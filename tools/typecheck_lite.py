#!/usr/bin/env python
"""Executable typing gate, part 1: static annotation-completeness lint.

This image has no mypy/pyright and no network, so the mypy-strict CI gate
(`pyproject.toml [tool.mypy]`) cannot run here.  This tool enforces the
*observable* core of `strict = true` that an AST can check, and actually
executes in CI and in the default test suite (``tests/test_typing.py``):

- ``disallow_untyped_defs`` / ``disallow_incomplete_defs``: every
  function and method in ``svs_tpu`` must annotate every parameter
  (except ``self``/``cls``) AND its return type;
- ``disallow_untyped_decorators`` is approximated by the same rule
  applied to nested/decorated defs;
- ``disallow_any_generics``: a bare generic in a signature annotation
  (``List``, ``Dict``, ``Callable``, builtin ``list``/``dict``/...)
  types as ``Any`` parameters under strict mypy — every generic in a
  def signature must be parameterized;
- ``ignore-without-code``: every ``# type: ignore`` must carry an error
  code (``# type: ignore[attr-defined]``) so suppressions stay narrow;
- ``no_implicit_optional`` (a strict-mode default since mypy 0.990): a
  parameter whose default is ``None`` must spell the optionality in its
  annotation (``Optional[...]``, ``... | None``, ``Any``/``object``);
- lambdas are exempt (as in mypy).

Part 2 is the typeguard runtime check (``tests/test_typing.py``), which
imports the package under an instrumented import hook and drives a KB
end-to-end so the annotations are *enforced* against real values.

Usage: ``python tools/typecheck_lite.py [package_dir]`` — prints one line
per violation and exits non-zero if any.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path
from typing import Iterator, List, Tuple

#: Nested helper closures (def inside a function body) are the one place
#: the lint relaxes the return-annotation rule when the function is
#: trivially local (mypy infers these; an AST cannot).  Parameters must
#: still be annotated.
ALLOW_UNANNOTATED_NESTED_RETURNS = False


def _iter_defs(
    tree: ast.AST,
) -> Iterator[Tuple[ast.AST, bool]]:
    """Yield (funcdef, is_method) for every def/async-def in the tree."""

    class V(ast.NodeVisitor):
        def __init__(self) -> None:
            self.out: List[Tuple[ast.AST, bool]] = []
            self._class_depth = 0

        def visit_ClassDef(self, node: ast.ClassDef) -> None:
            self._class_depth += 1
            self.generic_visit(node)
            self._class_depth -= 1

        def _visit_def(self, node: ast.AST) -> None:
            self.out.append((node, self._class_depth > 0))
            # nested defs: class depth resets inside a function body
            depth = self._class_depth
            self._class_depth = 0
            self.generic_visit(node)
            self._class_depth = depth

        visit_FunctionDef = _visit_def
        visit_AsyncFunctionDef = _visit_def

    v = V()
    v.visit(tree)
    yield from v.out


#: Generic types that are ``Any``-parameterized when written bare in an
#: annotation (mypy strict: ``disallow_any_generics``).  ``type`` is
#: excluded: bare ``type`` is a valid non-generic annotation.
_BARE_GENERICS = {
    "List", "Dict", "Tuple", "Set", "FrozenSet", "Deque", "DefaultDict",
    "OrderedDict", "Counter", "Iterator", "Iterable", "Sequence",
    "Mapping", "MutableMapping", "Callable", "Awaitable", "Coroutine",
    "AsyncIterator", "AsyncIterable", "Generator", "AsyncGenerator",
    "list", "dict", "tuple", "set", "frozenset",
}

_IGNORE_RE = __import__("re").compile(
    r"#\s*type:\s*ignore(?!\[)"
)


def _bare_generics_in(annotation: ast.AST) -> Iterator[str]:
    """Names from ``_BARE_GENERICS`` appearing UNPARAMETERIZED anywhere
    in an annotation expression (a Subscript's value is parameterized —
    its slice is walked for nested bare generics)."""
    if isinstance(annotation, ast.Subscript):
        yield from _bare_generics_in(annotation.slice)
        return
    if isinstance(annotation, ast.Name):
        if annotation.id in _BARE_GENERICS:
            yield annotation.id
        return
    if isinstance(annotation, ast.Attribute):
        if annotation.attr in _BARE_GENERICS:
            yield annotation.attr
        return
    if isinstance(annotation, ast.Constant):
        # string annotation: parse and recurse (from __future__
        # annotations makes these rare but they exist)
        if isinstance(annotation.value, str):
            try:
                sub = ast.parse(annotation.value, mode="eval").body
            except SyntaxError:
                return
            yield from _bare_generics_in(sub)
        return
    for child in ast.iter_child_nodes(annotation):
        yield from _bare_generics_in(child)


def _admits_none(annotation: ast.AST) -> bool:
    """Whether an annotation can type a ``None`` value: ``Optional``/
    ``Union`` arms, PEP 604 ``X | None``, literal ``None``, ``Any``,
    ``object``, or a string annotation of any of those."""
    if isinstance(annotation, ast.Constant):
        if annotation.value is None:
            return True
        if isinstance(annotation.value, str):
            try:
                sub = ast.parse(annotation.value, mode="eval").body
            except SyntaxError:
                return False
            return _admits_none(sub)
        return False
    if isinstance(annotation, ast.Name):
        return annotation.id in ("Optional", "Any", "object", "Union")
    if isinstance(annotation, ast.Attribute):
        return annotation.attr in ("Optional", "Any", "object", "Union")
    if isinstance(annotation, ast.Subscript):
        if _admits_none(annotation.value):
            # Optional[...] always admits None; Union[...] only if an
            # arm does — checked by walking the slice below
            base = annotation.value
            name = (
                base.id if isinstance(base, ast.Name)
                else base.attr if isinstance(base, ast.Attribute) else ""
            )
            if name in ("Optional", "Any", "object"):
                return True
            return any(
                _admits_none(c) for c in ast.walk(annotation.slice)
            )
        return False
    if isinstance(annotation, ast.BinOp) and isinstance(
        annotation.op, ast.BitOr
    ):
        return _admits_none(annotation.left) or _admits_none(
            annotation.right
        )
    return False


def check_file(path: Path) -> List[str]:
    src = path.read_text()
    tree = ast.parse(src, filename=str(path))
    problems: List[str] = []
    for lineno, line in enumerate(src.splitlines(), 1):
        if _IGNORE_RE.search(line):
            problems.append(
                f"{path}:{lineno}: bare '# type: ignore' (add an error "
                f"code: '# type: ignore[code]')"
            )
    for node, is_method in _iter_defs(tree):
        assert isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        args = node.args
        all_args = (
            list(args.posonlyargs)
            + list(args.args)
            + list(args.kwonlyargs)
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        )
        skip_first = is_method and all_args and all_args[0].arg in (
            "self", "cls"
        )
        # map default expressions to their parameters: positional
        # defaults align with the TAIL of posonly+args; kw_defaults
        # align 1:1 with kwonlyargs (None = no default)
        pos = list(args.posonlyargs) + list(args.args)
        none_defaulted = set()
        for a, dflt in zip(pos[len(pos) - len(args.defaults):],
                           args.defaults):
            if isinstance(dflt, ast.Constant) and dflt.value is None:
                none_defaulted.add(a)
        for a, kd in zip(args.kwonlyargs, args.kw_defaults):
            if isinstance(kd, ast.Constant) and kd.value is None:
                none_defaulted.add(a)
        for i, a in enumerate(all_args):
            if i == 0 and skip_first:
                continue
            if (
                a in none_defaulted
                and a.annotation is not None
                and not _admits_none(a.annotation)
            ):
                problems.append(
                    f"{path}:{node.lineno}: def {node.name}: parameter "
                    f"{a.arg!r} defaults to None but its annotation "
                    f"does not admit None (no_implicit_optional)"
                )
            if a.annotation is None:
                problems.append(
                    f"{path}:{node.lineno}: def {node.name}: parameter "
                    f"{a.arg!r} missing annotation"
                )
            else:
                for g in _bare_generics_in(a.annotation):
                    problems.append(
                        f"{path}:{node.lineno}: def {node.name}: parameter "
                        f"{a.arg!r} uses bare generic {g!r} "
                        f"(disallow_any_generics)"
                    )
        if node.returns is None:
            problems.append(
                f"{path}:{node.lineno}: def {node.name}: missing return "
                f"annotation"
            )
        else:
            for g in _bare_generics_in(node.returns):
                problems.append(
                    f"{path}:{node.lineno}: def {node.name}: return uses "
                    f"bare generic {g!r} (disallow_any_generics)"
                )
    return problems


def main(argv: List[str]) -> int:
    root = Path(argv[1]) if len(argv) > 1 else Path("svs_tpu")
    problems: List[str] = []
    for path in sorted(root.rglob("*.py")):
        problems.extend(check_file(path))
    for p in problems:
        print(p)
    print(
        f"typecheck_lite: {len(problems)} problem(s) in {root}",
        file=sys.stderr,
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
