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


def check_file(path: Path) -> List[str]:
    tree = ast.parse(path.read_text(), filename=str(path))
    problems: List[str] = []
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
        for i, a in enumerate(all_args):
            if i == 0 and skip_first:
                continue
            if a.annotation is None:
                problems.append(
                    f"{path}:{node.lineno}: def {node.name}: parameter "
                    f"{a.arg!r} missing annotation"
                )
        if node.returns is None:
            problems.append(
                f"{path}:{node.lineno}: def {node.name}: missing return "
                f"annotation"
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
