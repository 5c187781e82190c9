"""SQL fast path for the meta-filter row index (svs_tpu extension; the
reference has no filtering).

``Tx.meta_eq_emb_ids`` evaluates ``key in meta and meta[key] == value``
inside SQLite via JSON1.  Python's equality semantics are quirky across
scalar types (``True == 1 == 1.0``, ``"1" != 1``, ``None`` matches only a
stored JSON ``null``, dict/list compare structurally) — every case below
pins the SQL route to a brute-force Python evaluation of the SAME
predicate, and pins ``MetaRowIndex.lookup`` (which mixes both routes) to
the same answer.  A disagreement here would let the pre-filter fast path
return different hits than the post-filter ladder."""

import json

import numpy as np
import pytest

from svs_tpu import KB
from svs_tpu.kb import MetaRowIndex

from kb_helpers import make_angle_embedder

# (meta, label) per doc; label only aids debugging.
METAS = [
    ({"k": "x"}, "str"),
    ({"k": 1}, "int1"),
    ({"k": 1.0}, "float1"),
    ({"k": True}, "true"),
    ({"k": False}, "false"),
    ({"k": 0}, "int0"),
    ({"k": None}, "null"),
    (None, "no-meta"),
    ({"other": "x"}, "absent-key"),
    ({"k": {"a": 1}}, "object"),
    ({"k": [1, 2]}, "array"),
    ({"k": '{"a":1}'}, "object-json-text"),  # string shaped like the object
    ({"k": "1"}, "numeric-text"),
    ({"k": 2**70}, "big-int"),
    ({"k": "ü\n"}, "unicode"),
    ({'q"uote': 5}, "quoted-key"),
    ({"a.b": 6}, "dotted-key"),
]

FILTERS = [
    ("k", "x"),
    ("k", 1),
    ("k", 1.0),
    ("k", True),
    ("k", False),
    ("k", 0),
    ("k", None),
    ("k", {"a": 1}),
    ("k", [1, 2]),
    ("k", '{"a":1}'),
    ("k", "1"),
    ("k", 2**70),
    ("k", "ü\n"),
    ('q"uote', 5),
    ("a.b", 6),
    ("missing", "x"),
]


@pytest.fixture()
def kb(db_path):
    kb = KB(db_path, make_angle_embedder())
    with kb.bulk_add_docs() as add:
        for i, (meta, _label) in enumerate(METAS):
            add(f"angle:{i * 3.7}", meta=meta)
    yield kb
    kb.close()


def _brute(tx, key, value):
    """The predicate evaluated the slow, unquestionable way."""
    out = []
    for emb_id, meta_str in tx.iter_emb_meta():
        if meta_str is None:
            continue
        meta = json.loads(meta_str)
        if key in meta and meta[key] == value:
            out.append(emb_id)
    return sorted(out)


@pytest.mark.parametrize("key,value", FILTERS)
def test_sql_route_matches_python_equality(kb, key, value):
    with kb._require_db().transaction() as tx:
        want = _brute(tx, key, value)
        got_sql = tx.meta_eq_emb_ids(key, value)
        if got_sql is not None:
            assert got_sql == want, f"SQL route diverged for {key}={value!r}"
        idx = MetaRowIndex()
        got_idx = idx.lookup(tx, {key: value})
        assert got_idx.tolist() == want


def test_sql_route_declines_unroutable(kb):
    with kb._require_db().transaction() as tx:
        assert tx.meta_eq_emb_ids("k", {"a": 1}) is None  # non-scalar
        assert tx.meta_eq_emb_ids("k", [1, 2]) is None
        assert tx.meta_eq_emb_ids("k", 2**70) is None  # > int64
        assert tx.meta_eq_emb_ids('q"uote', 5) is None  # path escaping
        # ... but plain scalars route through SQL.
        assert tx.meta_eq_emb_ids("k", "x") is not None


def test_cross_type_equivalence_classes(kb):
    """Python: True == 1 == 1.0, False == 0; text never equals numbers;
    None matches only a stored JSON null, never an absent key."""
    with kb._require_db().transaction() as tx:
        one = tx.meta_eq_emb_ids("k", 1)
        assert one == tx.meta_eq_emb_ids("k", True) == tx.meta_eq_emb_ids("k", 1.0)
        assert len(one) == 3  # int1, float1, true
        zero = tx.meta_eq_emb_ids("k", 0)
        assert zero == tx.meta_eq_emb_ids("k", False) and len(zero) == 2
        assert tx.meta_eq_emb_ids("k", "1") != one  # text != number
        null = tx.meta_eq_emb_ids("k", None)
        assert len(null) == 1  # the stored null; absent keys don't match


def test_object_json_text_does_not_collide(kb):
    """A string filter value that happens to be an object's JSON text
    must match ONLY the string doc (Python: str != dict)."""
    with kb._require_db().transaction() as tx:
        got = tx.meta_eq_emb_ids("k", '{"a":1}')
        assert got == _brute(tx, "k", '{"a":1}') and len(got) == 1


def test_index_mixes_sql_and_scan_routes(kb):
    """A multi-key filter whose keys split across the SQL route and the
    Python scan intersects correctly."""
    with kb._require_db().transaction() as tx:
        idx = MetaRowIndex()
        # no doc has both keys -> empty intersection, via mixed routes
        got = idx.lookup(tx, {"k": "x", 'q"uote': 5})
        assert got.size == 0
        got2 = idx.lookup(tx, {'q"uote': 5})
        assert got2.tolist() == _brute(tx, 'q"uote', 5) and got2.size == 1


def test_retrieve_where_end_to_end_after_sql_route(kb):
    """Full retrieve(where=dict) stays exact with the SQL-built index."""
    pred = lambda d: d["meta"] is not None and d["meta"].get("k") == "x"
    fast = kb.retrieve("angle:3.7", 3, where={"k": "x"})
    ladder = kb.retrieve("angle:3.7", 3, where=pred)
    key = lambda hits: [(h["doc"]["id"], h["score"]) for h in hits]
    assert key(fast) == key(ladder)
    assert all(h["doc"]["meta"]["k"] == "x" for h in fast)


def test_huge_float_filter_declined_not_diverging(kb):
    """Stored ints past int64 reach SQL as rounded REALs; a float filter
    equal to that ROUNDING must not match in the fast path when Python's
    exact comparison says no.  The SQL route declines floats >= 2^53."""
    with kb._require_db().transaction() as tx:
        assert tx.meta_eq_emb_ids("k", float(2**70)) is None  # declined
        # Python truth: 2**70 stored exactly-representable matches the
        # equal float; the index (via the scan route) agrees.
        idx = MetaRowIndex()
        got = idx.lookup(tx, {"k": float(2**70)})
        assert got.tolist() == _brute(tx, "k", float(2**70))


def test_huge_float_vs_rounded_int_no_false_match(db_path):
    """The precise divergence case: stored 2**70+1 (not representable as
    a double) vs filter float(2**70) — Python says no; the old SQL route
    would have said yes via REAL rounding."""
    from svs_tpu import KB as _KB

    from kb_helpers import make_angle_embedder

    kb2 = _KB(str(db_path) + ".huge", make_angle_embedder())
    with kb2.bulk_add_docs() as add:
        add("angle:1.0", meta={"k": 2**70 + 1})
        add("angle:2.0", meta={"k": "other"})
    with kb2._require_db().transaction() as tx:
        idx = MetaRowIndex()
        assert idx.lookup(tx, {"k": float(2**70)}).size == 0
        assert idx.lookup(tx, {"k": 2**70 + 1}).size == 1
    kb2.close()
