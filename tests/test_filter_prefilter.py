"""Pre-filter fast path for filtered retrieval (svs_tpu extension; the
reference has no filtering — ``/root/reference/src/svs/kb.py:1171-1206``
always ranks the full corpus).

Declarative meta filters (``where=dict`` or a ``meta_filter_predicate``)
with a SELECTIVE match set skip the post-filter widen ladder: the
``MetaRowIndex`` maps the filter to matching emb ids, and
``RetrievalEngine.subset_topk`` scores ONLY those rows in exact f32 with
the reference tie rule — exact by construction.  These tests pin parity
with the ladder and the brute oracle, the dispatch gates, tie rule,
cache invalidation on writes, and both the device-mirror and host
routes."""

import numpy as np
import pytest

from svs_tpu import KB
from svs_tpu.kb import (
    _PREFILTER_MAX_ROWS,
    MetaRowIndex,
    meta_filter_predicate,
)

from kb_helpers import make_angle_embedder


def _build(db_path, n_docs=800, n_buckets=40, **kb_kwargs):
    """Corpus of ``n_docs`` distinct angles; meta bucket = i %% n_buckets
    (each bucket holds n_docs / n_buckets docs — selective enough to
    pass the pre-filter gate f * 4 <= n_valid)."""
    kb = KB(db_path, make_angle_embedder(), **kb_kwargs)
    with kb.bulk_add_docs() as add:
        for i in range(n_docs):
            add(f"angle:{i * 0.2}", meta={"bucket": i % n_buckets})
    return kb


def _spy_subset(kb, calls):
    real = kb.engine.subset_topk

    def spy(corpus, vectors, ids, n, key=None):
        calls.append(int(np.asarray(ids).size))
        return real(corpus, vectors, ids, n, key)

    kb.engine.subset_topk = spy  # type: ignore[method-assign]


def _oracle(kb, query, n, pred):
    full = kb.retrieve(query, len(kb))
    return [
        (h["doc"]["id"], h["score"])
        for h in full
        if pred(h["doc"])
    ][:n]


@pytest.mark.parametrize("precision", ["f32", "bf16", "int8"])
def test_prefilter_matches_ladder_and_oracle(db_path, precision):
    kb = _build(db_path, precision=precision)
    calls = []
    _spy_subset(kb, calls)
    pred = meta_filter_predicate({"bucket": 7})
    fast = kb.retrieve("angle:33.3", 5, where={"bucket": 7})
    assert calls == [20]  # the fast path ran, on exactly the bucket
    # ladder (opaque predicate -> no __meta_filter__) agrees exactly
    ladder = kb.retrieve(
        "angle:33.3", 5, where=lambda d: pred(d)
    )
    key = lambda hits: [(h["doc"]["id"], h["score"]) for h in hits]
    assert key(fast) == key(ladder) == _oracle(kb, "angle:33.3", 5, pred)
    assert all(h["doc"]["meta"] == {"bucket": 7} for h in fast)
    kb.close()


def test_where_dict_async(db_path):
    from svs_tpu import AsyncKB
    from svs_tpu.utils.aio import EventLoopThread

    kb = _build(db_path)
    want = [
        (h["doc"]["id"], h["score"])
        for h in kb.retrieve("angle:60", 4, where={"bucket": 3})
    ]
    kb.close()
    loop = EventLoopThread()
    try:
        akb = AsyncKB(db_path, make_angle_embedder())
        calls = []

        async def go():
            _spy_subset(akb, calls)
            hits = await akb.retrieve("angle:60", 4, where={"bucket": 3})
            await akb.close()
            return hits

        hits = loop.run(go())
    finally:
        loop.stop()
    assert [(h["doc"]["id"], h["score"]) for h in hits] == want
    assert calls == [20]


def test_prefilter_tie_rule_larger_emb_id_first(db_path):
    """Duplicate vectors inside the filtered subset: equal exact scores
    must surface the LARGER emb id first (the reference tie rule)."""
    kb = KB(db_path, make_angle_embedder())
    with kb.bulk_add_docs() as add:
        for i in range(400):
            add(f"angle:{i}", meta={"dup": False})
        for _ in range(4):  # identical vectors, identical meta
            add("angle:12", meta={"dup": True})
    calls = []
    _spy_subset(kb, calls)
    hits = kb.retrieve("angle:12", 4, where={"dup": True})
    assert calls == [4]
    assert len(hits) == 4
    ids = [h["doc"]["id"] for h in hits]
    assert ids == sorted(ids, reverse=True)
    assert len({h["score"] for h in hits}) == 1
    kb.close()


def test_prefilter_zero_matches_and_unselective_gate(db_path):
    kb = _build(db_path, n_docs=400, n_buckets=2)  # 200/bucket: unselective
    calls = []
    _spy_subset(kb, calls)
    # no doc matches: fast path short-circuits to empty lists
    assert kb.retrieve("angle:0", 3, where={"bucket": 99}) == []
    # f * 4 > n_valid: the gate declines, the ladder runs, results exact
    pred = meta_filter_predicate({"bucket": 1})
    hits = kb.retrieve("angle:10", 5, where={"bucket": 1})
    assert calls == []  # subset_topk never ran (gate refused both)
    assert [(h["doc"]["id"], h["score"]) for h in hits] == _oracle(
        kb, "angle:10", 5, pred
    )
    kb.close()


def test_prefilter_fewer_matches_than_n(db_path):
    kb = _build(db_path)
    calls = []
    _spy_subset(kb, calls)
    hits = kb.retrieve("angle:5", 50, where={"bucket": 11})  # 20 matches
    assert calls == [20]
    assert len(hits) == 20
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert all(h["doc"]["meta"]["bucket"] == 11 for h in hits)
    kb.close()


def test_prefilter_index_invalidates_on_write(db_path):
    kb = _build(db_path)
    before = kb.retrieve("angle:160", 3, where={"bucket": 0})
    with kb.bulk_add_docs() as add:
        add("angle:160.01", meta={"bucket": 0})  # near-exact new match
    after = kb.retrieve("angle:160", 3, where={"bucket": 0})
    texts = [h["doc"]["text"] for h in after]
    assert "angle:160.01" in texts
    assert after != before
    kb.close()


def test_prefilter_host_route_matches_device_route(db_path):
    """device_rescore='host' drops the HBM mirror; the subset path falls
    back to the host f32 gather + np dot and must agree bit-for-bit."""
    kb_dev = _build(db_path)
    want = [
        (h["doc"]["id"], h["score"])
        for h in kb_dev.retrieve("angle:42", 6, where={"bucket": 13})
    ]
    kb_dev.close()
    kb_host = KB(db_path, make_angle_embedder(), device_rescore="host")
    calls = []
    _spy_subset(kb_host, calls)
    hits = kb_host.retrieve("angle:42", 6, where={"bucket": 13})
    assert calls == [20]
    assert [(h["doc"]["id"], h["score"]) for h in hits] == want
    kb_host.close()


def test_prefilter_declines_to_ladder_when_no_route(db_path, monkeypatch):
    """No device mirror AND a host route past the FLOP ceiling: the
    subset path returns None and the ladder serves the query exactly."""
    import svs_tpu.engine.index as eidx

    monkeypatch.setattr(eidx, "_SUBSET_HOST_MAX_FLOPS", 0)
    kb = _build(db_path, device_rescore="host")
    pred = meta_filter_predicate({"bucket": 7})
    hits = kb.retrieve("angle:33.3", 5, where={"bucket": 7})
    assert [(h["doc"]["id"], h["score"]) for h in hits] == _oracle(
        kb, "angle:33.3", 5, pred
    )
    kb.close()


def test_prefilter_repeat_queries_reuse_device_subset(db_path):
    """Repeated filtered queries hit the engine's device-side subset
    cache (one upload per (filter, pack))."""
    kb = _build(db_path)
    kb.retrieve("angle:1", 3, where={"bucket": 5})
    cache = kb.engine._subset_dev
    key = MetaRowIndex.canonical({"bucket": 5})
    assert key in cache
    entry = cache[key]
    kb.retrieve("angle:2", 3, where={"bucket": 5})
    assert kb.engine._subset_dev[key] is entry  # reused, not re-uploaded
    kb.close()


def test_meta_row_index_value_types(db_path):
    """Value semantics match meta_filter_predicate exactly across JSON
    types (str/int/float/bool/nested), and multi-key filters intersect."""
    kb = KB(db_path, make_angle_embedder())
    metas = [
        {"k": "a", "j": 1},
        {"k": "a", "j": 2},
        {"k": 1},
        {"k": 1.0},
        {"k": True},
        {"k": {"nested": [1, 2]}},
        None,
    ]
    with kb.bulk_add_docs() as add:
        for i, meta in enumerate(metas):
            add(f"angle:{i * 7}", meta=meta)
    db = kb.db
    assert db is not None
    idx = MetaRowIndex()
    with db.transaction() as tx:
        for flt in (
            {"k": "a"},
            {"k": 1},
            {"k": True},
            {"k": {"nested": [1, 2]}},
            {"k": "a", "j": 2},
            {"missing": 0},
        ):
            got = idx.lookup(tx, flt)
            assert got is not None
            pred = meta_filter_predicate(flt)
            want = sorted(
                i + 1
                for i, meta in enumerate(metas)
                if pred({"meta": meta})  # type: ignore[typeddict-item]
            )
            # emb ids == insertion order here (fresh store, bulk add)
            assert got.tolist() == want, flt
        assert idx.lookup(tx, {}) is None  # empty filter -> ladder
    kb.close()


def test_rows_for_emb_ids_inverse_with_missing(db_path):
    kb = _build(db_path, n_docs=100, n_buckets=4)
    with kb._lock:
        corpus = kb._ensure_engine_fresh()
    ids = np.asarray([1, 50, 100, 101, 9999], dtype=np.int64)
    rows, present = corpus.rows_for_emb_ids(ids)
    assert present.tolist() == [True, True, True, False, False]
    assert np.array_equal(corpus.emb_ids[rows[present]], ids[present])
    kb.close()


def test_prefilter_gate_ceiling_constant_sane():
    assert 0 < _PREFILTER_MAX_ROWS <= 1 << 20
