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


def test_meta_only_swap_invalidates_subset_cache(db_path):
    """A meta update that swaps WHICH docs match while keeping the match
    COUNT constant must not serve the old match set from the device
    subset cache (the pack object survives meta-only changes, so the
    cache must key on the match set itself, not its size)."""
    kb = _build(db_path, n_docs=200, n_buckets=10)
    first = kb.retrieve("angle:10.0", 3, where={"bucket": 7})
    assert all(h["doc"]["meta"]["bucket"] == 7 for h in first)
    a = first[0]["doc"]["id"]  # best bucket-7 doc: move it OUT...
    with kb.bulk_query_docs() as q:
        some_b3 = next(
            d["id"]
            for d in q.dfs_traversal()
            if d["meta"] == {"bucket": 3}
        )
        q.update_doc_meta(a, {"bucket": 3})
        q.update_doc_meta(some_b3, {"bucket": 7})  # ...and one IN
    after = kb.retrieve("angle:10.0", 3, where={"bucket": 7})
    ids_after = {h["doc"]["id"] for h in after}
    assert a not in ids_after  # stale cache would still return it
    pred = lambda d: d["meta"] == {"bucket": 7}
    ladder = kb.retrieve("angle:10.0", 3, where=pred)
    key = lambda hits: [(h["doc"]["id"], h["score"]) for h in hits]
    assert key(after) == key(ladder)
    kb.close()


def test_meta_index_eviction_does_not_break_inflight_lookup(db_path):
    """A multi-key lookup must survive its own entries being evicted
    (FIFO at max_entries) mid-lookup."""
    kb = _build(db_path, n_docs=100, n_buckets=4)
    with kb._require_db().transaction() as tx:
        idx = MetaRowIndex(max_entries=1)
        got = idx.lookup(tx, {"bucket": 1, "missing": "x"})
        assert got.size == 0  # intersection with an empty set
        got2 = idx.lookup(tx, {"bucket": 1})
        assert got2.size == 25
    kb.close()


def test_unserializable_filter_value_falls_back_to_ladder(db_path):
    """Filter values json.dumps refuses (numpy scalars, ...) must not
    crash retrieve — the post-filter ladder compares them with Python
    equality."""
    kb = _build(db_path, n_docs=80, n_buckets=4)
    got = kb.retrieve("angle:4.2", 3, where={"bucket": np.int64(1)})
    assert len(got) == 3
    assert all(h["doc"]["meta"]["bucket"] == 1 for h in got)
    pred = meta_filter_predicate({"bucket": 1})
    want = kb.retrieve("angle:4.2", 3, where=lambda d: pred(d))
    key = lambda hits: [(h["doc"]["id"], h["score"]) for h in hits]
    assert key(got) == key(want)
    kb.close()


def test_subset_cache_sweeps_stale_corpus_entries(db_path):
    """Entries pinning a superseded pack (multi-GB of HBM each at real
    scale) are swept on the next store."""
    kb = _build(db_path, n_docs=200, n_buckets=10)
    kb.retrieve("angle:10.0", 3, where={"bucket": 7})
    eng = kb.engine
    assert len(eng._subset_dev) == 1
    old_corpus = next(iter(eng._subset_dev.values()))[0]
    with kb.bulk_add_docs() as add:  # re-pack
        for i in range(40):
            add(f"angle:{900 + i * 0.2}", meta={"bucket": i % 10})
    kb.retrieve("angle:10.0", 3, where={"bucket": 3})
    assert all(
        e[0] is not old_corpus for e in eng._subset_dev.values()
    )
    kb.close()
