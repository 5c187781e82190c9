"""Filtered pairwise — ``document_top_pairwise_scores(n, where=...)``
(svs_tpu extension; the reference has no filtering): exact top pairs
among documents passing a filter, via a derived subset corpus (single
chip) or post-filtering the exact global pair prefix (mesh).  Random
unit vectors give distinct pair scores, so results here are unique and
comparable tuple-by-tuple against the post-filtered full run."""

import asyncio

import numpy as np
import pytest

from svs_tpu import KB

DIM = 16


def _embedder():
    async def embed(texts):
        out = []
        for t in texts:
            seed = abs(hash(t)) % (2**32)
            v = np.random.default_rng(seed).standard_normal(DIM)
            v /= np.linalg.norm(v)
            out.append([float(x) for x in v])
        return out

    return embed


def _build(db_path, n=90, buckets=3, **kw):
    kb = KB(db_path, _embedder(), force_fresh_db=True, **kw)
    with kb.bulk_add_docs() as add:
        for i in range(n):
            add(f"doc-{i}", meta={"b": i % buckets})
    return kb


def _postfiltered_oracle(kb, n, pred):
    total = len(kb) * (len(kb) - 1) // 2
    full = kb.document_top_pairwise_scores(total)
    return [t for t in full if pred(t[1]) and pred(t[2])][:n]


def _key(pairs):
    return [(s, a["id"], b["id"]) for s, a, b in pairs]


@pytest.mark.parametrize("precision", ["f32", "bf16", "int8"])
def test_filtered_pairwise_matches_postfiltered_oracle(db_path, precision):
    kb = _build(db_path, precision=precision)
    pred = lambda d: d["meta"]["b"] == 1
    want = _postfiltered_oracle(kb, 7, pred)
    got_dict = kb.document_top_pairwise_scores(7, where={"b": 1})
    got_pred = kb.document_top_pairwise_scores(7, where=pred)
    assert _key(got_dict) == _key(want)
    assert _key(got_pred) == _key(want)
    assert all(pred(a) and pred(b) for _, a, b in got_dict)
    kb.close()


def test_filtered_pairwise_edge_cases(db_path):
    kb = _build(db_path, n=20)
    # filter matching < 2 docs -> no pairs
    with kb.bulk_query_docs() as q:
        some = next(iter(q.dfs_traversal()))["id"]
        q.update_doc_meta(some, {"b": 99})
    assert kb.document_top_pairwise_scores(5, where={"b": 99}) == []
    assert kb.document_top_pairwise_scores(0, where={"b": 1}) == []
    # empty dict matches everything == unfiltered
    got = kb.document_top_pairwise_scores(4, where={})
    want = kb.document_top_pairwise_scores(4)
    assert _key(got) == _key(want)
    # n past the subset's pair count returns exactly all subset pairs
    with kb.bulk_query_docs() as q:
        f = sum(
            1
            for d in q.dfs_traversal()
            if d["meta"] == {"b": 1}
        )
    all_pairs = kb.document_top_pairwise_scores(10_000, where={"b": 1})
    kb.close()
    assert len(all_pairs) == f * (f - 1) // 2


def test_filtered_pairwise_mesh_postfilter(db_path, tmp_path):
    """Mesh engines take the post-filter prefix ladder; with distinct
    scores it returns the same pairs as the single-chip subset route."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from svs_tpu.parallel import default_mesh

    plain = _build(db_path)
    plain_scores = [
        s for s, _, _ in plain.document_top_pairwise_scores(6, where={"b": 2})
    ]
    plain.close()

    kb = _build(tmp_path / "mesh.sqlite", mesh=default_mesh())
    assert (
        kb.engine.subset_pairwise_corpus(
            kb._ensure_engine_fresh(), np.arange(4), np.arange(1, 5)
        )
        is None
    )
    got = kb.document_top_pairwise_scores(6, where={"b": 2})
    # exactness vs THIS route's own post-filtered full run (tuple-exact);
    # cross-route score agreement only to rescore ulp (device HIGHEST vs
    # host BLAS accumulation can differ in the last ulp and near-ties
    # may swap order across routes — same caveat as the engine docs)
    pred = lambda d: d["meta"]["b"] == 2
    want = _postfiltered_oracle(kb, 6, pred)
    assert _key(got) == _key(want)
    np.testing.assert_allclose(
        [s for s, _, _ in got], plain_scores, atol=1e-5
    )
    kb.close()


def test_filtered_pairwise_async_parity(db_path):
    from svs_tpu import AsyncKB
    from svs_tpu.utils.aio import EventLoopThread

    kb = _build(db_path, n=45)
    want = kb.document_top_pairwise_scores(5, where={"b": 0})
    kb.close()

    async def run():
        akb = AsyncKB(db_path, _embedder())
        try:
            return await akb.document_top_pairwise_scores(
                5, where={"b": 0}
            )
        finally:
            await akb.close()

    got = asyncio.run(run())
    assert _key(got) == _key(want)


def test_filtered_pairwise_after_meta_update(db_path):
    """The subset must reflect meta updates (no stale match set)."""
    kb = _build(db_path, n=30)
    before = kb.document_top_pairwise_scores(3, where={"b": 0})
    mover = before[0][1]["id"]
    with kb.bulk_query_docs() as q:
        q.update_doc_meta(mover, {"b": 7})
    after = kb.document_top_pairwise_scores(3, where={"b": 0})
    assert all(
        a["id"] != mover and b["id"] != mover for _, a, b in after
    )
    pred = lambda d: d["meta"]["b"] == 0
    assert _key(after) == _key(_postfiltered_oracle(kb, 3, pred))
    kb.close()
