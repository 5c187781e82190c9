"""Host two-pass search: native int8 prescore + exact f32 rescore.

The reference's warm 10k query is a full f32 scan (``svs/kb.py:1185``,
published 11 ms / measured 3.6 ms same-host).  The host path used to
mirror that scan exactly — a tie by construction.  The two-pass design
scans 1/4 the bytes (int8, VNNI/AVX2) and rescores only the candidate
set in f32, with the SAME margin proof as the device path — so the host
path now *wins* the reference's own flagship shape while returning
bit-identical scores.  These tests pin exact agreement with the full
scan, the tie rule, the widen ladder on adversarial clusters, and the
row-map permuted case.
"""

import numpy as np
import pytest

from svs_tpu.engine import RetrievalEngine
from svs_tpu.native import native_available
from svs_tpu.store import Database, embedding_to_bytes
from svs_tpu.utils.topk_np import top_k_numpy

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native fastpack unavailable"
)


def _pack(db_path, m):
    db = Database(db_path)
    with db.transaction() as tx:
        for i, v in enumerate(m):
            tx.add_doc(
                f"d{i}", None, None, embedding_to_bytes(list(map(float, v)))
            )
        tx.bump_matrix_version()
    eng = RetrievalEngine(precision="int8")
    corpus = eng.ensure_fresh(db)
    return db, eng, corpus


def test_two_pass_matches_full_scan_exactly(db_path, unit_rows, monkeypatch):
    monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 64)
    m = unit_rows(3000, 96)
    db, eng, corpus = _pack(db_path, m)
    try:
        assert corpus.host_f32 is not None
        q = unit_rows(3, 96)
        hf, rm = corpus.host_f32, corpus.host_row_map
        emb_hf = corpus.emb_ids if rm is None else None
        if emb_hf is None:
            emb_hf = np.empty_like(corpus.emb_ids)
            emb_hf[rm] = corpus.emb_ids
        two = eng._host_two_pass(corpus, hf, emb_hf, q, 25)
        assert two is not None, "two-pass declined unexpectedly"
        e2, s2 = two
        # oracle: full scan through the same public entry (two-pass off)
        monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 10**9)
        e1, s1 = eng.host_topk_exact(corpus, q, 25)
        np.testing.assert_array_equal(e1, e2)
        # batched full scan uses one GEMM whose f32 accumulation can
        # differ in the last ulp from per-row dots (the documented
        # device_rescore='auto' contract); the TWO-PASS side is the
        # per-row one, i.e. the reference-faithful accumulation
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        # solo: both sides are per-row matvecs -> BIT-identical
        e1s, s1s = eng.host_topk_exact(corpus, q[:1], 25)
        monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 64)
        e2s, s2s = eng.host_topk_exact(corpus, q[:1], 25)
        np.testing.assert_array_equal(e1s, e2s)
        np.testing.assert_array_equal(s1s, s2s)
    finally:
        db.close()


def test_public_entry_routes_through_two_pass(db_path, unit_rows, monkeypatch):
    monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 64)
    m = unit_rows(2000, 64)
    db, eng, corpus = _pack(db_path, m)
    try:
        calls = []
        real = eng._host_two_pass

        def spy(*a, **kw):
            out = real(*a, **kw)
            calls.append(out is not None)
            return out

        monkeypatch.setattr(eng, "_host_two_pass", spy)
        q = unit_rows(1, 64)
        emb, scores = eng.host_topk_exact(corpus, q, 10)
        assert calls == [True]
        # oracle agreement
        exact = m @ q[0]
        oracle = top_k_numpy(exact, 10)
        np.testing.assert_allclose(
            scores[0], [s for s, _ in oracle], atol=1e-6
        )
    finally:
        db.close()


def test_two_pass_tie_rule_matches_reference(db_path, unit_rows, monkeypatch):
    """Duplicated rows beyond k: the returned tied subset must break to
    the LARGER emb id in descending id order (reference
    ``svs/util.py:190-203``)."""
    monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 64)
    m = unit_rows(1200, 32)
    m[200:260] = m[200]  # 60 exact duplicates
    db, eng, corpus = _pack(db_path, m)
    try:
        q = m[200][None, :].copy()
        emb, scores = eng.host_topk_exact(corpus, q, 10)
        # emb ids are insertion order (1-based in the store); the 60
        # duplicates are docs 200..259 -> largest ids win, descending
        dup_embs = sorted(
            int(corpus.emb_ids[i]) for i in range(200, 260)
        )
        assert list(emb[0]) == sorted(dup_embs, reverse=True)[:10]
    finally:
        db.close()


def test_two_pass_widens_on_adversarial_cluster(
    db_path, monkeypatch, caplog
):
    """Hundreds of rows inside one int8 quantization step at the
    candidate boundary: the margin proof must fail, the ladder must
    widen, and the result must match the f32 oracle."""
    import logging
    import math

    monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 64)
    n, k = 4000, 10
    scores = 0.7 + np.arange(n, dtype=np.float64) * 1e-7
    m = np.zeros((n, 32), dtype=np.float32)
    for i, s in enumerate(scores):
        m[i, 0] = s
        m[i, 1] = math.sqrt(1.0 - float(s) ** 2)
    db, eng, corpus = _pack(db_path, m)
    try:
        q = np.zeros((1, 32), dtype=np.float32)
        q[0, 0] = 1.0
        with caplog.at_level(
            logging.INFO, logger="svs_tpu.engine.index"
        ):
            emb, got = eng.host_topk_exact(corpus, q, k)
        exact = m @ q[0]
        oracle = top_k_numpy(exact, k)
        np.testing.assert_allclose(got[0], [s for s, _ in oracle], atol=0)
        # best rows are stored last -> the returned ids are the last k
        expect_emb = sorted(
            (int(e) for e in corpus.emb_ids), reverse=True
        )[:k]
        assert list(emb[0]) == expect_emb
        assert any("two-pass margin" in r.message for r in caplog.records)
    finally:
        db.close()


def test_two_pass_respects_row_map(db_path, unit_rows, monkeypatch):
    """Sidecar/native packs can keep the f32 cache unpermuted with a
    pack-row -> cache-row map; the two-pass (which works in CACHE row
    space) must return the same ids as the full scan."""
    monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 64)
    m = unit_rows(1500, 48)
    db, eng, corpus = _pack(db_path, m)
    try:
        if corpus.host_row_map is None:
            # synthesize a permuted cache: shuffle rows + matching map
            rng = np.random.default_rng(3)
            perm = rng.permutation(corpus.n_valid)
            hf = corpus.host_f32
            shuffled = hf[np.argsort(perm)].copy()
            object.__setattr__(
                corpus, "host_cache", (shuffled, perm.astype(np.int64))
            )
            object.__setattr__(corpus, "host_i8", None)
        q = unit_rows(1, 48)
        e2, s2 = eng.host_topk_exact(corpus, q, 15)
        monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 10**9)
        e1, s1 = eng.host_topk_exact(corpus, q, 15)
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_array_equal(s1, s2)  # solo: bit-identical
    finally:
        db.close()


def test_large_cache_builds_int8_in_background(
    db_path, unit_rows, monkeypatch
):
    monkeypatch.setattr(RetrievalEngine, "HOST_TWOPASS_MIN_ROWS", 64)
    monkeypatch.setattr(RetrievalEngine, "HOST_I8_SYNC_MAX_BYTES", 0)
    m = unit_rows(1000, 32)
    db, eng, corpus = _pack(db_path, m)
    try:
        q = unit_rows(1, 32)
        # first call: background build spawned, full scan answers
        e1, s1 = eng.host_topk_exact(corpus, q, 5)
        t = eng._host_i8_thread
        assert t is not None
        t.join(30)
        assert corpus.host_i8 is not None
        e2, s2 = eng.host_topk_exact(corpus, q, 5)
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_array_equal(s1, s2)
    finally:
        db.close()
