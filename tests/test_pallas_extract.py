"""Extraction-kernel correctness (interpret mode on the CPU backend):
oracle equivalence, adversarial hidden-element fallback, fused packed op,
and bf16-score candidate coverage."""

import jax.numpy as jnp
import numpy as np
import pytest

from svs_tpu.ops.pallas_extract import (
    BLOCK_N,
    EXTRACT_H,
    SUBTILE,
    extract_supported,
    extract_topk,
    score_topk_extract_packed,
)
from svs_tpu.ops.topk import score_topk_packed, unpack_vals_idx
from svs_tpu.utils.topk_np import top_k_numpy


def test_extract_supported_bounds():
    assert extract_supported(2 * BLOCK_N, 8, 10)
    assert not extract_supported(2 * BLOCK_N + 1, 8, 10)  # unaligned
    assert not extract_supported(1 << 24, 8, 10)  # f32-index ceiling
    assert not extract_supported(
        2 * BLOCK_N, 8, (2 * BLOCK_N // SUBTILE) * EXTRACT_H + 1
    )  # k beyond extracted coverage


def test_extract_topk_matches_oracle_random():
    rng = np.random.default_rng(0)
    n = 2 * BLOCK_N
    scores = rng.normal(size=(9, n)).astype(np.float32)  # odd batch: pads to 16
    vals, idx = extract_topk(jnp.asarray(scores), 37, interpret=True)
    assert vals.shape == (9, 37)
    for b in range(9):
        oracle = top_k_numpy(scores[b], 37)
        np.testing.assert_array_equal(np.asarray(vals)[b], [s for s, _ in oracle])
        assert list(np.asarray(idx)[b]) == [i for _, i in oracle]


def test_extract_topk_adversarial_hidden_fallback():
    """More than H true winners inside ONE subtile: the hidden-element
    check must trip and the in-graph fallback must return the exact set."""
    n = 2 * BLOCK_N
    adv = np.zeros((2, n), dtype=np.float32)
    adv[:, 100 : 100 + 4 * EXTRACT_H] = np.linspace(
        0.99, 0.9, 4 * EXTRACT_H, dtype=np.float32
    )[None, :]
    k = 3 * EXTRACT_H  # needs more than H from the hot subtile
    vals, idx = extract_topk(jnp.asarray(adv), k, interpret=True)
    for b in range(2):
        oracle = top_k_numpy(adv[b], k)
        np.testing.assert_array_equal(np.asarray(vals)[b], [s for s, _ in oracle])
        assert list(np.asarray(idx)[b]) == [i for _, i in oracle]


def test_score_topk_extract_packed_matches_plain(unit_rows):
    n = 2 * BLOCK_N
    m = unit_rows(n, 128)
    q = m[5:13]
    n_valid = n - 37  # padding rows masked
    plain = score_topk_packed(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(n_valid), 25
    )
    ext = score_topk_extract_packed(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(n_valid), 25, interpret=True
    )
    v1, r1 = unpack_vals_idx(np.asarray(plain), 25)
    v2, r2 = unpack_vals_idx(np.asarray(ext), 25)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(v1, v2)
    assert (r2 < n_valid).all()


def test_extract_packed_bf16_scores_cover_true_topk(unit_rows):
    """bf16 score storage loosens ordering inside ties, but with the
    engine's over-provisioning every exact-f32 top-k doc must be present
    in the candidate set."""
    n = 2 * BLOCK_N
    m = unit_rows(n, 64)
    q = m[:8]
    c = 64
    packed = score_topk_extract_packed(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(n), c,
        score_dtype="bf16", interpret=True,
    )
    _, rows = unpack_vals_idx(np.asarray(packed), c)
    exact = m @ q.T
    for b in range(8):
        true_top = {i for _, i in top_k_numpy(exact[:, b], 10)}
        assert true_top <= set(rows[b].tolist())


def test_fused_kernels_match_plain(unit_rows):
    """Fused float and int8 kernels against their XLA twins on a
    block-aligned corpus (interpret mode)."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        fused_supported,
        score_topk_fused_int8_packed,
        score_topk_fused_packed,
    )
    from svs_tpu.ops.quant import quantize_rows_int8, score_topk_int8_packed

    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[5:13]
    nv = n - 99
    assert fused_supported(n, 128, 8, 25)

    plain = score_topk_packed(jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), 25)
    fused = score_topk_fused_packed(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), 25, interpret=True
    )
    v1, r1 = unpack_vals_idx(np.asarray(plain), 25)
    v2, r2 = unpack_vals_idx(np.asarray(fused), 25)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(v1, v2, atol=2e-6)

    qd, scales = quantize_rows_int8(jnp.asarray(m))
    plain8 = score_topk_int8_packed(qd, scales, jnp.asarray(q), jnp.int32(nv), 25)
    fused8 = score_topk_fused_int8_packed(
        qd, scales, jnp.asarray(q), jnp.int32(nv), 25, interpret=True
    )
    v3, r3 = unpack_vals_idx(np.asarray(plain8), 25)
    v4, r4 = unpack_vals_idx(np.asarray(fused8), 25)
    np.testing.assert_array_equal(r3, r4)
    np.testing.assert_allclose(v3, v4, rtol=1e-5, atol=1e-6)


# --- keyed (v2) kernels -----------------------------------------------------


def _fused2_mods():
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        KEY_EPS,
        _reduce_h2,
        fused2_supported,
        score_topk_fused2_int8_packed,
        score_topk_fused2_packed,
    )

    return (
        FUSED_BLOCK_N,
        KEY_EPS,
        _reduce_h2,
        fused2_supported,
        score_topk_fused2_int8_packed,
        score_topk_fused2_packed,
    )


def test_fused2_supported_bounds():
    (FUSED_BLOCK_N, _, _reduce_h2, fused2_supported, _, _) = _fused2_mods()
    assert fused2_supported(4 * FUSED_BLOCK_N, 128, 8, 25)
    assert not fused2_supported(FUSED_BLOCK_N, 128, 8, 25)  # nb < 2
    assert not fused2_supported(4 * FUSED_BLOCK_N + 1, 128, 8, 25)
    # k so large relative to block count that H2 degenerates
    assert not fused2_supported(2 * FUSED_BLOCK_N, 128, 8, 120)
    assert _reduce_h2(128 * FUSED_BLOCK_N, 400) % 8 == 0


def test_fused2_candidate_set_covers_truth(unit_rows):
    """Random corpus: returned candidates must (a) decode within KEY_EPS
    below their true score, (b) contain every doc whose true score clears
    the returned k-th value by KEY_EPS (the engine's margin contract)."""
    import jax.numpy as jnp

    (FUSED_BLOCK_N, KEY_EPS, _, fused2_supported, _, f2) = _fused2_mods()
    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[5:13].astype(np.float32)
    nv = n - 99
    k = 25
    assert fused2_supported(n, 128, 8, k)
    packed = f2(jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), k, interpret=True)
    vals, rows = unpack_vals_idx(np.asarray(packed), k)
    assert (rows < nv).all() and (rows >= 0).all()
    exact = (m[:nv].astype(np.float32) @ q.T).T  # [8, nv]
    for b in range(8):
        true_of_returned = exact[b][rows[b]]
        # decoded quantized values sit within KEY_EPS below the truth
        assert (vals[b] <= true_of_returned + 1e-6).all()
        assert (true_of_returned <= vals[b] + KEY_EPS).all()
        # coverage: every doc clearly above the k-th returned value is in
        v_k = vals[b][k - 1]
        must_have = set(np.nonzero(exact[b] > v_k + KEY_EPS)[0].tolist())
        assert must_have <= set(rows[b].tolist())
        assert len(set(rows[b].tolist())) == k


def test_fused2_well_separated_matches_plain():
    """Scores spaced far beyond the key grid: the keyed path must agree
    with the XLA reference exactly on indices."""
    import jax.numpy as jnp

    (FUSED_BLOCK_N, _, _, fused2_supported, _, f2) = _fused2_mods()
    n = 2 * FUSED_BLOCK_N
    d = 128
    # 64 hot docs with scores 0.9, 0.899, ... (1e-3 spacing, far beyond
    # the 2^-13 key grid), spread across subtiles; flat background.
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 1] = 1.0
    hot_rows = (np.arange(64) * 997 + 5) % n
    assert len(set(hot_rows.tolist())) == 64
    hot = (0.9 - np.arange(64) * 1e-3).astype(np.float32)
    m[hot_rows, 0] = hot
    m[hot_rows, 1] = np.sqrt(1.0 - hot**2)
    q = np.zeros((8, d), dtype=np.float32)
    q[:, 0] = 1.0
    k = 17
    plain = score_topk_packed(jnp.asarray(m), jnp.asarray(q), jnp.int32(n), k)
    got = f2(jnp.asarray(m), jnp.asarray(q), jnp.int32(n), k, interpret=True)
    _, r1 = unpack_vals_idx(np.asarray(plain), k)
    _, r2 = unpack_vals_idx(np.asarray(got), k)
    for b in range(8):
        assert list(r1[b]) == list(r2[b])  # exact order: no grid ties


def test_fused2_level1_hidden_triggers_exact_fallback(unit_rows):
    """More than EXTRACT_H true winners inside one 512-doc subtile: the
    level-1 tail check must trip and the fallback returns exact scores."""
    import jax.numpy as jnp

    (FUSED_BLOCK_N, _, _, fused2_supported, _, f2) = _fused2_mods()
    n = 2 * FUSED_BLOCK_N
    d = 128
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 1] = 1.0  # background: orthogonal to the query
    hot = np.linspace(0.99, 0.9, 4 * EXTRACT_H).astype(np.float32)
    rows = 100 + np.arange(4 * EXTRACT_H)  # all inside subtile 0
    m[rows, 0] = hot
    m[rows, 1] = np.sqrt(1.0 - hot**2)
    q = np.zeros((1, d), dtype=np.float32)
    q[0, 0] = 1.0
    k = 3 * EXTRACT_H
    assert fused2_supported(n, d, 1, k)
    got = f2(jnp.asarray(m), jnp.asarray(q), jnp.int32(n), k, interpret=True)
    vals, ridx = unpack_vals_idx(np.asarray(got), k)
    oracle = top_k_numpy((m @ q.T)[:, 0], k)
    np.testing.assert_array_equal(vals[0], [s for s, _ in oracle])
    assert list(ridx[0]) == [i for _, i in oracle]


def test_fused2_level2_hidden_triggers_exact_fallback():
    """Winners concentrated in ONE block, but no more than EXTRACT_H per
    subtile — hidden only at the pass-2 group level; the level-2 tail
    check must trip and the fallback returns the exact set."""
    import jax.numpy as jnp

    (FUSED_BLOCK_N, _, _reduce_h2, fused2_supported, _, f2) = _fused2_mods()
    n = 4 * FUSED_BLOCK_N
    d = 128
    k = 40
    h2 = _reduce_h2(n, k)
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 1] = 1.0
    # 42 hot docs: 7 per subtile (UNDER EXTRACT_H, so level-1 tails stay
    # at the background score) across 6 subtiles — all in block 0, whose
    # pass-2 group can keep only h2 of them.
    hot_rows = []
    for s in range(6):
        hot_rows.extend(range(s * 512, s * 512 + 7))
    hot_rows = np.asarray(hot_rows)
    hot = np.linspace(0.99, 0.8, len(hot_rows)).astype(np.float32)
    m[hot_rows, 0] = hot
    m[hot_rows, 1] = np.sqrt(1.0 - hot**2)
    q = np.zeros((1, d), dtype=np.float32)
    q[0, 0] = 1.0
    assert k > h2, "test needs k beyond one group's kept winners"
    assert fused2_supported(n, d, 1, k)
    got = f2(jnp.asarray(m), jnp.asarray(q), jnp.int32(n), k, interpret=True)
    vals, ridx = unpack_vals_idx(np.asarray(got), k)
    oracle = top_k_numpy((m @ q.T)[:, 0], k)
    np.testing.assert_array_equal(vals[0], [s for s, _ in oracle])
    assert list(ridx[0]) == [i for _, i in oracle]


def test_fused2_out_of_domain_scores_fall_back_exact():
    """Scores past the key range (|key| >= 2^24, i.e. dots beyond ~2.9 —
    impossible for unit-norm cosine but reachable by raw-op callers):
    the overflow guard must route to the exact fallback."""
    import jax.numpy as jnp

    (FUSED_BLOCK_N, _, _, fused2_supported, _, f2) = _fused2_mods()
    n = 2 * FUSED_BLOCK_N
    d = 128
    rng = np.random.default_rng(5)
    m = (rng.standard_normal((n, d)) * 0.5).astype(np.float32)  # NOT unit
    q = (rng.standard_normal((2, d)) * 1.5).astype(np.float32)
    # dots reach well past the supported range
    assert np.abs(m @ q.T).max() > 3.5
    k = 20
    assert fused2_supported(n, d, 2, k)
    got = f2(jnp.asarray(m), jnp.asarray(q), jnp.int32(n), k, interpret=True)
    vals, rows = unpack_vals_idx(np.asarray(got), k)
    exact = m @ q.T
    for b in range(2):
        oracle = top_k_numpy(exact[:, b], k)
        np.testing.assert_allclose(
            vals[b], [s for s, _ in oracle], rtol=1e-6
        )
        assert list(rows[b]) == [i for _, i in oracle]


def test_fused2_int8_candidate_set(unit_rows):
    import jax.numpy as jnp
    from svs_tpu.ops.quant import quantize_rows_int8, score_topk_int8_packed

    (FUSED_BLOCK_N, KEY_EPS, _, fused2_supported, f2i8, _) = _fused2_mods()
    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[5:13].astype(np.float32)
    nv = n - 99
    k = 25
    qd, scales = quantize_rows_int8(jnp.asarray(m))
    got = f2i8(qd, scales, jnp.asarray(q), jnp.int32(nv), k, interpret=True)
    vals, rows = unpack_vals_idx(np.asarray(got), k)
    assert (rows < nv).all() and (rows >= 0).all()
    # compare against the XLA int8 reference: same prescore domain, so the
    # sets must agree up to key-grid ties at the boundary
    plain = score_topk_int8_packed(qd, scales, jnp.asarray(q), jnp.int32(nv), k)
    pv, pr = unpack_vals_idx(np.asarray(plain), k)
    for b in range(8):
        common = set(rows[b].tolist()) & set(pr[b].tolist())
        assert len(common) >= k - 2  # boundary grid ties only
        got_set = set(rows[b].tolist())
        must_have = {
            int(i) for v, i in zip(pv[b], pr[b]) if v > pv[b][k - 1] + KEY_EPS
        }
        assert must_have <= got_set


def test_fused2_negative_score_band_with_padding():
    """Scores in (-KEY_BIAS band, all negative keys) with dead padding
    lanes: markers must NOT outrank live lanes (a 0.0 marker would) and
    must not trip the domain guard."""
    import jax.numpy as jnp

    (FUSED_BLOCK_N, KEY_EPS, _, fused2_supported, _, f2) = _fused2_mods()
    n = 2 * FUSED_BLOCK_N
    d = 128
    rng = np.random.default_rng(9)
    # every dot lands in [-2.1, -1.2]: below -KEY_BIAS, inside the horizon
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 0] = 1.0
    q = np.zeros((2, d), dtype=np.float32)
    q[:, 0] = -(1.2 + 0.9 * rng.random(2)).astype(np.float32)
    # give docs slight magnitude spread so there is a real top-k order
    m[:, 0] *= (1.0 - 0.4 * rng.random(n)).astype(np.float32)
    nv = n - 300  # dead tail lanes
    k = 25
    assert fused2_supported(n, d, 2, k)
    got = f2(jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), k, interpret=True)
    vals, rows = unpack_vals_idx(np.asarray(got), k)
    assert (rows < nv).all() and (rows >= 0).all(), "padding promoted"
    exact = (m[:nv] @ q.T).T
    for b in range(2):
        true_of_returned = exact[b][rows[b]]
        assert (vals[b] <= true_of_returned + 1e-6).all()
        assert (true_of_returned <= vals[b] + KEY_EPS).all()
        v_k = vals[b][k - 1]
        must_have = set(np.nonzero(exact[b] > v_k + KEY_EPS)[0].tolist())
        assert must_have <= set(rows[b].tolist())


@pytest.mark.parametrize(
    "nv_off,b,k",
    [
        (1, 3, 1),      # n_valid just past a block boundary; k=1; odd batch
        (513, 1, 40),   # dead tail crossing a subtile boundary
        (0, 5, 40),     # fully dense corpus
    ],
)
def test_fused2_edge_shapes(unit_rows, nv_off, b, k):
    """Boundary sweep: odd batches, k=1, n_valid at awkward offsets —
    candidate coverage and index hygiene must hold everywhere."""
    import jax.numpy as jnp

    (FUSED_BLOCK_N, KEY_EPS, _, fused2_supported, _, f2) = _fused2_mods()
    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[20 : 20 + b].astype(np.float32)
    nv = n - nv_off
    assert fused2_supported(n, 128, b, k)
    got = f2(jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), k, interpret=True)
    vals, rows = unpack_vals_idx(np.asarray(got), k)
    assert vals.shape == (b, k)
    assert (rows >= 0).all() and (rows < nv).all()
    exact = (m[:nv].astype(np.float32) @ q.T).T
    for bb in range(b):
        assert len(set(rows[bb].tolist())) == k
        true_of_returned = exact[bb][rows[bb]]
        assert (vals[bb] <= true_of_returned + 1e-6).all()
        assert (true_of_returned <= vals[bb] + KEY_EPS).all()
        v_k = vals[bb][k - 1]
        must = set(np.nonzero(exact[bb] > v_k + KEY_EPS)[0].tolist())
        assert must <= set(rows[bb].tolist())


def test_fused2_no_size_ceiling_and_wide_decode():
    """The keyed kernels have NO 2^24 row ceiling (v1 paths do): the
    support predicate admits giant corpora, and the index reconstruction
    in _fused2_finish stays exact past 2^24 (int32 math on synthesized
    pass-1 keys — the full-corpus interpret run is the opt-in slow test
    below)."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        EXTRACT_H,
        FUSED_BLOCK_N,
        FUSED_SUBTILE,
        KEY_BIAS,
        KEY_DEAD,
        KEY_QSCALE,
        _KEY_LANES,
        _fused2_finish,
        _reduce_h2,
        fused2_supported,
        fused_supported,
    )

    n = (1 << 24) + 2 * FUSED_BLOCK_N
    assert fused2_supported(n, 128, 8, 20)
    assert not fused_supported(n, 128, 8, 20)  # v1 keeps its f32 ceiling
    assert not fused2_supported(n + 1, 128, 8, 20)  # alignment still holds

    # Synthesize pass-1 keys for a virtual n-row corpus: all dead except
    # hot entries planted at rows far above 2^24.
    l1 = (n // FUSED_SUBTILE) * EXTRACT_H
    keys1 = np.full((8, l1), KEY_DEAD, dtype=np.float32)

    def plant(row, score):
        jb, rem = divmod(row, FUSED_BLOCK_N)
        s, lane = divmod(rem, FUSED_SUBTILE)
        col = (jb * (FUSED_BLOCK_N // FUSED_SUBTILE) + s) * EXTRACT_H
        key = np.floor((score + KEY_BIAS) * KEY_QSCALE) * _KEY_LANES + lane
        keys1[:, col] = key
        return row

    hot = [
        plant(3, 0.95),
        plant((1 << 24) + 1234, 0.90),
        plant(n - FUSED_SUBTILE - 7, 0.85),
        plant(16_000_000, 0.80),
    ]
    k = 4
    vals, idx, covered = _fused2_finish(
        jnp.asarray(keys1), k, _reduce_h2(n, k), 8, True
    )
    idx = np.asarray(idx)
    for b in range(8):
        assert list(idx[b]) == hot, idx[b]
    np.testing.assert_allclose(
        np.asarray(vals)[0], [0.95, 0.90, 0.85, 0.80], atol=2.0**-12
    )
    assert bool(np.asarray(covered))


@pytest.mark.skipif(
    not __import__("os").environ.get("SVS_TPU_SLOW_TESTS"),
    reason="16.8M-row interpret run takes ~15+ min; set SVS_TPU_SLOW_TESTS=1",
)
def test_fused2_wide_corpus_full_interpret():
    """Full keyed path (kernel included) over a corpus past 2^24 padded
    rows in interpret mode: hot docs above 2^24 must be found exactly and
    the int32 validity mask must not leak poison rows past n_valid."""
    import ml_dtypes
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        score_topk_fused2_packed,
    )
    from svs_tpu.ops.topk import unpack_vals_idx

    n = (1 << 24) + 2 * FUSED_BLOCK_N
    d = 128
    docs = np.zeros((n, d), dtype=ml_dtypes.bfloat16)
    nv = n - 5000
    hot = [3, (1 << 24) + 1234, nv - 1, nv - 2, 16_000_000]
    for i, r in enumerate(hot):
        c = np.float32(0.9 - i * 0.01)
        docs[r, 0] = c
        docs[r, 1] = np.float32(np.sqrt(1 - float(c) ** 2))
    for r in range(nv, nv + 8):  # poison: wins iff masking leaks
        docs[r, 0] = 1.0
    q = np.zeros((8, d), np.float32)
    q[:, 0] = 1.0
    packed = np.asarray(
        score_topk_fused2_packed(
            jnp.asarray(docs), jnp.asarray(q), jnp.int32(nv), 20,
            wide=True, interpret=True,
        )
    )
    vals, rows = unpack_vals_idx(packed, 20)
    assert (rows < nv).all(), "validity mask leaked past 2^24"
    assert set(hot) <= set(rows[0].tolist())


# --- guarded (v3) kernels ---------------------------------------------------
#
# The guarded kernels promise NO candidate coverage — only that every
# document missing from the returned rows has a true prescore bounded by
# the returned ``bound`` (+ GUARD_KEY_EPS).  These tests prove that
# contract directly (it is what the engine's margin proof consumes), on
# shapes below the fused3_supported dispatch floor where interpret mode
# is fast — the kernels are shape-correct for any nb >= 2; the nb >= 16
# floor in fused3_supported is a dispatch-profitability choice, and the
# engine-level dispatch is covered in test_engine.py.


def _fused3_contract_check(m, q, nv, c, vals, rows, bound, key_eps):
    """Assert the guarded-kernel contract on f32 ground truth."""
    exact = (m[:nv].astype(np.float32) @ q.T).T  # [B, nv]
    b_n = q.shape[0]
    assert rows.shape == (b_n, c) and vals.shape == (b_n, c)
    assert (rows >= 0).all() and (rows < nv).all()
    for b in range(b_n):
        assert len(set(rows[b].tolist())) == c, "duplicate rows"
        true_of_returned = exact[b][rows[b]]
        # decoded quantized values sit within key_eps below the truth
        assert (vals[b] <= true_of_returned + 1e-6).all()
        assert (true_of_returned <= vals[b] + key_eps).all()
        # THE bound contract: no missing doc may exceed bound + key_eps
        mask = np.ones(nv, dtype=bool)
        mask[rows[b]] = False
        hidden_max = exact[b][mask].max()
        assert hidden_max <= bound[b] + key_eps + 1e-6, (
            hidden_max, bound[b]
        )


def test_fused3_supported_bounds():
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        FUSED_MAX_BATCH,
        GUARD_KEYS,
        GUARD_MAX_C,
        fused3_supported,
    )

    from svs_tpu.ops.pallas_extract import GUARD_MIN_BATCH

    n = 16 * FUSED_BLOCK_N
    b = GUARD_MIN_BATCH
    assert fused3_supported(n, 128, b, 400)
    assert not fused3_supported(15 * FUSED_BLOCK_N, 128, b, 400)  # nb < 16
    assert not fused3_supported(n + 1, 128, b, 400)  # unaligned rows
    assert not fused3_supported(n, 120, b, 400)  # unaligned dim
    assert not fused3_supported(n, 128, FUSED_MAX_BATCH + 1, 400)
    # batch floor: solo/small-batch selection stays on v2 (measured
    # faster there; see GUARD_MIN_BATCH)
    assert not fused3_supported(n, 128, GUARD_MIN_BATCH - 1, 400)
    # pool floor: the engine pads to LARGE_ROW_MULTIPLE = 2 blocks, so
    # up to two trailing blocks may be padding -> (nb-2)*GUARD_KEYS keys
    assert fused3_supported(n, 128, b, 14 * GUARD_KEYS)
    assert not fused3_supported(n, 128, b, 14 * GUARD_KEYS + 1)
    # candidate ceiling at GUARD_MAX_C even when the pool is huge
    big_nb = 256
    assert fused3_supported(big_nb * FUSED_BLOCK_N, 128, b, GUARD_MAX_C)
    assert not fused3_supported(
        big_nb * FUSED_BLOCK_N, 128, b, GUARD_MAX_C + 1
    )
    # NO row ceiling: not the 2^24 correctness one (int32 row
    # reconstruction) and, since the staged finish, not the
    # nb-scaled-profitability one either (the finish routes through the
    # pass-2 staged reduce past GUARD_STAGE_MIN_BLOCKS)
    huge = (((1 << 24) // FUSED_BLOCK_N) + 17) * FUSED_BLOCK_N
    assert fused3_supported(huge, 128, b, 400)


def test_fused3_bound_contract_random(unit_rows):
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_KEY_EPS,
        fused3_candidates,
    )

    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[5:13].astype(np.float32)
    nv = n - 777
    c = 20
    vals, rows, bound = fused3_candidates(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), c, interpret=True
    )
    _fused3_contract_check(
        m, q, nv, c,
        np.asarray(vals), np.asarray(rows), np.asarray(bound),
        GUARD_KEY_EPS,
    )


def test_fused3_hidden_cluster_bound_forces_widen():
    """More than GUARD_H winners inside ONE 1024-lane subtile: v3 has no
    fallback, so it MUST miss some — and the returned bound must sit
    above every miss, which makes the engine's margin check fail (the
    widen ladder then escalates off v3).  Both halves asserted here."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_H,
        GUARD_KEY_EPS,
        fused3_candidates,
    )

    n = 2 * FUSED_BLOCK_N
    d = 128
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 1] = 1.0  # background orthogonal to the probe
    n_hot = 3 * GUARD_H  # 12 > GUARD_H in subtile 0
    hot_rows = 100 + np.arange(n_hot)
    hot = np.linspace(0.99, 0.9, n_hot).astype(np.float32)
    m[hot_rows, 0] = hot
    m[hot_rows, 1] = np.sqrt(1.0 - hot**2)
    q = np.zeros((1, d), dtype=np.float32)
    q[0, 0] = 1.0
    c = 2 * GUARD_H
    vals, rows, bound = fused3_candidates(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(n), c, interpret=True
    )
    rows0 = set(np.asarray(rows)[0].tolist())
    missed = [r for r in hot_rows.tolist() if r not in rows0]
    assert missed, "test must force misses to prove anything"
    b0 = float(np.asarray(bound)[0])
    exact = (m @ q.T)[:, 0]
    for r in missed:
        assert exact[r] <= b0 + GUARD_KEY_EPS + 1e-6
    # the kb margin proof (kb.py _finalize_batch) compares the k-th BEST
    # rescored score against bound + eps: with the true 8th best hidden,
    # the check must fail for any sound eps >= GUARD_KEY_EPS
    k = c
    true_kth = np.sort(exact)[::-1][k - 1]
    assert true_kth < b0 + GUARD_KEY_EPS


def test_fused3_packed_wire_carries_bound(unit_rows):
    """The packed wire's boundary slot must be max(weakest candidate,
    bound) — exactly what the margin proof reads."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        fused3_candidates,
        score_topk_fused3_packed,
    )

    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[1:4].astype(np.float32)
    nv = n - 40
    c = 16
    vals, rows, bound = fused3_candidates(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), c, interpret=True
    )
    packed = score_topk_fused3_packed(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), c, interpret=True
    )
    wv, wr = unpack_vals_idx(np.asarray(packed), c)
    np.testing.assert_array_equal(wr, np.asarray(rows))
    np.testing.assert_array_equal(wv[:, :-1], np.asarray(vals)[:, :-1])
    np.testing.assert_array_equal(
        wv[:, -1],
        np.maximum(np.asarray(vals)[:, -1], np.asarray(bound)),
    )


def _guard_key(score, lane):
    """Encode a v3 packed key exactly as _guard_emit does (no clamp —
    callers pass in-domain scores)."""
    from svs_tpu.ops.pallas_extract import (
        GUARD_QSCALE,
        GUARD_SUBTILE,
        KEY_BIAS,
    )

    return float(
        np.floor((score + KEY_BIAS) * GUARD_QSCALE) * GUARD_SUBTILE + lane
    )


def _synth_guard_out(b, nb, key_spec, guards):
    """Raw v3 kernel output [b, nb*128] from a dense spec:
    ``key_spec[(bi, block, col)] = (score, lane)`` for the 32 key lanes
    (unset lanes become KEY_DEAD), ``guards[bi, block]`` = guard score."""
    from svs_tpu.ops.pallas_extract import (
        GUARD_KEYS,
        KEY_DEAD,
        _GUARD_OUT_LANES,
    )

    out = np.zeros((b, nb, _GUARD_OUT_LANES), np.float32)
    out[:, :, :GUARD_KEYS] = KEY_DEAD
    for (bi, blk, col), (score, lane) in key_spec.items():
        out[bi, blk, col] = _guard_key(score, lane)
    out[:, :, GUARD_KEYS] = np.vectorize(
        lambda s: _guard_key(s, 0)
    )(guards).astype(np.float32)
    return out.reshape(b, nb * _GUARD_OUT_LANES)


def test_fused3_staged_finish_matches_plain_merge():
    """At nb >= GUARD_STAGE_MIN_BLOCKS the finish routes through v2's
    pass-2 staged reduce instead of one top_k over all nb*32 lanes.  On
    keys whose global top-c is spread across groups (<= h2 winners per
    128-lane group), the staged merge must return EXACTLY the plain
    merge's candidate set with identical decoded values and rows, and a
    bound no lower than the plain bound."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_KEY_EPS,
        GUARD_KEYS,
        GUARD_STAGE_MIN_BLOCKS,
        GUARD_SUBTILE,
        _fused3_finish,
        _guard_reduce_h2,
    )

    nb = GUARD_STAGE_MIN_BLOCKS
    b, c = 3, 24
    assert _guard_reduce_h2(nb, c) <= 48  # staged path active
    rng = np.random.default_rng(7)
    key_spec = {}
    expect = {bi: [] for bi in range(b)}
    for bi in range(b):
        # background: every block's col 0 holds a mildly negative score
        for blk in range(nb):
            key_spec[(bi, blk, 0)] = (-0.5 + blk * 1e-6, 17)
        # plants: c distinct winners spread over distant blocks (one per
        # 128-lane group at most 4 blocks wide -> never > h2 per group)
        for j in range(c):
            blk = (j * 8 + bi) % nb
            score = 0.9 - j * 0.01
            lane = (j * 37) % GUARD_SUBTILE
            col = 1 + (j % (GUARD_KEYS - 1))
            key_spec[(bi, blk, col)] = (score, lane)
            expect[bi].append(
                (score, blk * FUSED_BLOCK_N + (col // 4) * GUARD_SUBTILE + lane)
            )
    guards = np.full((b, nb), -0.9, np.float64)
    out = _synth_guard_out(b, nb, key_spec, guards)
    vals, rows, bound = _fused3_finish(jnp.asarray(out), c, b, interpret=True)
    vals, rows, bound = np.asarray(vals), np.asarray(rows), np.asarray(bound)
    for bi in range(b):
        got = set(rows[bi].tolist())
        want = {r for _, r in expect[bi]}
        assert got == want, (bi, sorted(got - want), sorted(want - got))
        # decoded values within one grid step below the planted scores
        by_row = {r: s for s, r in expect[bi]}
        for v, r in zip(vals[bi], rows[bi]):
            s = by_row[int(r)]
            assert s - GUARD_KEY_EPS <= v <= s + 1e-6, (bi, r, s, v)
        # bound covers the guard lanes and the weakest candidate
        assert bound[bi] >= -0.9 - GUARD_KEY_EPS
        assert bound[bi] >= vals[bi][-1] - 1e-6
        assert np.isfinite(bound[bi])


def test_fused3_staged_finish_cluster_drops_are_bounded():
    """Adversarial: more winners inside ONE 128-lane key group than the
    pass-2 keeps (h2).  The staged merge MUST miss some — and every miss
    must sit under the returned bound (+ GUARD_KEY_EPS), which is what
    makes the engine's margin check fail and the widen ladder escalate."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_KEY_EPS,
        GUARD_KEYS,
        GUARD_STAGE_MIN_BLOCKS,
        _fused3_finish,
        _guard_reduce_h2,
    )

    nb = GUARD_STAGE_MIN_BLOCKS
    b, c = 1, 24
    h2 = _guard_reduce_h2(nb, c)
    n_hot = h2 + 4  # > h2 in the first group (blocks 0-3)
    key_spec = {}
    hot = {}
    for j in range(n_hot):
        blk, col = divmod(j, GUARD_KEYS)  # all inside blocks 0..3
        score = 0.95 - j * 0.001
        key_spec[(0, blk, col)] = (score, j % 512)
        hot[blk * FUSED_BLOCK_N + (col // 4) * 1024 + (j % 512)] = score
    for blk in range(4, nb):
        key_spec[(0, blk, 0)] = (-0.5, 3)
    guards = np.full((1, nb), -0.9, np.float64)
    out = _synth_guard_out(1, nb, key_spec, guards)
    vals, rows, bound = _fused3_finish(jnp.asarray(out), c, 1, interpret=True)
    rows0 = set(np.asarray(rows)[0].tolist())
    missed = [r for r in hot if r not in rows0]
    assert missed, "pass-2 must drop some of the cluster"
    b0 = float(np.asarray(bound)[0])
    for r in missed:
        assert hot[r] <= b0 + GUARD_KEY_EPS, (r, hot[r], b0)


def test_fused3_staged_finish_dead_pool_refuses():
    """Live pool short of c through the staged path: bound must go +inf
    and every returned row must stay inside the corpus (REDUCE_BLOCK
    padding positions must never escape as row indices)."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_STAGE_MIN_BLOCKS,
        _fused3_finish,
    )

    nb = GUARD_STAGE_MIN_BLOCKS
    c = 24
    key_spec = {(0, 0, j): (0.5 - j * 0.01, j) for j in range(8)}  # 8 live
    guards = np.full((1, nb), -1.0, np.float64)
    out = _synth_guard_out(1, nb, key_spec, guards)
    vals, rows, bound = _fused3_finish(jnp.asarray(out), c, 1, interpret=True)
    assert np.isinf(np.asarray(bound)[0])
    rows = np.asarray(rows)
    assert (rows >= 0).all() and (rows < nb * FUSED_BLOCK_N).all()


def test_fused3_int8_bound_contract(unit_rows):
    """int8 variant: the same contract, proven in the int8 prescore
    domain (dequantized int32 dot — the domain the keys quantize)."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_KEY_EPS,
        fused3_candidates_int8,
    )
    from svs_tpu.ops.quant import quantize_rows_int8

    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[5:13].astype(np.float32)
    nv = n - 99
    c = 20
    qd, scales = quantize_rows_int8(jnp.asarray(m))
    vals, rows, bound = fused3_candidates_int8(
        qd, scales, jnp.asarray(q), jnp.int32(nv), c, interpret=True
    )
    qi, qs = quantize_rows_int8(jnp.asarray(q))
    deq = (
        np.asarray(qd, np.float32) * np.asarray(scales)[:, None]
    )
    deq_q = np.asarray(qi, np.float32) * np.asarray(qs)[:, None]
    _fused3_contract_check(
        deq, deq_q, nv, c,
        np.asarray(vals), np.asarray(rows), np.asarray(bound),
        GUARD_KEY_EPS,
    )


def test_fused3_out_of_domain_saturates_bound():
    """Scores past the exact-key range (> ~2.5 — impossible for unit-norm
    cosine, reachable by raw-op callers): the bound must refuse to
    certify (+inf) instead of silently under-bounding."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import FUSED_BLOCK_N, fused3_candidates

    n = 2 * FUSED_BLOCK_N
    d = 128
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 0] = 1.0
    m[7, 0] = 3.6  # one far-out doc; clamped in-kernel, keys >= SAT
    q = np.zeros((2, d), dtype=np.float32)
    q[:, 0] = 1.0
    _, _, bound = fused3_candidates(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(n), 8, interpret=True
    )
    assert np.isinf(np.asarray(bound)).all()


def test_fused3_very_negative_scores_stay_sound():
    """Raw-op scores far below the key range: the emit clamp must keep
    live keys above the dead marker (no fabricated rows), and the bound
    contract must hold on the clamped corpus."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_KEY_EPS,
        fused3_candidates,
    )

    n = 2 * FUSED_BLOCK_N
    d = 128
    rng = np.random.default_rng(3)
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 0] = -(5.0 + 4.0 * rng.random(n)).astype(np.float32)  # dots in [-9,-5]
    q = np.zeros((2, d), dtype=np.float32)
    q[:, 0] = 1.0
    nv = n - 512
    c = 12
    vals, rows, bound = fused3_candidates(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), c, interpret=True
    )
    rows = np.asarray(rows)
    assert (rows >= 0).all() and (rows < nv).all(), "dead lanes promoted"
    # every doc clamps to -3.0: the bound must cover them all
    assert (np.asarray(bound) >= -3.0 - GUARD_KEY_EPS).all()


def test_fused3_starved_pool_refuses_certification():
    """A raw-op caller whose live pool is smaller than c (violating the
    padding contract fused3_supported encodes): dead markers reach the
    selection and the bound must go +inf rather than certify fabricated
    rows."""
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import FUSED_BLOCK_N, fused3_candidates

    n = 2 * FUSED_BLOCK_N
    d = 128
    m = np.zeros((n, d), dtype=np.float32)
    m[:, 0] = 1.0
    q = np.zeros((1, d), dtype=np.float32)
    q[0, 0] = 1.0
    nv = 40  # one live subtile -> only GUARD_H live keys, far under c
    _, _, bound = fused3_candidates(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), 20, interpret=True
    )
    assert np.isinf(np.asarray(bound)).all()


@pytest.mark.parametrize(
    "nv_off,b,c",
    [
        (1, 3, 1),     # n_valid just past a block boundary; c=1; odd batch
        (1025, 1, 24), # dead tail crossing a 1024-lane subtile boundary
        (0, 5, 32),    # fully dense corpus, c at one full block's pool
    ],
)
def test_fused3_edge_shapes(unit_rows, nv_off, b, c):
    import jax.numpy as jnp
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        GUARD_KEY_EPS,
        fused3_candidates,
    )

    n = 2 * FUSED_BLOCK_N
    m = unit_rows(n, 128)
    q = m[20 : 20 + b].astype(np.float32)
    nv = n - nv_off
    vals, rows, bound = fused3_candidates(
        jnp.asarray(m), jnp.asarray(q), jnp.int32(nv), c, interpret=True
    )
    _fused3_contract_check(
        m, q, nv, c,
        np.asarray(vals), np.asarray(rows), np.asarray(bound),
        GUARD_KEY_EPS,
    )
