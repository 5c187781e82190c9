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
