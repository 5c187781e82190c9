"""SUPERSEDED round-1 bitonic kernel (see benchmarks/pallas_topk_v1.py):
kept runnable for benchmark archaeology, not collected by pytest (lives
outside tests/).  Oracle equivalence in interpreter
mode (the CPU stand-in for Mosaic; the compiled path is exercised on real
TPU by the benchmark harness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svs_tpu.engine.packing import pad_matrix, pad_queries
from pallas_topk_v1 import (
    CARRY_K,
    TILE_ROWS,
    pallas_score_topk,
    pallas_supported,
)
from svs_tpu.utils.topk_np import top_k_numpy


def test_supported_predicate():
    assert pallas_supported(2048, 128, 100)
    assert not pallas_supported(2048, 128, 129)  # k > carry
    assert not pallas_supported(2000, 128, 10)  # rows not tile-aligned
    assert not pallas_supported(256, 128, 10)  # too small
    assert not pallas_supported(2048, 100, 10)  # dim not lane-aligned
    assert not pallas_supported(1 << 25, 128, 10)  # beyond f32-exact index


@pytest.mark.parametrize("b,k", [(1, 100), (3, 100), (8, 17), (2, 1)])
def test_pallas_matches_oracle(unit_rows, b, k):
    n, d = 2048, 128
    m = unit_rows(n, d)
    q = unit_rows(b, d)
    nv = n - 13
    vals, idx = pallas_score_topk(
        jnp.asarray(m), jnp.asarray(q), nv, k, interpret=True
    )
    assert vals.shape == (b, k) and idx.shape == (b, k)
    for bb in range(b):
        oracle = top_k_numpy(m[:nv] @ q[bb], k)
        assert list(np.asarray(idx)[bb]) == [i for _, i in oracle]
        np.testing.assert_allclose(
            np.asarray(vals)[bb], [s for s, _ in oracle], rtol=1e-5
        )


def test_pallas_full_k_capacity(unit_rows):
    """k == CARRY_K (the carry is exactly full every merge)."""
    n, d = 4 * TILE_ROWS, 128
    m = unit_rows(n, d)
    q = unit_rows(1, d)
    vals, idx = pallas_score_topk(
        jnp.asarray(m), jnp.asarray(q), n, CARRY_K, interpret=True
    )
    oracle = top_k_numpy(m @ q[0], CARRY_K)
    assert list(np.asarray(idx)[0]) == [i for _, i in oracle]


def test_pallas_duplicate_scores(unit_rows):
    """Heavy ties: identical rows -> equal scores; the selected set must
    still be k distinct valid indices with the right values."""
    d = 128
    row = unit_rows(1, d)
    m = np.repeat(row, 1024, axis=0).astype(np.float32)
    vals, idx = pallas_score_topk(
        jnp.asarray(m), jnp.asarray(row), 1000, 50, interpret=True
    )
    got = np.asarray(idx)[0]
    assert len(set(got.tolist())) == 50
    assert (got < 1000).all()
    np.testing.assert_allclose(np.asarray(vals)[0], 1.0, atol=1e-5)
