"""Native fastpack library: exact equivalence with the NumPy/device paths.
(The library is optional — tests that need it skip when no toolchain.)"""

import numpy as np
import pytest

from svs_tpu import native
from svs_tpu.utils.topk_np import top_k_numpy


def test_f32_to_bf16_matches_ml_dtypes(unit_rows):
    import ml_dtypes

    m = unit_rows(500, 64) * 3.7
    got = native.f32_to_bf16(m)
    ref = m.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint16), ref.view(np.uint16)
    )


def test_f32_to_bf16_special_values():
    import ml_dtypes

    vals = np.array(
        [0.0, -0.0, 1.0, -1.0, np.inf, -np.inf, np.nan, 1e-40, 3.4e38],
        dtype=np.float32,
    ).reshape(1, -1)
    got = np.asarray(native.f32_to_bf16(vals)).astype(np.float32)
    ref = vals.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    mask = ~np.isnan(ref)
    np.testing.assert_array_equal(got[mask], ref[mask])


def test_quantize_int8_matches_device(unit_rows):
    import jax.numpy as jnp

    from svs_tpu.ops.quant import quantize_rows_int8

    m = unit_rows(128, 32)
    qn, sn = native.quantize_int8(m)
    qd, sd = quantize_rows_int8(jnp.asarray(m))
    np.testing.assert_array_equal(qn, np.asarray(qd))
    np.testing.assert_allclose(sn, np.asarray(sd), rtol=1e-6)


def test_normalize_rows(unit_rows):
    m = unit_rows(50, 16) * 9.0
    out = native.normalize_rows(m)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # zero rows untouched
    z = np.zeros((2, 4), dtype=np.float32)
    np.testing.assert_array_equal(native.normalize_rows(z), z)


def test_topk_matches_oracle_including_ties(rng):
    scores = rng.standard_normal(10_000).astype(np.float32)
    scores[100:110] = scores[50]  # inject ties
    assert native.topk_f32(scores, 25) == top_k_numpy(scores, 25)
    assert native.topk_f32(scores, 0) == []
    assert native.topk_f32(scores[:3], 10) == top_k_numpy(scores[:3], 10)
