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


def test_scan_embeddings_matches_python_scan(tmp_path, unit_rows):
    """The C SQLite scanner must return byte-identical matrices to the
    Python streaming scan, and decline (-> None) on row-count mismatch."""
    from svs_tpu.store import Database, embedding_to_bytes

    db_file = tmp_path / "scan.sqlite"
    m = unit_rows(300, 24)
    db = Database(db_file)
    with db.transaction() as tx:
        for i, v in enumerate(m):
            tx.add_doc(f"d{i}", None, None, embedding_to_bytes(v.tolist()))
        tx.bump_matrix_version()

    if native.native_available():
        got = native.scan_embeddings(str(db_file), -1, 300, 24)
        assert got is not None
        nm, nids = got
        np.testing.assert_array_equal(nm, m.astype(np.float32))
        assert list(nids) == sorted(nids)
        # partial scan from the middle
        got2 = native.scan_embeddings(str(db_file), int(nids[99]), 200, 24)
        assert got2 is not None
        np.testing.assert_array_equal(got2[0], m[100:].astype(np.float32))
        # wrong expected count -> declined
        assert native.scan_embeddings(str(db_file), -1, 299, 24) is None
        # wrong dim (blob size mismatch) -> declined
        assert native.scan_embeddings(str(db_file), -1, 300, 23) is None

    # the transaction-level entry point agrees regardless of which path ran
    with db.transaction() as tx:
        tm, tids = tx.build_embeddings_matrix()
    np.testing.assert_array_equal(tm, m.astype(np.float32))
    db.close()


def test_build_matrix_sees_uncommitted_writes(tmp_path, unit_rows):
    """A pack inside a transaction with uncommitted embedding writes must
    include them — the native committed-state scanner must detect the
    mismatch and yield to the in-transaction streaming scan."""
    from svs_tpu.store import Database, embedding_to_bytes

    db_file = tmp_path / "scan2.sqlite"
    m = unit_rows(64, 8)
    db = Database(db_file)
    with db.transaction() as tx:
        for i, v in enumerate(m):
            tx.add_doc(f"d{i}", None, None, embedding_to_bytes(v.tolist()))
    with db.transaction() as tx:
        tx.add_doc("new", None, None, embedding_to_bytes([1.0] + [0.0] * 7))
        got, ids = tx.build_embeddings_matrix()
        assert got.shape == (65, 8)
        np.testing.assert_array_equal(got[-1], [1.0] + [0.0] * 7)
    db.close()
