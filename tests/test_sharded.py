"""Multi-device property tests on the virtual 8-CPU-device mesh: sharded
retrieval must be *indistinguishable* from single-device retrieval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from svs_tpu.engine.packing import pad_matrix, pad_queries
from svs_tpu.ops.quant import quantize_rows_int8
from svs_tpu.parallel import default_mesh, mesh_2d, sharded_score_topk
from svs_tpu.utils.topk_np import top_k_numpy


@pytest.fixture(scope="module")
def devices_available():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")


def _corpus(unit_rows, n=1000, d=64, b=4):
    m = unit_rows(n, d)
    q = unit_rows(b, d)
    mp = pad_matrix(m, row_multiple=256 * 8)  # divisible across 8 shards
    qp = pad_queries(q, mp.shape[1])
    return m, q, mp, qp


def test_sharded_1d_matches_oracle(devices_available, unit_rows):
    m, q, mp, qp = _corpus(unit_rows)
    mesh = default_mesh()
    docs = jax.device_put(jnp.asarray(mp), NamedSharding(mesh, P("data", None)))
    vals, idx = sharded_score_topk(
        docs, None, jnp.asarray(qp), jnp.int32(len(m)), 13, mesh=mesh
    )
    for b in range(q.shape[0]):
        oracle = top_k_numpy(m @ q[b], 13)
        assert list(np.asarray(idx)[b]) == [i for _, i in oracle]
        np.testing.assert_allclose(
            np.asarray(vals)[b], [s for s, _ in oracle], rtol=1e-5
        )


def test_sharded_2d_matches_oracle(devices_available, unit_rows):
    m, q, mp, qp = _corpus(unit_rows, d=100)  # pads to 128 = 2 x 64 cols
    mesh = mesh_2d(4, 2)
    docs = jax.device_put(jnp.asarray(mp), NamedSharding(mesh, P("data", "model")))
    vals, idx = sharded_score_topk(
        docs,
        None,
        jnp.asarray(qp),
        jnp.int32(len(m)),
        7,
        mesh=mesh,
        model_axis="model",
    )
    for b in range(q.shape[0]):
        oracle = top_k_numpy(m @ q[b], 7)
        assert list(np.asarray(idx)[b]) == [i for _, i in oracle]


def test_sharded_int8_covers_true_topk(devices_available, unit_rows):
    m, q, mp, qp = _corpus(unit_rows)
    mesh = default_mesh()
    qd, scales = quantize_rows_int8(jnp.asarray(mp))
    docs = jax.device_put(qd, NamedSharding(mesh, P("data", None)))
    sc = jax.device_put(scales, NamedSharding(mesh, P("data")))
    vals, idx = sharded_score_topk(
        docs, sc, jnp.asarray(qp), jnp.int32(len(m)), 50, mesh=mesh
    )
    for b in range(q.shape[0]):
        true = {i for _, i in top_k_numpy(m @ q[b], 10)}
        assert true <= set(np.asarray(idx)[b].tolist())


def test_sharded_int8_model_axis_rejected(devices_available, unit_rows):
    m, q, mp, qp = _corpus(unit_rows)
    mesh = mesh_2d(4, 2)
    qd, scales = quantize_rows_int8(jnp.asarray(mp))
    with pytest.raises(NotImplementedError):
        sharded_score_topk(
            qd, scales, jnp.asarray(qp), jnp.int32(len(m)), 5,
            mesh=mesh, model_axis="model",
        )


@pytest.mark.parametrize("n,k", [(500, 20), (1000, 7)])
def test_sharded_pairwise_matches_oracle(devices_available, unit_rows, n, k):
    from svs_tpu.parallel.pairwise_sharded import sharded_pairwise_topk
    from svs_tpu.utils.topk_np import top_pairs_numpy

    m = unit_rows(n, 32)
    mp = pad_matrix(m, row_multiple=8 * 8)
    mesh = default_mesh()
    docs = jax.device_put(jnp.asarray(mp), NamedSharding(mesh, P("data", None)))
    vals, rows, cols = sharded_pairwise_topk(
        docs, jnp.int32(n), k, mesh=mesh
    )
    oracle = top_pairs_numpy(m @ m.T, k)
    assert list(zip(np.asarray(rows), np.asarray(cols))) == [
        (r, c) for _, r, c in oracle
    ]
    np.testing.assert_allclose(
        np.asarray(vals), [s for s, _, _ in oracle], rtol=1e-4
    )


def test_sharded_k_larger_than_shard(devices_available, unit_rows):
    """k bigger than any single shard's row count still returns the exact
    global top-k (the per-shard k clamps to local rows)."""
    m, q, mp, qp = _corpus(unit_rows, n=900)
    mesh = default_mesh()
    docs = jax.device_put(jnp.asarray(mp), NamedSharding(mesh, P("data", None)))
    k = 400  # > 2048/8 = 256 rows per shard
    vals, idx = sharded_score_topk(
        docs, None, jnp.asarray(qp), jnp.int32(len(m)), k, mesh=mesh
    )
    oracle = [i for _, i in top_k_numpy(m @ q[0], k)]
    assert list(np.asarray(idx)[0]) == oracle


def test_sharded_per_shard_extraction_matches_oracle(unit_rows):
    """Per-shard selection routes through the extraction kernel when the
    local shard is block-aligned; the merged global top-k must still match
    the single-device oracle exactly."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svs_tpu.ops.pallas_extract import BLOCK_N
    from svs_tpu.parallel.mesh import default_mesh
    from svs_tpu.parallel.sharded import sharded_score_topk
    from svs_tpu.utils.topk_np import top_k_numpy

    devices = jax.devices()[:2]
    mesh = default_mesh(devices=devices)
    n = 2 * BLOCK_N  # one extraction block per shard
    m = unit_rows(n, 16)
    padded = np.zeros((n, 128), np.float32)
    padded[:, :16] = m
    docs = jax.device_put(padded, NamedSharding(mesh, P("data", None)))
    q = np.zeros((3, 128), np.float32)
    q[:, :16] = m[[7, 1000, 20000]][:, :16]
    n_valid = n - 57
    vals, idx = sharded_score_topk(
        docs, None, jax.numpy.asarray(q), jax.numpy.int32(n_valid), 9,
        mesh=mesh,
    )
    exact = m[:n_valid] @ m[[7, 1000, 20000]].T
    for b in range(3):
        oracle = [i for _, i in top_k_numpy(exact[:, b], 9)]
        assert list(np.asarray(idx)[b]) == oracle, b


def test_sharded_pairwise_escalates_and_subblocks(devices_available, unit_rows):
    """Sharded pairwise with (a) shard rows larger than the 256-row inner
    block (exercising the streamed sub-block scan) and (b) a
    near-duplicate cluster that overwhelms the first per-row width
    (exercising the verified escalation)."""
    from svs_tpu.parallel.pairwise_sharded import sharded_pairwise_topk
    from svs_tpu.ops import pairwise as pw
    from svs_tpu.utils.topk_np import top_pairs_numpy

    rng = np.random.default_rng(7)
    n = 4096  # 8 shards x 512 local rows -> 2 inner row-blocks per shard
    d = 16
    base = rng.standard_normal(d).astype(np.float32)
    m = np.zeros((n, d), dtype=np.float32)
    # 200 near-duplicates of one vector concentrated in the first rows,
    # the rest random background
    m[:200] = base[None, :] + 0.01 * rng.standard_normal((200, d))
    m[200:] = rng.standard_normal((n - 200, d))
    m /= np.linalg.norm(m, axis=1, keepdims=True)

    k = 150
    assert k > pw._ESCALATION[0]
    mesh = default_mesh()
    docs = jax.device_put(
        jnp.asarray(m), NamedSharding(mesh, P("data", None))
    )
    vals, rows, cols = sharded_pairwise_topk(docs, jnp.int32(n), k, mesh=mesh)
    oracle = top_pairs_numpy(m @ m.T, k)
    # values must match exactly; pairs up to ties at equal scores
    np.testing.assert_allclose(
        np.asarray(vals), [s for s, _, _ in oracle], rtol=1e-5
    )
    v_k = oracle[-1][0]
    sims = m @ m.T
    got = set(zip(np.asarray(rows).tolist(), np.asarray(cols).tolist()))
    np.testing.assert_allclose(
        sims[np.asarray(rows), np.asarray(cols)], np.asarray(vals), rtol=1e-5
    )
    iu = np.triu_indices(n, 1)
    flat = sims[iu]
    must_have = {
        (int(iu[0][i]), int(iu[1][i])) for i in np.nonzero(flat > v_k)[0]
    }
    assert must_have <= got
