"""Mesh-sharded all-pairs similarity: a ppermute ring over corpus blocks.

Single-device pairwise (ops/pairwise.py) streams row blocks against the
whole corpus.  Across a mesh, the corpus is already row-sharded; instead of
gathering it anywhere, the blocks themselves rotate around the ring:

  step s (of D): every chip scores its resident rows against the block that
  originated on chip (me + s) mod D          -> one [N/D, N/D] MXU matmul
  mask to the strict-upper global triangle, fold the per-row top-k into a
  running carry, then ppermute the block one hop left.

After D steps every global pair has been scored exactly once, each chip
holds its rows' top-k pairs, and one candidate merge (k per chip over ICI)
yields the exact global top-k.  Peak memory per chip is O((N/D)^2) for one
step's scores; traffic per chip is one corpus's worth over the ring.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.topk import NEG_INF, merge_topk, scores_matmul


def sharded_pairwise_topk(
    docs: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    mesh: jax.sharding.Mesh,
    data_axis: str = "data",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact top-``k`` upper-triangle pairs over a row-sharded corpus.

    ``docs``: ``[N, d]`` sharded ``P(data_axis, None)``.  Returns
    ``(scores f32 [k], rows int32 [k], cols int32 [k])``, sorted descending.
    Caller clamps ``k`` to the true pair count.
    """
    fn = _build(mesh, data_axis, int(k))
    return fn(docs, n_valid)


@functools.lru_cache(maxsize=None)
def _build(mesh: jax.sharding.Mesh, data_axis: str, k: int) -> "Any":
    n_shards = int(mesh.shape[data_axis])
    ring = [(j, (j - 1) % n_shards) for j in range(n_shards)]

    def local_pairs(
        docs_local: jax.Array, n_valid: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        n_local = docs_local.shape[0]
        me = jax.lax.axis_index(data_axis).astype(jnp.int32)
        row_base = me * n_local
        rows_g = row_base + jax.lax.broadcasted_iota(
            jnp.int32, (n_local, n_local), 0
        )
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (n_local, n_local), 1)
        per_row_k = min(k, n_local)

        carry_v = jnp.full((k,), NEG_INF, jnp.float32)
        carry_r = jnp.zeros((k,), jnp.int32)
        carry_c = jnp.zeros((k,), jnp.int32)
        block = docs_local

        for step in range(n_shards):
            src = (me + step) % n_shards
            cols_g = src * n_local + col_iota
            scores = scores_matmul(block, docs_local)  # [n_local rows, n_local cols]
            live = (cols_g > rows_g) & (cols_g < n_valid) & (rows_g < n_valid)
            scores = jnp.where(live, scores, NEG_INF)
            blk_v, blk_c = jax.lax.top_k(scores, per_row_k)
            blk_cg = jnp.take_along_axis(
                jnp.broadcast_to(cols_g, scores.shape), blk_c, axis=1
            )
            blk_r = jnp.broadcast_to(rows_g[:, :1], blk_cg.shape)

            all_v = jnp.concatenate([carry_v, blk_v.reshape(-1)])
            all_r = jnp.concatenate([carry_r, blk_r.reshape(-1)])
            all_c = jnp.concatenate([carry_c, blk_cg.reshape(-1)])
            carry_v, pos = jax.lax.top_k(all_v, k)
            carry_r = jnp.take(all_r, pos)
            carry_c = jnp.take(all_c, pos)

            if step + 1 < n_shards:
                block = jax.lax.ppermute(block, data_axis, ring)

        # Stack per-shard winners along the data axis for the outer merge.
        return carry_v[None], carry_r[None], carry_c[None]

    shard_fn = jax.shard_map(
        local_pairs,
        mesh=mesh,
        in_specs=(P(data_axis, None), P()),
        out_specs=(P(data_axis), P(data_axis), P(data_axis)),
        check_vma=False,
    )

    def merged(docs: jax.Array, n_valid: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        vals, rows, cols = shard_fn(docs, n_valid)  # [D, k] each
        flat_v = vals.reshape(1, -1)
        top_v, pos = jax.lax.top_k(flat_v, k)
        return (
            top_v[0],
            jnp.take(rows.reshape(-1), pos[0]),
            jnp.take(cols.reshape(-1), pos[0]),
        )

    return jax.jit(merged)
