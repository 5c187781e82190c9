"""Blocked all-pairs similarity: exact top-k pairs without the O(n^2) matrix.

The reference materializes ``docs @ docs.T`` in RAM and flattens its upper
triangle (``svs/kb.py:1219``, ``svs/util.py:206-233``) — a known scaling
cliff.  Here the computation streams over row blocks under one ``jit``:

  for each block of R rows:
      S = block @ docs.T                      # [R, N] lives only this step
      mask to the strict upper triangle (col > row) and valid docs
      per-row top-k                            # exact: a row contributes
                                               # at most k global top pairs
      merge with the running global top-k carry

Peak memory is O(R*N) instead of O(N^2), and the matmuls stay MXU-shaped.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .topk import NEG_INF, scores_matmul

#: Test hook: exercise the extraction path under the CPU interpreter.
_FORCE_EXTRACT_INTERPRET = False


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def pairwise_topk_blocked(
    docs: jax.Array,
    n_valid: jax.Array,
    k: int,
    block_rows: int = 256,
    row_scales: "jax.Array | None" = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact top-``k`` upper-triangle pairs of the row-wise similarity matrix.

    ``docs`` is ``[N, d]`` with N a multiple of ``block_rows`` (pad rows are
    ignored via ``n_valid``).  Returns ``(scores f32 [k], rows int32 [k],
    cols int32 [k])`` sorted by score descending.  The caller must clamp
    ``k`` to the number of real pairs, ``n_valid * (n_valid - 1) / 2``.

    With ``row_scales`` (int8 corpora), each block runs an int8 x int8 MXU
    matmul with int32 accumulation and rescales to f32 on the fly — no
    dequantized copy of the corpus ever materializes (the extra HBM is
    O(block x N) scores, same as the float path).
    """
    n_padded, _ = docs.shape
    assert n_padded % block_rows == 0, "pad the corpus to a block multiple"
    n_blocks = n_padded // block_rows
    per_row_k = min(k, n_padded)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, n_padded), 1)

    def step(
        carry: Tuple[jax.Array, jax.Array, jax.Array], block_idx: jax.Array
    ) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array], None]:
        c_vals, c_rows, c_cols = carry
        row0 = block_idx * block_rows
        block = jax.lax.dynamic_slice(docs, (row0, 0), (block_rows, docs.shape[1]))
        if row_scales is not None:
            raw = jax.lax.dot_general(
                block,
                docs,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [block_rows, n_padded] int32
            s_blk = jax.lax.dynamic_slice(row_scales, (row0,), (block_rows,))
            scores = raw.astype(jnp.float32) * s_blk[:, None] * row_scales[None, :]
        else:
            scores = scores_matmul(docs, block)  # [block_rows, n_padded]
        row_ids = row0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, n_padded), 0
        )
        live = (col_ids > row_ids) & (col_ids < n_valid) & (row_ids < n_valid)
        scores = jnp.where(live, scores, NEG_INF)

        from .pallas_extract import extract_supported, extract_topk

        on_cpu = jax.default_backend() == "cpu"
        if extract_supported(n_padded, block_rows, per_row_k) and (
            not on_cpu or _FORCE_EXTRACT_INTERPRET
        ):
            # Per-row selection via the extraction kernel: at 1M docs the
            # pairwise pass runs ~4000 of these selections, and lax.top_k
            # over [256, 1M] is ~9x the block matmul (BENCHMARKS.md).
            # Skipped on the CPU backend: interpret-mode pallas inside this
            # scan is minutes-slow and never a win there.
            blk_vals, blk_cols = extract_topk(
                scores, per_row_k, interpret=on_cpu
            )
        else:
            blk_vals, blk_cols = jax.lax.top_k(scores, per_row_k)
        blk_rows = jnp.broadcast_to(row_ids[:, :1], blk_cols.shape)

        all_vals = jnp.concatenate([c_vals, blk_vals.reshape(-1)])
        all_rows = jnp.concatenate([c_rows, blk_rows.reshape(-1)])
        all_cols = jnp.concatenate([c_cols, blk_cols.reshape(-1).astype(jnp.int32)])
        top_vals, top_pos = jax.lax.top_k(all_vals, k)
        return (
            top_vals,
            jnp.take(all_rows, top_pos),
            jnp.take(all_cols, top_pos),
        ), None

    init = (
        jnp.full((k,), NEG_INF, dtype=jnp.float32),
        jnp.zeros((k,), dtype=jnp.int32),
        jnp.zeros((k,), dtype=jnp.int32),
    )
    (vals, rows, cols), _ = jax.lax.scan(
        step, init, jnp.arange(n_blocks, dtype=jnp.int32)
    )
    return vals, rows, cols
