"""SUPERSEDED (round-1) Pallas kernel: fused streaming scores + bitonic
running top-k.  Both successors in ``svs_tpu/ops/pallas_extract.py`` (tile
extraction, then packed-key extraction) beat it on every measured shape
(BENCHMARKS.md shootouts 4-7); it is kept here, out of the package, for
benchmark archaeology only.

The XLA two-phase path (matmul -> [B, N] scores in HBM -> top-k) moves the
full score matrix through HBM twice (write + read) on top of the corpus
read.  This kernel streams the corpus through VMEM tile by tile, computes
each tile's scores on the MXU, and folds them into a running top-k carried
in VMEM across grid steps — scores never touch HBM, so total HBM traffic is
exactly one corpus read (the speed-of-light bound for exhaustive search).

Selection is a bitonic network (vectorized compare-exchange on the VPU):

  per tile:  sort the [B, T] tile scores ascending    (log^2 T stages)
             merge with the sorted-descending [B, K] carry (log 2K stages)

Mosaic-lowering constraints shaped the implementation:
  - the XOR-partner exchange is two `pltpu.roll`s + a select (gathers,
    reshapes, and `rev` don't lower);
  - stage direction masks are precomputed on the host and passed in as a
    float [n_stages, T] input; mask application is arithmetic
    (`lo + m*(hi-lo)`), avoiding vector integer compares entirely;
  - document indices ride through the network as float32 (exact for
    corpora up to 2^24 rows) and convert to int32 outside the kernel.

Constraints: k <= 128, N/d tile-aligned, N <= 16.7M rows.  The public
wrapper checks ``pallas_supported`` and callers fall back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

#: Docs per grid step: the tile (TILE_ROWS x d_pad bf16) must fit VMEM with
#: double buffering (0.75 MB at d_pad=1536).  Measured on v5e: wider tiles
#: don't help B=1 and hurt batched queries (pruning fires less often when
#: any query in the batch keeps a tile alive).
TILE_ROWS = 256

#: Carry width = top-k capacity (one 128-lane register row).
CARRY_K = 128

#: Float-carried indices are exact below 2^24.
MAX_ROWS = 1 << 24


def _sort_mask_stages(t: int, descending: bool) -> Tuple[np.ndarray, List[int]]:
    """Host-side: per-stage keep-max masks + strides for a full bitonic
    sort of width ``t``."""
    col = np.arange(t)
    masks, strides = [], []
    size = 2
    while size <= t:
        up = ((col & size) == 0) if descending else ((col & size) != 0)
        stride = size // 2
        while stride >= 1:
            low = (col & stride) == 0
            masks.append(np.where(up, low, ~low).astype(np.float32))
            strides.append(stride)
            stride //= 2
        size *= 2
    return np.stack(masks), strides


def _merge_mask_stages(t: int) -> Tuple[np.ndarray, List[int]]:
    """Host-side: stages for a descending bitonic *merge* of width ``t``."""
    col = np.arange(t)
    masks, strides = [], []
    stride = t // 2
    while stride >= 1:
        masks.append(((col & stride) == 0).astype(np.float32))
        strides.append(stride)
        stride //= 2
    return np.stack(masks), strides


def _swap_partners(x: jax.Array, stride: int) -> jax.Array:
    """x[j] <-> x[j ^ stride] via two static circular shifts + select."""
    t = x.shape[1]
    # tpu.iota is integer-only; convert for the float-compare parity trick
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1).astype(jnp.float32)
    fwd = pltpu.roll(x, t - stride, 1)  # position j holds x[j + stride]
    bwd = pltpu.roll(x, stride, 1)      # position j holds x[j - stride]
    # (j & stride) == 0  <=>  floor(j / stride) is even — float compare
    # (vector integer compares don't legalize in Mosaic)
    parity = jnp.mod(jnp.floor(col / float(stride)), 2.0)
    return jnp.where(parity < 0.5, fwd, bwd)


def _compare_exchange(
    vals: jax.Array, idxs: jax.Array, stride: int, keep_max: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One bitonic stage.  ``keep_max`` is a float {0,1} mask row; all
    selects use float-compare-derived predicates (cmpf legalizes in
    Mosaic, vector cmpi does not) — and `where`, not arithmetic blends,
    so -inf sentinels stay exact."""
    pv = _swap_partners(vals, stride)
    pi = _swap_partners(idxs, stride)
    # Strict total order via (value, index) lexicographic compare: without
    # the index tie-break, equal scores make both partners keep the same
    # element and the network emits duplicates.
    self_wins = jnp.logical_or(
        vals > pv, jnp.logical_and(vals == pv, idxs > pi)
    )
    vmax = jnp.where(self_wins, vals, pv)
    imax = jnp.where(self_wins, idxs, pi)
    vmin = jnp.where(self_wins, pv, vals)
    imin = jnp.where(self_wins, pi, idxs)
    keep = keep_max > 0.5
    return jnp.where(keep, vmax, vmin), jnp.where(keep, imax, imin)


_TILE_SORT_MASKS, _TILE_SORT_STRIDES = _sort_mask_stages(
    TILE_ROWS, descending=False
)
_MERGE_MASKS, _MERGE_STRIDES = _merge_mask_stages(2 * CARRY_K)


def _topk_kernel(
    nv_ref: Any,
    q_ref: Any,
    sort_masks_ref: Any,
    merge_masks_ref: Any,
    docs_ref: Any,
    out_vals_ref: Any,
    out_idx_ref: Any,
    carry_vals: Any,
    carry_idx: Any,
) -> None:
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    t = docs_ref.shape[0]

    @pl.when(step == 0)
    def _init() -> None:
        carry_vals[:] = jnp.full(carry_vals.shape, NEG_INF, jnp.float32)
        carry_idx[:] = jnp.zeros(carry_idx.shape, jnp.float32)

    # MXU: tile scores [B, T], f32 accumulation.
    q = q_ref[:].astype(docs_ref.dtype)
    scores = jax.lax.dot_general(
        q, docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    base = (step * t).astype(jnp.float32)
    gcol = base + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 1
    ).astype(jnp.float32)
    scores = jnp.where(gcol < nv_ref[0], scores, NEG_INF)

    # Threshold pruning: a tile whose best score (per query) cannot beat
    # the current k-th best contributes nothing — skip the whole sort
    # network.  After the carry warms up, almost every tile is skipped and
    # the kernel runs at matmul speed (the HBM floor).
    tile_best = jnp.max(scores, axis=1, keepdims=True)  # [B, 1]
    carry_worst = carry_vals[:, CARRY_K - 1 : CARRY_K]
    useful = jnp.any(tile_best > carry_worst)

    @pl.when(useful)
    def _fold() -> None:
        # VPU: sort the tile ASCENDING so its top-K occupies the last lanes
        # in ascending order; carry(desc) ++ tile-top(asc) is bitonic, so
        # one descending merge finishes the fold.
        tile_vals, tile_idx = scores, gcol
        for i, stride in enumerate(_TILE_SORT_STRIDES):
            tile_vals, tile_idx = _compare_exchange(
                tile_vals, tile_idx, stride, sort_masks_ref[i : i + 1, :]
            )
        merged_v = jnp.concatenate(
            [carry_vals[:], tile_vals[:, -CARRY_K:]], axis=1
        )
        merged_i = jnp.concatenate(
            [carry_idx[:], tile_idx[:, -CARRY_K:]], axis=1
        )
        for i, stride in enumerate(_MERGE_STRIDES):
            merged_v, merged_i = _compare_exchange(
                merged_v, merged_i, stride, merge_masks_ref[i : i + 1, :]
            )
        carry_vals[:] = merged_v[:, :CARRY_K]
        carry_idx[:] = merged_i[:, :CARRY_K]

    @pl.when(step == n_steps - 1)
    def _emit() -> None:
        out_vals_ref[:] = carry_vals[:]
        out_idx_ref[:] = carry_idx[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_topk128(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    n, d = docs.shape
    b = queries.shape[0]
    grid = n // TILE_ROWS
    kernel = pl.pallas_call(
        _topk_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid [1] f32
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                _TILE_SORT_MASKS.shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                _MERGE_MASKS.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((b, CARRY_K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, CARRY_K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, CARRY_K), jnp.float32),
            jax.ShapeDtypeStruct((b, CARRY_K), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, CARRY_K), jnp.float32),
            pltpu.VMEM((b, CARRY_K), jnp.float32),
        ],
        interpret=interpret,
    )
    vals, idxf = kernel(
        jnp.asarray([n_valid], jnp.float32),
        queries,
        jnp.asarray(_TILE_SORT_MASKS),
        jnp.asarray(_MERGE_MASKS),
        docs,
    )
    return vals, idxf.astype(jnp.int32)


def pallas_supported(n: int, d: int, k: int) -> bool:
    return (
        k <= CARRY_K
        and n % TILE_ROWS == 0
        and n >= 2 * TILE_ROWS
        and n <= MAX_ROWS
        and d % 128 == 0
    )


def pallas_score_topk(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused streaming exact top-k.  Returns ``([B, k] f32, [B, k] int32)``.

    Requires ``pallas_supported(...)``; callers fall back to the XLA path
    otherwise.  ``queries`` rows are padded to a multiple of 8 internally.
    On the CPU backend the kernel runs in interpreter mode automatically.
    """
    n, d = docs.shape
    assert pallas_supported(n, d, k), "caller must check pallas_supported"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = queries.shape[0]
    b_pad = max(8, ((b + 7) // 8) * 8)
    if b_pad != b:
        queries = jnp.concatenate(
            [queries, jnp.zeros((b_pad - b, queries.shape[1]), queries.dtype)],
            axis=0,
        )
    vals, idx = _pallas_topk128(docs, queries, n_valid, interpret=interpret)
    return vals[:b, :k], idx[:b, :k]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pallas_score_topk_packed(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    interpret: bool = False,
) -> jax.Array:
    """:func:`pallas_score_topk` + result packing in one device dispatch
    (see ``ops.topk.pack_vals_idx``)."""
    from .topk import pack_vals_idx

    vals, idx = pallas_score_topk(docs, queries, n_valid, k, interpret=interpret)
    return pack_vals_idx(vals, idx)
