"""Pallas tile-extraction selection: the batched-retrieval kernel.

Problem (measured on v5e, BENCHMARKS.md "selection shootout"): the batched
hot path is ``matmul (4.7 ms) + lax.top_k over [256, 1M] scores``, and the
selection costs 310 ms at k=400 / 85 ms at k=100 — 17-65x the matmul.
XLA's TopK pays a full sorting network per row; per-tile ``lax.top_k``
(the ``tiled_topk`` fallback path) still pays it per tile.

This kernel exploits the actual statistics of exact retrieval: the true
top-k of a big corpus is *sparse per tile* (k=400 over ~1000 subtiles ~
0.4 expected members per tile — and pack-time row permutation makes that
hold for ANY insertion order).  Per subtile, the top-``H`` elements are
extracted by iterated (max, clear) passes — pure VPU work, no sorting
network — and one small ``lax.top_k`` over the ``[B, T*H]`` survivors
(each H-group already DESCENDING) finishes the job.  Two deployments:

- two-pass (``_extract``): streams a precomputed score matrix from HBM;
- fused (``_fused_extract``/``_fused_extract_int8``): the matmul runs
  inside the kernel into a VMEM accumulator (grid over doc blocks x dim
  chunks, whole query batch resident), so the corpus is read from HBM
  exactly once per step and the score matrix never exists in HBM.
  Measured v5e, 1M x 1536 top-100: bf16 b=1 4.27 ms (89% of HBM
  bandwidth), b=256 0.038 ms/query; int8 b=1 2.33 ms (82%).

Exactness is verified in-graph: a subtile can hide a true top-k element
beyond its extracted H only if its H-th extracted value beats the merged
k-th value; any such subtile triggers the full ``lax.top_k`` fallback
inside ``lax.cond`` (lazy on TPU — measured: the fast path does not pay
for the untaken branch).  With permuted rows, P(some subtile holds >8 of
the top-400) is ~1e-4 per 256-query batch — the fallback exists for
adversarial score distributions, and keeps the result exact even then.

A second generation ("v2", keyed) of the fused kernels lives further
down in this file: packed-key extraction plus a staged merge, measured
(v5e, 1M x 1536, shootout 7) at b=256 top-100 6.9 ms bf16 / 5.1 ms int8
per step vs 9.8 / 7.6 for v1, and never slower at b=1.  The engine
dispatches to v2 whenever rescoring is on; v1 remains the exact-score
path for rescore-off callers.

Mosaic survival notes (see also ``benchmarks/pallas_topk_v1.py``):
float compares only
(int iota cast to f32), indices ride as exact f32 values (n < 2^24 —
larger corpora use the XLA path), ``jnp.where`` selects (never arithmetic
blends with -inf), no reshapes inside the kernel.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import (
    FALLBACK_SCORES_BUDGET,
    NEG_INF,
    f32_dot_precision,
    mask_cols,
    pack_vals_idx,
    score_topk,
    scores_matmul,
    streaming_score_topk,
)


def _exact_fallback(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    row_scales: "jax.Array | None" = None,
) -> Tuple[jax.Array, jax.Array]:
    """The exact path embedded in the keyed kernels' ``lax.cond``:
    materializing while the ``[B, N]`` f32 score matrix fits
    :data:`~svs_tpu.ops.topk.FALLBACK_SCORES_BUDGET`, streaming past it.
    ``cond`` branches allocate HBM even when untaken — a [256, 2^24]
    fallback is 17 GB, which fails COMPILE on a 16 GB chip for exactly
    the wide corpora the keyed kernels now support."""
    if queries.shape[0] * docs.shape[0] * 4 > FALLBACK_SCORES_BUDGET:
        return streaming_score_topk(
            docs, queries, n_valid, k, row_scales=row_scales
        )
    if row_scales is not None:
        from .quant import score_topk_int8

        return score_topk_int8(docs, row_scales, queries, n_valid, k)
    return score_topk(docs, queries, n_valid, k)

#: Pallas memory-ref handle type inside kernel bodies.  Pallas exposes no
#: public Ref class to annotate with, so kernels annotate refs as ``Any``
#: (an explicit-Any, permitted under mypy strict).
Ref = Any

#: Docs per extraction subtile (the unit of the top-H guarantee).
SUBTILE = 1024
#: Winners extracted per subtile.  Kernel VPU cost is linear in H; with
#: pack-time row permutation, per-subtile top-k occupancy is ~Poisson
#: (k / n_subtiles), so H=8 trips the fallback ~1e-4 per 256-query batch
#: at k=400 over 1M docs.  Output lanes per block =
#: (BLOCK_N // SUBTILE) * EXTRACT_H = 128 — one full lane tile.
EXTRACT_H = 8
#: Docs per grid step (one HBM->VMEM streamed block).
BLOCK_N = 16 * SUBTILE
#: Query rows per grid step (VPU sublane width).
QBLOCK = 8

_OUT_LANES = (BLOCK_N // SUBTILE) * EXTRACT_H  # 128


def _extract_kernel(scores_ref: Ref, out_vals_ref: Ref, out_idx_ref: Ref) -> None:
    j = pl.program_id(1)
    block_base = (j * BLOCK_N).astype(jnp.float32)
    pieces_v = []
    pieces_i = []
    for s in range(BLOCK_N // SUBTILE):
        sub = scores_ref[:, s * SUBTILE : (s + 1) * SUBTILE].astype(jnp.float32)
        gidx = (
            jax.lax.broadcasted_iota(jnp.int32, (QBLOCK, SUBTILE), 1).astype(
                jnp.float32
            )
            + block_base
            + float(s * SUBTILE)
        )
        for _ in range(EXTRACT_H):
            mval = jnp.max(sub, axis=1, keepdims=True)  # [8, 1]
            # index of (one of) the max elements: highest position wins
            midx = jnp.max(
                jnp.where(sub == mval, gidx, -1.0), axis=1, keepdims=True
            )
            pieces_v.append(mval)
            pieces_i.append(midx)
            sub = jnp.where(gidx == midx, NEG_INF, sub)
    out_vals_ref[:] = jnp.concatenate(pieces_v, axis=1)
    out_idx_ref[:] = jnp.concatenate(pieces_i, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _extract(scores: jax.Array, interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Per-subtile top-H of ``[B, N]`` scores (B % 8 == 0, N % BLOCK_N == 0).
    Returns ``(vals [B, T*H] f32, idx-as-f32 [B, T*H])`` where T = N//SUBTILE;
    each H-group is sorted descending."""
    b, n = scores.shape
    grid = (b // QBLOCK, n // BLOCK_N)
    out_shape = (b, (n // SUBTILE) * EXTRACT_H)
    return pl.pallas_call(
        _extract_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QBLOCK, BLOCK_N), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((QBLOCK, _OUT_LANES), lambda i, j: (i, j)),
            pl.BlockSpec((QBLOCK, _OUT_LANES), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ],
        interpret=interpret,
    )(scores)


def extract_supported(n: int, b: int, k: int) -> bool:
    """Shapes the kernel handles: block-aligned corpus below the f32-exact
    index ceiling, with enough subtiles that top-k sparsity holds.

    ``b`` is deliberately unconstrained today — the two-pass kernel
    streams ``[b, BLOCK_N]`` score blocks and has no measured batch
    ceiling at the engine's batch sizes; the parameter stays in the
    signature so every dispatch site already passes it if a constraint
    ever appears."""
    del b  # see docstring
    t = n // SUBTILE
    return (
        n % BLOCK_N == 0
        and n < (1 << 24)
        and t >= 2
        and k <= t * EXTRACT_H
    )


def _verified_merge(
    ev: jax.Array,
    ei: jax.Array,
    k: int,
    fallback: "Callable[[], Tuple[jax.Array, jax.Array]]",
) -> Tuple[jax.Array, jax.Array]:
    """Shared epilogue of the v1 extraction paths: merge the per-subtile
    winners with one ~k-wide ``top_k`` and prove coverage in-graph — a
    subtile can hide a true top-k element only if its H-th (smallest
    extracted) value still beats the merged k-th value; any such subtile
    routes the whole batch through ``fallback`` (a full exact top-k)
    inside ``lax.cond``.  One definition so a coverage-rule change lands
    in every epilogue at once.  Returns ``(vals f32, idx int32)`` over
    the padded batch."""
    vals, pos = jax.lax.top_k(ev, k)
    idx = jnp.take_along_axis(ei, pos, axis=1).astype(jnp.int32)
    v_k = vals[:, k - 1 : k]
    tails = ev[:, EXTRACT_H - 1 :: EXTRACT_H]  # [B, T]: each group's H-th
    covered = jnp.logical_not(jnp.any(tails > v_k))

    def fast(_: None) -> Tuple[jax.Array, jax.Array]:
        return vals, idx

    def full(_: None) -> Tuple[jax.Array, jax.Array]:
        fv, fi = fallback()
        return fv.astype(jnp.float32), fi

    return jax.lax.cond(covered, fast, full, None)


def extract_topk(
    scores: jax.Array, k: int, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over ``[B, N]`` scores via the extraction kernel +
    verified merge.  B is padded to 8 rows internally; requires
    ``extract_supported(N, B, k)``."""
    b, n = scores.shape
    b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
    if b_pad != b:
        scores = jnp.concatenate(
            [scores, jnp.full((b_pad - b, n), NEG_INF, scores.dtype)], axis=0
        )
    ev, ei = _extract(scores, interpret=interpret)
    vals, idx = _verified_merge(
        ev, ei, k, lambda: jax.lax.top_k(scores, k)
    )
    return vals[:b], idx[:b]


# --- fused matmul + extraction --------------------------------------------
#
# The two-pass path above materializes the [B, N] score matrix in HBM
# (write + read ~ 2.5 ms at B=256 over 1M docs).  The fused kernel keeps
# scores in a VMEM accumulator: grid over (doc block, dim chunk) with the
# WHOLE query batch resident — the corpus streams from HBM exactly once
# regardless of batch size (a query-block grid axis would re-read it per
# 8 queries).  Extraction runs on the accumulator at the last dim chunk.

#: The fused kernel uses a finer subtile (Mosaic wants 128-lane output
#: blocks: 16 subtiles x H=8 winners = 128) — also statistically safer
#: (k=400 over ~2000 subtiles ~ 0.2 expected winners each).
FUSED_SUBTILE = 512
#: Docs per fused grid step: accumulator is [B, FUSED_BLOCK_N] f32 in VMEM.
FUSED_BLOCK_N = 16 * FUSED_SUBTILE
#: Contraction chunk (corpus dim must be a multiple — always true: packs
#: pad the dim to 128).
DIM_CHUNK = 128
#: int8 contraction chunk: the int8 MXU path amortizes per-grid-step
#: overhead better with a 256-wide contraction (measured v5e 1M x 1536
#: b=256: matmul-only 2.41 vs 2.77 ms/step, full guarded kernel 3.38 vs
#: 3.69 — benchmarks/tpu_int8_opt.py).  Dims not a multiple of 256 fall
#: back to DIM_CHUNK; support checks stay on DIM_CHUNK so dispatch is
#: unchanged.
DIM_CHUNK_INT8 = 256


def _int8_chunk(d: int) -> int:
    return DIM_CHUNK_INT8 if d % DIM_CHUNK_INT8 == 0 else DIM_CHUNK
#: Accumulator budget: B * FUSED_BLOCK_N * 4 bytes; 256 queries -> 8 MB
#: of the ~16 MB VMEM.
FUSED_MAX_BATCH = 256

_FUSED_OUT_LANES = (FUSED_BLOCK_N // FUSED_SUBTILE) * EXTRACT_H  # 128


def _fused_kernel(nv_ref: Ref, q_ref: Ref, docs_ref: Ref, out_vals_ref: Ref, out_idx_ref: Ref, acc_ref: Ref) -> None:
    j = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _zero() -> None:
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 corpora need HIGHEST for the claimed error bound; bf16
        # operands are exact at DEFAULT (ops.topk.f32_dot_precision).
        precision=f32_dot_precision(docs_ref.dtype),
    )

    @pl.when(c == nc - 1)
    def _emit() -> None:
        nv = nv_ref[0]
        b = acc_ref.shape[0]
        block_base = (j * FUSED_BLOCK_N).astype(jnp.float32)
        # Winners are stored straight into the output refs per extraction
        # (a big trailing concatenate keeps all 128 pieces + per-subtile
        # temporaries live simultaneously and blows the VMEM stack).
        for s in range(FUSED_BLOCK_N // FUSED_SUBTILE):
            gidx = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (b, FUSED_SUBTILE), 1
                ).astype(jnp.float32)
                + block_base
                + float(s * FUSED_SUBTILE)
            )
            sub = jnp.where(
                gidx < nv,
                acc_ref[:, s * FUSED_SUBTILE : (s + 1) * FUSED_SUBTILE],
                NEG_INF,
            )
            for h in range(EXTRACT_H):
                mval = jnp.max(sub, axis=1, keepdims=True)
                midx = jnp.max(
                    jnp.where(sub == mval, gidx, -1.0), axis=1, keepdims=True
                )
                col = s * EXTRACT_H + h
                out_vals_ref[:, col : col + 1] = mval
                out_idx_ref[:, col : col + 1] = midx
                sub = jnp.where(gidx == midx, NEG_INF, sub)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_extract(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Matmul + per-subtile top-H in one kernel.  ``docs`` [N, d] (bf16 or
    f32), ``queries`` [B, d] in the docs dtype, B % 8 == 0, N %
    FUSED_BLOCK_N == 0, d % DIM_CHUNK == 0."""
    n, d = docs.shape
    b = queries.shape[0]
    grid = (n // FUSED_BLOCK_N, d // DIM_CHUNK)
    out_shape = (b, (n // FUSED_SUBTILE) * EXTRACT_H)
    return pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid [1] f32
            pl.BlockSpec((b, DIM_CHUNK), lambda j, c: (0, c)),
            pl.BlockSpec((FUSED_BLOCK_N, DIM_CHUNK), lambda j, c: (j, c)),
        ],
        out_specs=[
            pl.BlockSpec((b, _FUSED_OUT_LANES), lambda j, c: (0, j)),
            pl.BlockSpec((b, _FUSED_OUT_LANES), lambda j, c: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, FUSED_BLOCK_N), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.float32), queries, docs)


def fused_supported(n: int, d: int, b: int, k: int) -> bool:
    t = n // FUSED_SUBTILE
    return (
        n % FUSED_BLOCK_N == 0
        and n < (1 << 24)
        and d % DIM_CHUNK == 0
        and t >= 2
        and k <= t * EXTRACT_H
        and b <= FUSED_MAX_BATCH
    )


@functools.partial(jax.jit, static_argnames=("k", "wide", "interpret"))
def score_topk_fused_packed(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    wide: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Single-kernel scoring + selection + verified merge + packing — the
    score matrix never touches HBM.  Requires ``fused_supported``."""
    n, d = docs.shape
    b = queries.shape[0]
    b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
    q = queries.astype(docs.dtype) if jnp.issubdtype(
        docs.dtype, jnp.floating
    ) else queries
    if b_pad != b:
        q = jnp.concatenate(
            [q, jnp.zeros((b_pad - b, d), q.dtype)], axis=0
        )
    ev, ei = _fused_extract(docs, q, n_valid, interpret=interpret)
    vals, idx = _verified_merge(
        ev, ei, k,
        lambda: _exact_fallback(
            docs, queries if b_pad == b else q, n_valid, k
        ),
    )
    return pack_vals_idx(vals[:b], idx[:b], wide=wide)


def _fused_int8_kernel(
    nv_ref: Ref, q_ref: Ref, qs_ref: Ref, docs_ref: Ref, rs_ref: Ref, out_vals_ref: Ref, out_idx_ref: Ref, acc_ref: Ref
) -> None:
    """int8 variant: int8 x int8 MXU matmul with int32 accumulation; the
    f32 rescale by (row_scale x query_scale) happens per subtile at emit,
    so no full-width f32 score buffer ever exists."""
    j = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _zero() -> None:
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.int32)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(c == nc - 1)
    def _emit() -> None:
        nv = nv_ref[0]
        b = acc_ref.shape[0]
        qs = qs_ref[:]  # [b, 1] f32
        block_base = (j * FUSED_BLOCK_N).astype(jnp.float32)
        for s in range(FUSED_BLOCK_N // FUSED_SUBTILE):
            lo, hi = s * FUSED_SUBTILE, (s + 1) * FUSED_SUBTILE
            gidx = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (b, FUSED_SUBTILE), 1
                ).astype(jnp.float32)
                + block_base
                + float(lo)
            )
            sub = acc_ref[:, lo:hi].astype(jnp.float32) * rs_ref[:, lo:hi] * qs
            sub = jnp.where(gidx < nv, sub, NEG_INF)
            for h in range(EXTRACT_H):
                mval = jnp.max(sub, axis=1, keepdims=True)
                midx = jnp.max(
                    jnp.where(sub == mval, gidx, -1.0), axis=1, keepdims=True
                )
                col = s * EXTRACT_H + h
                out_vals_ref[:, col : col + 1] = mval
                out_idx_ref[:, col : col + 1] = midx
                sub = jnp.where(gidx == midx, NEG_INF, sub)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_extract_int8(
    q_docs: jax.Array,
    row_scales: jax.Array,
    q_int8: jax.Array,
    q_scales: jax.Array,
    n_valid: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    n, d = q_docs.shape
    b = q_int8.shape[0]
    chunk = _int8_chunk(d)
    grid = (n // FUSED_BLOCK_N, d // chunk)
    out_shape = (b, (n // FUSED_SUBTILE) * EXTRACT_H)
    return pl.pallas_call(
        _fused_int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid [1] int32
            pl.BlockSpec((b, chunk), lambda j, c: (0, c)),
            pl.BlockSpec((b, 1), lambda j, c: (0, 0)),
            pl.BlockSpec((FUSED_BLOCK_N, chunk), lambda j, c: (j, c)),
            pl.BlockSpec((1, FUSED_BLOCK_N), lambda j, c: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((b, _FUSED_OUT_LANES), lambda j, c: (0, j)),
            pl.BlockSpec((b, _FUSED_OUT_LANES), lambda j, c: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, FUSED_BLOCK_N), jnp.int32)],
        interpret=interpret,
    )(
        jnp.asarray([n_valid], jnp.int32),
        q_int8,
        q_scales[:, None].astype(jnp.float32),
        q_docs,
        row_scales[None, :].astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("k", "wide", "interpret"))
def score_topk_fused_int8_packed(
    q_docs: jax.Array,
    row_scales: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    wide: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """int8 single-kernel scoring + selection + verified merge + packing.
    Requires ``fused_supported``."""
    from .quant import quantize_rows_int8

    n, d = q_docs.shape
    b = queries.shape[0]
    b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
    if b_pad != b:
        queries = jnp.concatenate(
            [queries, jnp.zeros((b_pad - b, d), queries.dtype)], axis=0
        )
    q_int8, q_scales = quantize_rows_int8(queries)
    ev, ei = _fused_extract_int8(
        q_docs, row_scales, q_int8, q_scales, n_valid, interpret=interpret
    )
    def _int8_exact() -> Tuple[jax.Array, jax.Array]:
        return _exact_fallback(
            q_docs, queries, n_valid, k, row_scales=row_scales
        )

    vals, idx = _verified_merge(ev, ei, k, _int8_exact)
    return pack_vals_idx(vals[:b], idx[:b], wide=wide)


# --- keyed fused kernels (v2): packed-key extraction + staged merge --------
#
# Two measured facts drive this design (benchmarks/tpu_select5.py and
# tpu_select6.py, v5e):
#
#   1. the extraction emit is pure VPU work and CANNOT overlap the MXU
#      matmul (Mosaic serializes the units within a grid step; measured
#      overlap ~0), so the only lever is fewer VPU passes per winner;
#   2. the final ``lax.top_k`` merge costs ~2.4 ms at 16384 candidate
#      lanes but only ~0.25 ms at ~4096 — the merge width matters.
#
# Keyed extraction: scores are biased positive and quantized onto a 2^-13
# grid; the key ``floor((s + KEY_BIAS) * KEY_QSCALE) * 512 + lane`` is an
# exact f32 integer < 2^24 ordering like (quantized score, lane).  Keys
# are UNIQUE, so one winner costs ONE max-reduce plus ONE compare/select
# clear (~3 VPU passes vs ~6 for the f32 max / index-recover / clear
# sequence — measured 1.85x), and only the raw key is emitted: decode
# happens outside the kernel over the small extracted array (in-kernel
# [b,1] scalar decodes still burn full vregs; int32 VPU ops measured ~7x
# slower than f32, hence the all-f32 scheme).
#
# A second tiny kernel then reduces each 128-lane group of extracted keys
# to its top-H2 (H2 sized from the Poisson tail of k over the groups, in
# multiples of 8 so output lanes stay 128-aligned), shrinking the host
# merge from (N/SUBTILE)*H lanes to ~k-sized width.
#
# Decoded values sit within ``KEY_EPS`` BELOW the true score (floor grid
# + pack-multiply rounding).  Exactness of the candidate SET is verified
# in-graph exactly like the v1 kernels — any level-1 subtile tail or
# level-2 group tail above ``v_k - KEY_EPS`` triggers the full top-k
# fallback — and the engine adds KEY_EPS to its verified-rescore error
# bound so end-to-end retrieval stays provably exact.  The engine only
# dispatches here when rescoring is on (the raw op returns quantized
# scores; reference parity of returned score VALUES comes from the f32
# rescore, reference ``svs/kb.py:1185``).

#: Score quantization grid for packed keys.  2^13 keeps the largest key
#: (score ~2.03 biased, x512 lanes) an exact f32 integer below 2^24.
KEY_QSCALE = float(1 << 13)
#: Bias making cosine scores strictly positive pre-quantization (margin
#: over the int8 path's ~2% quantization overshoot past |s|=1).
KEY_BIAS = 1.0625
#: Sound bound on (true score - decoded key value): one 2^-13 grid step
#: plus pack rounding.  Also the coverage-check slack.
KEY_EPS = 2.0**-12
_KEY_LANES = float(FUSED_SUBTILE)  # lane-field width in pass-1 keys
#: Dead-lane / cleared-lane marker: exactly -2^24 (f32-exact), strictly
#: below every in-horizon live key — scores below -KEY_BIAS produce
#: NEGATIVE keys, so a 0.0 marker would outrank them and silently promote
#: padding.  The range guard treats == KEY_DEAD as fine (tail-padding
#: subtiles legitimately emit markers) and only live keys beyond the
#: horizon trip the exact fallback.
KEY_DEAD = -float(1 << 24)
#: Rounding horizon for the range guards: keys are exact f32 integers
#: only while |key| < 2^24; a LIVE key at or past this value has lost
#: lane bits and must route to the exact fallback (KEY_DEAD markers are
#: expected and pass).
KEY_HORIZON = float((1 << 24) - 512)

#: Pass-2 reduction: lanes per input group (one group = the H winners of
#: EXTRACT_H=8 level-1 subtiles) and lanes per grid step.
REDUCE_GROUP = 128
REDUCE_BLOCK = 2048


def _key_vals(keys: jax.Array) -> jax.Array:
    """Decode packed keys to quantized scores (within KEY_EPS below the
    true score).  Works for pass-1 and pass-2 keys alike: both carry the
    score field in bits >= 2^9."""
    vq = keys.astype(jnp.int32) // 512
    return vq.astype(jnp.float32) / KEY_QSCALE - KEY_BIAS


def _emit_keys(acc_block: jax.Array, lane: jax.Array, live_from: jax.Array,
               out_ref: Ref, col0: int) -> None:
    """Extract the top-EXTRACT_H of one subtile's scores as packed keys
    into ``out_ref[:, col0:col0+EXTRACT_H]``.  ``live_from`` = number of
    live lanes in this subtile (scalar f32, may be <=0 or >=SUBTILE)."""
    keys = jnp.floor((acc_block + KEY_BIAS) * KEY_QSCALE) * _KEY_LANES + lane
    keys = jnp.where(lane < live_from, keys, KEY_DEAD)
    for h in range(EXTRACT_H):
        mkey = jnp.max(keys, axis=1, keepdims=True)
        out_ref[:, col0 + h : col0 + h + 1] = mkey
        keys = jnp.where(keys == mkey, KEY_DEAD, keys)


def _fused2_kernel(nv_ref: Ref, q_ref: Ref, docs_ref: Ref, out_ref: Ref, acc_ref: Ref) -> None:
    j = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _zero() -> None:
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 corpora need HIGHEST for the claimed error bound; bf16
        # operands are exact at DEFAULT (ops.topk.f32_dot_precision).
        precision=f32_dot_precision(docs_ref.dtype),
    )

    @pl.when(c == nc - 1)
    def _emit() -> None:
        nv = nv_ref[0]  # int32: exact at ANY corpus size
        b = acc_ref.shape[0]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, FUSED_SUBTILE), 1
        ).astype(jnp.float32)
        for s in range(FUSED_BLOCK_N // FUSED_SUBTILE):
            lo = s * FUSED_SUBTILE
            # live-lane count for this subtile, computed in int32 scalars
            # then clamped into [0, SUBTILE] before the f32 cast — the
            # clamp keeps the value f32-exact no matter how large n gets
            # (a raw f32 n_valid rounds above 2^24, mis-masking the
            # validity boundary; this was the keyed path's size ceiling)
            live = jnp.clip(
                nv - (j * FUSED_BLOCK_N + lo), 0, FUSED_SUBTILE
            ).astype(jnp.float32)
            _emit_keys(
                acc_ref[:, lo : lo + FUSED_SUBTILE],
                lane,
                live,
                out_ref,
                s * EXTRACT_H,
            )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused2_extract(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Matmul + keyed per-subtile top-H in one kernel; returns raw packed
    keys ``[B, (N/FUSED_SUBTILE)*EXTRACT_H]`` (decode via the host-side
    helpers)."""
    n, d = docs.shape
    b = queries.shape[0]
    grid = (n // FUSED_BLOCK_N, d // DIM_CHUNK)
    out_shape = (b, (n // FUSED_SUBTILE) * EXTRACT_H)
    return pl.pallas_call(
        _fused2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid [1] int32
            pl.BlockSpec((b, DIM_CHUNK), lambda j, c: (0, c)),
            pl.BlockSpec((FUSED_BLOCK_N, DIM_CHUNK), lambda j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((b, _FUSED_OUT_LANES), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, FUSED_BLOCK_N), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), queries, docs)


def _fused2_int8_kernel(
    nv_ref: Ref, q_ref: Ref, qs_ref: Ref, docs_ref: Ref, rs_ref: Ref, out_ref: Ref, acc_ref: Ref
) -> None:
    """int8 variant: int8 x int8 MXU matmul with int32 accumulation; the
    f32 rescale happens per subtile at emit (no full-width f32 buffer)."""
    j = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _zero() -> None:
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.int32)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(c == nc - 1)
    def _emit() -> None:
        nv = nv_ref[0]  # int32: exact at ANY corpus size
        b = acc_ref.shape[0]
        qs = qs_ref[:]  # [b, 1] f32
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, FUSED_SUBTILE), 1
        ).astype(jnp.float32)
        for s in range(FUSED_BLOCK_N // FUSED_SUBTILE):
            lo = s * FUSED_SUBTILE
            sub = (
                acc_ref[:, lo : lo + FUSED_SUBTILE].astype(jnp.float32)
                * rs_ref[:, lo : lo + FUSED_SUBTILE]
                * qs
            )
            live = jnp.clip(
                nv - (j * FUSED_BLOCK_N + lo), 0, FUSED_SUBTILE
            ).astype(jnp.float32)  # int32 scalars: see _fused2_kernel
            _emit_keys(
                sub,
                lane,
                live,
                out_ref,
                s * EXTRACT_H,
            )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused2_extract_int8(
    q_docs: jax.Array,
    row_scales: jax.Array,
    q_int8: jax.Array,
    q_scales: jax.Array,
    n_valid: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    n, d = q_docs.shape
    b = q_int8.shape[0]
    chunk = _int8_chunk(d)
    grid = (n // FUSED_BLOCK_N, d // chunk)
    out_shape = (b, (n // FUSED_SUBTILE) * EXTRACT_H)
    return pl.pallas_call(
        _fused2_int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, chunk), lambda j, c: (0, c)),
            pl.BlockSpec((b, 1), lambda j, c: (0, 0)),
            pl.BlockSpec((FUSED_BLOCK_N, chunk), lambda j, c: (j, c)),
            pl.BlockSpec((1, FUSED_BLOCK_N), lambda j, c: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, _FUSED_OUT_LANES), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, FUSED_BLOCK_N), jnp.int32)],
        interpret=interpret,
    )(
        # int32 like the bf16 wrapper: the kernel's validity masking runs
        # on int32 scalars (see _fused2_kernel) — an f32 n_valid here
        # would silently re-acquire the 2^24 masking ceiling on int8
        jnp.asarray([n_valid], jnp.int32),
        q_int8,
        q_scales[:, None].astype(jnp.float32),
        q_docs,
        row_scales[None, :].astype(jnp.float32),
    )


def _make_reduce_kernel(h2: int) -> Any:
    def kern(keys_ref: Ref, out_ref: Ref) -> None:
        b = keys_ref.shape[0]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, REDUCE_GROUP), 1
        ).astype(jnp.float32)
        inv = 1.0 / float(REDUCE_GROUP)
        for g in range(REDUCE_BLOCK // REDUCE_GROUP):
            grp = keys_ref[:, g * REDUCE_GROUP : (g + 1) * REDUCE_GROUP]
            # Drop the low 7 lane bits of the level-1 key (exact: /128 is
            # an exponent shift, the product stays < 2^24) and re-key by
            # position-in-group; order still refines quantized-score order.
            k2 = jnp.floor(grp * inv) * float(REDUCE_GROUP) + lane
            for h in range(h2):
                m = jnp.max(k2, axis=1, keepdims=True)
                col = g * h2 + h
                out_ref[:, col : col + 1] = m
                k2 = jnp.where(k2 == m, -(2.0**24), k2)

    return kern


@functools.partial(jax.jit, static_argnames=("h2", "interpret"))
def _reduce_keys(
    keys: jax.Array, h2: int, interpret: bool = False
) -> jax.Array:
    """Top-``h2`` (as re-packed keys) of every 128-lane group of ``keys``.
    Requires ``keys.shape[1] % REDUCE_BLOCK == 0`` and ``h2 % 8 == 0``."""
    b, l1 = keys.shape
    grid = (l1 // REDUCE_BLOCK,)
    out_lanes = (REDUCE_BLOCK // REDUCE_GROUP) * h2
    return pl.pallas_call(
        _make_reduce_kernel(h2),
        grid=grid,
        in_specs=[pl.BlockSpec((b, REDUCE_BLOCK), lambda j: (0, j))],
        out_specs=pl.BlockSpec((b, out_lanes), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct(
            (b, (l1 // REDUCE_GROUP) * h2), jnp.float32
        ),
        interpret=interpret,
    )(keys)


def _reduce_h2(n: int, k: int) -> int:
    """Pass-2 winners kept per 128-lane group: Poisson mean ``k`` over the
    ``n/FUSED_BLOCK_N`` groups plus four sigma plus slack, rounded up to a
    multiple of 8 so output lanes stay 128-aligned."""
    nb = max(1, n // FUSED_BLOCK_N)
    lam = k / nb
    h2 = lam + 4.0 * lam**0.5 + 8.0
    return int(-(-h2 // 8) * 8)


def fused2_supported(n: int, d: int, b: int, k: int) -> bool:
    """Keyed-kernel shape support: v1's alignment/batch rules plus a sane
    pass-2 width (H2 capped so the reduction doesn't degenerate when k is
    large relative to the number of doc blocks).

    Unlike v1 (``fused_supported``), there is NO ``n < 2^24`` ceiling:
    keyed kernels never carry a global row index in f32 — keys encode
    only (quantized score, lane < SUBTILE), validity masking runs on
    int32 scalars, and the global row is reconstructed outside the kernel
    in int32 (exact to 2^31 rows).
    """
    t = n // FUSED_SUBTILE
    nb = n // FUSED_BLOCK_N
    h2 = _reduce_h2(n, k)
    return (
        n % FUSED_BLOCK_N == 0
        and d % DIM_CHUNK == 0
        and t >= 2
        and k <= t * EXTRACT_H
        and b <= FUSED_MAX_BATCH
        and nb >= 2
        and h2 <= 48
        and k <= nb * h2
    )


def _fused2_finish(
    keys1: jax.Array,
    k: int,
    h2: int,
    b_real: int,
    interpret: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared pass-2 + merge + decode + coverage for the keyed kernels.
    Returns ``(vals, idx, covered)`` over the padded batch.  Coverage is
    evaluated over the first ``b_real`` rows only: zero-padded query rows
    score 0 everywhere, so their quantized tails TIE the k-th value and
    the KEY_EPS slack would trip the fallback on every padded batch."""
    b_pad, l1 = keys1.shape
    l1p = ((l1 + REDUCE_BLOCK - 1) // REDUCE_BLOCK) * REDUCE_BLOCK
    keys1p = keys1 if l1p == l1 else jnp.concatenate(
        [keys1, jnp.zeros((b_pad, l1p - l1), jnp.float32)], axis=1
    )
    keys2 = _reduce_keys(keys1p, h2, interpret=interpret)
    sel_keys, sel_cols = jax.lax.top_k(keys2, k)
    k2i = sel_keys.astype(jnp.int32)
    vals = _key_vals(sel_keys)
    lane2 = k2i - (k2i // REDUCE_GROUP) * REDUCE_GROUP
    pos = (sel_cols // h2) * REDUCE_GROUP + lane2
    k1i = jnp.take_along_axis(keys1p, pos, axis=1).astype(jnp.int32)
    lane1 = k1i - (k1i // int(_KEY_LANES)) * int(_KEY_LANES)
    jb = pos // _FUSED_OUT_LANES
    cb = pos - jb * _FUSED_OUT_LANES
    s = cb // EXTRACT_H
    idx = jb * FUSED_BLOCK_N + s * FUSED_SUBTILE + lane1
    v_k = vals[:b_real, k - 1 : k]
    tails1 = _key_vals(keys1[:b_real, EXTRACT_H - 1 :: EXTRACT_H])
    tails2 = _key_vals(keys2[:b_real, h2 - 1 :: h2])
    covered = jnp.logical_not(
        jnp.logical_or(
            jnp.any(tails1 > v_k - KEY_EPS),
            jnp.any(tails2 > v_k - KEY_EPS),
        )
    )
    # Domain guard: keys are exact f32 integers only while |key| < 2^24,
    # i.e. scores within (-4-KEY_BIAS, 4-KEY_BIAS].  Unit-norm cosine
    # scores (the engine's contract) sit at |key| <= ~8.5M, far inside;
    # arbitrary raw-op inputs that overflow lose lane bits, so any key at
    # the rounding horizon routes to the exact fallback instead.  KEY_DEAD
    # markers (exactly -2^24, from tail-padding subtiles) are expected and
    # pass; only a LIVE key past the horizon trips.
    live_min = jnp.min(jnp.where(keys1 == KEY_DEAD, 0.0, keys1))
    in_range = jnp.logical_and(
        jnp.max(keys1) < KEY_HORIZON, live_min > -KEY_HORIZON
    )
    return vals, idx, jnp.logical_and(covered, in_range)


def fused2_topk(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Keyed single-kernel scoring + staged selection + verified merge,
    unpacked: ``(quantized vals f32 [B, k], int32 rows [B, k])``.  The
    exact ``score_topk`` fallback fires in-graph when coverage fails.
    Shared by the packed single-chip wrapper and the per-shard mesh path
    (callable inside ``shard_map``).  Requires ``fused2_supported``."""
    n, d = docs.shape
    b = queries.shape[0]
    b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
    q = queries.astype(docs.dtype)
    if b_pad != b:
        q = jnp.concatenate([q, jnp.zeros((b_pad - b, d), q.dtype)], axis=0)
    keys1 = _fused2_extract(docs, q, n_valid, interpret=interpret)
    vals, idx, covered = _fused2_finish(
        keys1, k, _reduce_h2(n, k), b, interpret
    )

    def fast(_: None) -> Tuple[jax.Array, jax.Array]:
        return vals, idx

    def full(_: None) -> Tuple[jax.Array, jax.Array]:
        fv, fi = _exact_fallback(docs, q, n_valid, k)
        return fv.astype(jnp.float32), fi

    vals, idx = jax.lax.cond(covered, fast, full, None)
    return vals[:b], idx[:b]


@functools.partial(jax.jit, static_argnames=("k", "wide", "interpret"))
def score_topk_fused2_packed(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    wide: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Keyed single-kernel scoring + staged selection + verified merge +
    packing.  Returned scores are quantized (within ``KEY_EPS`` below the
    true value) unless the coverage fallback fires — pair with an exact
    rescore for value parity.  Requires ``fused2_supported``."""
    vals, idx = fused2_topk(docs, queries, n_valid, k, interpret=interpret)
    return pack_vals_idx(vals, idx, wide=wide)


def fused2_topk_int8(
    q_docs: jax.Array,
    row_scales: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """int8 keyed path, unpacked; see :func:`fused2_topk`.  Requires
    ``fused2_supported``."""
    from .quant import quantize_rows_int8

    n, d = q_docs.shape
    b = queries.shape[0]
    b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
    if b_pad != b:
        queries = jnp.concatenate(
            [queries, jnp.zeros((b_pad - b, d), queries.dtype)], axis=0
        )
    q_int8, q_scales = quantize_rows_int8(queries)
    keys1 = _fused2_extract_int8(
        q_docs, row_scales, q_int8, q_scales, n_valid, interpret=interpret
    )
    vals, idx, covered = _fused2_finish(
        keys1, k, _reduce_h2(n, k), b, interpret
    )

    def fast(_: None) -> Tuple[jax.Array, jax.Array]:
        return vals, idx

    def full(_: None) -> Tuple[jax.Array, jax.Array]:
        fv, fi = _exact_fallback(
            q_docs, queries, n_valid, k, row_scales=row_scales
        )
        return fv.astype(jnp.float32), fi

    vals, idx = jax.lax.cond(covered, fast, full, None)
    return vals[:b], idx[:b]


@functools.partial(jax.jit, static_argnames=("k", "wide", "interpret"))
def score_topk_fused2_int8_packed(
    q_docs: jax.Array,
    row_scales: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    wide: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """int8 keyed single-kernel path; see :func:`score_topk_fused2_packed`.
    Requires ``fused2_supported``."""
    vals, idx = fused2_topk_int8(
        q_docs, row_scales, queries, n_valid, k, interpret=interpret
    )
    return pack_vals_idx(vals, idx, wide=wide)


# --- guarded fused kernels (v3): bound-carrying extraction -----------------
#
# The v2 kernels above pay 8 winners x 16 subtiles = 128 max-reduces per
# 8192-doc block because their exactness story requires per-subtile top-H
# *coverage* of the candidate set (any hidden element trips the in-graph
# ``lax.top_k`` fallback).  Measured on v5e (benchmarks/tpu_select8.py /
# tpu_select9.py): the emit phase is dominated by the NUMBER of
# max-reduce invocations — each costs ~the same up to 512 lanes and ~2x
# at 1024 — so coverage's H=8 puts a hard floor under the batched path
# (b=256 bf16 6.2 ms extract vs a 4.8 ms matmul floor).
#
# v3 drops the coverage requirement entirely.  The engine's verified
# rescore only needs an upper bound on every NON-candidate's prescore
# (the margin proof in ``kb._finalize_batch`` reads ``pre_vals[:, -1]``),
# and the subtile tails already are that bound: a doc not extracted from
# its subtile scores at most the subtile's H-th (weakest) extracted key.
# So the kernel extracts top-4 per 1024-lane subtile (32 reduces @1024
# ~ 64 cost units — HALF of v2 — and half the clear passes) and emits the
# raw 32 keys plus one guard lane (the running max of subtile tails) per
# block.  No second reduce kernel, no fallback branch: the merge is one
# ``lax.top_k`` over nb*32 lanes, and ``max(guard, weakest merged key)``
# decodes into a sound hidden-score bound that the packed wire carries in
# the boundary slot.  Exactness then rides on the existing margin check +
# widen-and-retry loop (``kb.py:1504-1524``): a failed margin widens the
# candidate set, which turns this dispatch off (``GUARD_MAX_C``) and
# falls back to the v2/v1/XLA ladder.  Measured v5e (tpu_select9):
# b=256 bf16 1M x 1536 c=400 extract 5.58 ms, full merge+decode 5.98 ms
# vs 6.84-6.94 for the full v2 path.
#
# Bound soundness for arbitrary (non-unit-norm) raw-op inputs: keys are
# exact f32 integers while |key| < 2^24 (scores within ~(-5, 2.9)); far
# outside, float rounding can corrupt lane bits — which misdirects
# CANDIDATE rows but cannot un-sound the bound (key rounding is a
# relative 2^-24 of the VALUE, covered by the margin cushions) — except
# for enormous positive scores, where the bound itself loses absolute
# precision.  Those are detected via the top merged key and the bound is
# forced to +inf (margin always fails -> callers widen to an exact path).

#: v3 subtile: 1024 lanes, 4 winners — 32 reduces per 8192-doc block.
GUARD_SUBTILE = 1024
GUARD_H = 4
#: Score grid for v3 keys: 2^12 keeps (score+bias)*QSCALE*1024 an exact
#: f32 integer below 2^24 for scores up to ~2.9.
GUARD_QSCALE = float(1 << 12)
#: Sound bound on (true score - decoded key value) for the v3 grid.
GUARD_KEY_EPS = 2.0**-11
GUARD_NSUB = FUSED_BLOCK_N // GUARD_SUBTILE  # 8 subtiles per block
GUARD_KEYS = GUARD_NSUB * GUARD_H  # 32 key lanes per block
#: Out block: 32 keys + 1 guard lane, padded to one 128-lane tile.
_GUARD_OUT_LANES = 128
#: v3 dispatch ceiling on the candidate count: above this the guard
#: bound (at ~prescore-rank lambda^-4 of the corpus) stops clearing the
#: margin reliably and retries would churn — the v2/v1 ladder takes over.
GUARD_MAX_C = 1024
#: v3 dispatch floor on the batch: below it the v2 staged reduce wins
#: (measured v5e 1Mx1536 c=400 bf16: b=1 4.12 vs 4.46 ms, b=8 4.08 vs
#: 4.21, b=16 4.26 vs 4.21 tie, b>=32 v3 wins outright — 6.18 vs 7.93
#: at b=256; benchmarks/tpu_v3_prod.py).
GUARD_MIN_BATCH = 16
#: Keys at/above this decode from scores > ~2.5 — beyond any unit-norm
#: or int8-overshoot score, so only reachable by raw-op inputs that may
#: have lost f32 exactness; the bound saturates to +inf there.
_GUARD_SAT_KEY = float(int((2.5 + KEY_BIAS) * GUARD_QSCALE) * GUARD_SUBTILE)


def _guard_emit(
    scores_block: jax.Array,
    lane: jax.Array,
    live_from: jax.Array,
    out_ref: Ref,
    col0: int,
    guard: jax.Array,
) -> jax.Array:
    """Extract the top-GUARD_H of one 1024-lane subtile as packed keys
    into ``out_ref[:, col0:col0+GUARD_H]``; returns the updated running
    guard (max of subtile tails)."""
    # Clamp before keying: raw-op scores below ~-4 would push keys under
    # the KEY_DEAD marker (dead lanes would then outrank live ones), and
    # far-out positives lose f32 exactness.  At +-3.0 every live key
    # stays an exact f32 integer strictly above KEY_DEAD; clamped-high
    # docs key at >= _GUARD_SAT_KEY, which saturates the bound to +inf
    # (see _fused3_finish) — soundness never depends on their ordering.
    # Unit-norm engine scores ([-1, 1] + int8 overshoot) never clamp.
    keys = (
        jnp.floor(
            (jnp.clip(scores_block, -3.0, 3.0) + KEY_BIAS) * GUARD_QSCALE
        )
        * float(GUARD_SUBTILE)
        + lane
    )
    keys = jnp.where(lane < live_from, keys, KEY_DEAD)
    assert GUARD_H >= 1
    for h in range(GUARD_H):
        mkey = jnp.max(keys, axis=1, keepdims=True)
        out_ref[:, col0 + h : col0 + h + 1] = mkey
        keys = jnp.where(keys == mkey, KEY_DEAD, keys)
    return jnp.maximum(guard, mkey)


def _fused3_kernel(
    nv_ref: Ref, q_ref: Ref, docs_ref: Ref, out_ref: Ref, acc_ref: Ref
) -> None:
    j = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _zero() -> None:
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 corpora need HIGHEST for the claimed error bound; bf16
        # operands are exact at DEFAULT (ops.topk.f32_dot_precision).
        precision=f32_dot_precision(docs_ref.dtype),
    )

    @pl.when(c == nc - 1)
    def _emit() -> None:
        nv = nv_ref[0]  # int32: exact at ANY corpus size
        b = acc_ref.shape[0]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, GUARD_SUBTILE), 1
        ).astype(jnp.float32)
        guard = jnp.full((b, 1), KEY_DEAD, jnp.float32)
        for s in range(GUARD_NSUB):
            lo = s * GUARD_SUBTILE
            live = jnp.clip(
                nv - (j * FUSED_BLOCK_N + lo), 0, GUARD_SUBTILE
            ).astype(jnp.float32)
            guard = _guard_emit(
                acc_ref[:, lo : lo + GUARD_SUBTILE],
                lane,
                live,
                out_ref,
                s * GUARD_H,
                guard,
            )
        out_ref[:, GUARD_KEYS : GUARD_KEYS + 1] = guard
        dead = jnp.full(
            (b, _GUARD_OUT_LANES - GUARD_KEYS - 1), KEY_DEAD, jnp.float32
        )
        out_ref[:, GUARD_KEYS + 1 :] = dead


def _fused3_int8_kernel(
    nv_ref: Ref,
    q_ref: Ref,
    qs_ref: Ref,
    docs_ref: Ref,
    rs_ref: Ref,
    out_ref: Ref,
    acc_ref: Ref,
) -> None:
    """int8 variant: int8 x int8 MXU matmul with int32 accumulation; the
    f32 rescale happens per subtile at emit (see _fused2_int8_kernel)."""
    j = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _zero() -> None:
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.int32)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(c == nc - 1)
    def _emit() -> None:
        nv = nv_ref[0]  # int32: exact at ANY corpus size
        b = acc_ref.shape[0]
        qs = qs_ref[:]  # [b, 1] f32
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, GUARD_SUBTILE), 1
        ).astype(jnp.float32)
        guard = jnp.full((b, 1), KEY_DEAD, jnp.float32)
        for s in range(GUARD_NSUB):
            lo = s * GUARD_SUBTILE
            sub = (
                acc_ref[:, lo : lo + GUARD_SUBTILE].astype(jnp.float32)
                * rs_ref[:, lo : lo + GUARD_SUBTILE]
                * qs
            )
            live = jnp.clip(
                nv - (j * FUSED_BLOCK_N + lo), 0, GUARD_SUBTILE
            ).astype(jnp.float32)
            guard = _guard_emit(
                sub, lane, live, out_ref, s * GUARD_H, guard
            )
        out_ref[:, GUARD_KEYS : GUARD_KEYS + 1] = guard
        dead = jnp.full(
            (b, _GUARD_OUT_LANES - GUARD_KEYS - 1), KEY_DEAD, jnp.float32
        )
        out_ref[:, GUARD_KEYS + 1 :] = dead


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused3_extract(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Matmul + guarded per-subtile top-4 in one kernel; returns raw
    per-block out tiles ``[B, (N/FUSED_BLOCK_N)*128]`` (32 keys + guard +
    dead padding per block; decode via :func:`_fused3_finish`)."""
    n, d = docs.shape
    b = queries.shape[0]
    grid = (n // FUSED_BLOCK_N, d // DIM_CHUNK)
    out_shape = (b, (n // FUSED_BLOCK_N) * _GUARD_OUT_LANES)
    return pl.pallas_call(
        _fused3_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid [1] int32
            pl.BlockSpec((b, DIM_CHUNK), lambda j, c: (0, c)),
            pl.BlockSpec((FUSED_BLOCK_N, DIM_CHUNK), lambda j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((b, _GUARD_OUT_LANES), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, FUSED_BLOCK_N), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), queries, docs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused3_extract_int8(
    q_docs: jax.Array,
    row_scales: jax.Array,
    q_int8: jax.Array,
    q_scales: jax.Array,
    n_valid: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    n, d = q_docs.shape
    b = q_int8.shape[0]
    chunk = _int8_chunk(d)
    grid = (n // FUSED_BLOCK_N, d // chunk)
    out_shape = (b, (n // FUSED_BLOCK_N) * _GUARD_OUT_LANES)
    return pl.pallas_call(
        _fused3_int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, chunk), lambda j, c: (0, c)),
            pl.BlockSpec((b, 1), lambda j, c: (0, 0)),
            pl.BlockSpec((FUSED_BLOCK_N, chunk), lambda j, c: (j, c)),
            pl.BlockSpec((1, FUSED_BLOCK_N), lambda j, c: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, _GUARD_OUT_LANES), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, FUSED_BLOCK_N), jnp.int32)],
        interpret=interpret,
    )(
        jnp.asarray([n_valid], jnp.int32),
        q_int8,
        q_scales[:, None].astype(jnp.float32),
        q_docs,
        row_scales[None, :].astype(jnp.float32),
    )


def fused3_supported(n: int, d: int, b: int, c: int) -> bool:
    """Guarded-kernel dispatch predicate.  ``c`` is the CANDIDATE count
    (``RetrievalEngine.candidate_count``), not the final k.  Requirements:
    block-aligned corpus, enough FULL live blocks that the merged pool
    holds ``c`` live keys (each fully live block contributes its 32
    extracted keys), and ``c`` small enough that the guard bound reliably
    clears the rescore margin (``GUARD_MAX_C``).  The engine pads large
    packs to ``LARGE_ROW_MULTIPLE`` = 2 blocks, so up to TWO trailing
    blocks may be partially/fully padding — hence ``nb - 2``.  A caller
    violating even that (pool starved of live keys) is caught at
    runtime: dead markers reaching the selection force the bound to +inf
    (see ``_fused3_finish``).  There is no row ceiling at all: no
    ``n < 2^24`` correctness ceiling (rows are reconstructed in int32
    from (block, subtile, lane)), and the nb-scaled finish cost that
    briefly imposed a measured profitability ceiling at ~1120 blocks is
    gone — past ``GUARD_STAGE_MIN_BLOCKS`` the finish runs v2's pass-2
    staged reduce, and v3 then wins every measured shape through
    nb=4100 (13-35% bf16, 21-42% int8; benchmarks/tpu_v2v3_cross.py,
    BENCHMARKS.md 2026-08-19)."""
    return fused3_shape_ok(n, d, b, c) and b >= GUARD_MIN_BATCH


def fused3_shape_ok(n: int, d: int, b: int, c: int) -> bool:
    """STRUCTURAL v3 support: every soundness/layout requirement of
    :func:`fused3_supported` except the ``GUARD_MIN_BATCH`` batch floor —
    which is a pure performance crossover (point-measured on one v5e,
    see the constant's comment), not a correctness constraint.  The
    engine's auto-calibration (``engine.calibrate``) measures the live
    v2-vs-v3 crossover per (chip, shape-class) and may promote v3 below
    the static floor or demote it above; this predicate is the envelope
    those measured decisions must stay inside."""
    nb = n // FUSED_BLOCK_N
    return (
        n % FUSED_BLOCK_N == 0
        and d % DIM_CHUNK == 0
        and 0 < b <= FUSED_MAX_BATCH
        and nb >= 16
        and 0 < c <= min(GUARD_MAX_C, (nb - 2) * GUARD_KEYS)
    )


def _guard_key_vals(keys: jax.Array) -> jax.Array:
    """Decode v3 packed keys to quantized scores (within GUARD_KEY_EPS
    below the true score)."""
    vq = keys.astype(jnp.int32) // GUARD_SUBTILE
    return vq.astype(jnp.float32) / GUARD_QSCALE - KEY_BIAS


#: finish-stage strategy floor: at/above this block count the finish
#: runs v2's pass-2 staged reduce over the key array instead of one
#: lax.top_k over all nb*32 lanes — whose nb-scaled cost is what made
#: plain-finish v3 LOSE to v2 past ~1120 blocks (measured crossover,
#: benchmarks/tpu_v2v3_cross.py).  With the staged finish v3 wins every
#: measured shape through nb=4100 — 13-35% bf16, 21-42% int8
#: (BENCHMARKS.md 2026-08-19) — so fused3_supported carries no block
#: ceiling.  Below this floor the single top_k is already cheap and the
#: extra kernel dispatch isn't worth it — measured flip between nb=64
#: (staged +10% slower: 3.48 vs 3.17 ms) and nb=124 (staged 4% faster:
#: 5.78 vs 6.00, and the gap only widens with nb), b=256 c=400 bf16.
GUARD_STAGE_MIN_BLOCKS = 96


def _guard_reduce_h2(nb: int, c: int) -> int:
    """Staged-finish winners kept per 128-lane key group (= 4 blocks'
    keys): Poisson mean ``c`` over the groups plus four sigma plus
    slack, rounded up to a multiple of 8 (same sizing rule as v2's
    ``_reduce_h2``)."""
    groups = max(1, (nb * GUARD_KEYS) // REDUCE_GROUP)
    lam = c / groups
    h2 = lam + 4.0 * lam**0.5 + 8.0
    return int(-(-h2 // 8) * 8)


def _fused3_finish(
    out: jax.Array, c: int, b_real: int, interpret: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Merge + decode + bound for the guarded kernels.  ``out`` is the
    raw kernel output ``[B_pad, nb*128]``.  Returns ``(vals f32 [B, c],
    rows int32 [B, c], bound f32 [B])`` over the padded batch, where
    ``bound`` is a sound upper bound on the decoded prescore of every
    document NOT among the returned rows (+inf when key saturation makes
    the bound untrustworthy).  Row reconstruction is int32 — exact for
    any corpus size (no 2^24 ceiling).

    Large corpora (``nb >= GUARD_STAGE_MIN_BLOCKS``) route the merge
    through v2's pass-2 staged-reduce kernel (top-h2 per 128-lane group,
    re-keyed by position) before a small ``lax.top_k`` — the single
    ``top_k`` over all ``nb*32`` lanes is what made v3 lose to v2 past
    ~1120 blocks.  Soundness of the staged bound: re-keying perturbs a
    key by < REDUCE_GROUP (= 128 < GUARD_SUBTILE), so a key dropped at
    pass-2 decodes at most ONE 2^-12 grid step above its group's kept
    tail; tails feed the bound, and that step plus key rounding is
    exactly the GUARD_KEY_EPS = 2^-11 the engine already carries."""
    b_pad = out.shape[0]
    nb = out.shape[1] // _GUARD_OUT_LANES
    o3 = out.reshape(b_pad, nb, _GUARD_OUT_LANES)
    keys = o3[:, :, :GUARD_KEYS].reshape(b_pad, nb * GUARD_KEYS)
    h2 = _guard_reduce_h2(nb, c)
    staged = nb >= GUARD_STAGE_MIN_BLOCKS and h2 <= 48

    if staged:
        l1 = nb * GUARD_KEYS
        l1p = ((l1 + REDUCE_BLOCK - 1) // REDUCE_BLOCK) * REDUCE_BLOCK
        # pad with KEY_DEAD (not zeros): v3 keys clamp at score -3, so a
        # live key can decode below zero-key's -KEY_BIAS — dead markers
        # are the only value guaranteed to stay under every live key
        # (and under their own re-keyed forms: -2^24 + pos < -8.2M).
        keys1p = keys if l1p == l1 else jnp.concatenate(
            [keys, jnp.full((b_pad, l1p - l1), KEY_DEAD, jnp.float32)],
            axis=1,
        )
        keys2 = _reduce_keys(keys1p, h2, interpret=interpret)
        sel, cols2 = jax.lax.top_k(keys2, c)
        k2i = sel.astype(jnp.int32)
        lane2 = k2i - (k2i // REDUCE_GROUP) * REDUCE_GROUP
        pos = (cols2 // h2) * REDUCE_GROUP + lane2
        k1i = jnp.take_along_axis(keys1p, pos, axis=1).astype(jnp.int32)
        # decode from the re-keyed value: GUARD_SUBTILE = 8*REDUCE_GROUP,
        # so floor(k1/128)*128 + pos keeps the same quantized score field
        vals = _guard_key_vals(sel)
        lane = k1i - (k1i // GUARD_SUBTILE) * GUARD_SUBTILE
        cols = pos
        sat_key = jnp.max(keys, axis=1)  # pass-2 reorders; check globally
        dead_sel = jnp.min(k1i, axis=1).astype(jnp.float32) <= KEY_DEAD
        # keys dropped at pass-2 are bounded by their group's kept tail
        stage_tail = jnp.max(keys2[:, h2 - 1 :: h2], axis=1)
    else:
        sel, cols = jax.lax.top_k(keys, c)
        ki = sel.astype(jnp.int32)
        lane = ki - (ki // GUARD_SUBTILE) * GUARD_SUBTILE
        vals = _guard_key_vals(sel)
        sat_key = sel[:, 0]
        dead_sel = sel[:, -1] <= KEY_DEAD
        stage_tail = None

    jb = cols // GUARD_KEYS
    s = (cols - jb * GUARD_KEYS) // GUARD_H
    rows = jb * FUSED_BLOCK_N + s * GUARD_SUBTILE + lane
    # a dead/padding selection (pool-starved raw-op caller; bound is
    # already +inf for it) may reconstruct a position in the staged
    # path's REDUCE_BLOCK padding, i.e. past the corpus — keep the row
    # in-range so downstream gathers never index out of bounds
    rows = jnp.minimum(rows, nb * FUSED_BLOCK_N - 1)
    # hidden-score bound: docs dropped in-subtile are <= their subtile's
    # tail (<= the guard lane); extracted docs dropped at the merge are
    # <= the weakest merged key.  Decode sits within GUARD_KEY_EPS below
    # the true score — the engine's prescore_eps carries that term.
    guard_keys = jnp.max(o3[:, :, GUARD_KEYS], axis=1)
    bound = jnp.maximum(_guard_key_vals(guard_keys), vals[:, -1])
    if stage_tail is not None:
        bound = jnp.maximum(bound, _guard_key_vals(stage_tail))
    # keys at scores > ~2.5 may have lost f32 exactness (raw-op callers
    # only; unit-norm corpora never get here): refuse to certify
    bound = jnp.where(
        sat_key >= _GUARD_SAT_KEY, jnp.float32(jnp.inf), bound
    )
    # a dead marker reaching the selection means the live pool ran short
    # of c (a raw-op caller violating the engine's <=1-partial-block
    # padding contract that fused3_supported encodes): the emitted rows
    # would be fabrications, so refuse to certify anything.  Dead keys
    # are the strict minimum after the emit clamp, so any in-selection
    # lands in the last slot.
    bound = jnp.where(dead_sel, jnp.float32(jnp.inf), bound)
    return vals, rows, bound


def fused3_candidates(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    c: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Guarded candidate selection, unpacked: ``(quantized prescores f32
    [B, c], rows int32 [B, c], hidden-score bound f32 [B])``.

    Unlike :func:`fused2_topk` there is NO exactness fallback in-graph:
    the rows are the top-``c`` of the kernel-extracted pool, which may
    (rarely) miss true top-``c`` members — every miss is provably below
    ``bound + GUARD_KEY_EPS``, so a caller that verifies its final top-k
    against ``bound`` (the engine's rescore margin, ``kb.py:409-415``)
    gets verified-exact retrieval with a widen-and-retry on failure.
    Requires ``fused3_supported``."""
    n, d = docs.shape
    b = queries.shape[0]
    b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
    q = queries.astype(docs.dtype)
    if b_pad != b:
        q = jnp.concatenate([q, jnp.zeros((b_pad - b, d), q.dtype)], axis=0)
    out = _fused3_extract(docs, q, n_valid, interpret=interpret)
    vals, rows, bound = _fused3_finish(out, c, b, interpret=interpret)
    return vals[:b], rows[:b], bound[:b]


def fused3_candidates_int8(
    q_docs: jax.Array,
    row_scales: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    c: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """int8 guarded candidate selection; see :func:`fused3_candidates`.
    Requires ``fused3_supported``."""
    from .quant import quantize_rows_int8

    n, d = q_docs.shape
    b = queries.shape[0]
    b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
    if b_pad != b:
        queries = jnp.concatenate(
            [queries, jnp.zeros((b_pad - b, d), queries.dtype)], axis=0
        )
    q_int8, q_scales = quantize_rows_int8(queries)
    out = _fused3_extract_int8(
        q_docs, row_scales, q_int8, q_scales, n_valid, interpret=interpret
    )
    vals, rows, bound = _fused3_finish(out, c, b, interpret=interpret)
    return vals[:b], rows[:b], bound[:b]


@functools.partial(jax.jit, static_argnames=("k", "wide", "interpret"))
def score_topk_fused3_packed(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    wide: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Guarded single-kernel candidate selection, packed.  The wire's
    boundary slot (``vals[:, -1]`` — exactly what the margin proof reads)
    carries ``max(weakest candidate prescore, hidden-score bound)``, so
    the existing verified-rescore machinery proves exactness with no
    in-graph fallback.  Only sound under a rescore+margin caller.
    Requires ``fused3_supported``."""
    vals, rows, bound = fused3_candidates(
        docs, queries, n_valid, k, interpret=interpret
    )
    vals = jnp.concatenate(
        [vals[:, :-1], jnp.maximum(vals[:, -1:], bound[:, None])], axis=1
    )
    return pack_vals_idx(vals, rows, wide=wide)


@functools.partial(jax.jit, static_argnames=("k", "wide", "interpret"))
def score_topk_fused3_int8_packed(
    q_docs: jax.Array,
    row_scales: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    wide: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """int8 guarded packed path; see :func:`score_topk_fused3_packed`.
    Requires ``fused3_supported``."""
    vals, rows, bound = fused3_candidates_int8(
        q_docs, row_scales, queries, n_valid, k, interpret=interpret
    )
    vals = jnp.concatenate(
        [vals[:, :-1], jnp.maximum(vals[:, -1:], bound[:, None])], axis=1
    )
    return pack_vals_idx(vals, rows, wide=wide)


@functools.partial(
    jax.jit, static_argnames=("k", "score_dtype", "wide", "interpret")
)
def score_topk_extract_packed(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    score_dtype: str = "f32",
    wide: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused scoring + extraction selection + packing: ONE device dispatch.

    ``score_dtype='bf16'`` halves the score matrix's HBM round trip; the
    engine's prescore error bound covers the extra rounding, so rescore
    stays verified-exact.
    """
    scores = mask_cols(scores_matmul(docs, queries), n_valid)
    if score_dtype == "bf16":
        scores = scores.astype(jnp.bfloat16)
    vals, idx = extract_topk(scores, k, interpret=interpret)
    return pack_vals_idx(vals.astype(jnp.float32), idx, wide=wide)


# --- keyed extraction over precomputed scores (the pairwise path) ----------
#
# The blocked pairwise scan (ops.pairwise) materializes one [R, N] f32
# score block per R-row step and needs each row's top-m.  The v1 two-pass
# extraction (grid over 8-row groups, f32 max / index-recover / clear)
# measured 3.7 ms per [256, 100k] block on v5e — 85% of the whole
# pairwise pass (BENCHMARKS.md 2026-08-18 profile).  This kernel applies
# the v2 packed-key emit to a score INPUT instead of a fused accumulator,
# with the whole R-row batch resident: one max-reduce + one clear per
# winner on [R, 512] operands.  Quantization (KEY_EPS) is covered by the
# KB's pairwise rescore margin exactly like retrieval's keyed paths —
# see ``engine.RetrievalEngine.pairwise_eps``.

#: Score columns per grid step: [PAIR_MAX_ROWS, PAIR_BLOCK_N] f32 input
#: blocks are 4 MB — half the VMEM budget of the fused kernels' 8192
#: accumulator, leaving room for Mosaic's input double-buffering.
PAIR_BLOCK_N = 4096
PAIR_NSUB = PAIR_BLOCK_N // FUSED_SUBTILE  # 8 subtiles per block
#: Live key lanes per block (the rest of the 128-lane out tile is DEAD).
PAIR_KEYS = PAIR_NSUB * EXTRACT_H  # 64
_PAIR_OUT_LANES = 128
#: Row-batch ceiling (VMEM: rows x PAIR_BLOCK_N f32 must double-buffer).
PAIR_MAX_ROWS = 256
#: Mask value for dead score entries (diagonal/lower-triangle/padding)
#: fed to this kernel: finite (an f32 -inf would destroy the key's lane
#: bits), strictly below every real cosine score, and decoding to exactly
#: -2.0 — callers drop candidates below PAIR_LIVE_MIN.
PAIR_MASKED = -2.0
#: Decoded-value threshold separating real (unit-norm-domain) candidates
#: from PAIR_MASKED sentinels and KEY_DEAD padding.
PAIR_LIVE_MIN = -1.5


def _pair_keys_kernel(scores_ref: Ref, out_ref: Ref) -> None:
    r = scores_ref.shape[0]
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (r, FUSED_SUBTILE), 1
    ).astype(jnp.float32)
    live = jnp.float32(FUSED_SUBTILE)  # masking happened in the scores
    for s in range(PAIR_NSUB):
        _emit_keys(
            scores_ref[:, s * FUSED_SUBTILE : (s + 1) * FUSED_SUBTILE],
            lane,
            live,
            out_ref,
            s * EXTRACT_H,
        )
    out_ref[:, PAIR_KEYS:] = jnp.full(
        (r, _PAIR_OUT_LANES - PAIR_KEYS), KEY_DEAD, jnp.float32
    )


def pair_keys_supported(n_cols: int, rows: int) -> bool:
    """Shapes :func:`pairwise_keys_extract` handles: 4096-aligned score
    columns (the engine pads large packs to 16384-row multiples, so every
    corpus past ``packing.LARGE_ROW_MULTIPLE`` qualifies) and a resident
    row batch within the VMEM budget."""
    return (
        n_cols % PAIR_BLOCK_N == 0
        and n_cols >= PAIR_BLOCK_N
        and rows % 8 == 0
        and 0 < rows <= PAIR_MAX_ROWS
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_keys_extract(
    scores: jax.Array, interpret: bool = False
) -> jax.Array:
    """Per-512-subtile top-``EXTRACT_H`` packed keys of an ``[R, N]`` f32
    score matrix.  Returns ``[R, (N/PAIR_BLOCK_N) * 128]`` raw key tiles:
    per block, lanes ``[0, PAIR_KEYS)`` hold the 8 subtiles' descending
    top-8 keys and the rest are ``KEY_DEAD``.  Scores must be finite and
    within the key horizon (unit-norm cosine domain; mask dead entries
    with :data:`PAIR_MASKED`, never ``-inf``).  Decode keys with
    ``_key_vals``; column reconstruction is
    ``block*PAIR_BLOCK_N + subtile*512 + (key mod 512)``.
    Requires :func:`pair_keys_supported`."""
    r, n = scores.shape
    assert pair_keys_supported(n, r), (n, r)
    nbc = n // PAIR_BLOCK_N
    return pl.pallas_call(
        _pair_keys_kernel,
        grid=(nbc,),
        in_specs=[pl.BlockSpec((r, PAIR_BLOCK_N), lambda j: (0, j))],
        out_specs=pl.BlockSpec((r, _PAIR_OUT_LANES), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((r, nbc * _PAIR_OUT_LANES), jnp.float32),
        interpret=interpret,
    )(scores)
