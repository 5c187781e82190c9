"""Exact cosine scoring + top-k on device (single chip).

The retrieval hot path is two fused stages under one ``jit``:

1. ``scores = docs @ queries.T`` — one MXU matmul over the HBM-resident
   corpus (bf16 or f32 storage, always f32 accumulation via
   ``preferred_element_type``), replacing the reference's NumPy GEMV
   (``svs/kb.py:1185``).
2. masked top-k — padding rows (index >= n_valid) are forced to ``-inf``
   before selection, so padding can never appear in results.

Shapes are static: corpora are padded to tile multiples at pack time and
``k`` is a Python int (jit caches one executable per distinct ``k``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def scores_matmul(docs: jax.Array, queries: jax.Array) -> jax.Array:
    """Cosine scores of every (query, doc) pair: ``[B, N]`` f32.

    ``docs`` is ``[N, d]`` (any float dtype), ``queries`` is ``[B, d]``.
    Because stored vectors are unit-norm, the plain dot product *is* the
    cosine similarity.

    Queries are cast to the docs' storage dtype so a bf16 corpus runs a
    bf16xbf16 MXU matmul (half the HBM traffic) instead of being silently
    promoted to f32; accumulation stays f32 either way.
    """
    if docs.dtype != queries.dtype and jnp.issubdtype(docs.dtype, jnp.floating):
        queries = queries.astype(docs.dtype)
    return jax.lax.dot_general(
        queries,
        docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def masked_topk(
    scores: jax.Array, k: int, n_valid: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the last axis of ``scores`` with positions >= ``n_valid``
    masked out.  Returns ``(values f32, indices int32)``."""
    n = scores.shape[-1]
    live = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    masked = jnp.where(live < n_valid, scores, NEG_INF)
    return jax.lax.top_k(masked, k)


@functools.partial(jax.jit, static_argnames=("k",))
def score_topk(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Fused scoring + exact top-k: ``[B, k]`` values and indices."""
    scores = scores_matmul(docs, queries)
    return masked_topk(scores, k, n_valid)


def verified_topk(
    scores: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """**Verified-exact** fast top-k over pre-masked ``[B, N]`` scores.

    ``lax.top_k`` on TPU is far from memory-bound for large score vectors
    (hundreds of microseconds per 1M-row query).  This path instead uses the
    TPU-optimized ``lax.approx_max_k`` (PartialReduce) to pull an
    over-provisioned candidate set, then *proves* exactness with one cheap
    counting pass:

      let v = the k-th largest candidate value.  If the number of elements
      STRICTLY greater than v matches between the candidate set and the
      full array, then no element above v was missed; the candidate top-k
      (all elements > v, padded to k with v-valued ties) has exactly the
      true top-k score multiset.  Ties at v itself are interchangeable, so
      the strict comparison keeps the proof robust on tie-heavy corpora
      (an ``>=`` version falls back almost always when scores repeat).

    If the check fails for any query in the batch (probability ~0 at 4x
    over-provisioning), fall back to full ``lax.top_k`` inside ``lax.cond``
    — so the result is always exact, and the fast path is just a fast path.
    """
    n = scores.shape[-1]
    c_width = min(n, max(4 * k, k + 128))
    if c_width >= n:  # tiny corpus: nothing to accelerate
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx

    # High recall target: at 0.95 the expected misses land above the k-th
    # candidate often enough that the proof fails (and the fallback runs)
    # for ~half of realistic queries, making the "fast" path pay for both
    # stages.  0.999 keeps PartialReduce cheap and the proof almost always
    # passing.
    cand_v, cand_i = jax.lax.approx_max_k(
        scores, c_width, recall_target=0.999, aggregate_to_topk=True
    )
    kth = cand_v[:, k - 1 : k]  # [B, 1] (sorted desc by aggregate_to_topk)
    in_cand = jnp.sum((cand_v > kth).astype(jnp.int32), axis=1)
    in_all = jnp.sum((scores > kth).astype(jnp.int32), axis=1)
    all_covered = jnp.all(in_cand == in_all)

    def from_candidates(_):
        vals, pos = jax.lax.top_k(cand_v, k)
        return vals, jnp.take_along_axis(cand_i, pos, axis=1)

    def full_fallback(_):
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx

    return jax.lax.cond(all_covered, from_candidates, full_fallback, None)


@functools.partial(jax.jit, static_argnames=("k",))
def score_topk_fast(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Fused scoring + :func:`verified_topk` selection."""
    scores = scores_matmul(docs, queries)
    live = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    scores = jnp.where(live < n_valid, scores, NEG_INF)
    return verified_topk(scores, k)


def pack_vals_idx(vals: jax.Array, idx: jax.Array, wide: bool = False) -> jax.Array:
    """Scores ++ indices in ONE array so a single host fetch retrieves both.

    Default layout (f32): indices travel as exact f32 *values* — exact
    below 2^24 rows.  (Bitcasting f32 score bits into small ints instead
    would produce denormals, which some transports flush to zero.)

    ``wide`` layout (int32): score f32 bits are bitcast into an int32
    array and concatenated with raw int32 indices — exact for any corpus
    size, at the cost of the host-side bitcast back.  Integer wire dtypes
    carry arbitrary bit patterns safely (no denormal flushing).
    """
    if wide:
        return jnp.concatenate(
            [jax.lax.bitcast_convert_type(vals, jnp.int32), idx], axis=1
        )
    return jnp.concatenate([vals, idx.astype(jnp.float32)], axis=1)


def unpack_vals_idx(
    packed: "jnp.ndarray", k: int, wide: bool = False
):
    """Host-side inverse of :func:`pack_vals_idx` on a fetched ndarray:
    returns ``(scores f32 [B, k], rows int64 [B, C-k])``."""
    import numpy as np

    packed = np.asarray(packed)
    if wide:
        vals = np.ascontiguousarray(packed[:, :k]).view(np.float32)
        rows = packed[:, k:].astype(np.int64)
    else:
        vals = packed[:, :k].astype(np.float32, copy=False)
        rows = packed[:, k:].astype(np.int64)
    return vals, rows


@functools.partial(jax.jit, static_argnames=("k", "wide"))
def score_topk_packed(
    docs: jax.Array,
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    wide: bool = False,
) -> jax.Array:
    """:func:`score_topk` + result packing in ONE device dispatch —
    the engine's hot path (every separate dispatch is a full RPC round
    trip on tunneled devices)."""
    return pack_vals_idx(*score_topk(docs, queries, n_valid, k), wide=wide)


def merge_topk(
    values: jax.Array, indices: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge candidate sets along the last axis into one exact top-k.

    ``values``/``indices`` are ``[..., C]`` with C >= k (e.g. concatenated
    per-shard or per-block winners).  Exactness: any global top-k element is
    present in the union of per-source top-k sets, so re-selecting over the
    union is exact.
    """
    top_vals, top_pos = jax.lax.top_k(values, k)
    top_idx = jnp.take_along_axis(indices, top_pos, axis=-1)
    return top_vals, top_idx
