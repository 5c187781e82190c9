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
