"""Corpus-sharded exact retrieval over a device mesh.

Design (net-new vs the reference; see SURVEY.md sections 2.3/5):

- the packed corpus is sharded row-wise along the ``data`` mesh axis (and
  optionally column-wise along a ``model`` axis for very wide embeddings);
- under ``shard_map``, every chip scores **only its shard** (one local MXU
  matmul, full local HBM bandwidth), masks padding by *global* row index,
  and selects a local top-k;
- only ``k`` candidates per chip leave the chip; the exact global top-k is
  a merge over those ``D * k`` candidates.  Exactness: each global top-k hit
  lives in some shard and is therefore in that shard's local top-k;
- with a ``model`` axis, partial dot products are reduced with one
  ``psum`` over ICI before selection.

Per-shard winners are returned from ``shard_map`` stacked along the data
axis and merged in plain jit-land, so the result needs no replication
bookkeeping inside the mapped function.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.quant import quantize_rows_int8
from ..ops.topk import NEG_INF, merge_topk, scores_matmul


def sharded_score_topk(
    docs: jax.Array,
    row_scales: Optional[jax.Array],
    queries: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    mesh: jax.sharding.Mesh,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    keyed: bool = False,
    guarded: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-``k`` over a mesh-sharded corpus.

    ``docs``: ``[N, d]`` sharded ``P(data_axis, model_axis)``;
    ``row_scales``: ``[N]`` f32 for int8 corpora (data-axis sharded) or
    ``None``; ``queries``: ``[B, d]``.  Returns replicated
    ``(values f32 [B, k], global row indices int32 [B, k])``.

    ``keyed=True`` runs each shard through the keyed (v2) fused kernels —
    matmul + packed-key selection in ONE kernel, per-shard score matrix
    never touching HBM (the flagship single-chip path, per chip).
    Returned values are then quantized prescores within ``KEY_EPS`` below
    the true score; callers pair it with the verified rescore exactly as
    on a single chip (``RetrievalEngine.prescore_eps`` adds the KEY_EPS
    term whenever this dispatch is possible).  Requires data-axis-only
    sharding and per-shard ``fused2_supported`` shapes — the engine's
    ``_keyed_selection_possible`` is the gate.

    ``guarded=True`` runs each shard through the guarded (v3) kernels
    instead — batched selection with half v2's emit reduces; each shard
    returns candidates plus a sound per-query bound on every hidden
    (non-extracted) prescore in its row range, and the merged boundary
    slot becomes ``max(weakest merged candidate, max over shards of the
    per-shard bounds)`` — exactly the composition the single-chip wire
    carries (``ops.pallas_extract.score_topk_fused3_packed``), so the
    engine's rescore margin proof reads it unchanged.  Only sound under
    the verified rescore + widen machinery; the engine's
    ``_guarded_selection_possible`` is the gate (data-axis-only,
    per-shard ``fused3_supported`` shapes, ``b >= GUARD_MIN_BATCH``).
    """
    if row_scales is not None and model_axis is not None:
        raise NotImplementedError(
            "int8 corpora shard over the data axis only (per-query scales "
            "must see the full query vector)"
        )
    if (keyed or guarded) and model_axis is not None:
        raise NotImplementedError(
            "keyed/guarded per-shard selection needs each shard's full "
            "dot products (data-axis-only sharding)"
        )
    fn = _build_sharded_topk(
        mesh, data_axis, model_axis, int(k), row_scales is not None, keyed,
        guarded,
    )
    if row_scales is not None:
        return fn(docs, row_scales, queries, n_valid)
    return fn(docs, queries, n_valid)


@functools.lru_cache(maxsize=None)
def _build_sharded_topk(
    mesh: jax.sharding.Mesh,
    data_axis: str,
    model_axis: Optional[str],
    k: int,
    has_scales: bool,
    keyed: bool = False,
    guarded: bool = False,
) -> "Any":
    def local_topk(
        docs: jax.Array,
        scales: Optional[jax.Array],
        q: jax.Array,
        n_valid: jax.Array,
    ) -> Tuple[jax.Array, ...]:
        n_local = docs.shape[0]
        k_local = min(k, n_local)
        on_cpu = jax.default_backend() == "cpu"
        offset = jax.lax.axis_index(data_axis).astype(jnp.int32) * n_local

        if guarded:
            # Guarded (v3) kernels per shard: candidates + a sound bound
            # on every prescore hidden in this shard's row range (see
            # ops.pallas_extract "guarded fused kernels").  The bound
            # rides back as a third per-shard output; ``merged`` folds
            # the max across shards into the wire's boundary slot.
            from ..ops.pallas_extract import (
                fused3_candidates,
                fused3_candidates_int8,
            )

            nv_local = jnp.clip(
                n_valid.astype(jnp.int32) - offset, 0, n_local
            )
            if has_scales:
                vals, rows, bound = fused3_candidates_int8(
                    docs, scales, q, nv_local, k_local, interpret=on_cpu
                )
            else:
                vals, rows, bound = fused3_candidates(
                    docs, q, nv_local, k_local, interpret=on_cpu
                )
            gidx = rows.astype(jnp.int32) + offset
            return vals[None], gidx[None], bound[None]

        if keyed:
            # Keyed fused kernels per shard: one kernel does matmul +
            # packed-key selection; the [B, N/D] score matrix never
            # exists in HBM (≈2x less per-shard HBM traffic than the
            # materialize-then-extract path below).  Shard rows are a
            # globally contiguous range, so this shard's live prefix is
            # clip(n_valid - offset, 0, n_local).
            from ..ops.pallas_extract import fused2_topk, fused2_topk_int8

            nv_local = jnp.clip(
                n_valid.astype(jnp.int32) - offset, 0, n_local
            )
            if has_scales:
                vals, idx = fused2_topk_int8(
                    docs, scales, q, nv_local, k_local, interpret=on_cpu
                )
            else:
                vals, idx = fused2_topk(
                    docs, q, nv_local, k_local, interpret=on_cpu
                )
            gidx = idx.astype(jnp.int32) + offset
            return vals[None], gidx[None]

        if model_axis is None:
            from ..ops.topk import FALLBACK_SCORES_BUDGET, streaming_score_topk

            if q.shape[0] * n_local * 4 > FALLBACK_SCORES_BUDGET:
                # The materializing path below allocates a [B, N/D] f32
                # score matrix PER SHARD — at [256, 2^24] that is 17 GB
                # and fails compile on a 16 GB chip.  Stream row blocks
                # instead (exact, same tie rule, O(B x block) memory).
                nv_local = jnp.clip(
                    n_valid.astype(jnp.int32) - offset, 0, n_local
                )
                vals, idx = streaming_score_topk(
                    docs, q, nv_local, k_local,
                    row_scales=scales if has_scales else None,
                )
                return vals[None], (idx + offset)[None]

        if has_scales:
            q_int8, q_scales = quantize_rows_int8(q)
            raw = jax.lax.dot_general(
                q_int8,
                docs,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = raw.astype(jnp.float32) * scales[None, :] * q_scales[:, None]
        else:
            scores = scores_matmul(docs, q)
            if model_axis is not None:
                scores = jax.lax.psum(scores, model_axis)
        global_col = offset + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, scores.ndim - 1
        )
        masked = jnp.where(global_col < n_valid, scores, NEG_INF)
        from ..ops.pallas_extract import extract_supported, extract_topk

        if extract_supported(n_local, q.shape[0], k_local):
            # Per-shard selection through the tile-extraction kernel —
            # the same ~7x over lax.top_k as single-chip, and it runs
            # concurrently on every chip (see ops/pallas_extract.py).
            vals, idx = extract_topk(masked, k_local, interpret=on_cpu)
        else:
            vals, idx = jax.lax.top_k(masked, k_local)
        gidx = idx.astype(jnp.int32) + offset
        # Stack per-shard winners along a leading data-axis dim.
        return vals[None], gidx[None]

    if has_scales:
        in_specs = (P(data_axis, model_axis), P(data_axis), P(None, model_axis), P())
        def mapped(
            docs: jax.Array, scales: jax.Array, q: jax.Array, n_valid: jax.Array
        ) -> Tuple[jax.Array, ...]:
            return local_topk(docs, scales, q, n_valid)
    else:
        in_specs = (P(data_axis, model_axis), P(None, model_axis), P())
        def mapped(
            docs: jax.Array, q: jax.Array, n_valid: jax.Array
        ) -> Tuple[jax.Array, ...]:
            return local_topk(docs, None, q, n_valid)

    out_specs: Tuple[P, ...] = (P(data_axis, None, None), P(data_axis, None, None))
    if guarded:
        out_specs = out_specs + (P(data_axis, None),)
    shard_fn = jax.shard_map(
        mapped,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )

    def merged(*args: jax.Array) -> Tuple[jax.Array, jax.Array]:
        out = shard_fn(*args)
        vals, gidx = out[0], out[1]  # [D, B, k_local]
        b = vals.shape[1]
        vals = jnp.moveaxis(vals, 0, 1).reshape(b, -1)
        gidx = jnp.moveaxis(gidx, 0, 1).reshape(b, -1)
        mvals, midx = merge_topk(vals, gidx, k)
        if guarded:
            # A doc missing from the merged set was either never
            # extracted in its shard (<= that shard's bound) or dropped
            # at the merge (<= the merged k-th value), so this boundary
            # upper-bounds every hidden prescore globally — the same
            # composition score_topk_fused3_packed writes single-chip.
            gbound = jnp.max(out[2], axis=0)  # [B]
            mvals = jnp.concatenate(
                [mvals[:, :-1], jnp.maximum(mvals[:, -1:], gbound[:, None])],
                axis=1,
            )
        return mvals, midx

    return jax.jit(merged)


def sharded_rescore_final(
    packed: jax.Array,
    mirror: jax.Array,
    dev_emb: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    wide: bool,
    mesh: jax.sharding.Mesh,
    data_axis: str = "data",
    dim: Optional[int] = None,
) -> jax.Array:
    """Mesh analog of the engine's on-device rescore + final selection
    (``engine.index._final_from_packed``): the exact f32 rescore of the
    merged candidates runs WHERE THE ROWS LIVE — each shard gathers the
    candidate rows in its global range from its slice of the f32 mirror,
    computes partial exact dots, and one ``psum`` over ICI produces the
    replicated exact scores; the final top-k selection (reference tie
    rule) then runs replicated, and the caller fetches one compact
    ``[B, 2k+1]`` int32 wire.  Only candidate metadata crosses ICI —
    never embedding vectors.

    ``packed``: replicated prescore wire from :func:`sharded_score_topk`
    via ``pack_vals_idx`` (scores ++ GLOBAL row indices);
    ``mirror``: ``[N_padded, dim]`` f32 in pack-row order, sharded
    ``P(data_axis)``; ``dev_emb``: ``[N_padded]`` int32 emb ids in
    pack-row order, replicated; ``queries``: ``[B, dim_padded]`` f32
    replicated.
    """
    fn = _build_sharded_rescore_final(
        mesh, data_axis, int(k), bool(wide),
        None if dim is None else int(dim),
    )
    return fn(packed, mirror, dev_emb, queries)


@functools.lru_cache(maxsize=None)
def _build_sharded_rescore_final(
    mesh: jax.sharding.Mesh,
    data_axis: str,
    k: int,
    wide: bool,
    dim: Optional[int],
) -> "Any":
    def local_partial(
        mirror: jax.Array, rows: jax.Array, q: jax.Array
    ) -> jax.Array:
        n_local = mirror.shape[0]
        offset = jax.lax.axis_index(data_axis).astype(jnp.int32) * n_local
        lr = rows - offset
        valid = (lr >= 0) & (lr < n_local)
        cand = mirror[jnp.clip(lr, 0, n_local - 1)]  # [B, C, d] local HBM
        # HIGHEST: exact-f32 rescore partials (the margin proof's ground
        # truth) — default MXU passes err ~2.6e-4 on f32 operands (see
        # ops.topk.f32_dot_precision).
        partial = jax.lax.dot_general(
            cand,
            q,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        partial = jnp.where(valid, partial, 0.0)
        return jax.lax.psum(partial, data_axis)

    shard_fn = jax.shard_map(
        local_partial,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(None, None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )

    def final(
        packed: jax.Array,
        mirror: jax.Array,
        dev_emb: jax.Array,
        queries: jax.Array,
    ) -> jax.Array:
        from ..ops.topk import final_select_wire, unpack_rows_tail

        if dim is not None and dim != queries.shape[1]:
            queries = queries[:, :dim]
        rows, tail_bits = unpack_rows_tail(packed, packed.shape[1] // 2, wide)
        exact = shard_fn(mirror, rows, queries)  # [B, C] replicated
        emb_of = dev_emb[rows]  # [B, C] int32
        return final_select_wire(exact, emb_of, tail_bits, k)

    return jax.jit(final)


def sharded_subset_topk(
    mirror: jax.Array,
    dev_emb: jax.Array,
    rows: jax.Array,
    n_live: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    mesh: jax.sharding.Mesh,
    data_axis: str = "data",
    dim: Optional[int] = None,
) -> jax.Array:
    """Mesh analog of the engine's pre-filter fast path
    (``engine.index._subset_final``): exact top-``k`` over an EXPLICIT
    pack-row subset, computed where the rows live.  Each shard gathers
    the subset rows in its global range from its slice of the f32
    mirror and computes partial exact dots (``HIGHEST``); one ``psum``
    over ICI replicates the full ``[B, F]`` exact score matrix; the
    final tie-rule selection runs replicated and the caller fetches one
    compact ``[B, 2k+1]`` wire.  Only the tiny row-index vector and the
    ``[B, F]`` partials cross ICI — never embedding vectors.

    ``mirror``: ``[N_padded, dim]`` f32 in pack-row order, sharded
    ``P(data_axis)``; ``dev_emb``: ``[N_padded]`` int32 emb ids in
    pack-row order, replicated; ``rows``: ``[F_pad]`` int32 pack rows
    (padding repeats row 0 — masked via ``n_live``), replicated;
    ``queries``: ``[B, dim_padded]`` f32 replicated."""
    fn = _build_sharded_subset(
        mesh, data_axis, int(k), None if dim is None else int(dim)
    )
    return fn(mirror, dev_emb, rows, n_live, queries)


@functools.lru_cache(maxsize=None)
def _build_sharded_subset(
    mesh: jax.sharding.Mesh,
    data_axis: str,
    k: int,
    dim: Optional[int],
) -> "Any":
    def local_partial(
        mirror: jax.Array, rows: jax.Array, q: jax.Array
    ) -> jax.Array:
        n_local = mirror.shape[0]
        offset = jax.lax.axis_index(data_axis).astype(jnp.int32) * n_local
        lr = rows - offset  # [F]
        valid = (lr >= 0) & (lr < n_local)
        cand = mirror[jnp.clip(lr, 0, n_local - 1)]  # [F, d] local HBM
        # HIGHEST: these ARE the returned scores (same contract as the
        # single-chip _subset_final).
        partial = jax.lax.dot_general(
            q,
            cand,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, F]
        partial = jnp.where(valid[None, :], partial, 0.0)
        return jax.lax.psum(partial, data_axis)

    shard_fn = jax.shard_map(
        local_partial,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )

    def final(
        mirror: jax.Array,
        dev_emb: jax.Array,
        rows: jax.Array,
        n_live: jax.Array,
        queries: jax.Array,
    ) -> jax.Array:
        from ..ops.topk import final_select_wire

        if dim is not None and dim != queries.shape[1]:
            queries = queries[:, :dim]
        exact = shard_fn(mirror, rows, queries)  # [B, F] replicated
        live = (
            jnp.arange(rows.shape[0], dtype=jnp.int32)[None, :] < n_live
        )
        exact = jnp.where(live, exact, -jnp.inf)
        emb_of = dev_emb[rows]  # [F] int32 (padding masked via -inf)
        emb_b = jnp.broadcast_to(emb_of[None, :], exact.shape)
        tail = jnp.zeros((exact.shape[0], 1), dtype=jnp.int32)
        return final_select_wire(exact, emb_b, tail, k)

    return jax.jit(final)
