"""Round-3 guarded-kernel width shootout: can narrower subtiles beat v3?

The production v3 guarded kernel (``ops/pallas_extract.py``) extracts
top-4 per 1024-lane subtile: 32 max-reduces @1024 lanes per 8192-doc
block, plus 32 clear passes @1024.  The round-2 cost model
(``tpu_select8.py``) measured max-reduce cost roughly flat up to 512
lanes and ~2x at 1024, with reduce COUNT the dominant term.  That
suggests **top-2 per 512-lane subtile**: the same 32 reduces per block
but at half width, only 16 clear passes (the last extraction of a
subtile needs no clear), the same 32 keys per block (identical merge
width), and a finer key grid (QSCALE 2^13 at 512 lanes vs 2^12 at
1024 — tighter GUARD_KEY_EPS).

The trade is bound quality: the hidden-score bound becomes
max-over-subtiles of the 2nd-best-of-512 instead of 4th-best-of-1024.
For any fixed 1024 lanes split in half, max(2nd of each half) >= the
overall 3rd (pigeonhole on the top-3), so the bound is ~one rank
weaker — more margin failures on adversarial score clusters, same
behavior on spread-out corpora.  This bench measures both sides:

  A. production v3 packed path (1024/H=4)      — baseline
  B. prototype  512/H=2  (32 keys/block)       — the candidate
  C. prototype  512/H=3  (48 keys/block)       — stronger bound, +50%
                                                  reduces, same merge pad
  D. matmul-only floor for this grid
plus per-variant soundness vs the exact oracle and the margin slack
(bound vs oracle k-th) on BOTH a random corpus and a planted hot
subtile (100 near-top docs in one 512-lane span — the adversarial case
for subtile-tail bounds).

Run on the TPU box: python benchmarks/tpu_select10.py
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path
from typing import Callable, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svs_tpu.ops.pallas_extract import (
    GUARD_KEY_EPS,
    fused3_supported,
    score_topk_fused3_packed,
)

#: SVS_SELECT10_SMOKE=1: tiny shapes + interpret mode — correctness-only
#: sanity on the CPU backend before burning TPU time.
SMOKE = bool(os.environ.get("SVS_SELECT10_SMOKE"))
if SMOKE:
    N, D = 8192 * 20, 256
    K = 50
else:
    N, D = 1_015_808, 1536
    K = 400
NV = N - 100
FUSED_BLOCK_N = 8192
DIM_CHUNK = 128
KEY_BIAS = 1.0625
KEY_DEAD = -float(1 << 24)
QBLOCK = 8


def make_variant(
    subtile: int, h: int, qscale: float
) -> Tuple[Callable, Callable, float]:
    """Build (candidates_fn, packed_fn, key_eps) for a guarded-extraction
    prototype with the given subtile width and winners-per-subtile."""
    nsub = FUSED_BLOCK_N // subtile
    keys_pb = nsub * h
    out_lanes = ((keys_pb + 1 + 127) // 128) * 128
    key_eps = 1.0 / qscale
    sat_key = float(int((2.5 + KEY_BIAS) * qscale) * subtile)
    # Keys must be exact f32 integers for all scores the saturation
    # guard certifies (< 2.5); clamped-higher keys only need to stay
    # >= sat_key, which f32 rounding preserves (production invariant).
    assert (2.5 + KEY_BIAS) * qscale * subtile < float(1 << 24), (
        "certified keys must stay exact f32 integers"
    )

    def emit(scores, lane, live, out_ref, col0, guard):
        keys = (
            jnp.floor((jnp.clip(scores, -3.0, 3.0) + KEY_BIAS) * qscale)
            * float(subtile)
            + lane
        )
        keys = jnp.where(lane < live, keys, KEY_DEAD)
        mkey = keys[:, :1]
        for i in range(h):
            mkey = jnp.max(keys, axis=1, keepdims=True)
            out_ref[:, col0 + i : col0 + i + 1] = mkey
            if i < h - 1:
                keys = jnp.where(keys == mkey, KEY_DEAD, keys)
        return jnp.maximum(guard, mkey)

    def kernel(nv_ref, q_ref, docs_ref, out_ref, acc_ref):
        j = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(c == 0)
        def _zero():
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

        acc_ref[:] += jax.lax.dot_general(
            q_ref[:],
            docs_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == nc - 1)
        def _emit():
            nv = nv_ref[0]
            b = acc_ref.shape[0]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (b, subtile), 1
            ).astype(jnp.float32)
            guard = jnp.full((b, 1), KEY_DEAD, jnp.float32)
            for s in range(nsub):
                lo = s * subtile
                live = jnp.clip(
                    nv - (j * FUSED_BLOCK_N + lo), 0, subtile
                ).astype(jnp.float32)
                guard = emit(
                    acc_ref[:, lo : lo + subtile],
                    lane,
                    live,
                    out_ref,
                    s * h,
                    guard,
                )
            out_ref[:, keys_pb : keys_pb + 1] = guard
            out_ref[:, keys_pb + 1 :] = jnp.full(
                (b, out_lanes - keys_pb - 1), KEY_DEAD, jnp.float32
            )

    @jax.jit
    def extract(docs, q, nv):
        n, d = docs.shape
        b = q.shape[0]
        grid = (n // FUSED_BLOCK_N, d // DIM_CHUNK)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((b, DIM_CHUNK), lambda j, c: (0, c)),
                pl.BlockSpec(
                    (FUSED_BLOCK_N, DIM_CHUNK), lambda j, c: (j, c)
                ),
            ],
            out_specs=pl.BlockSpec((b, out_lanes), lambda j, c: (0, j)),
            out_shape=jax.ShapeDtypeStruct(
                (b, (n // FUSED_BLOCK_N) * out_lanes), jnp.float32
            ),
            scratch_shapes=[pltpu.VMEM((b, FUSED_BLOCK_N), jnp.float32)],
            interpret=SMOKE,
        )(jnp.asarray([nv], jnp.int32), q, docs)

    def key_vals(keys):
        vq = keys.astype(jnp.int32) // subtile
        return vq.astype(jnp.float32) / qscale - KEY_BIAS

    def finish(out, c):
        b_pad = out.shape[0]
        nb = out.shape[1] // out_lanes
        o3 = out.reshape(b_pad, nb, out_lanes)
        keys = o3[:, :, :keys_pb].reshape(b_pad, nb * keys_pb)
        sel, cols = jax.lax.top_k(keys, c)
        ki = sel.astype(jnp.int32)
        lane = ki - (ki // subtile) * subtile
        vals = key_vals(sel)
        jb = cols // keys_pb
        s = (cols - jb * keys_pb) // h
        rows = jb * FUSED_BLOCK_N + s * subtile + lane
        guard_keys = jnp.max(o3[:, :, keys_pb], axis=1)
        bound = jnp.maximum(key_vals(guard_keys), vals[:, -1])
        bound = jnp.where(
            sel[:, 0] >= sat_key, jnp.float32(jnp.inf), bound
        )
        bound = jnp.where(
            sel[:, -1] <= KEY_DEAD, jnp.float32(jnp.inf), bound
        )
        return vals, rows, bound

    def candidates(docs, q, nv, c):
        b = q.shape[0]
        b_pad = max(QBLOCK, ((b + QBLOCK - 1) // QBLOCK) * QBLOCK)
        qq = q.astype(docs.dtype)
        if b_pad != b:
            qq = jnp.concatenate(
                [qq, jnp.zeros((b_pad - b, docs.shape[1]), qq.dtype)], 0
            )
        vals, rows, bound = finish(extract(docs, qq, nv), c)
        return vals[:b], rows[:b], bound[:b]

    @functools.partial(jax.jit, static_argnames=("c",))
    def packed(docs, q, nv, c):
        vals, rows, bound = candidates(docs, q, nv, c)
        vals = jnp.concatenate(
            [vals[:, :-1], jnp.maximum(vals[:, -1:], bound[:, None])], 1
        )
        both = jnp.stack([vals, rows.astype(jnp.float32)], axis=1)
        return both  # wire shape irrelevant for timing; forces both live

    return candidates, packed, key_eps


@jax.jit
def synth(_):
    r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    x = x - jnp.floor(x) - 0.5
    x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x.astype(jnp.bfloat16)


@jax.jit
def oracle_topk(docs, q):
    scores = jax.lax.dot_general(
        q,
        docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < NV
    scores = jnp.where(mask, scores, -jnp.inf)
    return jax.lax.top_k(scores, min(100, K))


@jax.jit
def matmul_floor(docs, q, nv):
    s = jax.lax.dot_general(
        q,
        docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.max(s, axis=1)


def chained(fn, length):
    @jax.jit
    def f(*args):
        q = args[1]

        def body(i, qc):
            out = fn(args[0], qc, *args[2:])
            return qc + 0.0 * out.reshape(-1)[0].astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        return fn(args[0], qf, *args[2:]).reshape(-1)[:1]

    return f


def time_case(label, fn, args, iters=11, reps=5):
    short, long_ = chained(fn, 1), chained(fn, iters)
    np.asarray(short(*args))
    np.asarray(long_(*args))
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(short(*args))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(long_(*args))
        tl = time.perf_counter() - t0
        runs.append(max(0.0, (tl - ts) / (iters - 1)))
    runs.sort()
    print(
        f"{label:22}: median {runs[len(runs) // 2] * 1e3:7.3f} ms "
        f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f})",
        flush=True,
    )
    return runs[len(runs) // 2]


def soundness(label, cand_fn, key_eps, docs, q8):
    vals, rows, bound = cand_fn(docs, q8, jnp.int32(NV), K)
    ovals, orows = oracle_topk(docs, q8.astype(jnp.bfloat16))
    vals, rows, bound = (
        np.asarray(vals),
        np.asarray(rows),
        np.asarray(bound),
    )
    ovals, orows = np.asarray(ovals), np.asarray(orows)
    missing, worst = 0, 0.0
    for b in range(q8.shape[0]):
        got = set(rows[b].tolist())
        assert len(got) == K, f"{label}: duplicate rows"
        assert (rows[b] < NV).all() and (rows[b] >= 0).all()
        for v, r in zip(ovals[b], orows[b]):
            if int(r) not in got:
                missing += 1
                assert v <= bound[b] + key_eps + 1e-6, (
                    label,
                    b,
                    int(r),
                    float(v),
                    float(bound[b]),
                )
                worst = max(worst, float(v - bound[b]))
    # margin slack: oracle k-th minus the hidden bound — positive means
    # the verified-rescore margin passes without widening
    slack = ovals[:, -1] - bound
    print(
        f"{label:22}: {missing}/{q8.shape[0] * min(100, K)} oracle rows outside "
        f"candidates (all bounded, worst excess {worst:.2e}); margin "
        f"slack min {slack.min():+.4f} median "
        f"{np.median(slack):+.4f}",
        flush=True,
    )


def main():
    print("device:", jax.devices()[0], flush=True)
    assert fused3_supported(N, D, 256, K)

    docs = synth(0)
    np.asarray(docs[0, :1])  # materialize (ghost transfer happens here)

    rng = np.random.default_rng(0)
    q = rng.standard_normal((256, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qd = jnp.asarray(q)
    nv = jnp.int32(NV)

    cand_b, packed_b, eps_b = make_variant(512, 2, float(1 << 13))
    cand_c, packed_c, eps_c = make_variant(512, 3, float(1 << 13))

    # --- soundness + margin slack, random corpus ------------------------
    q8 = qd[:8]
    soundness("rand 512/H=2", cand_b, eps_b, docs, q8)
    soundness("rand 512/H=3", cand_c, eps_c, docs, q8)

    # --- adversarial: a hot 512-lane span of near-top docs --------------
    hot = np.array(docs[N // 3].astype(jnp.float32))
    hot /= np.linalg.norm(hot)
    hot_block = 40 if not SMOKE else 7
    rows_hot = np.arange(
        8192 * hot_block + 1024, 8192 * hot_block + 1024 + 100
    )
    jit_rows = hot[None, :] + 3e-3 * rng.standard_normal(
        (100, D)
    ).astype(np.float32)
    jit_rows /= np.linalg.norm(jit_rows, axis=1, keepdims=True)
    docs_hot = docs.at[jnp.asarray(rows_hot)].set(
        jnp.asarray(jit_rows, dtype=docs.dtype)
    )
    q_hot = jnp.asarray(
        np.repeat(hot[None, :], 8, axis=0), dtype=jnp.float32
    )
    soundness("hot  512/H=2", cand_b, eps_b, docs_hot, q_hot)
    soundness("hot  512/H=3", cand_c, eps_c, docs_hot, q_hot)
    del docs_hot

    if SMOKE:
        print("smoke OK (correctness only; timing needs the TPU)")
        return

    # --- timing ----------------------------------------------------------
    def v3(d_, q_, nv_):
        return score_topk_fused3_packed(d_, q_, nv_, K)

    def vb(d_, q_, nv_):
        return packed_b(d_, q_, nv_, K)

    def vc(d_, q_, nv_):
        return packed_c(d_, q_, nv_, K)

    time_case("bf16 b=256 floor", matmul_floor, (docs, qd, nv))
    t3 = time_case("bf16 b=256 v3 1024/4", v3, (docs, qd, nv))
    tb = time_case("bf16 b=256    512/2", vb, (docs, qd, nv))
    tc = time_case("bf16 b=256    512/3", vc, (docs, qd, nv))
    print(
        f"  -> v3 {t3 / 256 * 1e6:.1f} | 512/2 {tb / 256 * 1e6:.1f} | "
        f"512/3 {tc / 256 * 1e6:.1f} us/query device"
    )
    for b in (32, 64, 128):
        qb = qd[:b]
        time_case(f"bf16 b={b:<3} v3", v3, (docs, qb, nv))
        time_case(f"bf16 b={b:<3} 512/2", vb, (docs, qb, nv))


if __name__ == "__main__":
    main()
