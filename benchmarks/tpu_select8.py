"""Round-3 emit-cost shootout for the keyed (fused2) kernel.

b=256 bf16 device time is ~6.84 ms vs a ~4.7 ms matmul-only floor; the
delta is the per-subtile top-H key extraction (VPU, serial behind the
MXU — measured round 2: no overlap within a grid step).  This bench
isolates the emit cost and tries cheaper emit strategies:

  A. current: per 512-lane subtile, 8 x (max over 512 + clear over 512)
  B. hierarchical: per pass, fold 512 -> 128 lanes with 3 elementwise
     maxes, reduce over 128, clear over 512 (keys order-embed lane, so
     folding by max preserves the winner)
  C. matmul-only (no emit) — the floor for this grid

Run on the TPU: python benchmarks/tpu_select8.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, B = 1_015_808, 1536, 256
FUSED_SUBTILE = 512
FUSED_BLOCK_N = 8192
DIM_CHUNK = 128
EXTRACT_H = 8
KEY_QSCALE = float(1 << 13)
KEY_BIAS = 1.0625
KEY_DEAD = -float(1 << 24)
_KEY_LANES = float(FUSED_SUBTILE)
OUT_LANES = (FUSED_BLOCK_N // FUSED_SUBTILE) * EXTRACT_H


def emit_current(acc, lane, live, out_ref, col0):
    keys = jnp.floor((acc + KEY_BIAS) * KEY_QSCALE) * _KEY_LANES + lane
    keys = jnp.where(lane < live, keys, KEY_DEAD)
    for h in range(EXTRACT_H):
        mkey = jnp.max(keys, axis=1, keepdims=True)
        out_ref[:, col0 + h : col0 + h + 1] = mkey
        keys = jnp.where(keys == mkey, KEY_DEAD, keys)


def emit_hier(acc, lane, live, out_ref, col0):
    keys = jnp.floor((acc + KEY_BIAS) * KEY_QSCALE) * _KEY_LANES + lane
    keys = jnp.where(lane < live, keys, KEY_DEAD)
    for h in range(EXTRACT_H):
        k0 = keys[:, 0:128]
        k1 = keys[:, 128:256]
        k2 = keys[:, 256:384]
        k3 = keys[:, 384:512]
        folded = jnp.maximum(jnp.maximum(k0, k1), jnp.maximum(k2, k3))
        mkey = jnp.max(folded, axis=1, keepdims=True)
        out_ref[:, col0 + h : col0 + h + 1] = mkey
        keys = jnp.where(keys == mkey, KEY_DEAD, keys)


def emit_h6g128(acc, lane128, live_base, out_ref, col0):
    """6 passes per 128-lane group (4 groups per 512 subtile): ~25% less
    elementwise work than 8x512 IF reduce width dominates; coverage at
    k=400 over 1M: lam=0.0126/group, P(X>=7) ~ 1e-7 per batch."""
    for g in range(4):
        keys = acc[:, g * 128 : (g + 1) * 128]
        keys = jnp.floor((keys + KEY_BIAS) * KEY_QSCALE) * 128.0 + lane128
        keys = jnp.where(lane128 < live_base - g * 128.0, keys, KEY_DEAD)
        for h in range(6):
            mkey = jnp.max(keys, axis=1, keepdims=True)
            out_ref[:, col0 + g * 6 + h : col0 + g * 6 + h + 1] = mkey
            keys = jnp.where(keys == mkey, KEY_DEAD, keys)


def emit_h8g256(acc, lane256, live_base, out_ref, col0):
    for g in range(2):
        keys = acc[:, g * 256 : (g + 1) * 256]
        keys = jnp.floor((keys + KEY_BIAS) * KEY_QSCALE) * 256.0 + lane256
        keys = jnp.where(lane256 < live_base - g * 256.0, keys, KEY_DEAD)
        for h in range(8):
            mkey = jnp.max(keys, axis=1, keepdims=True)
            out_ref[:, col0 + g * 8 + h : col0 + g * 8 + h + 1] = mkey
            keys = jnp.where(keys == mkey, KEY_DEAD, keys)


def emit_h8g1024(acc2, lane1024, live_base, out_ref, col0):
    """top-8 per 1024-lane pair-group: HALF the max-reduce ops of the
    current 8x512 (reduce count, not elementwise width, dominates —
    narrow-group variants measured worse).  Key lane field widens to
    1024, so the score grid drops to 2^12 (KEY_EPS 2^-11, still well
    inside the bf16 rescore bound).  Coverage at k=400 over 1M: lam=0.4
    per group, P(X>=9) ~ 1.2e-4 per 256-batch.  Out: 8 live lanes per
    group, padded to 16 with KEY_DEAD (pass-2 skips dead keys)."""
    QS = float(1 << 12)
    keys = jnp.floor((acc2 + KEY_BIAS) * QS) * 1024.0 + lane1024
    keys = jnp.where(lane1024 < live_base, keys, KEY_DEAD)
    for h in range(8):
        mkey = jnp.max(keys, axis=1, keepdims=True)
        out_ref[:, col0 + h : col0 + h + 1] = mkey
        keys = jnp.where(keys == mkey, KEY_DEAD, keys)
    dead = jnp.full((acc2.shape[0], 1), KEY_DEAD, jnp.float32)
    for h in range(8, 16):
        out_ref[:, col0 + h : col0 + h + 1] = dead


EMIT_META = {
    # name: (emit_fn|None, out lanes per 512-subtile, lane iota width)
    "matmul": (None, EXTRACT_H, FUSED_SUBTILE),
    "current": (emit_current, EXTRACT_H, FUSED_SUBTILE),
    "hier": (emit_hier, EXTRACT_H, FUSED_SUBTILE),
    "h6g128": (emit_h6g128, 24, 128),
    "h8g256": (emit_h8g256, 16, 256),
    # handled specially in make_kernel: iterates 1024-lane pair-groups
    "h8g1024": (emit_h8g1024, 16, 1024),
}


def make_kernel(emit):
    emit_fn, sub_lanes, lane_w = EMIT_META[emit]

    def kern(nv_ref, q_ref, docs_ref, out_ref, acc_ref):
        j = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(c == 0)
        def _z():
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

        acc_ref[:] += jax.lax.dot_general(
            q_ref[:], docs_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == nc - 1)
        def _e():
            if emit_fn is None:
                out_ref[:, :] = acc_ref[:, : sub_lanes * 16]
                return
            nv = nv_ref[0]
            b = acc_ref.shape[0]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (b, lane_w)
                , 1
            ).astype(jnp.float32)
            if emit_fn is emit_h8g1024:
                for s in range(FUSED_BLOCK_N // 1024):
                    lo = s * 1024
                    live = jnp.clip(
                        nv - (j * FUSED_BLOCK_N + lo), 0, 1024
                    ).astype(jnp.float32)
                    emit_fn(acc_ref[:, lo : lo + 1024], lane, live,
                            out_ref, s * 16)
                return
            for s in range(FUSED_BLOCK_N // FUSED_SUBTILE):
                lo = s * FUSED_SUBTILE
                live = jnp.clip(
                    nv - (j * FUSED_BLOCK_N + lo), 0, FUSED_SUBTILE
                ).astype(jnp.float32)
                emit_fn(acc_ref[:, lo : lo + FUSED_SUBTILE], lane, live,
                        out_ref, s * sub_lanes)

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def run(docs, q, nv, variant):
    _, sub_lanes, _ = EMIT_META[variant]
    if variant == "h8g1024":
        out_block = (FUSED_BLOCK_N // 1024) * 16
        out_shape = (B, (N // 1024) * 16)
    else:
        out_block = sub_lanes * (FUSED_BLOCK_N // FUSED_SUBTILE)
        out_shape = (B, (N // FUSED_SUBTILE) * sub_lanes)
    grid = (N // FUSED_BLOCK_N, D // DIM_CHUNK)
    return pl.pallas_call(
        make_kernel(variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, DIM_CHUNK), lambda j, c: (0, c)),
            pl.BlockSpec((FUSED_BLOCK_N, DIM_CHUNK), lambda j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((B, out_block), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, FUSED_BLOCK_N), jnp.float32)],
    )(jnp.asarray([nv], jnp.int32), q, docs)


def chained(variant, length):
    @jax.jit
    def f(docs, q, nv):
        def body(i, qc):
            out = run(docs, qc, nv, variant)
            return qc + 0.0 * out[0, 0].astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        # fetch ONE element, not the 16 MB keys array — fetch variance
        # otherwise swamps the chained-slope measurement on the tunnel
        return run(docs, qf, nv, variant)[:1, :1]

    return f


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    @jax.jit
    def synth(_):
        r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
        x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
        x = x - jnp.floor(x) - 0.5
        x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        return x.astype(jnp.bfloat16)

    docs = synth(0)
    np.asarray(docs[0, :1])
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    nv = N - 100

    for variant in ("current", "h8g1024"):
        short, long_ = chained(variant, 1), chained(variant, 11)
        np.asarray(short(docs, q, nv))
        np.asarray(long_(docs, q, nv))
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(short(docs, q, nv))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(long_(docs, q, nv))
            tl = time.perf_counter() - t0
            runs.append(max(0.0, (tl - ts) / 10))
        runs.sort()
        print(f"{variant:8}: median {runs[2] * 1e3:.3f} ms "
              f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f})")


if __name__ == "__main__":
    main()
