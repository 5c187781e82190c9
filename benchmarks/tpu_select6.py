"""Probe: packed-key subtile extraction vs the iterated f32 max/clear.

The extraction emit is pure VPU and cannot overlap the MXU (measured,
tpu_select5.py: overlap ~0).  So the only lever is fewer VPU passes per
extracted winner.  Keyed scheme: biased score (positive) bitcast to
int32, low 9 mantissa bits replaced by the lane index -> keys are
UNIQUE and integer-ordered like (truncated score, lane).  Per winner:
one int32 max-reduce + one compare/select clear — ~3 VPU passes vs ~6
for the f32 max / index-recover / clear sequence.

Measures, on a VMEM-resident score buffer (no matmul, no HBM traffic):
  old: f32 iterated max/clear (the current _fused_kernel emit)
  key: packed-key extraction
and checks both against a NumPy oracle.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BIAS = 1.03125  # scores in [-1, 1] -> biased in [0.03125, 2.03125] > 0
IDX_BITS = 9
IDX_MASK = (1 << IDX_BITS) - 1  # 0x1FF
VAL_MASK = ~IDX_MASK  # 0xFFFFFE00


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    log(f"device {dev}")
    out = {}

    B, SUB, NSUB, H = 256, 512, 16, 8
    BN = SUB * NSUB  # 8192
    NB = 122  # ~1M docs worth of emit work

    rng = np.random.default_rng(3)
    scores_np = (rng.standard_normal((B, BN)) * 0.3).clip(-1, 1).astype(
        np.float32
    )
    scores = jnp.asarray(scores_np)

    def old_emit(sub, gidx, out_v, out_i, s):
        for h in range(H):
            mval = jnp.max(sub, axis=1, keepdims=True)
            midx = jnp.max(
                jnp.where(sub == mval, gidx, -1.0), axis=1, keepdims=True
            )
            col = s * H + h
            out_v[:, col : col + 1] = mval
            out_i[:, col : col + 1] = midx
            sub = jnp.where(gidx == midx, -1e30, sub)

    def old_kernel(s_ref, ov_ref, oi_ref):
        for s in range(NSUB):
            sub = s_ref[:, s * SUB : (s + 1) * SUB]
            gidx = (
                jax.lax.broadcasted_iota(jnp.int32, (B, SUB), 1).astype(
                    jnp.float32
                )
                + float(s * SUB)
            )
            old_emit(sub, gidx, ov_ref, oi_ref, s)

    def key_kernel(s_ref, ov_ref, oi_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, SUB), 1)
        for s in range(NSUB):
            sub = s_ref[:, s * SUB : (s + 1) * SUB]
            biased = sub + BIAS
            ib = jax.lax.bitcast_convert_type(biased, jnp.int32)
            keys = (ib & VAL_MASK) | lane
            for h in range(H):
                mkey = jnp.max(keys, axis=1, keepdims=True)
                vbits = mkey & VAL_MASK
                mval = (
                    jax.lax.bitcast_convert_type(vbits, jnp.float32) - BIAS
                )
                midx = (mkey & IDX_MASK).astype(jnp.float32) + float(s * SUB)
                col = s * H + h
                ov_ref[:, col : col + 1] = mval
                oi_ref[:, col : col + 1] = midx
                keys = jnp.where(keys == mkey, 0, keys)

    # f32 packed keys: int32 VPU ops measured 7x slower than f32 (see
    # results), so quantize in f32 instead: key = floor(biased * 2^14)
    # * 512 + lane — exact integers below 2^24, unique per lane, ordered
    # like (quantized score, lane).  All passes are f32 VPU ops.
    QSCALE = float(1 << 13)  # max key = 2.03125*8192*512+511 < 2^24 (f32-exact)
    NLANE = float(SUB)

    def keyf_kernel(s_ref, ov_ref, oi_ref):
        # Emit RAW keys (decode happens outside the kernel in XLA over
        # the small extracted array — in-kernel [b,1] scalar decodes
        # still burn full vregs).  oi_ref gets the same keys so the
        # harness signature matches; a real deployment has ONE output.
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, SUB), 1).astype(
            jnp.float32
        )
        for s in range(NSUB):
            sub = s_ref[:, s * SUB : (s + 1) * SUB]
            keys = jnp.floor((sub + BIAS) * QSCALE) * NLANE + lane
            for h in range(H):
                mkey = jnp.max(keys, axis=1, keepdims=True)
                col = s * H + h
                ov_ref[:, col : col + 1] = mkey
                oi_ref[:, col : col + 1] = mkey
                keys = jnp.where(keys == mkey, -1.0, keys)

    def build(kern):
        call = pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=[pl.BlockSpec((B, BN), lambda j: (0, 0))],
            out_specs=[
                pl.BlockSpec((B, NSUB * H), lambda j: (0, 0)),
                pl.BlockSpec((B, NSUB * H), lambda j: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, NSUB * H), jnp.float32),
                jax.ShapeDtypeStruct((B, NSUB * H), jnp.float32),
            ],
        )

        @jax.jit
        def run(x, reps):
            def body(_, carry):
                v, i = call(x + carry)
                return carry + 0.0 * (v[:1, :1] + i[:1, :1])

            return jax.lax.fori_loop(0, reps, body, jnp.zeros((1, 1)))

        return call, run

    def ms(run, x):
        np.asarray(run(x, 1))
        np.asarray(run(x, 7))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(run(x, 1))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(run(x, 7))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / 6 * 1e3

    # correctness vs oracle (single block, no reps)
    old_call, old_run = build(old_kernel)
    key_call, key_run = build(key_kernel)
    ov, oi = (np.asarray(a) for a in old_call(scores))
    kv, ki = (np.asarray(a) for a in key_call(scores))

    eps = 2.0 ** (1 - 23 + IDX_BITS)  # max truncation error at exp(2.03)=1
    bad = 0
    for s in range(NSUB):
        blk = scores_np[:, s * SUB : (s + 1) * SUB]
        order = np.argsort(-blk, axis=1, kind="stable")[:, :H]
        want_v = np.take_along_axis(blk, order, axis=1)
        got_v = kv[:, s * H : (s + 1) * H]
        got_i = ki[:, s * H : (s + 1) * H].astype(np.int64) - s * SUB
        got_true = np.take_along_axis(blk, got_i, axis=1)
        # truncated values lower-bound the true ones within eps
        if not ((got_v <= got_true + 1e-6) & (got_true < got_v + eps)).all():
            bad += 1
        # the selected set matches the oracle top-H set up to eps ties
        if not (np.sort(got_true, axis=1)[:, ::-1] >= want_v - eps).all():
            bad += 1
    out["key_correct"] = bad == 0
    out["old_matches_oracle"] = bool(
        np.allclose(
            np.sort(ov.reshape(B, NSUB, H), axis=2),
            np.sort(
                np.take_along_axis(
                    scores_np.reshape(B, NSUB, SUB),
                    np.argsort(-scores_np.reshape(B, NSUB, SUB), axis=2)[
                        :, :, :H
                    ],
                    axis=2,
                ),
                axis=2,
            ),
        )
    )
    log(f"correctness: old={out['old_matches_oracle']} key_bad_groups={bad}")

    keyf_call, keyf_run = build(keyf_kernel)
    fkeys, _ = (np.asarray(a) for a in keyf_call(scores))
    # host decode: exact in int64
    ki_ = fkeys.astype(np.int64)
    lane_in_sub = ki_ % SUB
    vq_ = ki_ // SUB
    fv = vq_.astype(np.float32) / QSCALE - BIAS
    # two grid steps: one from floor, one from the pack-multiply rounding
    epsf = 2.0 / (1 << 13)
    badf = 0
    for s in range(NSUB):
        blk = scores_np[:, s * SUB : (s + 1) * SUB]
        order = np.argsort(-blk, axis=1, kind="stable")[:, :H]
        want_v = np.take_along_axis(blk, order, axis=1)
        got_i = lane_in_sub[:, s * H : (s + 1) * H]
        got_v = fv[:, s * H : (s + 1) * H]
        got_true = np.take_along_axis(blk, got_i, axis=1)
        if not ((got_v <= got_true + 1e-6) & (got_true < got_v + epsf)).all():
            badf += 1
        if not (np.sort(got_true, axis=1)[:, ::-1] >= want_v - epsf).all():
            badf += 1
    out["keyf_correct"] = badf == 0
    log(f"keyf correctness: bad_groups={badf}")

    o_ms = ms(old_run, scores)
    k_ms = ms(key_run, scores)
    f_ms = ms(keyf_run, scores)
    out["old_emit_ms"] = round(o_ms, 3)
    out["key_emit_ms"] = round(k_ms, 3)
    out["keyf_emit_ms"] = round(f_ms, 3)
    out["speedup_int_key"] = round(o_ms / k_ms, 2)
    out["speedup_f32_key"] = round(o_ms / f_ms, 2)
    log(f"emit x{NB} blocks: old {o_ms:.3f} ms | int-key {k_ms:.3f} ms | "
        f"f32-key {f_ms:.3f} ms ({o_ms / f_ms:.2f}x)")

    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
