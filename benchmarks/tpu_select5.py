"""Probes for pipelining the fused extraction kernel (shootout 5).

Questions this answers (on the real TPU):

1. What does the final ``lax.top_k`` merge cost at candidate widths
   16384 (current fused lanes at 1M docs) vs 32768 (SUBTILE=256
   variant) vs ~4096 (hypothetical block-merged width)?
2. Does Mosaic overlap MXU matmuls with INDEPENDENT VPU work inside
   one grid step?  This is the premise of pipelining block ``j-1``'s
   extraction under block ``j``'s matmul: if the scheduler serializes
   the units, the pipelined kernel buys nothing.

Probe 2 builds three kernels over the same grid: matmul-only, VPU-only
(iterated max/clear over a scratch), and both combined.  overlap
quality = (mm + vpu - both) / min(mm, vpu): 1.0 = perfect overlap,
0.0 = fully serialized.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    log(f"device {dev}")
    out = {}

    # ---- probe 1: merge width -------------------------------------------
    rng = np.random.default_rng(7)

    def topk_ms(width, k):
        x = jnp.asarray(rng.standard_normal((256, width)).astype(np.float32))

        def fn(xx):
            v, i = jax.lax.top_k(xx, k)
            return v + i.astype(jnp.float32)

        @jax.jit
        def run(xx, reps):
            def body(_, acc):
                r = fn(xx + acc[0, :1])
                return acc + 0.0 * r[0, :1]

            return jax.lax.fori_loop(0, reps, body, xx[:, :1] * 0.0)

        np.asarray(run(x, 1))
        np.asarray(run(x, 21))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(run(x, 1))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(run(x, 21))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / 20 * 1e3

    for width in (4096, 16384, 32768):
        for k in (100, 400):
            ms = topk_ms(width, k)
            out[f"top_k[256,{width}] k={k}"] = round(ms, 3)
            log(f"top_k[256,{width}] k={k}: {ms:.3f} ms")

    # ---- probe 2: MXU/VPU overlap ---------------------------------------
    B, BN, D, NB, H = 256, 4096, 128, 64, 8
    SUB = 256

    def make_kernel(do_mm, do_vpu):
        def kern(q_ref, docs_ref, o_ref, acc_ref, buf_ref):
            j = pl.program_id(0)

            @pl.when(j == 0)
            def _init():
                acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
                o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)

            if do_mm:
                acc_ref[:] += jax.lax.dot_general(
                    q_ref[:],
                    docs_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if do_vpu:
                # iterated max/clear over a persistent buffer: the same
                # VPU instruction mix as the extraction emit, independent
                # of the matmul accumulator.
                for s in range(BN // SUB):
                    sub = buf_ref[:, s * SUB : (s + 1) * SUB]
                    gidx = jax.lax.broadcasted_iota(
                        jnp.int32, (B, SUB), 1
                    ).astype(jnp.float32)
                    for h in range(H):
                        mval = jnp.max(sub, axis=1, keepdims=True)
                        midx = jnp.max(
                            jnp.where(sub == mval, gidx, -1.0),
                            axis=1,
                            keepdims=True,
                        )
                        o_ref[:, s * H + h : s * H + h + 1] = mval + midx
                        sub = jnp.where(gidx == midx, -1e30, sub)

            @pl.when(j == NB - 1)
            def _fin():
                o_ref[:, :1] += acc_ref[:, :1]

        return kern

    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    docs = jnp.asarray(
        rng.standard_normal((NB * BN, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def build(do_mm, do_vpu):
        @jax.jit
        def run(qq, dd, reps):
            def body(_, carry):
                o = pl.pallas_call(
                    make_kernel(do_mm, do_vpu),
                    grid=(NB,),
                    in_specs=[
                        pl.BlockSpec((B, D), lambda j: (0, 0)),
                        pl.BlockSpec((BN, D), lambda j: (j, 0)),
                    ],
                    out_specs=pl.BlockSpec(
                        (B, (BN // SUB) * H), lambda j: (0, 0)
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (B, (BN // SUB) * H), jnp.float32
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((B, BN), jnp.float32),
                        pltpu.VMEM((B, BN), jnp.float32),
                    ],
                )(qq + carry[0, :1].astype(qq.dtype), dd)
                return carry + 0.0 * o[:1, :1]

            return jax.lax.fori_loop(
                0, reps, body, jnp.zeros((1, 1), jnp.float32)
            )

        return run

    def kern_ms(do_mm, do_vpu):
        run = build(do_mm, do_vpu)
        np.asarray(run(q, docs, 1))
        np.asarray(run(q, docs, 7))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(run(q, docs, 1))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(run(q, docs, 7))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / 6 * 1e3

    mm = kern_ms(True, False)
    log(f"matmul-only: {mm:.3f} ms")
    vpu = kern_ms(False, True)
    log(f"vpu-only:    {vpu:.3f} ms")
    both = kern_ms(True, True)
    log(f"both:        {both:.3f} ms")
    overlap = (mm + vpu - both) / max(1e-9, min(mm, vpu))
    out["mm_ms"] = round(mm, 3)
    out["vpu_ms"] = round(vpu, 3)
    out["both_ms"] = round(both, 3)
    out["overlap_frac"] = round(overlap, 3)
    log(f"overlap quality: {overlap:.2f} (1 = perfect, 0 = serialized)")

    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
