"""Shootout 7: keyed fused kernels (v2) vs v1 on the real TPU.

1M x 1536, bf16 and int8, batch 1/256, k 100/400 — device time isolated
via chained iterations (same method as bench.py).
"""

from __future__ import annotations

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

    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        fused2_supported,
        fused_supported,
        score_topk_fused2_int8_packed,
        score_topk_fused2_packed,
        score_topk_fused_int8_packed,
        score_topk_fused_packed,
    )
    from svs_tpu.ops.quant import quantize_rows_int8

    n, dim = 1_000_000, 1536
    n_pad = ((n + FUSED_BLOCK_N - 1) // FUSED_BLOCK_N) * FUSED_BLOCK_N
    dev = jax.devices()[0]
    log(f"device {dev}; n_pad {n_pad}")

    def synth(_):
        r = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
        x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
        x = x - jnp.floor(x) - 0.5
        x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        return x.astype(jnp.bfloat16)

    docs = jax.jit(synth)(0)
    _ = np.asarray(docs[0, :1])
    docs8, scales8 = jax.jit(quantize_rows_int8)(docs)
    _ = np.asarray(docs8[0, :1])
    nv = jnp.int32(n)
    rng = np.random.default_rng(42)
    q256 = jnp.asarray(
        (rng.standard_normal((256, dim)) / np.sqrt(dim)).astype(np.float32)
    )
    q1 = q256[:1]

    def device_ms(fn, *args, chain=6):
        def chained(length):
            @jax.jit
            def run(*a):
                q = a[-2]

                def body(i, qc):
                    out = fn(*a[:-2], qc, a[-1])
                    return qc + 0.0 * out[0, 0].astype(qc.dtype)

                qf = jax.lax.fori_loop(0, length, body, q)
                return fn(*a[:-2], qf, a[-1])

            return run

        short, long_ = chained(1), chained(chain)
        np.asarray(short(*args))
        np.asarray(long_(*args))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(short(*args))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(long_(*args))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / (chain - 1) * 1e3

    out = {}
    for k in (100, 400):
        for b, q in ((1, q1), (256, q256)):
            assert fused_supported(n_pad, dim, b, k)
            assert fused2_supported(n_pad, dim, b, k), (n_pad, b, k)

            def v1(d_, q_, nv_):
                return score_topk_fused_packed(d_, q_, nv_, k)

            def v2(d_, q_, nv_):
                return score_topk_fused2_packed(d_, q_, nv_, k)

            def v1i(d_, s_, q_, nv_):
                return score_topk_fused_int8_packed(d_, s_, q_, nv_, k)

            def v2i(d_, s_, q_, nv_):
                return score_topk_fused2_int8_packed(d_, s_, q_, nv_, k)

            for name, fn, args in (
                (f"v1 bf16 k{k} b{b}", v1, (docs, q, nv)),
                (f"v2 bf16 k{k} b{b}", v2, (docs, q, nv)),
                (f"v1 int8 k{k} b{b}", v1i, (docs8, scales8, q, nv)),
                (f"v2 int8 k{k} b{b}", v2i, (docs8, scales8, q, nv)),
            ):
                ms = device_ms(fn, *args)
                out[name] = round(ms, 3)
                log(f"{name}: {ms:.3f} ms ({ms / b:.4f} ms/q)")

    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
