"""Map the v2 (keyed) vs v3 (guarded) crossover across corpus shapes.

Known points: v3 wins b=256 at 1M x 1536 (-22%); v2 wins at 16.8M x 256
(+18%).  Hypothesis: v3's single wide merge ``top_k`` over nb*32 lanes
grows with the block count while its emit saving is fixed per block, so
the winner flips as nb grows / d shrinks.  This probe times both packed
production paths at b=256, k=100 over a shape ladder to turn the two
anecdotes into a dispatch rule.

Run on the TPU box: python benchmarks/tpu_v2v3_cross.py [--int8]

``--int8`` times the int8 packed paths instead (matmul ~2x faster, so
selection dominates earlier and v2's crossover should arrive at smaller
nb than bf16's).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from svs_tpu.ops.pallas_extract import (
    FUSED_BLOCK_N,
    fused2_supported,
    fused3_supported,
    score_topk_fused2_int8_packed,
    score_topk_fused2_packed,
    score_topk_fused3_int8_packed,
    score_topk_fused3_packed,
)

K = 100
B = 256

#: (rows, dim) ladder: nb grows as d shrinks, bytes stay chip-friendly.
SHAPES = [
    (124 * FUSED_BLOCK_N, 1536),   # ~1M — the headline anchor
    (256 * FUSED_BLOCK_N, 768),    # ~2.1M
    (512 * FUSED_BLOCK_N, 512),    # ~4.2M
    (1024 * FUSED_BLOCK_N, 256),   # ~8.4M
    (1216 * FUSED_BLOCK_N, 256),   # ~10.0M
    (1408 * FUSED_BLOCK_N, 256),   # ~11.5M
    (1792 * FUSED_BLOCK_N, 256),   # ~14.7M
    (2050 * FUSED_BLOCK_N, 256),   # ~16.8M — past 2^24
]


def synth(n, d):
    @jax.jit
    def f(_):
        r = jax.lax.broadcasted_iota(jnp.float32, (n, d), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (n, d), 1)
        x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
        x = (x - jnp.floor(x) - 0.5) * (0.5 / np.sqrt(d / 12.0))
        return x.astype(jnp.bfloat16)

    return f(0)


def synth_int8(n, d):
    """int8 rows + per-row scales shaped like the engine's quantized
    pack (unit-norm rows -> scores in [-1, 1])."""

    @jax.jit
    def f(_):
        r = jax.lax.broadcasted_iota(jnp.float32, (n, d), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (n, d), 1)
        x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
        q = jnp.round((x - jnp.floor(x) - 0.5) * 254.0)
        return q.astype(jnp.int8)

    scales = jnp.full((n,), 1.0 / (127.0 * np.sqrt(d / 12.0)), jnp.float32)
    return f(0), scales


def chained(fn, length):
    @jax.jit
    def f(docs, q, nv):
        def body(i, qc):
            out = fn(docs, qc, nv)
            return qc + 0.0 * out.reshape(-1)[0].astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        return fn(docs, qf, nv).reshape(-1)[:1]

    return f


def device_ms(fn, args, iters=9, reps=5):
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
        runs.append(max(0.0, (time.perf_counter() - t0 - ts) / (iters - 1)))
    runs.sort()
    return runs[len(runs) // 2] * 1e3


def main():
    int8 = "--int8" in sys.argv[1:]
    print("device:", jax.devices()[0], "| precision:", "int8" if int8 else "bf16")
    rng = np.random.default_rng(0)
    print(f"{'shape':>16} {'nb':>5} | {'v2 ms':>8} {'v3 ms':>8} | winner")
    for n, d in SHAPES:
        wide = n >= (1 << 24)
        assert fused2_supported(n, d, B, K) and fused3_supported(n, d, B, K)
        q = rng.standard_normal((B, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qd, nv = jnp.asarray(q), jnp.int32(n - 37)

        if int8:
            docs, scales = synth_int8(n, d)
            np.asarray(docs[0, :1])

            def v2(d_, q_, n_):
                return score_topk_fused2_int8_packed(
                    d_, scales, q_, n_, K, wide=wide
                )

            def v3(d_, q_, n_):
                return score_topk_fused3_int8_packed(
                    d_, scales, q_, n_, K, wide=wide
                )

        else:
            docs = synth(n, d)
            np.asarray(docs[0, :1])

            def v2(d_, q_, n_):
                return score_topk_fused2_packed(d_, q_, n_, K, wide=wide)

            def v3(d_, q_, n_):
                return score_topk_fused3_packed(d_, q_, n_, K, wide=wide)

        t2 = device_ms(v2, (docs, qd, nv))
        t3 = device_ms(v3, (docs, qd, nv))
        nb = n // FUSED_BLOCK_N
        win = "v2" if t2 < t3 else "v3"
        print(f"{n:>10}x{d:<5} {nb:>5} | {t2:8.2f} {t3:8.2f} | {win} "
              f"({abs(t3 - t2) / max(t2, t3) * 100:.0f}%)")
        del docs


if __name__ == "__main__":
    main()
