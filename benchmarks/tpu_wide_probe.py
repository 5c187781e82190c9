"""Probe: why is fused2 b=256 slow at 16.8M x 256?  Checks the coverage
flag directly and times the component stages + the v3 guarded path."""
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
    _fused2_extract,
    _fused2_finish,
    _reduce_h2,
    fused3_supported,
    score_topk_fused3_packed,
)

N = 2050 * FUSED_BLOCK_N
D = 256
K = 100
NV = N - 37


@jax.jit
def synth(_):
    r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    x = (x - jnp.floor(x) - 0.5) * (0.5 / np.sqrt(D / 12.0))
    return x.astype(jnp.bfloat16)


def timed(label, f, *args, reps=3):
    out = jax.block_until_ready(f(*args))  # compile
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        runs.append(time.perf_counter() - t0)
    print(f"{label:30}: {sorted(runs)[len(runs)//2]*1e3:9.2f} ms "
          f"(min {min(runs)*1e3:.2f})")
    return out


@jax.jit
def extract_only(docs, q, nv):
    return _fused2_extract(docs, q, nv)


@jax.jit
def finish_only(keys1):
    return _fused2_finish(keys1, K, _reduce_h2(N, K), 256, False)


def main():
    print("device:", jax.devices()[0])
    docs = synth(0)
    np.asarray(docs[0, :1])
    rng = np.random.default_rng(0)
    q = rng.standard_normal((256, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qd = jnp.asarray(q)
    nv = jnp.int32(NV)

    keys1 = timed("pass1 extract b=256", extract_only, docs, qd, nv)
    vals, idx, covered = timed("pass2 finish b=256", finish_only, keys1)
    print("covered:", bool(np.asarray(covered)))

    if fused3_supported(N, D, 256, K):
        timed(
            "fused3 packed b=256",
            lambda d_, q_, n_: score_topk_fused3_packed(d_, q_, n_, K, wide=True),
            docs, qd, nv,
        )
    else:
        print("fused3 unsupported at this shape")


if __name__ == "__main__":
    main()
