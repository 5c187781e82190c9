"""Wide-shape dispatch calibration ON SILICON — the evidence round 4
promised.

Round 3 flagged the wide-corpus b=256 rows (16.8M x 256 bf16 at
0.128 ms/query, 33.6M x 256 int8 at 0.225 ms/query) as 1.5-2.2x off
their floor and round 4 built the calibrator (``engine.calibrate``) to
let measured winners override the static v2/v3 prior — but never ran it
at those shapes.  This script does exactly that: synthesizes each wide
corpus on-device, times the v2 (keyed) and v3 (guarded) kernels at
b=256 / c=400 with the calibrator's own chained-iteration method,
PERSISTS the winner into ``dispatch.json`` via the real
``DispatchCalibrator.record`` under the real ``dispatch_key``, and
prints the before (static prior's kernel) vs after (measured winner)
device times.

Run on the TPU box, one shape per invocation (each corpus fills most of
HBM):

    python benchmarks/tpu_wide_calib.py wide16   # 16.8M x 256 bf16
    python benchmarks/tpu_wide_calib.py wide33   # 33.6M x 256 int8
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from svs_tpu.engine.calibrate import dispatch_key, get_calibrator
from svs_tpu.ops.pallas_extract import (
    FUSED_BLOCK_N,
    GUARD_MIN_BATCH,
    fused2_supported,
    fused3_supported,
    score_topk_fused2_int8_packed,
    score_topk_fused2_packed,
    score_topk_fused3_int8_packed,
    score_topk_fused3_packed,
)

SHAPE = sys.argv[1] if len(sys.argv) > 1 else "wide16"
D = 256
B = 256
K = 100
C = 400  # the engine's candidate_count(100)
CHAIN = 8

if SHAPE == "wide16":
    N = 2050 * FUSED_BLOCK_N  # 16,793,600 (> 2^24)
    PRECISION = "bf16"
else:
    N = 4100 * FUSED_BLOCK_N  # 33,587,200
    PRECISION = "int8"
NV = N - 37


@jax.jit
def synth_bf16(_):
    r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    x = (x - jnp.floor(x) - 0.5) * (0.5 / np.sqrt(D / 12.0))
    return x.astype(jnp.bfloat16), None


@jax.jit
def synth_int8(_):
    r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    q = jnp.round((x - jnp.floor(x) - 0.5) * 254.0).astype(jnp.int8)
    scales = jnp.full((N,), (0.25 / np.sqrt(D / 12.0)) / 127.0, jnp.float32)
    return q, scales


def step(v3: bool, docs, scales, q, nv):
    if PRECISION == "int8":
        fn = (
            score_topk_fused3_int8_packed if v3
            else score_topk_fused2_int8_packed
        )
        return fn(docs, scales, q, nv, C, wide=True)
    fn = score_topk_fused3_packed if v3 else score_topk_fused2_packed
    return fn(docs, q, nv, C, wide=True)


def chained(v3: bool):
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def f(docs, scales, q, nv):
        def body(i, qc):
            out = step(v3, docs, scales, qc, nv)
            return qc + 0.0 * out[0, 0].astype(qc.dtype)

        qf = jax.lax.fori_loop(0, CHAIN, body, q)
        return step(v3, docs, scales, qf, nv)

    return f


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev} | {SHAPE}: {N}x{D} {PRECISION} b={B} c={C}",
          flush=True)
    assert fused2_supported(N, D, B, C) and fused3_supported(N, D, B, C)
    docs, scales = (synth_bf16 if PRECISION == "bf16" else synth_int8)(0)
    np.asarray(docs[0, :1])
    rng = np.random.default_rng(0)
    qf = rng.standard_normal((B, D)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    if PRECISION == "int8":
        sq = (np.maximum(np.abs(qf).max(axis=1), 1e-30) / 127.0)
        q = jnp.asarray(
            np.clip(np.rint(qf / sq[:, None]), -127, 127).astype(np.int8)
        )
        # the packed int8 entry points take f32 queries and quantize
        # inside; check their signature expectation
        q = jnp.asarray(qf)
    else:
        q = jnp.asarray(qf).astype(jnp.bfloat16)
    nv = jnp.int32(NV)

    results = {}
    for label, v3 in (("v2", False), ("v3", True)):
        f = chained(v3)
        np.asarray(f(docs, scales, q, nv))  # compile+warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(docs, scales, q, nv))
            times.append(time.perf_counter() - t0)
        times.sort()
        per_step = times[2] / (CHAIN + 1)
        results[label] = per_step
        print(f"{label}: {per_step * 1e3:.3f} ms/step "
              f"({per_step / B * 1e3:.4f} ms/query; spread "
              f"{times[0] / (CHAIN + 1) * 1e3:.3f}-"
              f"{times[-1] / (CHAIN + 1) * 1e3:.3f})", flush=True)

    winner = "v2" if results["v2"] <= results["v3"] else "v3"
    prior = "v3" if B >= GUARD_MIN_BATCH else "v2"
    kind = str(dev.device_kind).replace(" ", "_")
    key = dispatch_key(kind, PRECISION, N, D, B, C)
    cal = get_calibrator()
    cal.record(key, winner, results["v2"], results["v3"])
    print(json.dumps({
        "shape": SHAPE, "key": key,
        "v2_ms": round(results["v2"] * 1e3, 3),
        "v3_ms": round(results["v3"] * 1e3, 3),
        "static_prior": prior, "winner": winner,
        "prior_ms": round(results[prior] * 1e3, 3),
        "winner_ms": round(results[winner] * 1e3, 3),
        "gain_pct": round(
            (results[prior] - results[winner]) / results[prior] * 100, 1
        ),
        "per_query_ms_after": round(results[winner] / B * 1e3, 4),
        "cache": str(cal.path()),
    }), flush=True)


if __name__ == "__main__":
    main()
