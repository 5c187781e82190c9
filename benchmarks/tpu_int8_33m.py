"""33.6M documents on ONE chip: the int8 keyed path at 2x past 2^24.

``tpu_wide_corpus.py`` proved the wide wire at 16.8M rows bf16 (8.6 GB).
int8 halves the bytes per row, so the same HBM footprint holds TWICE the
corpus: 33,587,200 rows x 256 int8 (8.6 GB + 134 MB row scales) — the
largest exact-search corpus a single v5e can hold at this dim.  The
reference would need a 34.4 GB f32 RAM matrix for this corpus and scans
it at ~8 s/query extrapolated; see BASELINE.md.

Checks first, clock second (same discipline as tpu_wide_corpus.py):
  1. a planted row at index N-9-37 (2x past 2^24) returns at rank 1 with
     an exactly-decoded wide index;
  2. b=8 keyed results hold the exact-coverage + value contract against
     an on-device int8-domain oracle (the prescore model is the
     quantized dot — the engine's verified rescore recovers f32
     exactness on top; here we verify the kernel against its model).

Run on the TPU box: python benchmarks/tpu_int8_33m.py
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
    KEY_EPS,
    fused2_supported,
    score_topk_fused2_int8_packed,
    score_topk_fused3_int8_packed,
)
from svs_tpu.ops.quant import quantize_rows_int8

N = 4100 * FUSED_BLOCK_N  # 33,587,200 rows — 2x past 2^24
D = 256
K = 100
NV = N - 37
PLANT = N - 9 - 37
BYTES = N * D + N * 4  # int8 rows + f32 row scales


@jax.jit
def synth(u_q):
    """Pseudo-noise int8 corpus, elementwise-fused straight to int8 (no
    f32 intermediate of [N, D] ever materializes), with the int8-rounded
    unit row ``u_q`` planted at PLANT."""
    r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    q = jnp.round((x - jnp.floor(x) - 0.5) * 254.0).astype(jnp.int8)
    return jax.lax.dynamic_update_slice(q, u_q[None, :], (PLANT, 0))


@jax.jit
def oracle_topk(docs, scales, q):
    """int8-domain ground truth: quantize queries exactly as the keyed
    path does, exact int32 dot, scale to f32, mask, top-k."""
    qi, qs = quantize_rows_int8(q)
    raw = jax.lax.dot_general(
        qi, docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * scales[None, :] * qs[:, None]
    mask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < NV
    return jax.lax.top_k(jnp.where(mask, scores, -jnp.inf), K)


def main():
    print("device:", jax.devices()[0])
    print(f"corpus: {N:,} x {D} int8 = {BYTES / 1e9:.2f} GB "
          f"({N - (1 << 24):,} rows past 2^24)")
    assert N > 2 * (1 << 24) and fused2_supported(N, D, 256, K)

    rng = np.random.default_rng(0)
    u = rng.standard_normal(D).astype(np.float32)
    u /= np.linalg.norm(u)
    u_q = np.clip(np.round(u * 127.0), -127, 127).astype(np.int8)
    docs = synth(jnp.asarray(u_q))
    np.asarray(docs[PLANT, :1])  # materialize
    # per-row scales: noise rows dequantize to +-0.25/sqrt(D/12) entries
    # (same score model as tpu_wide_corpus.py: every noise |score| << 1,
    # keys far inside the exact-integer horizon); the planted row's scale
    # makes it the unit vector, so it must return at rank 1
    s_noise = (0.25 / np.sqrt(D / 12.0)) / 127.0
    scales = jnp.full((N,), s_noise, jnp.float32).at[PLANT].set(1.0 / 127.0)

    nv = jnp.int32(NV)

    def keyed(d_, q_, nv_):
        return score_topk_fused2_int8_packed(d_, scales, q_, nv_, K, wide=True)

    # --- check 1: the planted 2x-past-2^24 row decodes exactly at rank 1
    packed = np.asarray(keyed(docs, jnp.asarray(u)[None, :], nv))
    vals = np.frombuffer(
        np.ascontiguousarray(packed[:, :K]).tobytes(), np.float32
    ).reshape(1, K)
    idx = packed[:, K:]
    assert idx.dtype == np.int32 and int(idx[0, 0]) == PLANT, idx[0, :4]
    assert abs(float(vals[0, 0]) - 1.0) < 0.02, vals[0, 0]
    print(f"planted-row check OK: rank-1 idx {int(idx[0, 0]):,} "
          f"(2*2^24 = {2 << 24:,}), score {float(vals[0, 0]):.4f}")

    # --- check 2: b=8 vs the exact int8-domain oracle -------------------
    q8 = rng.standard_normal((8, D)).astype(np.float32)
    q8 /= np.linalg.norm(q8, axis=1, keepdims=True)
    q8d = jnp.asarray(q8)
    packed8 = np.asarray(keyed(docs, q8d, nv))
    vals8 = np.frombuffer(
        np.ascontiguousarray(packed8[:, :K]).tobytes(), np.float32
    ).reshape(8, K)
    idx8 = packed8[:, K:]
    ovals, orows = (np.asarray(a) for a in oracle_topk(docs, scales, q8d))
    eps = KEY_EPS + 1e-5
    for b in range(8):
        got = set(idx8[b].tolist())
        assert len(got) == K and (idx8[b] >= 0).all() and (idx8[b] < NV).all()
        by_row = {int(r): float(v) for v, r in zip(ovals[b], orows[b])}
        for r, v in by_row.items():
            assert r in got or v <= vals8[b, -1] + eps, (b, r, v, vals8[b, -1])
        for j in range(K):
            t = by_row.get(int(idx8[b, j]))
            if t is not None:
                assert t - eps <= vals8[b, j] <= t + eps, (b, j, t, vals8[b, j])
    print("oracle check OK: 8 queries, exact-coverage + value contract hold")

    def guarded(d_, q_, nv_):
        return score_topk_fused3_int8_packed(
            d_, scales, q_, nv_, K, wide=True
        )

    # --- timing ----------------------------------------------------------
    def chained(length, fn=keyed):
        @jax.jit
        def f(d_, q_, nv_):
            def body(i, qc):
                out = fn(d_, qc, nv_)
                return qc + 0.0 * out.reshape(-1)[0].astype(qc.dtype)

            qf = jax.lax.fori_loop(0, length, body, q_)
            return fn(d_, qf, nv_).reshape(-1)[:1]

        return f

    def time_case(label, args, iters=9, reps=5, flops=0.0, fn=keyed):
        short, long_ = chained(1, fn), chained(iters, fn)
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
        med = runs[len(runs) // 2]
        hbm = BYTES / med / 1e9 / 819.0 * 100  # v5e ~819 GB/s
        extra = f", {hbm:5.1f}% of HBM bw" if flops == 0 else (
            f", {flops / med / 1e12 / 394 * 100:5.1f}% MFU"
        )
        print(
            f"{label:22}: median {med * 1e3:7.3f} ms "
            f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f}){extra}"
        )
        return med

    qn = rng.standard_normal((256, D)).astype(np.float32)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    q1 = jnp.asarray(q8[:1])
    q256 = jnp.asarray(qn)
    t1 = time_case("keyed int8 33.6M b=1", (docs, q1, nv))
    t256 = time_case(
        "keyed int8 33.6M b=256", (docs, q256, nv),
        flops=2.0 * 256 * N * D,
    )
    t256g = time_case(
        "guarded int8 33.6M b=256", (docs, q256, nv),
        flops=2.0 * 256 * N * D, fn=guarded,
    )
    best = min(t256, t256g)
    print(f"per query at b=256: {best / 256 * 1e3:.4f} ms "
          f"(engine dispatch at b>=16 is v3 — staged finish)")
    print(f"HBM floor at this shape: {BYTES / 819e9 * 1e3:.2f} ms "
          f"(b=1 measured {t1 * 1e3:.2f})")


if __name__ == "__main__":
    main()
