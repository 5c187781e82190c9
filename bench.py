"""Benchmark harness: reproduces the reference's headline configuration
(1M docs x 1536 dims, exact cosine top-100; BASELINE.md) on the current
JAX device and prints ONE JSON line to stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``vs_baseline`` is the speedup over the reference's published warm-query
number on the same configuration (0.24 s at 1M x 1536,
``/root/reference/README.md:129``); >1 means faster than the reference.

Details and secondary metrics go to stderr.  Timing is fetch-based
(``np.asarray`` of the result) — on tunneled TPU setups
``block_until_ready`` can return before execution completes, so only a
host round trip is trustworthy.

Usage:
    python bench.py                  # headline: 1M x 1536 bf16 top-100
    python bench.py --preset smoke   # tiny CPU-safe sanity run
    python bench.py --batch 256      # batched-throughput variant
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


# Reference warm-query latencies (seconds) for the two corpus sizes it
# published (BASELINE.md).
REF_WARM_1M_S = 0.240
REF_WARM_10K_S = 0.011

PRESETS = {
    # name: (n_docs, dim, k, ref_seconds)
    "headline": (1_000_000, 1536, 100, REF_WARM_1M_S),
    "dadjokes": (10_548, 1536, 100, REF_WARM_10K_S),
    "smoke": (10_000, 256, 10, None),
}


def _percentile(values, q):
    values = sorted(values)
    idx = min(len(values) - 1, int(round(q * (len(values) - 1))))
    return values[idx]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", choices=PRESETS, default="headline")
    parser.add_argument("--precision", choices=["f32", "bf16", "int8"],
                        default="bf16")
    parser.add_argument("--batch", type=int, default=1,
                        help="queries per retrieval step")
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--k", type=int, default=None)
    parser.add_argument(
        "--kernel",
        choices=["topk", "fast", "pallas"],
        default="topk",
        help="selection kernel: fused lax.top_k (measured fastest at all "
        "batch sizes on v5e), verified-exact approx_max_k, or the Pallas "
        "streaming kernel",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from svs_tpu.ops.pallas_topk import pallas_score_topk, pallas_supported
    from svs_tpu.ops.quant import (
        quantize_rows_int8,
        score_topk_int8,
        score_topk_int8_fast,
    )
    from svs_tpu.ops.topk import score_topk, score_topk_fast

    n, dim, k_default, ref_s = PRESETS[args.preset]
    k = args.k or k_default
    dev = jax.devices()[0]
    log(f"device: {dev} | corpus {n}x{dim} {args.precision} | "
        f"top-{k} | batch {args.batch}")

    # --- build the packed corpus on device (synthetic, matches the
    # reference's 1M-doc notebook which also used synthetic vectors) ------
    n_pad = ((n + 255) // 256) * 256  # tile-aligned, like engine packing
    dtype = jnp.bfloat16 if args.precision != "f32" else jnp.float32
    t0 = time.perf_counter()

    def synth(_):
        # Deterministic pseudo-random corpus without PRNG machinery (RNG
        # kernels can be pathologically slow on tunneled devices; timing is
        # value-independent for a dense matmul anyway).
        r = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
        return jnp.sin(r * 0.9301 + c * 1.7113).astype(dtype)

    docs = jax.jit(synth)(0)
    row_scales = None
    if args.precision == "int8":
        docs, row_scales = jax.jit(quantize_rows_int8)(docs)
    _ = np.asarray(docs[0, :1])  # force materialization
    log(f"corpus generation+pack: {time.perf_counter() - t0:.2f}s "
        f"({docs.size * docs.dtype.itemsize / 1e9:.2f} GB on device)")

    n_valid = jnp.int32(n)
    queries = [
        jax.random.normal(jax.random.PRNGKey(100 + i), (args.batch, dim),
                          dtype=jnp.float32)
        for i in range(8)
    ]

    if args.kernel == "pallas":
        assert args.precision != "int8", "pallas kernel is float-only for now"
        assert pallas_supported(n_pad, dim, k), "pallas unsupported for this shape"

    # The corpus is an explicit argument (NOT a closure capture): captured
    # device constants get embedded in the lowered program — 3 GB of
    # constant upload per compile on remote setups.
    @jax.jit
    def step(corpus, scales, q):
        if args.precision == "int8":
            search8 = score_topk_int8 if args.kernel == "topk" else score_topk_int8_fast
            vals, idx = search8(corpus, scales, q, n_valid, k)
        elif args.kernel == "pallas":
            vals, idx = pallas_score_topk(corpus, q, n_valid, k)
        elif args.kernel == "fast":
            vals, idx = score_topk_fast(corpus, q, n_valid, k)
        else:
            vals, idx = score_topk(corpus, q, n_valid, k)
        # pack scores + indices into one array so the host round trip is a
        # single fetch (indices as f32 VALUES — exact below 2^24; bitcasts
        # produce denormals that some transports flush to zero)
        return jnp.concatenate([vals, idx.astype(jnp.float32)], axis=1)

    # warmup / compile
    t0 = time.perf_counter()
    _ = np.asarray(step(docs, row_scales, queries[0]))
    log(f"compile+first query: {time.perf_counter() - t0:.2f}s")

    # timed: each iteration is one full query -> host-visible result
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        packed = np.asarray(step(docs, row_scales, queries[i % len(queries)]))
        times.append(time.perf_counter() - t0)
    vals = packed[:, :k]
    idx = packed[:, k:].astype(np.int64)
    assert (idx >= 0).all() and (idx < n).all(), "padding leaked into top-k"
    assert len(np.unique(idx[0])) == k, "duplicate/corrupted indices"

    p50 = _percentile(times, 0.50)
    p99 = _percentile(times, 0.99)
    per_query = p50 / args.batch
    log(f"p50 {p50 * 1e3:.3f} ms | p99 {p99 * 1e3:.3f} ms | "
        f"per-query {per_query * 1e3:.4f} ms | "
        f"QPS {args.batch / p50:,.0f}")

    # Batched throughput companion metric (one step amortizes the corpus
    # read over many queries) — same executable family, one extra compile.
    batched = None
    if args.batch == 1 and args.preset != "smoke":
        qb = jax.random.normal(
            jax.random.PRNGKey(7), (256, dim), dtype=jnp.float32
        )
        _ = np.asarray(step(docs, row_scales, qb))
        btimes = []
        for _ in range(max(5, args.iters // 3)):
            t0 = time.perf_counter()
            _ = np.asarray(step(docs, row_scales, qb))
            btimes.append(time.perf_counter() - t0)
        bp50 = _percentile(btimes, 0.50)
        batched = {
            "batch": 256,
            "p50_ms": round(bp50 * 1e3, 3),
            "per_query_ms": round(bp50 / 256 * 1e3, 4),
            "qps": round(256 / bp50, 1),
            "vs_baseline": round(ref_s / (bp50 / 256), 1) if ref_s else None,
        }
        log(f"batched-256: p50 {bp50 * 1e3:.1f} ms | "
            f"per-query {bp50 / 256 * 1e3:.4f} ms | QPS {256 / bp50:,.0f}")

    result = {
        "metric": (
            f"p50 exact cosine top-{k} over {n}x{dim} "
            f"({args.precision}, batch={args.batch}, end-to-end incl. "
            f"host round-trip)"
        ),
        "value": round(p50 * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(ref_s / per_query, 1) if ref_s else None,
        "per_query_ms": round(per_query * 1e3, 4),
        "qps": round(args.batch / p50, 1),
        "p99_ms": round(p99 * 1e3, 4),
        "kernel": args.kernel,
        "batched": batched,
        "device": str(dev),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
