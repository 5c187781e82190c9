"""Full on-chip benchmark suite: all kernels and precisions in ONE process.

Runs the headline corpus (1M x 1536) through every search variant and
appends a markdown row table to BENCHMARKS.md plus a JSON blob to stdout.
Designed for tunneled TPU setups: a single process claims the device once,
reuses one synthesized corpus, and never interrupts an in-flight compile.

    python benchmarks/tpu_suite.py [--n 1000000] [--dim 1536] [--k 100]
                                   [--skip pallas,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_ms(fn, args_list, iters):
    """Median end-to-end (dispatch -> host fetch) milliseconds."""
    import numpy as np

    np.asarray(fn(*args_list[0]))  # warm/compile
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args_list[i % len(args_list)]))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=1536)
    parser.add_argument("--k", type=int, default=100)
    parser.add_argument("--iters", type=int, default=15)
    parser.add_argument("--skip", default="")
    parser.add_argument("--out", default="BENCHMARKS.md")
    args = parser.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # the superseded v1 bitonic kernel lives next to this file now
    from pallas_topk_v1 import pallas_score_topk, pallas_supported
    from svs_tpu.ops.quant import (
        quantize_rows_int8,
        score_topk_int8,
        score_topk_int8_fast,
    )
    from svs_tpu.ops.topk import score_topk, score_topk_fast, scores_matmul

    n, dim, k = args.n, args.dim, args.k
    n_pad = ((n + 255) // 256) * 256
    dev = jax.devices()[0]
    log(f"device {dev}; corpus {n}x{dim} (padded {n_pad}); top-{k}")

    t0 = time.perf_counter()

    def synth(_):
        r = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
        return jnp.sin(r * 0.9301 + c * 1.7113).astype(jnp.bfloat16)

    docs = jax.jit(synth)(0)
    _ = np.asarray(docs[0, :1])
    log(f"corpus synth: {time.perf_counter() - t0:.1f}s")
    n_valid = jnp.int32(n)

    def queries(b, count=6):
        return [
            jnp.asarray(
                np.random.default_rng(100 + i).standard_normal(
                    (b, dim), dtype=np.float32
                )
            )
            for i in range(count)
        ]

    q1, q256 = queries(1), queries(256, count=2)
    rows = []

    def run(name, fn, qs, batch):
        if name.split(" ")[0] in skip:
            log(f"skip {name}")
            return
        log(f"running {name} ...")
        t0 = time.perf_counter()
        ms = fetch_ms(fn, [(q,) for q in qs], args.iters)
        rows.append(
            {
                "config": name,
                "batch": batch,
                "p50_ms": round(ms, 3),
                "per_query_ms": round(ms / batch, 4),
                "qps": round(batch / ms * 1e3, 1),
            }
        )
        log(f"  -> p50 {ms:.2f} ms  ({time.perf_counter() - t0:.0f}s total)")

    # NOTE: the corpus must flow through as an ARGUMENT to the jitted
    # search functions (they are jitted themselves) — wrapping them in an
    # outer jit that closes over `docs` would embed 3 GB of constants into
    # the lowered program and stall remote compilation for tens of minutes.
    # indices as f32 values (bitcast denormals get flushed by the tunnel)
    pack = jax.jit(
        lambda v, i: jnp.concatenate([v, i.astype(jnp.float32)], axis=1)
    )

    def xla_topk_b(q):
        return pack(*score_topk(docs, q, n_valid, k))

    def xla_fast_b(q):
        return pack(*score_topk_fast(docs, q, n_valid, k))

    run("bf16 lax.top_k", xla_topk_b, q1, 1)
    run("bf16 verified-fast", xla_fast_b, q1, 1)
    run("bf16 verified-fast b256", xla_fast_b, q256, 256)
    run("bf16 lax.top_k b256", xla_topk_b, q256, 256)

    if "int8" not in skip:
        qd, scales = jax.jit(quantize_rows_int8)(docs)
        _ = np.asarray(scales[:1])

        def int8_fast_b(q):
            return pack(*score_topk_int8_fast(qd, scales, q, n_valid, k))

        run("int8 verified-fast", int8_fast_b, q1, 1)
        run("int8 verified-fast b256", int8_fast_b, q256, 256)

    if "pallas" not in skip and pallas_supported(n_pad, dim, k):

        def pallas_b(q):
            return pack(*pallas_score_topk(docs, q, n_valid, k))

        run("bf16 pallas-stream", pallas_b, q1, 1)
        run("bf16 pallas-stream b256", pallas_b, q256, 256)

    report = {
        "corpus": f"{n}x{dim}",
        "k": k,
        "device": str(dev),
        "rows": rows,
    }
    print(json.dumps(report, indent=2), flush=True)

    out = Path(args.out)
    lines = [
        f"\n## {time.strftime('%Y-%m-%d %H:%M')} — {n}x{dim}, top-{k}, {dev}\n",
        "| config | batch | p50 ms | per-query ms | QPS |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['config']} | {r['batch']} | {r['p50_ms']} | "
            f"{r['per_query_ms']} | {r['qps']} |"
        )
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    log(f"appended results to {out}")


if __name__ == "__main__":
    main()
