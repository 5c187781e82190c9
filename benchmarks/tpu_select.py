"""On-chip shootout for batched exact selection (the round-2 perf target).

Round 1 measured batch-256 retrieval at ~120 ms with ~82 ms in
``lax.top_k`` over the [256, 1M] score matrix (~3% MFU).  This script
measures every candidate replacement in ONE process (tunnel discipline:
one device claim, no mid-RPC kills) and reports BOTH:

- ``e2e_ms``: dispatch -> host fetch (what a tunneled client sees), and
- ``device_ms``: isolated device time via chained iterations (run the op
  N times with a data dependency, fetch once; per-iter = slope between
  two chain lengths) — immune to the ~30 ms RPC floor.

    python benchmarks/tpu_select.py [--n 1000000] [--dim 1536] [--k 400]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=1536)
    p.add_argument("--k", type=int, default=400)  # candidate_count(100)
    p.add_argument("--iters", type=int, default=7)
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--skip", default="")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from svs_tpu.ops.topk import (
        score_topk_packed,
        score_topk_tiled_packed,
        scores_matmul,
        unpack_vals_idx,
        pack_vals_idx,
    )

    n, dim, k = args.n, args.dim, args.k
    n_pad = ((n + 255) // 256) * 256
    dev = jax.devices()[0]
    log(f"device {dev}; corpus {n}x{dim} (padded {n_pad}); k={k}")

    # --- wide (int32) transport validation: bit patterns must survive ----
    vals = jnp.asarray(np.array([[1e-40, -0.5, 3.14159, 0.0]], np.float32))
    idx = jnp.asarray(np.array([[2**24 + 1, 0, 7, 2**30]], np.int32))
    packed = jax.jit(lambda v, i: pack_vals_idx(v, i, wide=True))(vals, idx)
    v, r = unpack_vals_idx(np.asarray(packed), 4, wide=True)
    wide_ok = bool(
        np.array_equal(v, np.asarray(vals)) and np.array_equal(r, np.asarray(idx))
    )
    log(f"wide int32 transport exact through tunnel: {wide_ok}")

    t0 = time.perf_counter()

    def synth(_):
        r_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
        c_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
        m = jnp.sin(r_ * 0.9301 + c_ * 1.7113)
        m = m / jnp.sqrt(jnp.sum(m * m, axis=1, keepdims=True))
        return m.astype(jnp.bfloat16)

    docs = jax.jit(synth)(0)
    _ = np.asarray(docs[0, :1])
    log(f"corpus synth: {time.perf_counter() - t0:.1f}s")
    n_valid = jnp.int32(n)

    def mk_queries(b):
        return jnp.asarray(
            np.random.default_rng(42).standard_normal((b, dim)).astype(np.float32)
            / np.sqrt(dim)
        )

    q1, q256 = mk_queries(1), mk_queries(256)

    rows = []

    def e2e_ms(fn, q, iters):
        np.asarray(fn(docs, q, n_valid))  # compile+warm
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            np.asarray(fn(docs, q, n_valid))
            ts.append(time.perf_counter() - t)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    def chained(fn, length):
        @jax.jit
        def run(d, q, nv):
            def body(i, qc):
                out = fn(d, qc, nv)
                return qc + 0.0 * out[0, 0].astype(qc.dtype)

            qf = jax.lax.fori_loop(0, length, body, q)
            return fn(d, qf, nv)

        return run

    def device_ms(fn, q, chain):
        """Per-iteration device time from the slope between chain lengths."""
        short, long_ = chained(fn, 1), chained(fn, chain)
        np.asarray(short(docs, q, n_valid))
        np.asarray(long_(docs, q, n_valid))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(short(docs, q, n_valid))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(long_(docs, q, n_valid))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / (chain - 1) * 1e3

    def run(name, fn, q, batch, kk):
        if any(s and s in name for s in skip):
            log(f"skip {name}")
            return
        log(f"running {name} ...")
        t0 = time.perf_counter()
        e2e = e2e_ms(fn, q, args.iters)
        dev_t = device_ms(fn, q, args.chain)
        rows.append(
            {
                "config": name,
                "batch": batch,
                "k": kk,
                "e2e_ms": round(e2e, 3),
                "device_ms": round(dev_t, 3),
                "device_per_query_ms": round(dev_t / batch, 4),
            }
        )
        log(
            f"  -> e2e {e2e:.2f} ms, device {dev_t:.2f} ms "
            f"({time.perf_counter() - t0:.0f}s incl. compiles)"
        )

    # matmul-only roofline reference (scores reduced to keep fetch tiny)
    def matmul_only(d, q, nv):
        s = scores_matmul(d, q)
        return jnp.max(s, axis=1, keepdims=True)

    matmul_only_j = jax.jit(matmul_only)

    def mk_plain(kk):
        return lambda d, q, nv: score_topk_packed(d, q, nv, kk)

    def mk_tiled(kk, m, sd):
        return lambda d, q, nv: score_topk_tiled_packed(
            d, q, nv, kk, m=m, score_dtype=sd
        )

    # ---- batch 256, k=400 (the real batched-retrieval configuration) ----
    run("matmul-only b256", matmul_only_j, q256, 256, 0)
    run("xla top_k b256 k400", jax.jit(mk_plain(k), static_argnums=()), q256, 256, k)
    run("tiled m16 f32 b256 k400", mk_tiled(k, 16, "f32"), q256, 256, k)
    run("tiled m16 bf16 b256 k400", mk_tiled(k, 16, "bf16"), q256, 256, k)
    run("tiled m8 bf16 b256 k400", mk_tiled(k, 8, "bf16"), q256, 256, k)
    run("tiled m32 bf16 b256 k400", mk_tiled(k, 32, "bf16"), q256, 256, k)

    # ---- batch 1 (interactive latency) ----
    run("matmul-only b1", matmul_only_j, q1, 1, 0)
    run("xla top_k b1 k400", mk_plain(k), q1, 1, k)
    run("tiled m16 bf16 b1 k400", mk_tiled(k, 16, "bf16"), q1, 1, k)

    # ---- k=100 no-rescore shape ----
    run("xla top_k b256 k100", mk_plain(100), q256, 256, 100)
    run("tiled m8 bf16 b256 k100", mk_tiled(100, 8, "bf16"), q256, 256, 100)

    # correctness spot check on-device: tiled vs plain, same winners
    pl = np.asarray(score_topk_packed(docs, q256[:4], n_valid, 50))
    tl_ = np.asarray(
        score_topk_tiled_packed(docs, q256[:4], n_valid, 50, m=16)
    )
    v1, r1 = unpack_vals_idx(pl, 50)
    v2, r2 = unpack_vals_idx(tl_, 50)
    sel_ok = bool(np.array_equal(r1, r2) and np.allclose(v1, v2))
    log(f"tiled == plain winners on device: {sel_ok}")

    report = {
        "corpus": f"{n}x{dim}",
        "device": str(dev),
        "wide_int32_transport_ok": wide_ok,
        "tiled_matches_plain_on_device": sel_ok,
        "rows": rows,
    }
    print(json.dumps(report, indent=2), flush=True)

    out = Path(args.out)
    lines = [
        f"\n## {time.strftime('%Y-%m-%d %H:%M')} — selection shootout "
        f"{n}x{dim}, {dev}\n",
        "| config | batch | k | e2e ms | device ms | device ms/query |",
        "|---|---|---|---|---|---|",
    ]
    for r_ in rows:
        lines.append(
            f"| {r_['config']} | {r_['batch']} | {r_['k']} | {r_['e2e_ms']} | "
            f"{r_['device_ms']} | {r_['device_per_query_ms']} |"
        )
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    log(f"appended results to {out}")


if __name__ == "__main__":
    main()
