"""Selection shootout round 3: the pallas extraction kernel vs the field.

Prior rounds (BENCHMARKS.md): matmul floor 4.74 ms (b=256); best exact so
far tiled(m=32) 80.7 ms; plain lax.top_k k=400 310 ms.

    python benchmarks/tpu_select3.py
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
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from svs_tpu.ops.pallas_extract import (
        BLOCK_N,
        score_topk_extract_packed,
    )
    from svs_tpu.ops.topk import (
        score_topk_packed,
        score_topk_tiled_packed,
        unpack_vals_idx,
    )

    n, dim = args.n, args.dim
    n_pad = ((n + BLOCK_N - 1) // BLOCK_N) * BLOCK_N
    dev = jax.devices()[0]
    log(f"device {dev}; corpus {n}x{dim} (padded {n_pad})")

    def synth(_):
        r_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
        c_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
        m = jnp.sin(r_ * 0.9301 + c_ * 1.7113)
        m = m / jnp.sqrt(jnp.sum(m * m, axis=1, keepdims=True))
        return m.astype(jnp.bfloat16)

    docs = jax.jit(synth)(0)
    _ = np.asarray(docs[0, :1])
    nv = jnp.int32(n)
    rng = np.random.default_rng(42)
    q256 = jnp.asarray(
        rng.standard_normal((256, dim)).astype(np.float32) / np.sqrt(dim)
    )
    q1 = q256[:1]

    rows = []

    def e2e_ms(fn, q, iters):
        np.asarray(fn(docs, q, nv))
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            np.asarray(fn(docs, q, nv))
            ts.append(time.perf_counter() - t)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    def chained(fn, length):
        @jax.jit
        def run(d, q, nvv):
            def body(i, qc):
                out = fn(d, qc, nvv)
                return qc + 0.0 * out[0, 0].astype(qc.dtype)

            qf = jax.lax.fori_loop(0, length, body, q)
            return fn(d, qf, nvv)

        return run

    def device_ms(fn, q, chain):
        short, long_ = chained(fn, 1), chained(fn, chain)
        np.asarray(short(docs, q, nv))
        np.asarray(long_(docs, q, nv))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(short(docs, q, nv))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(long_(docs, q, nv))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / (chain - 1) * 1e3

    def run(name, fn, q):
        log(f"running {name} ...")
        t0 = time.perf_counter()
        e2e = e2e_ms(fn, q, args.iters)
        dv = device_ms(fn, q, args.chain)
        rows.append(
            {
                "config": name,
                "batch": q.shape[0],
                "e2e_ms": round(e2e, 3),
                "device_ms": round(dv, 3),
                "device_per_query_ms": round(dv / q.shape[0], 4),
            }
        )
        log(f"  -> e2e {e2e:.2f} ms, device {dv:.2f} ms "
            f"({time.perf_counter() - t0:.0f}s)")

    def mk_extract(kk, sd):
        def f(d, q, nvv):
            return score_topk_extract_packed(d, q, nvv, kk, score_dtype=sd)

        return f

    def mk_plain(kk):
        return lambda d, q, nvv: score_topk_packed(d, q, nvv, kk)

    def mk_tiled(kk, m):
        return lambda d, q, nvv: score_topk_tiled_packed(d, q, nvv, kk, m=m)

    # correctness first, on-device, before paying for timings
    pl_ = np.asarray(score_topk_packed(docs, q256[:8], nv, 50))
    ex_ = np.asarray(mk_extract(50, "f32")(docs, q256[:8], nv))
    v1, r1 = unpack_vals_idx(pl_, 50)
    v2, r2 = unpack_vals_idx(ex_, 50)
    ok = bool(np.array_equal(r1, r2) and np.allclose(v1, v2))
    log(f"extract == plain winners on device: {ok}")
    if not ok:
        log("MISMATCH — dumping first row")
        log("plain", r1[0][:10], v1[0][:5])
        log("extract", r2[0][:10], v2[0][:5])

    run("extract f32 k400 b256", mk_extract(400, "f32"), q256)
    run("extract bf16 k400 b256", mk_extract(400, "bf16"), q256)
    run("extract f32 k100 b256", mk_extract(100, "f32"), q256)
    run("extract f32 k400 b1", mk_extract(400, "f32"), q1)
    run("tiled m32 k400 b256 (ref)", mk_tiled(400, 32), q256)
    run("plain k100 b256 (ref)", mk_plain(100), q256)

    report = {
        "corpus": f"{n}x{dim}",
        "device": str(dev),
        "extract_matches_plain": ok,
        "rows": rows,
    }
    print(json.dumps(report, indent=2), flush=True)

    out = Path(args.out)
    lines = [
        f"\n## {time.strftime('%Y-%m-%d %H:%M')} — selection shootout 3 "
        f"(pallas extract) {n}x{dim}, {dev}\n",
        "| config | batch | e2e ms | device ms | device ms/query |",
        "|---|---|---|---|---|",
    ]
    for r_ in rows:
        lines.append(
            f"| {r_['config']} | {r_['batch']} | {r_['e2e_ms']} | "
            f"{r_['device_ms']} | {r_['device_per_query_ms']} |"
        )
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    log(f"appended results to {out}")


if __name__ == "__main__":
    main()
