"""Selection shootout round 2: approx_max_k, coarse gather, bigger tiles.

Round-2a results (BENCHMARKS.md): matmul floor 4.74 ms; plain lax.top_k
k=400 b=256 costs 310 ms device; tiled(m=32, tile=256) 80.7 ms.  This round
measures the remaining candidates for the k=400 batched-candidate config.

    python benchmarks/tpu_select2.py
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
    p.add_argument("--k", type=int, default=400)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--skip", default="")
    p.add_argument("--out", default="BENCHMARKS.md")
    args = p.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from svs_tpu.ops.topk import (
        NEG_INF,
        coarse_topk,
        pack_vals_idx,
        score_topk_fast,
        scores_matmul,
        tiled_topk,
        unpack_vals_idx,
    )

    n, dim, k = args.n, args.dim, args.k
    dev = jax.devices()[0]
    log(f"device {dev}; corpus {n}x{dim}; k={k}")

    def synth(n_pad):
        def f(_):
            r_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
            c_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
            m = jnp.sin(r_ * 0.9301 + c_ * 1.7113)
            m = m / jnp.sqrt(jnp.sum(m * m, axis=1, keepdims=True))
            return m.astype(jnp.bfloat16)

        d = jax.jit(f)(0)
        _ = np.asarray(d[0, :1])
        return d

    n_pad256 = ((n + 255) // 256) * 256
    n_pad1024 = ((n + 1023) // 1024) * 1024
    docs = synth(n_pad256)
    nv = jnp.int32(n)
    q256 = jnp.asarray(
        np.random.default_rng(42).standard_normal((256, dim)).astype(np.float32)
        / np.sqrt(dim)
    )

    rows = []

    def e2e_ms(fn, d, q, iters):
        np.asarray(fn(d, q, nv))
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            np.asarray(fn(d, q, nv))
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

    def device_ms(fn, d, q, chain):
        short, long_ = chained(fn, 1), chained(fn, chain)
        np.asarray(short(d, q, nv))
        np.asarray(long_(d, q, nv))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(short(d, q, nv))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(long_(d, q, nv))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / (chain - 1) * 1e3

    def run(name, fn, d=None, q=None):
        if any(s and s in name for s in skip):
            log(f"skip {name}")
            return
        d = docs if d is None else d
        q = q256 if q is None else q
        log(f"running {name} ...")
        t0 = time.perf_counter()
        e2e = e2e_ms(fn, d, q, args.iters)
        dv = device_ms(fn, d, q, args.chain)
        rows.append(
            {
                "config": name,
                "e2e_ms": round(e2e, 3),
                "device_ms": round(dv, 3),
                "device_per_query_ms": round(dv / q.shape[0], 4),
            }
        )
        log(f"  -> e2e {e2e:.2f} ms, device {dv:.2f} ms "
            f"({time.perf_counter() - t0:.0f}s)")

    def masked_scores(d, q, nvv, dtype=None):
        s = scores_matmul(d, q)
        live = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        s = jnp.where(live < nvv, s, NEG_INF)
        return s.astype(dtype) if dtype is not None else s

    # -- approx_max_k raw (selection floor; NOT exact) --------------------
    def mk_approx(recall, agg):
        def f(d, q, nvv):
            s = masked_scores(d, q, nvv)
            v, i = jax.lax.approx_max_k(
                s, k, recall_target=recall, aggregate_to_topk=agg
            )
            return pack_vals_idx(v[:, :k], i[:, :k])

        return f

    run("approx r0.95 agg k400", mk_approx(0.95, True))
    run("approx r0.999 agg k400", mk_approx(0.999, True))
    run("approx r0.999 raw k400", mk_approx(0.999, False))

    # -- verified approx (exact) ------------------------------------------
    def vfast(d, q, nvv):
        v, i = score_topk_fast(d, q, nvv, k)
        return pack_vals_idx(v, i)

    run("verified-approx k400", vfast)

    # -- coarse gather (exact) ---------------------------------------------
    def mk_coarse(kt, m, tile):
        def f(d, q, nvv):
            s = masked_scores(d, q, nvv)
            v, i = coarse_topk(s, k, tiles_kept=kt, m=m, tile=tile)
            return pack_vals_idx(v, i)

        return f

    run("coarse kt400 m8 t256", mk_coarse(400, 8, 256))
    run("coarse kt800 m8 t256", mk_coarse(800, 8, 256))
    run("coarse kt800 m4 t256", mk_coarse(800, 4, 256))

    # -- sort-slice per tile (algorithmic probe) ---------------------------
    def sort_slice(d, q, nvv):
        s = masked_scores(d, q, nvv)
        b = s.shape[0]
        t3 = s.reshape(b, -1, 256)
        sv = jnp.sort(t3, axis=-1)[:, :, -32:]
        v, i = jax.lax.top_k(sv.reshape(b, -1), k)
        return pack_vals_idx(v, i.astype(jnp.int32))

    run("sortslice m32 t256 (values only)", sort_slice)

    # -- tile=1024 variants (needs 1024-row padding) ------------------------
    docs1024 = synth(n_pad1024)

    def mk_tiled1024(m):
        def f(d, q, nvv):
            s = masked_scores(d, q, nvv)
            v, i = tiled_topk(s, k, m=m, tile=1024)
            return pack_vals_idx(v, i)

        return f

    run("tiled m8 t1024", mk_tiled1024(8), d=docs1024)
    run("tiled m32 t1024", mk_tiled1024(32), d=docs1024)
    run("coarse kt400 m8 t1024", mk_coarse(400, 8, 1024), d=docs1024)

    # correctness spot check for the coarse path on device
    from svs_tpu.ops.topk import score_topk_packed

    pl_ = np.asarray(score_topk_packed(docs, q256[:4], nv, 50))
    co_ = np.asarray(mk_coarse(100, 8, 256)(docs, q256[:4], nv))
    v1, r1 = unpack_vals_idx(pl_, 50)
    v2, r2 = unpack_vals_idx(co_, k)
    ok = bool(
        np.array_equal(r1, r2[:, :50]) and np.allclose(v1, v2[:, :50])
    )
    log(f"coarse == plain winners on device: {ok}")

    report = {"corpus": f"{n}x{dim}", "k": k, "device": str(dev),
              "coarse_matches_plain": ok, "rows": rows}
    print(json.dumps(report, indent=2), flush=True)

    out = Path(args.out)
    lines = [
        f"\n## {time.strftime('%Y-%m-%d %H:%M')} — selection shootout 2 "
        f"{n}x{dim} k={k} b=256, {dev}\n",
        "| config | e2e ms | device ms | device ms/query |",
        "|---|---|---|---|",
    ]
    for r_ in rows:
        lines.append(
            f"| {r_['config']} | {r_['e2e_ms']} | {r_['device_ms']} | "
            f"{r_['device_per_query_ms']} |"
        )
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    log(f"appended results to {out}")


if __name__ == "__main__":
    main()
