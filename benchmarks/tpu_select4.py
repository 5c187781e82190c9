"""Selection shootout round 4: fused matmul+extraction vs two-pass, H=8.

    python benchmarks/tpu_select4.py
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
        BLOCK_N,
        FUSED_BLOCK_N,
        fused_supported,
        score_topk_extract_packed,
        score_topk_fused_packed,
    )
    from svs_tpu.ops.topk import score_topk_packed, scores_matmul, unpack_vals_idx

    n, dim = 1_000_000, 1536
    align = max(BLOCK_N, FUSED_BLOCK_N)
    n_pad = ((n + align - 1) // align) * align
    dev = jax.devices()[0]
    log(f"device {dev}; corpus {n}x{dim} (padded {n_pad})")

    def synth(_):
        r_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
        c_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
        x = jnp.sin(r_ * 12.9898 + c_ * 78.233) * 43758.5453
        x = x - jnp.floor(x) - 0.5
        x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        return x.astype(jnp.bfloat16)

    docs = jax.jit(synth)(0)
    _ = np.asarray(docs[0, :1])
    nv = jnp.int32(n)
    q256 = jnp.asarray(
        np.random.default_rng(42).standard_normal((256, dim)).astype(np.float32)
        / np.sqrt(dim)
    )
    q1 = q256[:1]
    assert fused_supported(n_pad, dim, 256, 400)

    rows = []

    def e2e_ms(fn, q, iters=5):
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

    def device_ms(fn, q, chain=6):
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
        e2e = e2e_ms(fn, q)
        dv = device_ms(fn, q)
        rows.append(
            {"config": name, "batch": q.shape[0], "e2e_ms": round(e2e, 3),
             "device_ms": round(dv, 3),
             "device_per_query_ms": round(dv / q.shape[0], 4)}
        )
        log(f"  -> e2e {e2e:.2f} ms, device {dv:.2f} ms "
            f"({time.perf_counter() - t0:.0f}s)")

    def mk_fused(kk):
        return lambda d, q, nvv: score_topk_fused_packed(d, q, nvv, kk)

    def mk_twopass(kk):
        return lambda d, q, nvv: score_topk_extract_packed(d, q, nvv, kk)

    # correctness on device first
    pl_ = np.asarray(score_topk_packed(docs, q256[:8], nv, 50))
    fu_ = np.asarray(mk_fused(50)(docs, q256[:8], nv))
    tp_ = np.asarray(mk_twopass(50)(docs, q256[:8], nv))
    v1, r1 = unpack_vals_idx(pl_, 50)
    v2, r2 = unpack_vals_idx(fu_, 50)
    v3, r3 = unpack_vals_idx(tp_, 50)
    ok_f = bool(np.array_equal(r1, r2) and np.allclose(v1, v2, atol=1e-5))
    ok_t = bool(np.array_equal(r1, r3) and np.allclose(v1, v3, atol=1e-5))
    log(f"fused == plain: {ok_f}; twopass == plain: {ok_t}")

    def matmul_only(d, q, nvv):
        return jnp.max(scores_matmul(d, q), axis=1, keepdims=True)

    run("matmul-only b256", jax.jit(matmul_only), q256)
    run("fused k400 b256", mk_fused(400), q256)
    run("twopass H8 k400 b256", mk_twopass(400), q256)
    run("fused k100 b256", mk_fused(100), q256)
    run("fused k400 b1", mk_fused(400), q1)
    run("twopass H8 k400 b1", mk_twopass(400), q1)

    report = {"device": str(dev), "fused_ok": ok_f, "twopass_ok": ok_t,
              "rows": rows}
    print(json.dumps(report, indent=2), flush=True)
    with open("BENCHMARKS.md", "a") as f:
        f.write(f"\n## {time.strftime('%Y-%m-%d %H:%M')} — shootout 4 "
                f"(fused extract, H=8) {n}x{dim}, {dev}\n\n")
        f.write("| config | batch | e2e ms | device ms | device ms/query |\n")
        f.write("|---|---|---|---|---|\n")
        for r_ in rows:
            f.write(f"| {r_['config']} | {r_['batch']} | {r_['e2e_ms']} | "
                    f"{r_['device_ms']} | {r_['device_per_query_ms']} |\n")
    log("appended results to BENCHMARKS.md")


if __name__ == "__main__":
    main()
