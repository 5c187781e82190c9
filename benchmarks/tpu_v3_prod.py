"""Production guarded (v3) path on real TPU: soundness check + shootout.

Validates ``svs_tpu.ops.pallas_extract`` v3 against an on-device oracle
at the headline shape (1M x 1536 bf16, c=400), then times the PRODUCTION
packed paths (v2 vs v3, bf16 and int8, b=256 and b=1) with chained
iterations to isolate device time from tunnel RPC.

Run on the TPU box: python benchmarks/tpu_v3_prod.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from svs_tpu.ops.pallas_extract import (
    GUARD_KEY_EPS,
    fused2_supported,
    fused3_candidates,
    fused3_supported,
    score_topk_fused2_int8_packed,
    score_topk_fused2_packed,
    score_topk_fused3_int8_packed,
    score_topk_fused3_packed,
)

N, D = 1_015_808, 1536
K = 400
NV = N - 100


@jax.jit
def synth(_):
    r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    x = x - jnp.floor(x) - 0.5
    x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x.astype(jnp.bfloat16)


@jax.jit
def oracle_topk(docs, q):
    """True top-100 of the bf16 prescore domain, computed the exact way
    (full f32-accumulated score matrix + lax.top_k)."""
    scores = jax.lax.dot_general(
        q, docs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < NV
    scores = jnp.where(mask, scores, -jnp.inf)
    return jax.lax.top_k(scores, 100)


def chained(fn, length):
    @jax.jit
    def f(*args):
        q = args[1]

        def body(i, qc):
            out = fn(args[0], qc, *args[2:])
            return qc + 0.0 * out.reshape(-1)[0].astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        return fn(args[0], qf, *args[2:]).reshape(-1)[:1]

    return f


def time_case(label, fn, args, iters=11, reps=5):
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
        tl = time.perf_counter() - t0
        runs.append(max(0.0, (tl - ts) / (iters - 1)))
    runs.sort()
    print(
        f"{label:18}: median {runs[len(runs) // 2] * 1e3:7.3f} ms "
        f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f})"
    )
    return runs[len(runs) // 2]


def main():
    print("device:", jax.devices()[0])
    assert fused3_supported(N, D, 256, K) and fused2_supported(N, D, 256, K)

    docs = synth(0)
    np.asarray(docs[0, :1])  # materialize (ghost transfer happens here)

    rng = np.random.default_rng(0)
    q = rng.standard_normal((256, D)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    qd = jnp.asarray(q)
    nv = jnp.int32(NV)

    # --- soundness on silicon: v3 contract vs the exact oracle ---------
    q8 = qd[:8]
    vals, rows, bound = fused3_candidates(docs, q8, nv, K)
    ovals, orows = oracle_topk(docs, q8.astype(jnp.bfloat16))
    vals, rows, bound = np.asarray(vals), np.asarray(rows), np.asarray(bound)
    ovals, orows = np.asarray(ovals), np.asarray(orows)
    worst = 0.0
    for b in range(8):
        got = set(rows[b].tolist())
        assert len(got) == K, "duplicate rows"
        assert (rows[b] < NV).all() and (rows[b] >= 0).all()
        for v, r in zip(ovals[b], orows[b]):
            if int(r) not in got:
                assert v <= bound[b] + GUARD_KEY_EPS + 1e-6, (
                    b, int(r), float(v), float(bound[b])
                )
                worst = max(worst, float(v - bound[b]))
    n_missing = sum(
        1
        for b in range(8)
        for r in orows[b]
        if int(r) not in set(rows[b].tolist())
    )
    print(
        f"soundness OK: {n_missing} of 800 oracle rows outside the "
        f"candidate sets, all bounded (worst excess {worst:.2e}); "
        f"bounds {bound.min():.4f}..{bound.max():.4f}, "
        f"oracle k-th {ovals[:, -1].min():.4f}"
    )

    # --- timing: production packed paths -------------------------------
    def v2_bf16(d_, q_, nv_):
        return score_topk_fused2_packed(d_, q_, nv_, K)

    def v3_bf16(d_, q_, nv_):
        return score_topk_fused3_packed(d_, q_, nv_, K)

    time_case("bf16 b=256 v2", v2_bf16, (docs, qd, nv))
    t3 = time_case("bf16 b=256 v3", v3_bf16, (docs, qd, nv))
    print(f"  -> {t3 / 256 * 1e6:.1f} us/query device")

    for b in (1, 8, 32, 64, 128):
        qb = qd[:b]
        time_case(f"bf16 b={b:<3} v2", v2_bf16, (docs, qb, nv))
        time_case(f"bf16 b={b:<3} v3", v3_bf16, (docs, qb, nv))

    @jax.jit
    def quant_blocked(d_):
        def one(blk):
            s = jnp.max(jnp.abs(blk.astype(jnp.float32)), axis=1) / 127.0
            s = jnp.maximum(s, 1e-12)
            qq = jnp.clip(
                jnp.round(blk.astype(jnp.float32) / s[:, None]), -127, 127
            ).astype(jnp.int8)
            return qq, s
        qs, ss = jax.lax.map(one, d_.reshape(124, 8192, D))
        return qs.reshape(N, D), ss.reshape(N)

    di8, dscales = quant_blocked(docs)
    di8.block_until_ready()

    def v2_int8(d_, q_, s_, nv_):
        return score_topk_fused2_int8_packed(d_, s_, q_, nv_, K)

    def v3_int8(d_, q_, s_, nv_):
        return score_topk_fused3_int8_packed(d_, s_, q_, nv_, K)

    time_case("int8 b=256 v2", v2_int8, (di8, qd, dscales, nv))
    time_case("int8 b=256 v3", v3_int8, (di8, qd, dscales, nv))


if __name__ == "__main__":
    main()
