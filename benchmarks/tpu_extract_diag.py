"""Isolate the extraction pipeline's cost stages on the TPU.

Stages measured independently (same synthetic corpus as the shootouts):
  A. scores matmul + mask only
  B. A + pallas extract, outputs reduced (no merge, no cond)
  C. B + merge top_k (no cond/verify)
  D. full extract_topk (with in-graph verify + fallback cond)
  E. D with the fallback branch replaced by a no-op (cond cost probe)
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
        EXTRACT_H,
        _extract,
        extract_topk,
    )
    from svs_tpu.ops.topk import NEG_INF, scores_matmul

    n, dim, k = 1_000_000, 1536, 400
    n_pad = ((n + BLOCK_N - 1) // BLOCK_N) * BLOCK_N
    dev = jax.devices()[0]
    log(f"device {dev}; n_pad {n_pad}")

    def synth(_):
        r_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 0)
        c_ = jax.lax.broadcasted_iota(jnp.float32, (n_pad, dim), 1)
        m = jnp.sin(r_ * 0.9301 + c_ * 1.7113)
        m = m / jnp.sqrt(jnp.sum(m * m, axis=1, keepdims=True))
        return m.astype(jnp.bfloat16)

    docs = jax.jit(synth)(0)
    _ = np.asarray(docs[0, :1])
    nv = jnp.int32(n)
    q256 = jnp.asarray(
        np.random.default_rng(42).standard_normal((256, dim)).astype(np.float32)
        / np.sqrt(dim)
    )

    def masked(d, q, nvv):
        s = scores_matmul(d, q)
        live = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        return jnp.where(live < nvv, s, NEG_INF)

    def a_fn(d, q, nvv):
        return jnp.max(masked(d, q, nvv), axis=1, keepdims=True)

    def b_fn(d, q, nvv):
        ev, ei = _extract(masked(d, q, nvv))
        return jnp.max(ev, axis=1, keepdims=True) + jnp.max(
            ei, axis=1, keepdims=True
        )

    def c_fn(d, q, nvv):
        ev, ei = _extract(masked(d, q, nvv))
        vals, pos = jax.lax.top_k(ev, k)
        idx = jnp.take_along_axis(ei, pos, axis=1)
        return vals + idx

    def d_fn(d, q, nvv):
        vals, idx = extract_topk(masked(d, q, nvv), k)
        return vals + idx.astype(jnp.float32)

    def e_fn(d, q, nvv):
        s = masked(d, q, nvv)
        ev, ei = _extract(s)
        vals, pos = jax.lax.top_k(ev, k)
        idx = jnp.take_along_axis(ei, pos, axis=1).astype(jnp.int32)
        v_k = vals[:, k - 1 : k]
        tails = ev[:, EXTRACT_H - 1 :: EXTRACT_H]
        covered = jnp.logical_not(jnp.any(tails > v_k))

        def fast(_):
            return vals, idx

        def cheap(_):
            return vals * 0.0, idx * 0

        v, i = jax.lax.cond(covered, fast, cheap, None)
        return v + i.astype(jnp.float32)

    def chained(fn, length):
        @jax.jit
        def run(d, q, nvv):
            def body(i, qc):
                out = fn(d, qc, nvv)
                return qc + 0.0 * out[0, 0].astype(qc.dtype)

            qf = jax.lax.fori_loop(0, length, body, q)
            return fn(d, qf, nvv)

        return run

    def device_ms(fn):
        short, long_ = chained(fn, 1), chained(fn, 6)
        np.asarray(short(docs, q256, nv))
        np.asarray(long_(docs, q256, nv))
        ts, tl = [], []
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(short(docs, q256, nv))
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            np.asarray(long_(docs, q256, nv))
            tl.append(time.perf_counter() - t)
        return (min(tl) - min(ts)) / 5 * 1e3

    # first: is the covered flag actually true on this data?
    @jax.jit
    def flag_fn(d, q, nvv):
        s = masked(d, q, nvv)
        ev, ei = _extract(s)
        vals, pos = jax.lax.top_k(ev, k)
        v_k = vals[:, k - 1 : k]
        tails = ev[:, EXTRACT_H - 1 :: EXTRACT_H]
        per_q_hidden = jnp.sum((tails > v_k).astype(jnp.int32), axis=1)
        return jnp.stack(
            [jnp.sum(per_q_hidden), jnp.max(per_q_hidden)]
        ).astype(jnp.float32)

    fl = np.asarray(flag_fn(docs, q256, nv))
    log(f"hidden-check: total violations {fl[0]}, worst query {fl[1]}")

    out = {"hidden_violations": float(fl[0])}
    for name, fn in [
        ("A matmul+mask", a_fn),
        ("B +extract", b_fn),
        ("C +merge", c_fn),
        ("D full (verify+fallback)", d_fn),
        ("E verify+cheap-fallback", e_fn),
    ]:
        log(f"running {name} ...")
        t0 = time.perf_counter()
        ms = device_ms(fn)
        out[name] = round(ms, 2)
        log(f"  -> device {ms:.2f} ms ({time.perf_counter()-t0:.0f}s)")

    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
