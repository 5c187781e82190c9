"""Probe: does the v5e run int4 matmuls natively, and at what rate?

If s4 x s4 -> s32 dot_general compiles and beats int8 wall-clock at the
same logical shape, an int4 prescore pack (0.77 GB at 1M x 1536 — HBM
floor ~0.95 ms) under the verified f32 rescore would halve single-query
latency again.  The quantization error per element is 8x int8's, so the
candidate widths grow; whether the bound stays practical is a separate
question — this probe is only about kernel support + speed.

Run:  python benchmarks/tpu_int4_probe.py [n_rows]

RESULT (2026-08-19, TPU v5 lite0): dead, twice over.
  1. Kernel: s4 x s4 -> s32 dot_general raises UNIMPLEMENTED on the v5e
     backend (tested both as jit arguments — which additionally break the
     tunnel client with a RecursionError on the S4 aval — and as
     closure-embedded constants, where compilation succeeds but execution
     hits the TPU backend's Unimplemented).  int8 control at the same
     logical shape: 0.347 ms/step (131k x 1536, b=256).
  2. Statistics: even with a working kernel, the int4 Hoeffding bound at
     unit-norm d=1536 is eps ~0.1 (scales are 8x int8's; the
     residual-x-residual term alone is ~0.08) — larger than typical
     top-100 score margins at 1M docs, so the verified-exact rescore
     would widen to most of the corpus.  int4 prescore cannot support
     exact retrieval at this dimensionality; int8 remains the floor
     precision (see precision='auto').
"""
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131_072
    dim, b = 1536, 256
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (n, dim), dtype=jnp.float32)
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
    q = jax.random.normal(jax.random.PRNGKey(1), (b, dim), dtype=jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)

    def quant(x, bits):
        lim = (1 << (bits - 1)) - 1
        scale = jnp.max(jnp.abs(x), axis=1, keepdims=True) / lim
        return jnp.round(x / scale), scale

    results = {}
    for bits, dtype in ((8, jnp.int8), (4, jnp.int4)):
        try:
            cq, _ = jax.jit(lambda x: quant(x, bits))(f)
            qq, _ = jax.jit(lambda x: quant(x, bits))(q)
            c_i = cq.astype(dtype)
            q_i = qq.astype(dtype)

            @jax.jit
            def dot(c, qm):
                return jax.lax.dot_general(
                    qm, c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

            out = dot(c_i, q_i)
            np.asarray(out[:1, :1])  # compile + run
            # chained timing: slope between chain lengths isolates device
            def chained(length):
                @jax.jit
                def run(c, qm):
                    def body(i, acc):
                        o = dot(c, qm)
                        return acc + o[0, 0]
                    acc = jax.lax.fori_loop(0, length, body, jnp.int32(0))
                    return acc
                return run

            s1, s9 = chained(1), chained(9)
            np.asarray(s1(c_i, q_i)); np.asarray(s9(c_i, q_i))
            runs = []
            for _ in range(5):
                t0 = time.perf_counter(); np.asarray(s1(c_i, q_i))
                a = time.perf_counter() - t0
                t0 = time.perf_counter(); np.asarray(s9(c_i, q_i))
                bt = time.perf_counter() - t0
                runs.append((bt - a) / 8)
            runs.sort()
            ms = runs[len(runs) // 2] * 1e3
            gb = n * dim * (1 if bits == 8 else 0.5) / 1e9
            results[bits] = ms
            print(f"int{bits}: {ms:.3f} ms/step (corpus {gb:.2f} GB -> "
                  f"{gb / (ms / 1e3):.0f} GB/s effective)", flush=True)
        except Exception as exc:
            print(f"int{bits}: FAILED — {type(exc).__name__}: {exc}",
                  flush=True)
    if 4 in results and 8 in results:
        print(f"int4/int8 speedup: {results[8] / results[4]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
