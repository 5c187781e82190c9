"""bf16 fused3 (guarded) batched-selection variant shootout.

Same methodology as tpu_int8_opt.py (which found DIM_CHUNK_INT8=256
worth 8.5%): bf16 b=256 runs 6.35-6.5 ms device vs a ~4.8 ms matmul
floor — is any of that emit/geometry recoverable?

Variants (1M x 1536 bf16, b=256, c=400):
- mm128/mm256: matmul-only floor at contraction chunk 128 / 256;
- v3: production geometry (block 8192, chunk 128);
- v3c256: chunk 256 (VMEM: acc 8 MB f32 + 2x4 MB bf16 doc blocks — may
  not fit; reported as FAILED if so);
- v3b4096: block 4096 + chunk 256 (acc 4 MB, doc blocks 2 MB; NSUB=4,
  same keys/doc so the same bound quality and GUARD_MAX_C budget per
  doc).

Run on the TPU:  python benchmarks/tpu_bf16_opt.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, B = 1_015_808, 1536, 256
SUB3 = 1024
H3 = 4
QS3 = float(1 << 12)
OUT_LANES = 128
KEY_BIAS = 1.0625
KEY_DEAD = -float(1 << 24)


def make_kern(variant: str, block_n: int):
    nsub = block_n // SUB3

    def kern(nv_ref, q_ref, docs_ref, out_ref, acc_ref):
        j = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(c == 0)
        def _z():
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

        acc_ref[:] += jax.lax.dot_general(
            q_ref[:], docs_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == nc - 1)
        def _e():
            if variant == "mm":
                out_ref[:, :] = acc_ref[:, :OUT_LANES]
                return
            nv = nv_ref[0]
            b = acc_ref.shape[0]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (b, SUB3), 1
            ).astype(jnp.float32)
            guard = jnp.full((b, 1), KEY_DEAD, jnp.float32)
            for s in range(nsub):
                lo = s * SUB3
                keys = (
                    jnp.floor(
                        (acc_ref[:, lo: lo + SUB3] + KEY_BIAS) * QS3
                    ) * float(SUB3) + lane
                )
                live = jnp.clip(
                    nv - (j * block_n + lo), 0, SUB3
                ).astype(jnp.float32)
                keys = jnp.where(lane < live, keys, KEY_DEAD)
                for h in range(H3):
                    mkey = jnp.max(keys, axis=1, keepdims=True)
                    out_ref[:, s * H3 + h: s * H3 + h + 1] = mkey
                    keys = jnp.where(keys == mkey, KEY_DEAD, keys)
                guard = jnp.maximum(guard, mkey)
            out_ref[:, nsub * H3: nsub * H3 + 1] = guard

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "chunk", "block_n"))
def run(docs, q, nv, variant, chunk, block_n):
    grid = (N // block_n, D // chunk)
    out_shape = (B, (N // block_n) * OUT_LANES)
    return pl.pallas_call(
        make_kern(variant, block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, chunk), lambda j, c: (0, c)),
            pl.BlockSpec((block_n, chunk), lambda j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((B, OUT_LANES), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
    )(jnp.asarray([nv], jnp.int32), q, docs)


def chained(variant, chunk, block_n, length):
    @jax.jit
    def f(docs, q, nv):
        def body(i, qc):
            out = run(docs, qc, nv, variant, chunk, block_n)
            return qc + (0 * out.reshape(-1)[0]).astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        return run(docs, qf, nv, variant, chunk, block_n).reshape(-1)[:1]

    return f


def main():
    print("device:", jax.devices()[0], flush=True)

    @jax.jit
    def synth(_):
        r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
        x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
        x = x - jnp.floor(x) - 0.5
        x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        return x.astype(jnp.bfloat16)

    docs = synth(0)
    np.asarray(docs[0, :1])
    rng = np.random.default_rng(0)
    qf = rng.standard_normal((B, D)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    q = jnp.asarray(qf).astype(jnp.bfloat16)
    nv = N - 100

    cases = [
        ("mm128", "mm", 128, 8192),
        ("mm256", "mm", 256, 8192),
        ("v3", "v3", 128, 8192),
        ("v3c256", "v3", 256, 8192),
        ("v3b4096", "v3", 256, 4096),
        ("v3b4096c128", "v3", 128, 4096),
    ]
    for label, variant, chunk, block_n in cases:
        try:
            short = chained(variant, chunk, block_n, 1)
            long_ = chained(variant, chunk, block_n, 9)
            np.asarray(short(docs, q, nv))
            np.asarray(long_(docs, q, nv))
            runs = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(short(docs, q, nv))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                np.asarray(long_(docs, q, nv))
                tl = time.perf_counter() - t0
                runs.append(max(0.0, (tl - ts) / 8))
            runs.sort()
            print(f"{label}: device {runs[2] * 1e3:.3f} ms "
                  f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f})",
                  flush=True)
        except Exception as exc:
            print(f"{label}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
