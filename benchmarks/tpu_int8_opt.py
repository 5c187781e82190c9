"""int8 fused3 (guarded) batched-selection optimization shootout.

Round-4 verdict: int8 b=256 runs 3.61 ms device vs the 1.9 ms HBM
corpus-read floor (52.8%), while bf16 achieves 60-65% of its own floor.
Physics check first: at b=256 the int8 matmul itself is COMPUTE-bound —
2*B*N*D = 798e9 ops / 394 TOPS ~= 2.0 ms > the 1.9 ms memory floor — so
the reachable target is mm-floor + a thin emit, not the raw HBM number.

Variants measured here (all guarded-v3 geometry, 1M x 1536, b=256):

- ``mm128`` / ``mm256``: int8 matmul only at DIM_CHUNK 128 / 256 — the
  real floor and whether a larger contraction chunk helps the int8 MXU.
- ``v3``: the production emit (int32 acc -> f32, * row_scales, *
  q_scales broadcast, key + top-4 per 1024-subtile).
- ``v3dq``: defer the per-QUERY scale into the key grid: keys =
  floor((y + bias/qs) * (QSCALE*qs)) with y = acc*rs — bias' and
  QSCALE' are [b,1] scalars precomputed outside, saving one full
  [b, 8192] broadcast multiply per block.  Bit-identical keys up to f32
  rounding of the fused constants (validated vs v3 on a small slice).
- ``v3dq256``: v3dq at DIM_CHUNK=256.

Run on the TPU:  python benchmarks/tpu_int8_opt.py
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
BLOCK_N = 8192
SUB3 = 1024
H3 = 4
QS3 = float(1 << 12)
NSUB3 = BLOCK_N // SUB3
OUT_LANES = 128
KEY_BIAS = 1.0625
KEY_DEAD = -float(1 << 24)


def make_kern(variant: str):
    def kern(nv_ref, q_ref, qs_ref, qb_ref, qq_ref, docs_ref, rs_ref,
             out_ref, acc_ref):
        j = pl.program_id(0)
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(c == 0)
        def _z():
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.int32)

        acc_ref[:] += jax.lax.dot_general(
            q_ref[:], docs_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(c == nc - 1)
        def _e():
            if variant == "mm":
                out_ref[:, :] = acc_ref[:, :OUT_LANES].astype(jnp.float32)
                return
            nv = nv_ref[0]
            b = acc_ref.shape[0]
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (b, SUB3), 1
            ).astype(jnp.float32)
            guard = jnp.full((b, 1), KEY_DEAD, jnp.float32)
            qs = qs_ref[:]      # [b,1] q scale
            qb = qb_ref[:]      # [b,1] KEY_BIAS / qs
            qq = qq_ref[:]      # [b,1] QS3 * qs
            for s in range(NSUB3):
                lo = s * SUB3
                if variant == "v3":
                    sub = (
                        acc_ref[:, lo: lo + SUB3].astype(jnp.float32)
                        * rs_ref[:, lo: lo + SUB3] * qs
                    )
                    keys = (
                        jnp.floor((sub + KEY_BIAS) * QS3)
                        * float(SUB3) + lane
                    )
                else:  # v3dq: fold qs into per-query grid constants
                    y = (
                        acc_ref[:, lo: lo + SUB3].astype(jnp.float32)
                        * rs_ref[:, lo: lo + SUB3]
                    )
                    keys = (
                        jnp.floor((y + qb) * qq) * float(SUB3) + lane
                    )
                live = jnp.clip(
                    nv - (j * BLOCK_N + lo), 0, SUB3
                ).astype(jnp.float32)
                keys = jnp.where(lane < live, keys, KEY_DEAD)
                for h in range(H3):
                    mkey = jnp.max(keys, axis=1, keepdims=True)
                    out_ref[:, s * H3 + h: s * H3 + h + 1] = mkey
                    keys = jnp.where(keys == mkey, KEY_DEAD, keys)
                guard = jnp.maximum(guard, mkey)
            out_ref[:, NSUB3 * H3: NSUB3 * H3 + 1] = guard

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "chunk"))
def run(docs, q, qs, qb, qq, rs, nv, variant, chunk):
    grid = (N // BLOCK_N, D // chunk)
    out_shape = (B, (N // BLOCK_N) * OUT_LANES)
    return pl.pallas_call(
        make_kern(variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, chunk), lambda j, c: (0, c)),
            pl.BlockSpec((B, 1), lambda j, c: (0, 0)),
            pl.BlockSpec((B, 1), lambda j, c: (0, 0)),
            pl.BlockSpec((B, 1), lambda j, c: (0, 0)),
            pl.BlockSpec((BLOCK_N, chunk), lambda j, c: (j, c)),
            pl.BlockSpec((1, BLOCK_N), lambda j, c: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, OUT_LANES), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, BLOCK_N), jnp.int32)],
    )(jnp.asarray([nv], jnp.int32), q, qs, qb, qq, docs, rs)


def chained(variant, chunk, length):
    @jax.jit
    def f(docs, q, qs, qb, qq, rs, nv):
        def body(i, qc):
            out = run(docs, qc, qs, qb, qq, rs, nv, variant, chunk)
            return qc + (0 * out.reshape(-1)[0]).astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        return run(docs, qf, qs, qb, qq, rs, nv, variant, chunk
                   ).reshape(-1)[:1]

    return f


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    @jax.jit
    def synth(_):
        r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
        c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
        x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
        x = x - jnp.floor(x) - 0.5
        x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        absmax = jnp.max(jnp.abs(x), axis=1)
        scales = jnp.maximum(absmax, 1e-12) / 127.0
        qd = jnp.clip(
            jnp.round(x / scales[:, None]), -127, 127
        ).astype(jnp.int8)
        return qd, scales

    docs, scales = synth(0)
    np.asarray(docs[0, :1])
    rng = np.random.default_rng(0)
    qf = rng.standard_normal((B, D)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    sq = (np.maximum(np.abs(qf).max(axis=1), 1e-30) / 127.0).astype(
        np.float32
    )
    qi = np.clip(np.rint(qf / sq[:, None]), -127, 127).astype(np.int8)
    q = jnp.asarray(qi)
    qs = jnp.asarray(sq[:, None])
    qb = jnp.asarray((KEY_BIAS / sq)[:, None].astype(np.float32))
    qq = jnp.asarray((QS3 * sq)[:, None].astype(np.float32))
    rs = jnp.asarray(scales)[None, :]
    nv = N - 100

    # validate v3dq keys == v3 keys (up to fused-constant rounding;
    # require identical on this data)
    a = np.asarray(run(docs, q, qs, qb, qq, rs, nv, "v3", 128))
    bq = np.asarray(run(docs, q, qs, qb, qq, rs, nv, "v3dq", 128))
    same = np.mean(a == bq)
    print(f"v3 vs v3dq key agreement: {same * 100:.4f}%", flush=True)

    cases = [
        ("mm128", "mm", 128),
        ("mm256", "mm", 256),
        ("v3", "v3", 128),
        ("v3dq", "v3dq", 128),
        ("v3dq256", "v3dq", 256),
        ("v3-256", "v3", 256),
    ]
    for label, variant, chunk in cases:
        try:
            short = chained(variant, chunk, 1)
            long_ = chained(variant, chunk, 9)
            np.asarray(short(docs, q, qs, qb, qq, rs, nv))
            np.asarray(long_(docs, q, qs, qb, qq, rs, nv))
            runs = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(short(docs, q, qs, qb, qq, rs, nv))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                np.asarray(long_(docs, q, qs, qb, qq, rs, nv))
                tl = time.perf_counter() - t0
                runs.append(max(0.0, (tl - ts) / 8))
            runs.sort()
            print(f"{label}: device {runs[2] * 1e3:.3f} ms "
                  f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f})",
                  flush=True)
        except Exception as exc:
            print(f"{label}: FAILED {type(exc).__name__}: {exc}",
                  flush=True)


if __name__ == "__main__":
    main()
