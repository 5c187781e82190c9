"""Round-3 "v3 guarded" selection prototype: timing shootout.

Measured cost model from tpu_select8 (v5e): the emit phase is dominated
by the NUMBER of max-reduce invocations (each ~constant cost up to 512
lanes; 1024-wide costs ~2x), with elementwise clear width second order.
v2 pays 8 winners x 16 subtiles = 128 reduces per 8192-doc block because
its exactness story needs top-8 *coverage* per 512-subtile of the
k_eff=4k candidate set.

v3 replaces the coverage proof with a *hidden-score bound*: the engine's
rescore-margin check only needs an upper bound on every non-candidate's
prescore, and the subtile tails are that bound.  That frees the emit
shape: top-4 per 1024-lane subtile = 32 reduces @1024 (~64 units, half
of v2) AND half the clear passes, emitting the raw 32 keys + 1 guard
lane (max subtile tail) per block — no second reduce kernel, no in-graph
lax.top_k fallback.  Merge = one lax.top_k over nb*32 (~3968 at 1M)
lanes.  Key encoding: qscale 2^12 x 1024 lanes < 2^24 stays f32-exact
(KEY_EPS widens to 2^-11, negligible vs the bf16 term).

Guard tightness at 1M, c=400: bound sits at prescore rank ~391
(992 subtiles, lambda^4/24 = 1/992), margin gap (rank 100 vs 391)
~0.0082 >> eps ~0.0046 — margin passes on permuted packs; failures
widen-and-retry through v2 as today.

Run on the TPU: python benchmarks/tpu_select9.py
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
DIM_CHUNK = 128
# v3 geometry
SUB3 = 1024
H3 = 4
QS3 = float(1 << 12)
NSUB3 = BLOCK_N // SUB3  # 8
LIVE_LANES = NSUB3 * H3 + 1  # 32 keys + 1 guard
OUT_LANES = 128
# v2 geometry (reference)
SUB2 = 512
QS2 = float(1 << 13)
KEY_BIAS = 1.0625
KEY_DEAD = -float(1 << 24)


def kern_v3(nv_ref, q_ref, docs_ref, out_ref, acc_ref):
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
        nv = nv_ref[0]
        b = acc_ref.shape[0]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, SUB3), 1
        ).astype(jnp.float32)
        guard = jnp.full((b, 1), KEY_DEAD, jnp.float32)
        for s in range(NSUB3):
            lo = s * SUB3
            live = jnp.clip(
                nv - (j * BLOCK_N + lo), 0, SUB3
            ).astype(jnp.float32)
            keys = (
                jnp.floor((acc_ref[:, lo : lo + SUB3] + KEY_BIAS) * QS3)
                * float(SUB3) + lane
            )
            keys = jnp.where(lane < live, keys, KEY_DEAD)
            for h in range(H3):
                mkey = jnp.max(keys, axis=1, keepdims=True)
                out_ref[:, s * H3 + h : s * H3 + h + 1] = mkey
                keys = jnp.where(keys == mkey, KEY_DEAD, keys)
            guard = jnp.maximum(guard, mkey)
        out_ref[:, NSUB3 * H3 : NSUB3 * H3 + 1] = guard


def kern_v2(nv_ref, q_ref, docs_ref, out_ref, acc_ref):
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
        nv = nv_ref[0]
        b = acc_ref.shape[0]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, SUB2), 1
        ).astype(jnp.float32)
        for s in range(BLOCK_N // SUB2):
            lo = s * SUB2
            live = jnp.clip(
                nv - (j * BLOCK_N + lo), 0, SUB2
            ).astype(jnp.float32)
            keys = (
                jnp.floor((acc_ref[:, lo : lo + SUB2] + KEY_BIAS) * QS2)
                * float(SUB2) + lane
            )
            keys = jnp.where(lane < live, keys, KEY_DEAD)
            for h in range(8):
                mkey = jnp.max(keys, axis=1, keepdims=True)
                out_ref[:, s * 8 + h : s * 8 + h + 1] = mkey
                keys = jnp.where(keys == mkey, KEY_DEAD, keys)


def kern_mm(nv_ref, q_ref, docs_ref, out_ref, acc_ref):
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
        out_ref[:, :] = acc_ref[:, :OUT_LANES]


KERNS = {"v3": kern_v3, "v2": kern_v2, "mm": kern_mm}


@functools.partial(jax.jit, static_argnames=("variant",))
def run(docs, q, nv, variant):
    grid = (N // BLOCK_N, D // DIM_CHUNK)
    out_shape = (B, (N // BLOCK_N) * OUT_LANES)
    return pl.pallas_call(
        KERNS[variant],
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, DIM_CHUNK), lambda j, c: (0, c)),
            pl.BlockSpec((BLOCK_N, DIM_CHUNK), lambda j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((B, OUT_LANES), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, BLOCK_N), jnp.float32)],
    )(jnp.asarray([nv], jnp.int32), q, docs)


@functools.partial(jax.jit, static_argnames=("k",))
def merge_v3(out, k=400):
    nb = N // BLOCK_N
    o3 = out.reshape(B, nb, OUT_LANES)
    keys = o3[:, :, : NSUB3 * H3].reshape(B, nb * NSUB3 * H3)
    sel, cols = jax.lax.top_k(keys, k)
    ki = sel.astype(jnp.int32)
    lane = ki - (ki // SUB3) * SUB3
    vals = (ki // SUB3).astype(jnp.float32) / QS3 - KEY_BIAS
    jb = cols // (NSUB3 * H3)
    s = (cols - jb * (NSUB3 * H3)) // H3
    rows = jb * BLOCK_N + s * SUB3 + lane
    guard_keys = jnp.max(o3[:, :, NSUB3 * H3], axis=1)
    gi = guard_keys.astype(jnp.int32)
    bound = jnp.maximum(
        (gi // SUB3).astype(jnp.float32) / QS3 - KEY_BIAS, vals[:, -1]
    )
    return vals, rows, bound


@functools.partial(jax.jit, static_argnames=("k",))
def run_full_v3(docs, q, nv, k=400):
    vals, rows, bound = merge_v3(run(docs, q, nv, "v3"), k)
    return vals[:1, :1] + rows[:1, :1].astype(jnp.float32) + bound[:1]


def chained_extract(variant, length):
    @jax.jit
    def f(docs, q, nv):
        def body(i, qc):
            out = run(docs, qc, nv, variant)
            return qc + 0.0 * out.reshape(-1)[0].astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        return run(docs, qf, nv, variant).reshape(-1)[:1]

    return f


def chained_full(length):
    @jax.jit
    def f(docs, q, nv):
        def body(i, qc):
            out = run_full_v3(docs, qc, nv)
            return qc + 0.0 * out.reshape(-1)[0].astype(qc.dtype)

        qf = jax.lax.fori_loop(0, length, body, q)
        return run_full_v3(docs, qf, nv).reshape(-1)[:1]

    return f


def main():
    dev = jax.devices()[0]
    print("device:", dev)

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
    q = rng.standard_normal((B, D)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))
    q = q.astype(jnp.bfloat16)
    nv = N - 100

    cases = [
        ("mm-floor", chained_extract("mm", 1), chained_extract("mm", 11)),
        ("v2-extract", chained_extract("v2", 1), chained_extract("v2", 11)),
        ("v3-extract", chained_extract("v3", 1), chained_extract("v3", 11)),
        ("v3-full", chained_full(1), chained_full(11)),
    ]
    for label, short, long_ in cases:
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
            runs.append(max(0.0, (tl - ts) / 10))
        runs.sort()
        print(f"{label:11}: median {runs[2] * 1e3:.3f} ms "
              f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f})")


if __name__ == "__main__":
    main()
