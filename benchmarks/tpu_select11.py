"""Round-3 deferred-emit (ping-pong) guarded-kernel shootout.

The v3 guarded kernel's residual over the matmul floor is the emit
phase: 32 max-reduces @1024 lanes per 8192-doc block, issued at the
block's LAST dim-chunk step — serially behind that step's matmul,
because the emit input is the score block the matmul just finished
(round-2 measurement: no MXU/VPU overlap *with a data dependency*).

This bench removes the dependency instead of shrinking the work: a
ping-pong accumulator pair lets block j-1's emit run during block j's
accumulation, one subtile per dim-chunk step, where the VPU work
(~4 reduces @1024 ≈ 2.3 us) is nearly the same size as the step's MXU
work ([256,4096]x[4096,128] ≈ 2.7 us) — if Mosaic schedules the two
units independently the emit disappears into the matmul shadow.

VMEM forces BLOCK_N=4096 for the pair (2 x 4 MB f32 accumulators
vs the production single 8 MB at 8192), so the grid has a control:

  A. matmul-only floor, BLOCK 8192 (production grid)
  B. production v3 packed path (1024/H=4, BLOCK 8192)   — baseline
  C. same-step emit at BLOCK 4096 (1024/H=4, 1 buffer)  — blocking cost
  D. deferred ping-pong at BLOCK 4096                   — the candidate
  E. matmul-only floor, BLOCK 4096                      — D's true floor

C and D emit identical per-block packed tiles (16 keys + guard +
dead padding per 4096-doc block), asserted bitwise; the hidden-score
bound is the same top-4-of-1024 subtile tail as production v3, so a win
here promotes directly into ``ops.pallas_extract`` with no change to
the exactness story.

Run on the TPU box:  python benchmarks/tpu_select11.py
Smoke (CPU/interpret): SVS_SELECT11_SMOKE=1 python benchmarks/tpu_select11.py
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svs_tpu.ops.pallas_extract import (
    GUARD_H,
    GUARD_QSCALE,
    GUARD_SUBTILE,
    KEY_BIAS,
    KEY_DEAD,
    fused3_supported,
    score_topk_fused3_packed,
)

SMOKE = bool(os.environ.get("SVS_SELECT11_SMOKE"))
if SMOKE:
    N, D, B = 4096 * 7, 640, 16
    K = 50
else:
    N, D, B = 1_015_808, 1536, 256
    K = 400
NV = N - 100
BLK = 4096
DIM_CHUNK = 128
NSUB = BLK // GUARD_SUBTILE  # 4 subtiles per block
KEYS_PB = NSUB * GUARD_H  # 16 key lanes per block
OUT_LANES = 128  # 16 keys + 1 guard, padded to one lane tile
_LANEF = float(GUARD_SUBTILE)


def _emit_subtile(src, lane, live, out_ref, col0, init_guard):
    """Emit top-GUARD_H packed keys of one 1024-lane subtile slice
    ``src`` into ``out_ref[:, col0:col0+H]`` and fold the subtile tail
    into the guard lane (init on the first subtile)."""
    keys = (
        jnp.floor((jnp.clip(src, -3.0, 3.0) + KEY_BIAS) * GUARD_QSCALE)
        * _LANEF
        + lane
    )
    keys = jnp.where(lane < live, keys, KEY_DEAD)
    mkey = keys[:, :1]
    for h in range(GUARD_H):
        mkey = jnp.max(keys, axis=1, keepdims=True)
        out_ref[:, col0 + h : col0 + h + 1] = mkey
        if h < GUARD_H - 1:
            keys = jnp.where(keys == mkey, KEY_DEAD, keys)
    if init_guard:
        out_ref[:, KEYS_PB : KEYS_PB + 1] = mkey
        b = src.shape[0]
        out_ref[:, KEYS_PB + 1 :] = jnp.full(
            (b, OUT_LANES - KEYS_PB - 1), KEY_DEAD, jnp.float32
        )
    else:
        out_ref[:, KEYS_PB : KEYS_PB + 1] = jnp.maximum(
            out_ref[:, KEYS_PB : KEYS_PB + 1], mkey
        )


def _same_step_kernel(nv_ref, q_ref, docs_ref, out_ref, acc_ref):
    """Variant C: v3 logic at BLOCK 4096 (emit at the block's last
    chunk step, single accumulator)."""
    j = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _zero():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == nc - 1)
    def _emit():
        nv = nv_ref[0]
        b = acc_ref.shape[0]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (b, GUARD_SUBTILE), 1
        ).astype(jnp.float32)
        for s in range(NSUB):
            lo = s * GUARD_SUBTILE
            live = jnp.clip(
                nv - (j * BLK + lo), 0, GUARD_SUBTILE
            ).astype(jnp.float32)
            _emit_subtile(
                acc_ref[:, lo : lo + GUARD_SUBTILE],
                lane,
                live,
                out_ref,
                s * GUARD_H,
                s == 0,
            )


def _deferred_kernel(nv_ref, q_ref, docs_ref, out_ref, acc0, acc1):
    """Variant D: ping-pong accumulators; block j-1's subtile s emits at
    block j's chunk step s, independent of that step's matmul."""
    j = pl.program_id(0)
    c = pl.program_id(1)
    nb = pl.num_programs(0)
    nc = pl.num_programs(1)
    even = (j % 2) == 0

    part = jax.lax.dot_general(
        q_ref[:],
        docs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(even & (c == 0))
    def _z0():
        acc0[:] = part

    @pl.when(even & (c != 0))
    def _a0():
        acc0[:] += part

    @pl.when(jnp.logical_not(even) & (c == 0))
    def _z1():
        acc1[:] = part

    @pl.when(jnp.logical_not(even) & (c != 0))
    def _a1():
        acc1[:] += part

    nv = nv_ref[0]
    b = part.shape[0]
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (b, GUARD_SUBTILE), 1
    ).astype(jnp.float32)

    def emit(src_ref, blk, s):
        lo = s * GUARD_SUBTILE
        live = jnp.clip(
            nv - (blk * BLK + lo), 0, GUARD_SUBTILE
        ).astype(jnp.float32)
        _emit_subtile(
            src_ref[:, lo : lo + GUARD_SUBTILE],
            lane,
            live,
            out_ref,
            s * GUARD_H,
            s == 0,
        )

    # Deferred path: subtile c of block j-1, from the buffer block j-1
    # filled (the opposite of the one block j is accumulating into).
    for s in range(NSUB):
        cond = (j > 0) & (c == s)

        @pl.when(cond & even)
        def _d0(s=s):
            emit(acc1, j - 1, s)

        @pl.when(cond & jnp.logical_not(even))
        def _d1(s=s):
            emit(acc0, j - 1, s)

    # The final block has no successor: emit it in place at its last
    # chunk step (un-overlapped; one block out of nb).
    last = (j == nb - 1) & (c == nc - 1)
    for s in range(NSUB):

        @pl.when(last & even)
        def _l0(s=s):
            emit(acc0, j, s)

        @pl.when(last & jnp.logical_not(even))
        def _l1(s=s):
            emit(acc1, j, s)


@functools.partial(jax.jit, static_argnames=("deferred",))
def extract4096(docs, q, nv, deferred):
    n, d = docs.shape
    b = q.shape[0]
    nb = n // BLK
    nc = d // DIM_CHUNK
    # Strict: at nc == NSUB the final block's in-place emit step
    # (nb-1, nc-1) would collide with block nb-2's last deferred write.
    assert nc > NSUB, "deferred emit needs > NSUB chunk steps"
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((b, DIM_CHUNK), lambda j, c: (0, c)),
        pl.BlockSpec((BLK, DIM_CHUNK), lambda j, c: (j, c)),
    ]
    out_shape = jax.ShapeDtypeStruct((b, nb * OUT_LANES), jnp.float32)
    if deferred:

        def out_map(j, c):
            return (
                0,
                jnp.where(
                    (j == nb - 1) & (c == nc - 1),
                    j,
                    jnp.maximum(j - 1, 0),
                ),
            )

        return pl.pallas_call(
            _deferred_kernel,
            grid=(nb, nc),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, OUT_LANES), out_map),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((b, BLK), jnp.float32),
                pltpu.VMEM((b, BLK), jnp.float32),
            ],
            interpret=SMOKE,
        )(jnp.asarray([nv], jnp.int32), q, docs)
    return pl.pallas_call(
        _same_step_kernel,
        grid=(nb, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, OUT_LANES), lambda j, c: (0, j)),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((b, BLK), jnp.float32)],
        interpret=SMOKE,
    )(jnp.asarray([nv], jnp.int32), q, docs)


def _key_vals(keys):
    vq = keys.astype(jnp.int32) // GUARD_SUBTILE
    return vq.astype(jnp.float32) / GUARD_QSCALE - KEY_BIAS


@functools.partial(jax.jit, static_argnames=("c", "deferred"))
def packed4096(docs, q, nv, c, deferred):
    """Full candidate path on the 4096-block tiles: merge + decode +
    bound (mirrors ``_fused3_finish``)."""
    out = extract4096(docs, q, nv, deferred)
    b = out.shape[0]
    nb = out.shape[1] // OUT_LANES
    o3 = out.reshape(b, nb, OUT_LANES)
    keys = o3[:, :, :KEYS_PB].reshape(b, nb * KEYS_PB)
    sel, cols = jax.lax.top_k(keys, c)
    ki = sel.astype(jnp.int32)
    lane = ki - (ki // GUARD_SUBTILE) * GUARD_SUBTILE
    vals = _key_vals(sel)
    jb = cols // KEYS_PB
    s = (cols - jb * KEYS_PB) // GUARD_H
    rows = jb * BLK + s * GUARD_SUBTILE + lane
    guard = jnp.max(o3[:, :, KEYS_PB], axis=1)
    bound = jnp.maximum(_key_vals(guard), vals[:, -1])
    bound = jnp.where(sel[:, -1] <= KEY_DEAD, jnp.float32(jnp.inf), bound)
    vals = jnp.concatenate(
        [vals[:, :-1], jnp.maximum(vals[:, -1:], bound[:, None])], 1
    )
    return jnp.stack([vals, rows.astype(jnp.float32)], axis=1)


@jax.jit
def synth(_):
    r = jax.lax.broadcasted_iota(jnp.float32, (N, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    x = x - jnp.floor(x) - 0.5
    x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x.astype(jnp.bfloat16)


@jax.jit
def matmul_floor(docs, q, nv):
    s = jax.lax.dot_general(
        q,
        docs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.max(s, axis=1)


@functools.partial(jax.jit, static_argnames=("blk",))
def matmul_floor_blocked(docs, q, nv, blk):
    """Matmul-only pallas floor at the given doc block size (what the
    grid itself costs, no emit)."""
    n, d = docs.shape
    b = q.shape[0]

    def kern(q_ref, docs_ref, out_ref, acc_ref):
        c = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(c == 0)
        def _zero():
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

        acc_ref[:] += jax.lax.dot_general(
            q_ref[:],
            docs_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == nc - 1)
        def _emit():
            out_ref[:, :1] = jnp.max(acc_ref[:], axis=1, keepdims=True)
            out_ref[:, 1:] = jnp.zeros(
                (acc_ref.shape[0], 127), jnp.float32
            )

    return pl.pallas_call(
        kern,
        grid=(n // blk, d // DIM_CHUNK),
        in_specs=[
            pl.BlockSpec((b, DIM_CHUNK), lambda j, c: (0, c)),
            pl.BlockSpec((blk, DIM_CHUNK), lambda j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((b, 128), lambda j, c: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, (n // blk) * 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, blk), jnp.float32)],
        interpret=SMOKE,
    )(q, docs)


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
        f"{label:26}: median {runs[len(runs) // 2] * 1e3:7.3f} ms "
        f"(spread {runs[0] * 1e3:.3f}-{runs[-1] * 1e3:.3f})",
        flush=True,
    )
    return runs[len(runs) // 2]


def main():
    print("device:", jax.devices()[0], flush=True)
    docs = synth(0)
    np.asarray(docs[0, :1])

    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qd = jnp.asarray(q)
    nv = jnp.int32(NV)

    # --- correctness: deferred emits the exact same tiles as same-step
    tiles_c = np.asarray(extract4096(docs, qd[:8], nv, False))
    tiles_d = np.asarray(extract4096(docs, qd[:8], nv, True))
    assert tiles_c.shape == tiles_d.shape
    if not np.array_equal(tiles_c, tiles_d):
        bad = np.argwhere(tiles_c != tiles_d)
        raise AssertionError(
            f"deferred tiles differ at {bad[:4]} "
            f"({tiles_c[tuple(bad[0])]} vs {tiles_d[tuple(bad[0])]})"
        )
    print("tiles: deferred == same-step (bitwise) OK", flush=True)

    # --- candidate soundness vs oracle on the deferred path -------------
    both = np.asarray(packed4096(docs, qd[:8], nv, K, True))
    vals, rows = both[:, 0, :], both[:, 1, :].astype(np.int64)
    scores = np.array(
        jnp.einsum(
            "bd,nd->bn",
            qd[:8],
            docs.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    )
    scores[:, NV:] = -np.inf
    okth = np.sort(scores, axis=1)[:, -min(100, K)]
    for bq in range(8):
        got = set(rows[bq].tolist())
        assert len(got) == K and all(0 <= r < NV for r in got)
        bound = vals[bq, -1]
        for r in np.argsort(scores[bq])[::-1][: min(100, K)]:
            if int(r) not in got:
                assert scores[bq, r] <= bound + 2e-3, (
                    bq,
                    int(r),
                    scores[bq, r],
                    bound,
                )
    del scores, okth
    print("candidates: sound vs oracle OK", flush=True)

    if SMOKE:
        print("smoke OK (correctness only; timing needs the TPU)")
        return

    def v3(d_, q_, nv_):
        return score_topk_fused3_packed(d_, q_, nv_, K)

    def same_step(d_, q_, nv_):
        return packed4096(d_, q_, nv_, K, False)

    def deferred(d_, q_, nv_):
        return packed4096(d_, q_, nv_, K, True)

    def floor8192(d_, q_, nv_):
        return matmul_floor_blocked(d_, q_, nv_, 8192)

    def floor4096(d_, q_, nv_):
        return matmul_floor_blocked(d_, q_, nv_, BLK)

    assert fused3_supported(N, D, B, K)
    time_case("A bf16 b=256 floor 8192", floor8192, (docs, qd, nv))
    time_case("E bf16 b=256 floor 4096", floor4096, (docs, qd, nv))
    t3 = time_case("B bf16 b=256 v3 (prod)", v3, (docs, qd, nv))
    tc = time_case("C bf16 b=256 same-step", same_step, (docs, qd, nv))
    td = time_case("D bf16 b=256 deferred", deferred, (docs, qd, nv))
    print(
        f"  -> v3 {t3 / B * 1e6:.1f} | same-step {tc / B * 1e6:.1f} | "
        f"deferred {td / B * 1e6:.1f} us/query device",
        flush=True,
    )
    for b in (32, 64, 128):
        qb = qd[:b]
        time_case(f"bf16 b={b:<3} v3", v3, (docs, qb, nv))
        time_case(f"bf16 b={b:<3} deferred", deferred, (docs, qb, nv))


if __name__ == "__main__":
    main()
