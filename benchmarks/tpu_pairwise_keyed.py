"""Keyed pairwise candidate pass vs the exact blocked path, on TPU.

The exact path's profile at the 100k headline (tpu_pairwise_prof,
BENCHMARKS.md 2026-08-18): matmul+mask scan 0.9 s, + per-row selection
3.7 ms/block -> ~85% of the 1.73 s total.  The keyed pass replaces the
v1 two-pass extraction with one packed-key emit per 4096-col block
(ops.pallas_extract.pairwise_keys_extract) and defers exactness to the
KB's rescore margin.  This script times, per corpus size:

  1. exact pairwise_topk_blocked (the old headline number)
  2. keyed pairwise_candidates_keyed at the KB's first-attempt width
  3. the matmul+mask scan floor

Run on the TPU box: python benchmarks/tpu_pairwise_keyed.py [n] [k]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from svs_tpu.ops.pairwise import (
    keyed_pairwise_route,
    pairwise_candidates_keyed,
    pairwise_topk_blocked,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
D = 1536
BLOCK = 256
ROW_MULT = 16384  # packing.LARGE_ROW_MULTIPLE — the engine's padding
N_PAD = ((N + ROW_MULT - 1) // ROW_MULT) * ROW_MULT
C = max(K + 64, K * 5 // 4)  # the KB's first-attempt candidate width


@jax.jit
def synth(_):
    r = jax.lax.broadcasted_iota(jnp.float32, (N_PAD, D), 0)
    c = jax.lax.broadcasted_iota(jnp.float32, (N_PAD, D), 1)
    x = jnp.sin(r * 12.9898 + c * 78.233) * 43758.5453
    x = x - jnp.floor(x) - 0.5
    x = x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x.astype(jnp.bfloat16)


def timeit(label, fn, reps=5):
    fn()  # warm/compile
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    med = runs[len(runs) // 2]
    print(
        f"{label:44}: median {med * 1e3:9.1f} ms "
        f"(spread {runs[0] * 1e3:.1f}-{runs[-1] * 1e3:.1f})",
        flush=True,
    )
    return med


def main():
    print("device:", jax.devices()[0], flush=True)
    print(f"N={N} (pad {N_PAD}), D={D}, K={K}, C={C}, block={BLOCK}")
    assert keyed_pairwise_route(N_PAD, BLOCK, C), "keyed route must apply"
    docs = synth(0)
    np.asarray(docs[0, :1])
    nv = jnp.int32(N)

    def exact():
        v, r, c = pairwise_topk_blocked(docs, nv, K, block_rows=BLOCK)
        np.asarray(v[:1])

    def keyed():
        v, r, c, ok = pairwise_candidates_keyed(
            docs, nv, C, block_rows=BLOCK
        )
        assert ok
        np.asarray(v[:1])

    t_keyed = timeit("keyed candidate pass (C=%d)" % C, keyed, reps=5)
    t_exact = timeit("exact blocked (old headline)", exact, reps=3)
    print(f"speedup: {t_exact / t_keyed:.2f}x", flush=True)

    # sanity: keyed candidates must contain ~all of exact's top pairs
    ev, er, ec = pairwise_topk_blocked(docs, nv, K, block_rows=BLOCK)
    kv, kr, kc, ok = pairwise_candidates_keyed(docs, nv, C, block_rows=BLOCK)
    exact_pairs = set(
        zip(np.asarray(er)[:K].tolist(), np.asarray(ec)[:K].tolist())
    )
    keyed_pairs = set(
        zip(np.asarray(kr).tolist(), np.asarray(kc).tolist())
    )
    inter = len(exact_pairs & keyed_pairs)
    kv_np = np.asarray(kv)
    print(
        f"coverage: {inter}/{K} exact top-k among keyed candidates; "
        f"boundary bound {kv_np[-1]:.6f} vs exact k-th "
        f"{np.asarray(ev)[K - 1]:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
