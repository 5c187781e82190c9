"""The One-Million-Documents benchmark, end to end through the KB API.

Recreates the reference's ``examples/One Million Documents Benchmark.ipynb``
with the same synthetic setup (1M docs, 1536-dim random unit vectors written
straight into the store) and times the same phases:

  1. bulk SQLite load of 1M docs              (reference: ~8 s)
  2. first query — cold: pack + search        (reference: ~2 min)
  3. subsequent queries — warm                (reference: ~0.24 s)

Run with less RAM/time via --n.  Writes ./million.sqlite (+ sidecar).
"""

import argparse
import time

import numpy as np

from svs_tpu import KB
from svs_tpu.store import Database, embedding_to_bytes as to_bytes


def synth_unit_rows(n, dim, seed=0, chunk=50_000):
    rng = np.random.default_rng(seed)
    for start in range(0, n, chunk):
        rows = rng.standard_normal((min(chunk, n - start), dim)).astype(np.float32)
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        yield start, rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=1536)
    parser.add_argument("--db", default="million.sqlite")
    parser.add_argument("--precision", default="bf16")
    parser.add_argument("--skip-load", action="store_true",
                        help="reuse an existing store (skip phase 1)")
    args = parser.parse_args()

    # -- phase 1: bulk load (writing blobs directly, like the notebook) ----
    if args.skip_load:
        return _query_phases(args)
    t0 = time.perf_counter()
    db = Database(args.db)
    with db.transaction() as tx:
        for start, rows in synth_unit_rows(args.n, args.dim):
            for i, row in enumerate(rows):
                tx.add_doc(f"synthetic document #{start + i}", None, None,
                           to_bytes(row))
        tx.bump_matrix_version()
    db.close()
    print(f"bulk load {args.n} docs: {time.perf_counter() - t0:.1f}s")
    _query_phases(args)


def _query_phases(args):
    async def passthrough_embedder(texts):
        rng = np.random.default_rng(abs(hash(tuple(texts))) % 2**32)
        v = rng.standard_normal(args.dim).astype(np.float32)
        v /= np.linalg.norm(v)
        return [v.tolist() for _ in texts]

    # -- phase 2: first (cold) query ----------------------------------------
    kb = KB(args.db, passthrough_embedder, precision=args.precision,
            sidecar=True)
    t0 = time.perf_counter()
    hits = kb.retrieve("cold query", 100)
    assert len(hits) == 100
    print(f"first top-100 query (cold): {time.perf_counter() - t0:.2f}s")

    # persist the sidecar so the NEXT cold open mmaps instead of rescanning
    kb.load()

    # -- phase 3: warm queries ----------------------------------------------
    times = []
    for i in range(10):
        t0 = time.perf_counter()
        kb.retrieve(f"warm query {i}", 100)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"warm top-100 query p50: {times[5] * 1e3:.1f} ms")

    # -- phase 4: batched throughput (new capability vs the reference) -----
    t0 = time.perf_counter()
    results = kb.retrieve_batch([f"batched {i}" for i in range(256)], 100)
    dt = time.perf_counter() - t0
    assert len(results) == 256
    print(f"batched 256 queries: {dt:.2f}s total, "
          f"{dt / 256 * 1e3:.2f} ms/query end-to-end")
    kb.close()


if __name__ == "__main__":
    main()
