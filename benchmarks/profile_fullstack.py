"""Stage-level profile of the full-stack retrieve_batch path on the
live device: where does a 256-query batch actually spend its time once
the rescore mirror is up?  Drives the same KB the bench's full-stack
phase uses and prints per-stage p50s plus a cProfile of the finalize
stage (the host side is a 1-vCPU class machine — Python minting costs
are first-order here).

Usage: python benchmarks/profile_fullstack.py [n_docs] [batch]
"""

import asyncio
import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root
from corpus import ensure_bench_kb, query_embedder  # noqa: E402

from svs_tpu import AsyncKB  # noqa: E402


async def main(n: int, batch: int) -> None:
    path = ensure_bench_kb(n, 1536)
    t0 = time.perf_counter()
    kb = AsyncKB(path, query_embedder(1536), sidecar=True)
    await kb.load()
    print(f"open+load: {time.perf_counter() - t0:.1f}s "
          f"(pack_uploading={kb.engine.pack_uploading})", flush=True)

    # cold query while the pack may still be uploading (host path)
    t0 = time.perf_counter()
    res = await kb.retrieve_batch([f"c:{i}" for i in range(batch)], 100)
    print(f"cold batch ({'host' if kb.engine.pack_uploading else 'device'} "
          f"path): {time.perf_counter() - t0:.2f}s", flush=True)

    loop = asyncio.get_running_loop()
    t0 = time.perf_counter()
    ok = await loop.run_in_executor(
        None, lambda: kb.engine.wait_for_mirror(900)
    )
    print(f"uploads settled: {ok} after {time.perf_counter() - t0:.1f}s",
          flush=True)

    kb._stats.reset()
    for r in range(2):  # warm compiles
        await kb.retrieve_batch([f"w{r}:{i}" for i in range(batch)], 100)
    kb._stats.reset()
    times = []
    for r in range(6):
        t0 = time.perf_counter()
        res = await kb.retrieve_batch([f"m{r}:{i}" for i in range(batch)], 100)
        times.append(time.perf_counter() - t0)
    assert len(res) == batch and len(res[0]) == 100
    times.sort()
    print(f"steady batch p50: {times[len(times) // 2] * 1e3:.1f} ms "
          f"({times[0] * 1e3:.0f}-{times[-1] * 1e3:.0f})", flush=True)
    for name, st in sorted(kb.stats().items()):
        if isinstance(st, dict) and "p50_s" in st:
            print(f"  stage {name}: p50 {st['p50_s'] * 1e3:.1f} ms "
                  f"x{st['count']}", flush=True)

    # device_search microscope: split q-upload / dispatch+fetch / raw RPC
    import jax
    import numpy as np

    corpus = kb.engine.corpus
    print(f"rpc floor: {kb.engine.device_rpc_floor() * 1e3:.1f} ms",
          flush=True)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((batch, 1536)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    for _ in range(3):
        t0 = time.perf_counter()
        q_dev = kb.engine._put_queries(corpus, q)
        q_dev.block_until_ready()
        t_up = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = kb.engine.topk_final(corpus, q, 100, 400)
        t_full = time.perf_counter() - t0
        print(f"  q upload {t_up * 1e3:.1f} ms | topk_final "
              f"{t_full * 1e3:.1f} ms (out={'ok' if out else 'None'})",
              flush=True)

    # profile one full batch
    prof = cProfile.Profile()
    prof.enable()
    await kb.retrieve_batch([f"p:{i}" for i in range(batch)], 100)
    prof.disable()
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue(), flush=True)
    await kb.close(write_sidecar=False)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    asyncio.run(main(n, batch))
