"""Profile the full-stack retrieve_batch pipeline on the real TPU.

Isolates where the ~125 ms device_search and ~65 ms finalize stages go
at 1M x 1536 bf16 b=256 k=100, and measures the candidate fixes:

  A. query upload bytes: today the [B, d] f32 queries cross the tunnel
     TWICE (prescore pad_queries upload + rescore jnp.asarray upload)
  B. wire bytes: [B, 2C+1] (C=400) vs an on-device final top-k
     selection returning [B, 2k+1] (k=100)
  C. finalize host time: the 25.6k-hit mint loop

Run:  python benchmarks/tpu_fullstack_prof.py
"""
import asyncio
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def t(label, fn, reps=5):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[len(times) // 2] * 1e3
    print(f"  {label:55s} {ms:9.2f} ms  (min {min(times)*1e3:.2f})",
          flush=True)
    return out, ms


def main():
    import jax
    import jax.numpy as jnp

    from corpus import ensure_bench_kb, query_embedder
    from svs_tpu import AsyncKB

    n, dim, B, K = 1_000_000, 1536, 256, 100
    path = ensure_bench_kb(n, dim)
    kb = AsyncKB(path, query_embedder(dim), precision="bf16", sidecar=True)

    async def load():
        await kb.load()

    t0 = time.perf_counter()
    asyncio.run(load())
    print(f"open+pack: {time.perf_counter() - t0:.1f}s", flush=True)

    queries = [f"q:{i}" for i in range(B)]

    async def one_batch():
        return await kb.retrieve_batch(queries, K)

    # warm (compile + caches)
    for _ in range(2):
        asyncio.run(one_batch())
    kb._stats.reset() if hasattr(kb._stats, "reset") else None

    print("\n-- current retrieve_batch stage split (6 reps) --", flush=True)
    for _ in range(6):
        asyncio.run(one_batch())
    for name, st in sorted(kb.stats().items()):
        if isinstance(st, dict):
            print(f"  {name:20s} p50 {st.get('p50_s', 0)*1e3:8.1f} ms "
                  f"(n={st.get('count')})", flush=True)

    # ---- component microbenches -----------------------------------------
    eng = kb.engine
    corpus = kb._corpus if hasattr(kb, "_corpus") else None
    if corpus is None:
        # grab the engine's live corpus via the freshness path
        async def grab():
            return await kb._ensure_engine_fresh()
        corpus = asyncio.run(grab())

    rng = np.random.default_rng(0)
    qv = rng.standard_normal((B, dim)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)

    dev = corpus.dev_rescore
    print(f"\ndev_rescore mirror present: {dev is not None}", flush=True)
    C = eng.candidate_count(K)
    print(f"candidate C = {C}", flush=True)

    print("\n-- component timings --", flush=True)
    t("host->dev: queries f32 [256,1536] device_put + ready",
      lambda: jax.device_put(qv, eng.device).block_until_ready())

    # full current topk_with_rescore (host-called, includes fetch)
    t("engine.topk_with_rescore (C=400, full wire)",
      lambda: eng.topk_with_rescore(corpus, qv, C))

    # the new fully-on-device pipeline: 1 upload, [B, 2K+1] wire
    t("engine.topk_final (C=400 -> K=100 on-device)",
      lambda: eng.topk_final(corpus, qv, K, C))

    # dispatch-only (no fetch): prescore + chained rescore, device handle
    from svs_tpu.engine.index import _rescore_from_packed

    def dispatch_only():
        packed_dev, wide = eng._prescore_packed(corpus, qv, C)
        combined = _rescore_from_packed(
            packed_dev, dev[0], dev[1], jnp.asarray(qv), C, wide
        )
        combined.block_until_ready()
        return combined, wide

    (combined, wide), _ = t("dispatch+device (block_until_ready, no np fetch)",
                            dispatch_only)[0], None
    print(f"  wire shape {combined.shape} dtype {combined.dtype} "
          f"= {combined.size * 4 / 1e6:.2f} MB", flush=True)

    t("fetch full wire [B,2C+1] np.asarray",
      lambda: np.asarray(combined))

    # simulated small wire: slice to [B, 2K+1] on device, then fetch
    def small_wire():
        small = jnp.concatenate(
            [combined[:, :K], combined[:, C:C + K], combined[:, -1:]],
            axis=1)
        return np.asarray(small)

    t("fetch small wire [B,2K+1] (slice on dev + fetch)", small_wire)

    # query upload once vs twice: prescore with pre-uploaded handle
    q_dev = jax.device_put(qv, eng.device)
    q_dev.block_until_ready()

    def dispatch_prescore_only():
        packed_dev, w = eng._prescore_packed(corpus, qv, C)
        packed_dev.block_until_ready()

    t("prescore only dispatch+ready (uploads queries)",
      dispatch_prescore_only)

    # finalize-only timing: run through _finalize_batch with device_exact
    from svs_tpu.kb import _finalize_batch

    pre_vals, pre_rows, dev_exact = eng.topk_with_rescore(corpus, qv, C)
    pre_eps = eng.prescore_eps(corpus, qv, C)

    async def fin():
        db = await kb._ensure_db()
        with db.transaction() as tx:
            return _finalize_batch(
                tx, corpus, qv, pre_vals, pre_rows, K, eng.rescore,
                pre_eps, doc_cache=kb._doc_cache, device_exact=dev_exact)

    t("finalize (cache-warm) total", lambda: asyncio.run(fin()))

    # finalize sub-parts
    def select_only():
        emb_of = corpus.emb_ids[pre_rows]
        id_order = np.argsort(emb_of, axis=1, kind="stable")
        exact_o = np.take_along_axis(
            np.asarray(dev_exact, dtype=np.float32), id_order, axis=1)
        rows_o = np.take_along_axis(pre_rows, id_order, axis=1)
        rev = exact_o[:, ::-1]
        order_rev = np.argsort(-rev, axis=1, kind="stable")[:, :K]
        order = pre_rows.shape[1] - 1 - order_rev
        top_scores = np.take_along_axis(exact_o, order, axis=1)
        top_rows = np.take_along_axis(rows_o, order, axis=1)
        return top_scores, top_rows

    (ts_, tr_), _ = t("finalize: host top-k selection+tie order", select_only)[0], None

    top_emb = corpus.emb_ids[tr_]

    def mint_only():
        import json
        loads = json.loads
        emb_list = top_emb.tolist()
        score_list = ts_.tolist()
        row_by_emb = kb._doc_cache._rows
        results = []
        for scores_b, embs_b in zip(score_list, emb_list):
            hits = []
            for score, emb_id in zip(scores_b, embs_b):
                rec, meta_str = row_by_emb[emb_id]
                doc = dict(rec)
                if meta_str is not None:
                    doc["meta"] = loads(meta_str)
                hits.append({"score": score, "doc": doc})
            results.append(hits)
        return results

    t("finalize: 25.6k-hit mint loop", mint_only)

    async def close():
        await kb.close(write_sidecar=False)
    asyncio.run(close())


if __name__ == "__main__":
    main()
