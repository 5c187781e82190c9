"""Observability tour: what the KB and server expose about themselves.

The reference's observability is log lines (``svs/kb.py:871-874``);
svs_tpu adds structured, queryable state at three layers:

1. ``kb.stats()`` — rolling per-phase timings (pack / embed /
   device_search or host_search / finalize), ``pack_events`` (how each
   freshness check was satisfied: reuse / append / delete / sidecar /
   scan — writes should ride the incremental paths), and ``dispatch``
   (the adaptive host/device routing's live inputs: measured device RPC
   floor, learned host-scan bandwidth, hedge counters).
2. ``/healthz`` on the server — docs count, ``warming`` (background
   pack/mirror uploads in flight), fragment-cache hit/miss/entries, and
   the micro-batcher's queue depth.
3. ``/stats`` on the server — (1) plus the batcher's request/batch/shed
   counters.

Run:  python examples/observability.py
"""

from __future__ import annotations

import numpy as np

from svs_tpu import KB


def embedder(dim: int = 64):
    async def embed(texts):
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float32)
            v[abs(hash(t)) % dim] = 1.0
            out.append([float(x) for x in v])
        return out

    return embed


def main() -> None:
    kb = KB("observability_demo.sqlite", embedder(), force_fresh_db=True)
    with kb.bulk_add_docs() as add:
        for i in range(200):
            add(f"document number {i}", meta={"shard": i % 4})

    kb.retrieve("document number 42", 5)
    kb.retrieve_batch([f"document number {i}" for i in range(8)], 3)

    stats = kb.stats()

    print("== per-phase timings ==")
    for name in ("pack", "embed", "device_search", "host_search",
                 "finalize"):
        st = stats.get(name)
        if isinstance(st, dict) and st.get("count"):
            print(f"  {name:14s} count={int(st['count']):3d} "
                  f"p50={st['p50_s'] * 1e3:7.2f} ms")

    print("== pack events (writes should ride incremental paths) ==")
    print("  ", {k: int(v) for k, v in stats["pack_events"].items()})

    print("== dispatch inputs (why queries route where they do) ==")
    disp = stats["dispatch"]
    for k, v in sorted(disp.items()):
        print(f"  {k:14s} {v:.6g}")

    kb.close()


if __name__ == "__main__":
    main()
