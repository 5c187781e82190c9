"""Serving example: run the micro-batching HTTP server and query it.

Starts `svs_tpu.serve` on a loopback port over a small demo KB, fires a
burst of concurrent requests, and prints the achieved batching stats —
the point of the server: concurrent requests coalesce into single
batched device steps (one corpus read serves the whole batch).

Run:  python examples/serving.py
"""

from __future__ import annotations

import asyncio
import math
import zlib

from svs_tpu import AsyncKB
from svs_tpu.serve import make_app

try:
    from aiohttp.test_utils import TestClient, TestServer
except ImportError:  # pragma: no cover
    raise SystemExit("this example needs aiohttp: pip install 'svs-tpu[http]'")

DB = "serving_demo.sqlite"


def make_embedder(dim: int = 64):
    async def embed(texts):
        out = []
        for t in texts:
            # crc32, not hash(): PYTHONHASHSEED salting made vectors (and
            # therefore exact-tie collisions between distinct docs) vary
            # per process — a ~5%-per-run flake in the top-1 assertion
            h = zlib.crc32(t.encode())
            v = [0.0] * dim
            v[h % dim] = 1.0
            # tiny second component so near-misses rank deterministically
            v[(h // dim) % dim] += 0.1
            n = math.sqrt(sum(x * x for x in v))
            out.append([x / n for x in v])
        return out

    return embed


async def main() -> None:
    kb = AsyncKB(DB, make_embedder(), force_fresh_db=True)
    async with kb.bulk_add_docs() as add:
        for i in range(200):
            await add(f"document number {i}", meta={"i": i})
    await kb.load()

    app = make_app(kb, window_ms=5.0)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        health = await (await client.get("/healthz")).json()
        print("healthz:", health)

        # a burst of concurrent queries -> few batched device steps
        responses = await asyncio.gather(
            *(
                client.post(
                    "/retrieve",
                    json={"query": f"document number {i}", "n": 3},
                )
                for i in range(50)
            )
        )
        hits = [(await r.json())["results"][0]["doc"]["text"] for r in responses]
        assert hits[7] == "document number 7"
        stats = await (await client.get("/stats")).json()
        srv = stats["server"]
        print(
            f"{srv['requests']} requests served in {srv['batches']} device "
            f"steps (avg batch {srv['avg_batch']:.1f})"
        )
    finally:
        await client.close()
        await kb.close()


if __name__ == "__main__":
    asyncio.run(main())
