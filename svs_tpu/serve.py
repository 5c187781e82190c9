"""HTTP serving facade with TPU-idiomatic request micro-batching.

The reference positions its async KB for web services
(``/root/reference/README.md:42-44``) but has no serving layer, and its
engine pays a full corpus scan per query either way.  On TPU the
economics invert: one batched device step over ``B`` queries costs ONE
corpus read (measured 0.027 ms/query at B=256 vs 4.1 ms at B=1 on v5e,
BENCHMARKS.md), so the right server shape is a **micro-batcher** —
concurrent ``/retrieve`` requests coalesce into single
:meth:`AsyncKB.retrieve_batch` steps bounded by a small time window.

Routes (JSON in/out):

- ``GET  /healthz``   -> ``{"ok": true, "docs": N}``
- ``GET  /stats``     -> KB phase timings + server batching counters
- ``POST /retrieve``  -> ``{"query": str | "queries": [str], "n": int}``
  -> one result list per query; each hit is ``{"score": float, "doc":
  DocumentRecord}`` (embeddings reported as presence booleans)
- ``POST /add``       -> ``{"texts": [str], "metas": [obj]?}`` (only with
  ``writable=True``) -> ``{"ids": [int]}``

Start from the CLI: ``svs-tpu serve kb.sqlite --port 8080``.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Any, Dict, List, Optional, Tuple

from .kb import AsyncKB
from .types import Retrieval

log = logging.getLogger(__name__)

try:  # aiohttp is the 'http' extra (same dependency as the providers)
    from aiohttp import web
except ImportError:  # pragma: no cover - exercised by import guard test
    web = None  # type: ignore[assignment]

#: Default micro-batch window: long enough to coalesce a burst arriving
#: within one event-loop tick + scheduling jitter, short next to the
#: ~4 ms device step it feeds.
DEFAULT_WINDOW_MS = 2.0
#: Matches the fused kernels' resident-batch ceiling
#: (``ops.pallas_extract.FUSED_MAX_BATCH``).
DEFAULT_MAX_BATCH = 256
#: Upper bound on per-request result count (rescore over-provisions 4x
#: on the device; an unbounded n would let one request drive an
#: arbitrarily large device top-k).
MAX_RETRIEVE_N = 1000


class MicroBatcher:
    """Coalesces concurrent retrieve calls into batched device steps.

    Single-event-loop discipline: all state is touched only from loop
    callbacks, so no locks are needed.  A request either rides the next
    flush (queue below ``max_batch``) or triggers an immediate one.
    """

    def __init__(
        self,
        kb: AsyncKB,
        max_batch: int = DEFAULT_MAX_BATCH,
        window_ms: float = DEFAULT_WINDOW_MS,
    ) -> None:
        self._kb = kb
        self._max_batch = max(1, int(max_batch))
        self._window_s = max(0.0, float(window_ms)) / 1e3
        self._queue: List[Tuple[str, int, "asyncio.Future[List[Retrieval]]"]] = []
        self._timer: Optional[asyncio.TimerHandle] = None
        # observability
        self.requests = 0
        self.batches = 0
        self.batched_queries = 0

    async def retrieve(self, query: str, n: int) -> List[Retrieval]:
        loop = asyncio.get_running_loop()
        fut: "asyncio.Future[List[Retrieval]]" = loop.create_future()
        self._queue.append((query, n, fut))
        self.requests += 1
        if len(self._queue) >= self._max_batch:
            self._cancel_timer()
            asyncio.ensure_future(self._flush())
        elif self._timer is None:
            self._timer = loop.call_later(
                self._window_s, lambda: asyncio.ensure_future(self._flush())
            )
        return await fut

    def _cancel_timer(self) -> None:
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None

    async def _flush(self) -> None:
        self._cancel_timer()
        batch = self._queue[: self._max_batch]
        self._queue = self._queue[self._max_batch :]
        if not batch:
            return
        if self._queue:
            # leftover burst: keep draining without waiting another window
            asyncio.ensure_future(self._flush())
        self.batches += 1
        self.batched_queries += len(batch)
        n_max = max(n for _, n, _ in batch)
        try:
            results = await self._kb.retrieve_batch(
                [q for q, _, _ in batch], n_max
            )
        except Exception as exc:  # propagate to every waiter
            for _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(exc)
            return
        for (_, n, fut), res in zip(batch, results):
            if not fut.done():
                fut.set_result(res[:n])


def _doc_json(doc: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(doc)
    # embeddings may be float lists when callers asked for them; the wire
    # format reports presence only (payloads are corpus-sized)
    if not isinstance(out.get("embedding"), (bool, type(None))):
        out["embedding"] = True
    return out


def make_app(
    kb: AsyncKB,
    *,
    writable: bool = False,
    max_batch: int = DEFAULT_MAX_BATCH,
    window_ms: float = DEFAULT_WINDOW_MS,
) -> "web.Application":
    """Build the aiohttp application serving ``kb``."""
    if web is None:  # pragma: no cover
        raise RuntimeError(
            "aiohttp is required for serving: pip install 'svs-tpu[http]'"
        )
    batcher = MicroBatcher(kb, max_batch=max_batch, window_ms=window_ms)
    app = web.Application()
    app["kb"] = kb
    app["batcher"] = batcher

    async def healthz(request: "web.Request") -> "web.Response":
        async with kb.bulk_query_docs() as q:
            docs = await q.count()
        return web.json_response({"ok": True, "docs": docs})

    async def stats(request: "web.Request") -> "web.Response":
        return web.json_response(
            {
                "kb": kb.stats(),
                "server": {
                    "requests": batcher.requests,
                    "batches": batcher.batches,
                    "batched_queries": batcher.batched_queries,
                    "avg_batch": (
                        batcher.batched_queries / batcher.batches
                        if batcher.batches
                        else 0.0
                    ),
                },
            }
        )

    async def retrieve(request: "web.Request") -> "web.Response":
        try:
            body = await request.json()
        except ValueError:
            raise web.HTTPBadRequest(text="body must be JSON")
        n = body.get("n", 10)
        if isinstance(n, bool) or not isinstance(n, int) or not (
            0 < n <= MAX_RETRIEVE_N
        ):
            raise web.HTTPBadRequest(
                text=f"'n' must be an integer in [1, {MAX_RETRIEVE_N}]"
            )
        if "queries" in body:
            queries = body["queries"]
            single = False
        elif "query" in body:
            queries = [body["query"]]
            single = True
        else:
            raise web.HTTPBadRequest(text="missing 'query' or 'queries'")
        if not isinstance(queries, list) or not all(
            isinstance(q, str) for q in queries
        ):
            raise web.HTTPBadRequest(text="'queries' must be a list of strings")
        results = await asyncio.gather(
            *(batcher.retrieve(q, n) for q in queries)
        )
        payload = [
            [{"score": r["score"], "doc": _doc_json(dict(r["doc"]))} for r in res]
            for res in results
        ]
        return web.json_response(
            {"results": payload[0] if single else payload}
        )

    async def add(request: "web.Request") -> "web.Response":
        if not writable:
            raise web.HTTPForbidden(text="server started read-only")
        try:
            body = await request.json()
        except ValueError:
            raise web.HTTPBadRequest(text="body must be JSON")
        texts = body.get("texts")
        if not isinstance(texts, list) or not all(
            isinstance(t, str) for t in texts
        ):
            raise web.HTTPBadRequest(text="'texts' must be a list of strings")
        metas = body.get("metas")
        if metas is None:
            metas = [None] * len(texts)
        if not isinstance(metas, list) or len(metas) != len(texts):
            raise web.HTTPBadRequest(
                text="'metas' must be a list matching 'texts'"
            )
        ids: List[int] = []
        async with kb.bulk_add_docs() as add_doc:
            for text, meta in zip(texts, metas):
                ids.append(await add_doc(text, meta=meta))
        return web.json_response({"ids": ids})

    app.router.add_get("/healthz", healthz)
    app.router.add_get("/stats", stats)
    app.router.add_post("/retrieve", retrieve)
    app.router.add_post("/add", add)
    return app


def run_server(
    db_path: str,
    *,
    host: str = "127.0.0.1",
    port: int = 8080,
    writable: bool = False,
    max_batch: int = DEFAULT_MAX_BATCH,
    window_ms: float = DEFAULT_WINDOW_MS,
    **kb_kwargs: Any,
) -> None:
    """Open ``db_path`` and serve it until interrupted (CLI entry)."""
    if web is None:
        raise RuntimeError(
            "aiohttp is required for serving: pip install 'svs-tpu[http]'"
        )

    async def _main() -> None:
        kb = AsyncKB(db_path, **kb_kwargs)
        await kb.load()  # pack the corpus before accepting traffic
        app = make_app(
            kb, writable=writable, max_batch=max_batch, window_ms=window_ms
        )
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        log.info("serving %s on http://%s:%d", db_path, host, port)
        try:
            await asyncio.Event().wait()
        finally:
            await runner.cleanup()
            await kb.close()

    try:
        asyncio.run(_main())
    except KeyboardInterrupt:
        pass
