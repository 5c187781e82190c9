"""HTTP serving facade: routes, micro-batching, and write gating.

Uses aiohttp's in-process TestServer/TestClient — no sockets are bound
beyond loopback and no external services are touched.
"""

import asyncio

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from svs_tpu import AsyncKB  # noqa: E402
from svs_tpu.serve import MicroBatcher, make_app  # noqa: E402

from kb_helpers import make_onehot_embedder  # noqa: E402


async def _make_kb(db_path, n_docs=12):
    kb = AsyncKB(db_path, make_onehot_embedder(), force_fresh_db=True)
    async with kb.bulk_add_docs() as add:
        for i in range(n_docs):
            await add(f"vec:{i}")
    return kb


async def _client(kb, **kwargs):
    app = make_app(kb, **kwargs)
    client = TestClient(TestServer(app))
    await client.start_server()
    return client


async def test_healthz_and_retrieve_single(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb)
    try:
        r = await client.get("/healthz")
        assert r.status == 200
        body = await r.json()
        assert body["ok"] is True and body["docs"] == 12
        assert body["warming"] is False

        r = await client.post("/retrieve", json={"query": "vec:3", "n": 2})
        assert r.status == 200
        body = await r.json()
        hits = body["results"]
        assert hits[0]["doc"]["text"] == "vec:3"
        assert hits[0]["score"] == pytest.approx(1.0)
        assert len(hits) == 2
    finally:
        await client.close()
        await kb.close()


async def test_retrieve_many_and_bad_requests(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb)
    try:
        r = await client.post(
            "/retrieve", json={"queries": ["vec:1", "vec:7"], "n": 1}
        )
        body = await r.json()
        assert [h[0]["doc"]["text"] for h in body["results"]] == [
            "vec:1",
            "vec:7",
        ]

        assert (await client.post("/retrieve", json={"n": 3})).status == 400
        assert (
            await client.post("/retrieve", json={"queries": [1, 2]})
        ).status == 400
        r = await client.post("/retrieve", data=b"not json")
        assert r.status == 400
    finally:
        await client.close()
        await kb.close()


async def test_concurrent_requests_coalesce_into_batches(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb, window_ms=20.0)
    try:
        results = await asyncio.gather(
            *(
                client.post("/retrieve", json={"query": f"vec:{i % 12}", "n": 1})
                for i in range(24)
            )
        )
        for i, r in enumerate(results):
            body = await r.json()
            assert body["results"][0]["doc"]["text"] == f"vec:{i % 12}"

        stats = await (await client.get("/stats")).json()
        server = stats["server"]
        assert server["requests"] == 24
        assert server["batched_queries"] == 24
        # 24 concurrent requests within one 20 ms window must coalesce
        # into far fewer device steps than requests
        assert server["batches"] < 24
        assert server["avg_batch"] > 1.5
    finally:
        await client.close()
        await kb.close()


async def test_add_gated_by_writable(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb)  # read-only default
    try:
        r = await client.post("/add", json={"texts": ["vec:99"]})
        assert r.status == 403
    finally:
        await client.close()

    client = await _client(kb, writable=True)
    try:
        r = await client.post(
            "/add", json={"texts": ["vec:13"], "metas": [{"a": 1}]}
        )
        assert r.status == 200
        ids = (await r.json())["ids"]
        assert len(ids) == 1

        r = await client.post("/retrieve", json={"query": "vec:13", "n": 1})
        hit = (await r.json())["results"][0]
        assert hit["doc"]["text"] == "vec:13"
        assert hit["doc"]["meta"] == {"a": 1}

        assert (
            await client.post("/add", json={"texts": "nope"})
        ).status == 400
        assert (
            await client.post(
                "/add", json={"texts": ["a"], "metas": [1, 2]}
            )
        ).status == 400
    finally:
        await client.close()
        await kb.close()


async def test_batcher_max_batch_splits_bursts(db_path):
    kb = await _make_kb(db_path)
    batcher = MicroBatcher(kb, max_batch=4, window_ms=50.0)
    results = await asyncio.gather(
        *(batcher.retrieve(f"vec:{i % 12}", 1) for i in range(10))
    )
    for i, res in enumerate(results):
        assert res[0]["doc"]["text"] == f"vec:{i % 12}"
    assert batcher.requests == 10
    assert batcher.batches >= 3  # 4 + 4 + 2
    await kb.close()


async def test_batcher_propagates_errors(db_path):
    kb = await _make_kb(db_path)
    await kb.close()

    async def boom(texts):
        raise RuntimeError("embedder down")

    kb2 = AsyncKB(db_path, boom)
    batcher = MicroBatcher(kb2, max_batch=8, window_ms=1.0)
    with pytest.raises(RuntimeError, match="embedder down"):
        await batcher.retrieve("vec:1", 1)
    await kb2.close()


async def test_cancelled_waiters_release_queue_capacity(db_path):
    """A disconnected client's queries must leave the queue WITH their
    capacity slots — otherwise a timeout storm defeats the overload
    bound (pending drains while dead queries still fill the queue and
    ride device batches)."""
    kb = await _make_kb(db_path)
    gate = asyncio.Event()
    inner = kb.embedding_func

    async def slow_embed(texts):
        await gate.wait()
        return await inner(texts)

    slow_embed.__embedding_func_params__ = getattr(
        inner, "__embedding_func_params__", None
    )
    kb.embedding_func = slow_embed
    batcher = MicroBatcher(kb, max_batch=32, window_ms=5.0, max_queue=8)
    try:
        # fill the queue to the bound, then cancel every waiter
        waiters = [
            asyncio.ensure_future(batcher.retrieve(f"vec:{i}", 1))
            for i in range(8)
        ]
        await asyncio.sleep(0)  # admit all 8
        assert batcher._pending == 8
        for w in waiters:
            w.cancel()
        await asyncio.sleep(0)  # run cancellation callbacks
        assert batcher._pending == 0
        assert batcher._queue == []  # dead queries evicted, not dispatched
        # full capacity is available again and live requests complete
        gate.set()
        res = await asyncio.gather(
            *(batcher.retrieve(f"vec:{i % 12}", 1) for i in range(8))
        )
        assert all(r[0]["score"] == pytest.approx(1.0) for r in res)
    finally:
        await kb.close()


async def test_kv_put_null_rejected_not_500(db_path):
    """JSON null must be a 400 at validation — the STRICT schema's
    NOT NULL would otherwise surface it as a 500 IntegrityError."""
    kb = await _make_kb(db_path)
    client = await _client(kb, writable=True)
    try:
        r = await client.put("/kv/x", json=None)
        assert r.status == 400
        assert "null" not in (await r.text())
    finally:
        await client.close()
        await kb.close()


async def test_concurrent_writes_and_reads(db_path):
    """Writes through /add interleaved with concurrent /retrieve bursts:
    the per-KB lock + engine invalidation must keep every response
    consistent (no stale-corpus index errors, new docs retrievable)."""
    kb = await _make_kb(db_path)
    client = await _client(kb, writable=True, window_ms=5.0)
    try:
        async def reader(i):
            r = await client.post(
                "/retrieve", json={"query": f"vec:{i % 12}", "n": 1}
            )
            assert r.status == 200
            return (await r.json())["results"][0]["doc"]["text"]

        async def writer(wave):
            r = await client.post(
                "/add", json={"texts": [f"vec:{12 + wave}"]}
            )
            assert r.status == 200

        for wave in range(3):
            results = await asyncio.gather(
                writer(wave), *(reader(i) for i in range(10))
            )
            assert results[1:] == [f"vec:{i % 12}" for i in range(10)]
            # the newly added doc is immediately retrievable
            r = await client.post(
                "/retrieve", json={"query": f"vec:{12 + wave}", "n": 1}
            )
            assert (await r.json())["results"][0]["doc"]["text"] == (
                f"vec:{12 + wave}"
            )
    finally:
        await client.close()
        await kb.close()

async def test_queue_bound_sheds_with_429(db_path):
    """A burst beyond the queue bound is shed with 429, not queued
    without limit; accepted requests still complete correctly."""
    kb = await _make_kb(db_path)
    # tiny bound: 4 per batch, 8 queued max; a slow embedder keeps the
    # queue occupied long enough for the burst to pile up
    slow_gate = asyncio.Event()
    inner = kb.embedding_func

    async def slow_embed(texts):
        await slow_gate.wait()
        return await inner(texts)

    slow_embed.__embedding_func_params__ = getattr(
        inner, "__embedding_func_params__", None
    )
    kb.embedding_func = slow_embed
    client = await _client(kb, max_batch=4, max_queue=8, window_ms=1.0)
    try:
        tasks = [
            asyncio.ensure_future(
                client.post("/retrieve", json={"query": f"vec:{i % 12}", "n": 1})
            )
            for i in range(20)
        ]
        await asyncio.sleep(0.1)  # let the queue fill and shedding begin
        slow_gate.set()
        responses = await asyncio.gather(*tasks)
        statuses = [r.status for r in responses]
        assert statuses.count(429) > 0, statuses
        assert statuses.count(200) > 0, statuses
        for r in responses:
            if r.status == 200:
                body = await r.json()
                assert body["results"][0]["score"] == pytest.approx(1.0)
        stats = await (await client.get("/stats")).json()
        assert stats["server"]["shed"] == statuses.count(429)
    finally:
        await client.close()
        await kb.close()


async def test_n_bucketing_isolates_outlier_n(db_path):
    """An n=64 outlier co-arriving with n=1 requests must not change the
    n=1 responses (they flush as separate retrieve_batch groups)."""
    kb = await _make_kb(db_path)
    batcher = MicroBatcher(kb, max_batch=16, window_ms=20.0)
    results = await asyncio.gather(
        batcher.retrieve("vec:0", 64),
        *(batcher.retrieve(f"vec:{i % 12}", 1) for i in range(8)),
    )
    assert len(results[0]) == 12  # n=64 capped by corpus size
    for i, res in enumerate(results[1:]):
        assert len(res) == 1 and res[0]["doc"]["text"] == f"vec:{i % 12}"
    assert batcher.batches == 1  # one flush, grouped internally
    await kb.close()


async def test_pairwise_route(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb)
    try:
        r = await client.post("/pairwise", json={"n": 3})
        assert r.status == 200
        pairs = (await r.json())["pairs"]
        assert len(pairs) == 3
        for p in pairs:
            assert set(p) == {"score", "doc_a", "doc_b"}
            assert p["doc_a"]["id"] != p["doc_b"]["id"]
        assert (await client.post("/pairwise", json={"n": 0})).status == 400
        assert (
            await client.post("/pairwise", json={"n": 10**9})
        ).status == 400
        # filtered pairwise: both endpoints must pass the meta filter
        async with kb.bulk_query_docs() as q:
            roots = [d async for d in q.dfs_traversal()]
            for d in roots[:6]:
                await q.update_doc_meta(d["id"], {"grp": "x"})
        r = await client.post(
            "/pairwise", json={"n": 2, "meta_filter": {"grp": "x"}}
        )
        assert r.status == 200
        fp = (await r.json())["pairs"]
        assert len(fp) == 2
        assert all(
            p["doc_a"]["meta"] == {"grp": "x"}
            and p["doc_b"]["meta"] == {"grp": "x"}
            for p in fp
        )
        assert (
            await client.post(
                "/pairwise", json={"n": 2, "meta_filter": [1]}
            )
        ).status == 400
    finally:
        await client.close()
        await kb.close()


async def test_delete_route(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb, writable=True)
    try:
        r = await client.post("/retrieve", json={"query": "vec:5", "n": 1})
        doc_id = (await r.json())["results"][0]["doc"]["id"]
        r = await client.post("/delete", json={"ids": [doc_id]})
        assert r.status == 200 and (await r.json()) == {"deleted": 1}
        r = await client.get("/healthz")
        # healthz count may be cached ~1s; wait out the TTL
        await asyncio.sleep(1.1)
        r = await client.get("/healthz")
        assert (await r.json())["docs"] == 11
        # bad input + read-only gating
        assert (await client.post("/delete", json={"ids": "x"})).status == 400
        r = await client.post("/delete", json={"ids": [999999]})
        assert r.status == 404
    finally:
        await client.close()
        await kb.close()

    client = await _client(kb)  # read-only
    try:
        assert (await client.post("/delete", json={"ids": [1]})).status == 403
    finally:
        await client.close()
        await kb.close()


async def test_kv_routes(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb, writable=True)
    try:
        assert (await client.get("/kv/color")).status == 404
        # KV values are SQLite-bindable scalars (reference semantics)
        assert (
            await client.put("/kv/color", json={"hue": "red"})
        ).status == 400
        r = await client.put("/kv/color", json="red")
        assert r.status == 200
        r = await client.get("/kv/color")
        assert (await r.json()) == {"key": "color", "value": "red"}
        r = await client.delete("/kv/color")
        assert r.status == 200
        assert (await client.get("/kv/color")).status == 404
        assert (await client.delete("/kv/none")).status == 404
    finally:
        await client.close()
        await kb.close()

    client = await _client(kb)  # read-only: reads ok, writes gated
    try:
        assert (await client.put("/kv/x", json=1)).status == 403
        assert (await client.delete("/kv/x")).status == 403
    finally:
        await client.close()
        await kb.close()


async def test_serve_with_replica_engine(db_path):
    """The serving facade works unchanged over a replica-mode KB: each
    micro-batch splits across the replica devices inside the engine."""
    kb = AsyncKB(
        db_path, make_onehot_embedder(), force_fresh_db=True, replicas=4
    )
    async with kb.bulk_add_docs() as add:
        for i in range(16):
            await add(f"vec:{i}")
    client = await _client(kb)
    try:
        # a burst that co-batches and then fans out over 4 replicas
        rs = await asyncio.gather(*[
            client.post("/retrieve", json={"query": f"vec:{i}", "n": 1})
            for i in range(10)
        ])
        for i, r in enumerate(rs):
            assert r.status == 200
            body = await r.json()
            assert body["results"][0]["doc"]["text"] == f"vec:{i}"
    finally:
        await client.close()
        await kb.close()


async def test_doc_routes(db_path):
    kb = AsyncKB(db_path, make_onehot_embedder(), force_fresh_db=True)
    async with kb.bulk_add_docs() as add:
        root = await add("vec:0", meta={"kind": "root"})
        kid_a = await add("vec:1", parent_id=root)
        kid_b = await add("vec:2", parent_id=root)
    client = await _client(kb, writable=True)
    try:
        r = await client.get(f"/doc/{root}")
        assert r.status == 200
        doc = (await r.json())["doc"]
        assert doc["text"] == "vec:0" and doc["meta"] == {"kind": "root"}
        assert doc["level"] == 0 and doc["embedding"] is True

        assert (await client.get("/doc/999999")).status == 404
        assert (await client.get("/doc/xyz")).status == 400

        r = await client.get(f"/doc/{root}/children")
        kids = (await r.json())["docs"]
        assert {d["id"] for d in kids} == {kid_a, kid_b}
        assert all(d["level"] == 1 for d in kids)
        assert (await client.get("/doc/999999/children")).status == 404

        r = await client.get("/level/1")
        body = await r.json()
        assert {d["id"] for d in body["docs"]} == {kid_a, kid_b}
        assert body["truncated"] is False
        assert (await client.get("/level/7")).status == 200

        r = await client.put(f"/doc/{kid_a}/meta", json={"tag": "x"})
        assert r.status == 200
        r = await client.get(f"/doc/{kid_a}")
        assert (await r.json())["doc"]["meta"] == {"tag": "x"}
        # json=None means "no body" to the client; send a literal null
        r = await client.put(
            f"/doc/{kid_a}/meta", data=b"null",
            headers={"Content-Type": "application/json"},
        )
        assert r.status == 200
        r = await client.get(f"/doc/{kid_a}")
        assert (await r.json())["doc"]["meta"] is None
        assert (
            await client.put(f"/doc/{kid_a}/meta", json=["not", "a", "dict"])
        ).status == 400
        assert (await client.put("/doc/999999/meta", json={})).status == 404
    finally:
        await client.close()

    # read-only client over the SAME open KB (closing a force_fresh_db KB
    # wipes it on reopen — reference parity): queries ok, meta write gated
    client = await _client(kb)
    try:
        assert (await client.get(f"/doc/{root}")).status == 200
        assert (await client.put(f"/doc/{root}/meta", json={})).status == 403
    finally:
        await client.close()
        await kb.close()


async def test_graph_routes(db_path):
    kb = await _make_kb(db_path, n_docs=4)
    client = await _client(kb, writable=True)
    try:
        r = await client.post(
            "/graph/edge",
            json={"a": 1, "b": 2, "relationship": 3, "weight": 0.5},
        )
        assert r.status == 200
        e1 = (await r.json())["edge_id"]
        r = await client.post(
            "/graph/edge",
            json={"a": 2, "b": 3, "relationship": 4, "directed": True},
        )
        e2 = (await r.json())["edge_id"]

        # duplicate triplet -> 409 (reference RuntimeError semantics)
        r = await client.post(
            "/graph/edge", json={"a": 1, "b": 2, "relationship": 3}
        )
        assert r.status == 409

        r = await client.get("/graph/edges")
        body = await r.json()
        assert body["total"] == 2
        assert body["edges"] == [
            {"id": e1, "a": 1, "b": 2, "relationship": 3, "weight": 0.5,
             "directed": False},
            {"id": e2, "a": 2, "b": 3, "relationship": 4, "weight": None,
             "directed": True},
        ]

        # paging
        r = await client.get("/graph/edges?limit=1&offset=1")
        body = await r.json()
        assert [e["id"] for e in body["edges"]] == [e2]
        assert body["total"] == 2
        assert (await client.get("/graph/edges?limit=0")).status == 400
        assert (await client.get("/graph/edges?limit=zzz")).status == 400

        # bad bodies
        assert (
            await client.post("/graph/edge", json={"a": 1, "b": 2})
        ).status == 400
        assert (
            await client.post(
                "/graph/edge",
                json={"a": 1, "b": 2, "relationship": 3, "directed": "yes"},
            )
        ).status == 400

        r = await client.delete(f"/graph/edge/{e1}")
        assert r.status == 200
        assert (await client.delete(f"/graph/edge/{e1}")).status == 404
        r = await client.get("/graph/edges")
        assert (await r.json())["total"] == 1
    finally:
        await client.close()
        await kb.close()

    client = await _client(kb)  # read-only: listing ok, mutation gated
    try:
        assert (await client.get("/graph/edges")).status == 200
        assert (
            await client.post(
                "/graph/edge", json={"a": 1, "b": 2, "relationship": 3}
            )
        ).status == 403
        assert (await client.delete("/graph/edge/1")).status == 403
    finally:
        await client.close()
        await kb.close()


async def test_retrieve_meta_filter(db_path):
    """meta_filter: exact filtered retrieval over meta-key equalities;
    non-object filters are rejected; filtered requests still count
    against the admission bound (run_unbatched path)."""
    kb = AsyncKB(db_path, make_onehot_embedder(), force_fresh_db=True)
    async with kb.bulk_add_docs() as add:
        for i in range(12):
            await add(f"vec:{i}", meta={"lang": "en" if i % 2 == 0 else "de"})
    client = await _client(kb)
    try:
        r = await client.post(
            "/retrieve",
            json={"query": "vec:3", "n": 3, "meta_filter": {"lang": "de"}},
        )
        assert r.status == 200
        hits = (await r.json())["results"]
        assert hits[0]["doc"]["text"] == "vec:3"
        assert all(h["doc"]["meta"]["lang"] == "de" for h in hits)
        assert len(hits) == 3

        # filter matching nothing -> empty list, not an error
        r = await client.post(
            "/retrieve",
            json={"query": "vec:3", "n": 3, "meta_filter": {"lang": "fr"}},
        )
        assert (await r.json())["results"] == []

        # absent key never matches (docs without meta too)
        r = await client.post(
            "/retrieve",
            json={"query": "vec:3", "n": 3, "meta_filter": {"nope": None}},
        )
        assert (await r.json())["results"] == []

        # malformed filter -> 400
        r = await client.post(
            "/retrieve",
            json={"query": "vec:3", "n": 3, "meta_filter": ["lang"]},
        )
        assert r.status == 400
    finally:
        await client.close()
        await kb.close()


async def test_fragment_cache_meta_update_invalidates(db_path):
    """/retrieve responses assemble from preserialized doc fragments; a
    meta update (a store write -> new freshness epoch) must invalidate
    them, and repeated identical requests must serve from the cache."""
    kb = await _make_kb(db_path)
    client = await _client(kb, writable=True)
    try:
        r = await client.post("/retrieve", json={"query": "vec:5", "n": 1})
        doc = (await r.json())["results"][0]["doc"]
        assert doc["meta"] is None
        doc_id = doc["id"]

        # cache warm: identical request, identical payload
        r2 = await client.post("/retrieve", json={"query": "vec:5", "n": 1})
        assert (await r2.json())["results"][0]["doc"] == doc

        r = await client.put(f"/doc/{doc_id}/meta", json={"tag": "fresh"})
        assert r.status == 200
        r3 = await client.post("/retrieve", json={"query": "vec:5", "n": 1})
        got = (await r3.json())["results"][0]["doc"]
        assert got["meta"] == {"tag": "fresh"}
    finally:
        await client.close()
        await kb.close()


async def test_fragment_render_matches_json_dumps(db_path):
    """Byte-assembled responses must parse to exactly what the
    dict+json.dumps path produced (scores as shortest-repr floats,
    unicode intact, embedding as presence boolean)."""
    import json as _json

    kb = AsyncKB(db_path, make_onehot_embedder(), force_fresh_db=True)
    async with kb.bulk_add_docs() as add:
        await add("vec:1", meta={"u": "héllo ☃", "n": [1, 2.5, None]})
        await add("vec:2")
        await add("vec:3")
    client = await _client(kb)
    try:
        r = await client.post(
            "/retrieve", json={"queries": ["vec:1", "vec:2"], "n": 3}
        )
        body = _json.loads(await r.text())
        results = body["results"]
        assert len(results) == 2 and len(results[0]) == 3
        by_text = {h["doc"]["text"]: h for h in results[0]}
        assert by_text["vec:1"]["doc"]["meta"] == {
            "u": "héllo ☃", "n": [1, 2.5, None]
        }
        assert by_text["vec:1"]["doc"]["embedding"] is True
        assert isinstance(by_text["vec:1"]["score"], float)
    finally:
        await client.close()
        await kb.close()


async def test_warm_bucket_ladder_and_kb_warmup(db_path):
    from svs_tpu.serve import warm_bucket_ladder

    assert warm_bucket_ladder(256) == [1, 2, 4, 8, 16, 32, 64, 128, 256]
    assert warm_bucket_ladder(1) == [1]
    assert warm_bucket_ladder(48) == [1, 2, 4, 8, 16, 32, 48]

    kb = await _make_kb(db_path)
    try:
        await kb.warmup([1, 4], n=3)
        stats = kb.stats()
        assert stats["warmup"]["count"] == 4  # 2 sizes x 2 rounds
        # warmup must not disturb results
        hits = await kb.retrieve("vec:2", 2)
        assert hits[0]["doc"]["text"] == "vec:2"
    finally:
        await kb.close()


def test_sync_kb_warmup(db_path):
    from svs_tpu import KB
    from tests.kb_helpers import make_onehot_embedder as _mk

    kb = KB(db_path, _mk(), force_fresh_db=True)
    try:
        with kb.bulk_add_docs() as add:
            for i in range(8):
                add(f"vec:{i}")
        kb.warmup([1, 2], n=2, rounds=1)
        assert kb.stats()["warmup"]["count"] == 2
    finally:
        kb.close()


def test_fragment_cache_segmented_eviction():
    """Overflow moves the current segment to 'old' instead of dropping
    everything; hot entries promote back and survive rollovers (a
    wholesale clear collapsed the hit rate at corpora larger than the
    cache)."""
    from svs_tpu.serve import _DocFragmentCache

    fc = _DocFragmentCache(max_entries=8)  # segments of 4
    docs = [
        {"id": i, "parent_id": None, "level": 0, "text": f"t{i}",
         "embedding": True, "meta": None}
        for i in range(20)
    ]
    hot = docs[0]
    fc.frag(hot)
    for d in docs[1:20]:
        fc.frag(d)      # rolls the segments several times
        fc.frag(hot)    # hot doc touched between every insert
    # the hot doc stayed cached through every rollover
    before = fc.misses
    fc.frag(hot)
    assert fc.misses == before
    assert fc.hits >= 19
    assert len(fc) <= 8


async def test_healthz_exports_cache_and_queue(db_path):
    kb = await _make_kb(db_path)
    client = await _client(kb)
    try:
        # populate the fragment cache via one retrieve
        resp = await client.post("/retrieve", json={"query": "vec:1", "n": 2})
        assert resp.status == 200
        h = await (await client.get("/healthz")).json()
        assert h["ok"] is True
        assert "fragment_cache" in h and "queue_depth" in h
        assert h["fragment_cache"]["misses"] >= 1
        assert h["queue_depth"] == 0
        # a second identical retrieve hits the cache
        await client.post("/retrieve", json={"query": "vec:1", "n": 2})
        h2 = await (await client.get("/healthz")).json()
        assert h2["fragment_cache"]["hits"] > h["fragment_cache"]["hits"]
    finally:
        await client.close()
        await kb.close()


def test_cli_serve_accepts_workers(monkeypatch):
    import svs_tpu.cli as cli

    seen = {}

    def fake_run_server(db, **kw):
        seen.update(kw)

    monkeypatch.setattr("svs_tpu.serve.run_server", fake_run_server)
    rc = cli.main(["serve", "/tmp/x.sqlite", "--workers", "3"])
    assert rc == 0
    assert seen["workers"] == 3
