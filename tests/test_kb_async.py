"""AsyncKB facade tests — the async mirror of test_kb_sync (the parity
itself is the contract, as in the reference suite)."""

import numpy as np
import pytest

from svs_tpu import AsyncKB, make_mock_embeddings_func

from kb_helpers import make_angle_embedder, make_onehot_embedder


async def test_lazy_init_and_reopen_from_params(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        await add("hello")
    await kb.close()
    kb2 = AsyncKB(db_path)  # no func: restored from DB
    hits = await kb2.retrieve("x", 1)
    assert hits[0]["doc"]["text"] == "hello"
    await kb2.close()


async def test_close_on_new_db_without_func_raises(db_path):
    """Even close() forces open-time reconciliation on a brand-new DB
    (reference parity: ``tests/test_kb.py:922-928``)."""
    kb = AsyncKB(db_path)
    with pytest.raises(RuntimeError, match="No embedding function"):
        await kb.close()


async def test_embedding_func_reset_on_close(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    await kb.load()
    await kb.close()
    kb2 = AsyncKB(db_path)  # restored from DB...
    await kb2.load()
    assert kb2.embedding_func is not None
    await kb2.close()
    assert kb2.embedding_func is None  # ...and reset to the ctor value


async def test_gzip_artifact_bytes_match_db(db_path):
    import gzip as gz

    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        await add("content")
    await kb.close(also_gzip=True)
    with gz.open(f"{db_path}.gz", "rb") as f:
        assert f.read() == db_path.read_bytes()


async def test_no_func_anywhere_raises(db_path):
    kb = AsyncKB(db_path)
    with pytest.raises(RuntimeError, match="No embedding function"):
        async with kb.bulk_add_docs() as add:
            pass


async def test_retrieve_ordering(db_path):
    kb = AsyncKB(db_path, make_angle_embedder())
    async with kb.bulk_add_docs() as add:
        for deg in [0, 10, 20, 45, 90]:
            await add(f"angle:{deg}")
    hits = await kb.retrieve("angle:12", 3)
    assert [h["doc"]["text"] for h in hits] == ["angle:10", "angle:20", "angle:0"]
    assert hits[0]["score"] == pytest.approx(np.cos(np.radians(2)), abs=1e-6)
    await kb.close()


async def test_retrieve_batch(db_path):
    kb = AsyncKB(db_path, make_onehot_embedder())
    async with kb.bulk_add_docs() as add:
        for i in range(6):
            await add(f"vec:{i}")
    res = await kb.retrieve_batch(["vec:1", "vec:4"], 2)
    assert res[0][0]["doc"]["text"] == "vec:1"
    assert res[1][0]["doc"]["text"] == "vec:4"
    await kb.close()


async def test_load_warms_engine(db_path):
    kb = AsyncKB(db_path, make_onehot_embedder())
    async with kb.bulk_add_docs() as add:
        await add("vec:0")
    await kb.load()
    assert kb.engine.corpus is not None
    assert kb.engine.corpus.n_valid == 1
    await kb.close()


async def test_bulk_add_rollback(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    with pytest.raises(RuntimeError, match="boom"):
        async with kb.bulk_add_docs() as add:
            await add("doomed")
            raise RuntimeError("boom")
    async with kb.bulk_query_docs() as q:
        assert await q.count() == 0
    await kb.close()


async def test_bulk_add_rollback_on_embedding_failure(db_path):
    async def flaky(texts):
        raise ConnectionError("down")

    kb = AsyncKB(db_path, flaky)
    with pytest.raises(ConnectionError):
        async with kb.bulk_add_docs() as add:
            await add("doomed")
    async with kb.bulk_query_docs() as q:
        assert await q.count() == 0
    await kb.close()


async def test_escape_guard(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        await add("x")
    with pytest.raises(AssertionError):
        await add("outside")
    await kb.close()


async def test_hierarchy_and_dfs(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        root = await add("root")
        kid = await add("kid", parent_id=root)
        grand = await add("grand", parent_id=kid)
        other = await add("other-root")
    async with kb.bulk_query_docs() as q:
        assert await q.count() == 4
        assert (await q.query_doc(grand))["level"] == 2
        order = [d["id"] async for d in q.dfs_traversal()]
        assert order == [root, kid, grand, other]
        await q.update_doc_meta(root, {"m": 1})
        assert (await q.query_doc(root))["meta"] == {"m": 1}
    await kb.close()


async def test_bulk_del(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        a = await add("a")
        b = await add("b")
    async with kb.bulk_del_docs() as dd:
        await dd(b)
    async with kb.bulk_query_docs() as q:
        assert await q.count() == 1
    await kb.close()


async def test_keyval_interface(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_keyval_update() as kv:
        assert not await kv.has("a")
        await kv.set("a", 42)
        await kv.set("b", b"raw-bytes")
        assert await kv.get("a") == 42
        assert await kv.get("missing", "fallback") == "fallback"
        with pytest.raises(KeyError):
            await kv.get("missing")
        assert await kv.count() == 2
        items = [i async for i in kv.items()]
        assert sorted(items) == [("a", 42), ("b", b"raw-bytes")]
        await kv.remove("a")
        with pytest.raises(KeyError):
            await kv.remove("a")
    await kb.close()


async def test_graph_interface(db_path):
    import networkx as nx

    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        a, b, r = await add("a"), await add("b"), await add("r")
    async with kb.bulk_graph_update() as g:
        e = await g.add_edge(a, b, r, weight=1.5)
        with pytest.raises(RuntimeError, match="already exists"):
            await g.add_edge(a, b, r)
        assert await g.count_edges() == 1
        graph = await g.build_networkx_graph()
        assert isinstance(graph, nx.MultiGraph)
        assert graph[a][b][0]["weight"] == 1.5
        await g.del_edge(e)
        assert await g.count_edges() == 0
    await kb.close()


async def test_graph_edges_enumeration(db_path):
    """Async mirror of the sync edges() enumeration contract."""
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        a, b, r = await add("a"), await add("b"), await add("r")
    async with kb.bulk_graph_update() as g:
        e1 = await g.add_edge(a, b, r, weight=0.5)
        e2 = await g.add_directed_edge(b, a, r)
        rows = await g.edges()
        assert rows == [
            {"id": e1, "a": a, "b": b, "relationship": r, "weight": 0.5,
             "directed": False},
            {"id": e2, "a": b, "b": a, "relationship": r, "weight": None,
             "directed": True},
        ]
        assert await g.edges(limit=1) == rows[:1]
        assert await g.edges(limit=5, offset=1) == rows[1:]
    await kb.close()


async def test_pairwise_scores(db_path):
    kb = AsyncKB(db_path, make_angle_embedder())
    async with kb.bulk_add_docs() as add:
        for deg in [0, 5, 90, 180]:
            await add(f"angle:{deg}")
    pairs = await kb.document_top_pairwise_scores(1)
    score, d1, d2 = pairs[0]
    assert {d1["text"], d2["text"]} == {"angle:0", "angle:5"}
    await kb.close()


async def test_close_gzip(db_path):
    kb = AsyncKB(db_path, make_mock_embeddings_func())
    async with kb.bulk_add_docs() as add:
        await add("z")
    await kb.close(vacuum=True, also_gzip=True)
    kb2 = AsyncKB(f"{db_path}.gz")
    async with kb2.bulk_query_docs() as q:
        assert await q.count() == 1
    await kb2.close()


async def test_reference_retrieval_scenario(db_path):
    """The reference suite's canonical retrieve scenario (substring-keyed
    embedder, exact orderings, freshness across add/delete —
    ``tests/test_kb.py:1205-1318``), replayed verbatim against this
    implementation."""

    async def embed(texts):
        table = {
            "first": [1.0, 0.001, 0.0],
            "second": [0.0, 1.0, 0.0001],
            "third": [0.01, 0.0, 1.0],
            "forth": [0.707, 0.707, 0.0],
        }
        return [next(v for key, v in table.items() if key in t) for t in texts]

    kb = AsyncKB(db_path, embed)
    async with kb.bulk_add_docs() as add_doc:
        assert await add_doc("third doc") == 1
        assert await add_doc("first doc") == 2
        assert await add_doc("second doc") == 3

    for query, order in [
        ("... first ...", ["first doc", "third doc", "second doc"]),
        ("... second ...", ["second doc", "first doc", "third doc"]),
        ("... third ...", ["third doc", "first doc", "second doc"]),
    ]:
        docs = await kb.retrieve(query, n=3)
        assert [d["doc"]["text"] for d in docs] == order

    records = await kb.document_top_pairwise_scores(n=2)
    assert [(a["id"], b["id"]) for _, a, b in records] == [(1, 2), (2, 3)]

    # freshness across an add...
    assert (await kb.retrieve("... forth ...", 1))[0]["doc"]["text"] == "first doc"
    async with kb.bulk_add_docs() as add_doc:
        assert await add_doc("forth doc") == 4
    assert (await kb.retrieve("... forth ...", 1))[0]["doc"]["text"] == "forth doc"

    # ...and across deletes
    async with kb.bulk_del_docs() as del_doc:
        await del_doc(1), await del_doc(2), await del_doc(4)
    assert (await kb.retrieve("... forth ...", 1))[0]["doc"]["text"] == "second doc"
    await kb.close()


async def test_concurrent_retrieves(db_path):
    """Multiple in-flight retrieves serialize safely on one KB."""
    import asyncio

    kb = AsyncKB(db_path, make_onehot_embedder())
    async with kb.bulk_add_docs() as add:
        for i in range(10):
            await add(f"vec:{i}")
    results = await asyncio.gather(*(kb.retrieve(f"vec:{i}", 1) for i in range(5)))
    assert [r[0]["doc"]["text"] for r in results] == [f"vec:{i}" for i in range(5)]
    await kb.close()


async def test_retrieve_filtered_async_parity(db_path):
    """AsyncKB's where= path mirrors the sync facade: oracle-exact
    filtered top-n, including a forced widen past the first prefix."""
    from kb_helpers import make_angle_embedder

    kb = AsyncKB(db_path, make_angle_embedder(), rescore=True)
    async with kb.bulk_add_docs() as add:
        for deg in range(0, 180, 5):
            await add(f"angle:{deg}", meta={"bucket": deg % 3})
    where = lambda d: (d["meta"] or {}).get("bucket") == 0  # noqa: E731
    hits = await kb.retrieve("angle:47", 4, where=where)
    full = await kb.retrieve("angle:47", 36)
    oracle = [h for h in full if where(h["doc"])][:4]
    assert [(h["doc"]["id"], h["score"]) for h in hits] == [
        (h["doc"]["id"], h["score"]) for h in oracle
    ]
    # rare matches at the bottom of the ranking: must widen and stay exact
    far = await kb.retrieve(
        "angle:0", 3, where=lambda d: int(d["text"].split(":")[1]) >= 165
    )
    assert [h["doc"]["text"] for h in far] == [
        "angle:165", "angle:170", "angle:175"
    ]
    await kb.close()
