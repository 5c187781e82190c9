"""KB facade with a device mesh: full retrieval pipeline (pack with
sharded placement -> shard_map search -> merge -> rescore -> hydrate) on
the 8-virtual-device CPU mesh, compared against an unsharded KB."""

import jax
import pytest

from svs_tpu import KB
from svs_tpu.parallel import default_mesh, mesh_2d

from kb_helpers import make_angle_embedder


@pytest.fixture(scope="module")
def need_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _populate(kb, n=40):
    with kb.bulk_add_docs() as add:
        for i in range(n):
            add(f"angle:{(i * 7) % 360}")


def test_kb_retrieve_on_1d_mesh_matches_unsharded(need_devices, tmp_path):
    plain = KB(tmp_path / "plain.sqlite", make_angle_embedder())
    _populate(plain)
    expected = plain.retrieve("angle:33", 5)
    plain.close()

    sharded = KB(
        tmp_path / "sharded.sqlite",
        make_angle_embedder(),
        mesh=default_mesh(),
    )
    _populate(sharded)
    got = sharded.retrieve("angle:33", 5)
    assert [h["doc"]["text"] for h in got] == [
        h["doc"]["text"] for h in expected
    ]
    assert [h["score"] for h in got] == pytest.approx(
        [h["score"] for h in expected], abs=1e-6
    )
    sharded.close()


def test_kb_retrieve_on_2d_mesh(need_devices, tmp_path):
    kb = KB(
        tmp_path / "m2.sqlite",
        make_angle_embedder(),
        mesh=mesh_2d(4, 2),  # 'model' axis auto-shards the embedding dim
        precision="f32",
    )
    _populate(kb, n=30)
    hits = kb.retrieve("angle:0", 3)
    assert hits[0]["doc"]["text"] == "angle:0"
    kb.close()


def test_kb_int8_on_mesh(need_devices, tmp_path):
    kb = KB(
        tmp_path / "m8.sqlite",
        make_angle_embedder(),
        mesh=default_mesh(),
        precision="int8",
    )
    _populate(kb)
    hits = kb.retrieve("angle:77", 3)
    assert hits[0]["doc"]["text"] == "angle:77"  # exact via f32 rescore
    kb.close()


async def test_async_kb_batch_on_mesh(need_devices, tmp_path):
    from svs_tpu import AsyncKB

    kb = AsyncKB(
        tmp_path / "am.sqlite", make_angle_embedder(), mesh=default_mesh()
    )
    async with kb.bulk_add_docs() as add:
        for deg in range(0, 360, 9):
            await add(f"angle:{deg}")
    res = await kb.retrieve_batch(["angle:45", "angle:180"], 2)
    assert res[0][0]["doc"]["text"] == "angle:45"
    assert res[1][0]["doc"]["text"] == "angle:180"
    await kb.close()


def test_kb_pairwise_on_mesh(need_devices, tmp_path):
    kb = KB(
        tmp_path / "mp.sqlite", make_angle_embedder(), mesh=default_mesh()
    )
    with kb.bulk_add_docs() as add:
        for deg in [0, 4, 90, 180]:
            add(f"angle:{deg}")
    pairs = kb.document_top_pairwise_scores(1)
    score, d1, d2 = pairs[0]
    assert {d1["text"], d2["text"]} == {"angle:0", "angle:4"}
    kb.close()


def test_kb_filtered_prefilter_on_mesh(need_devices, tmp_path):
    """Declarative filtered retrieval on a mesh routes through the
    sharded subset kernel (engine.subset_topk must NOT return None) and
    agrees exactly with the post-filter ladder and an unsharded KB."""
    import numpy as np

    def build(path, **kw):
        kb = KB(path, make_angle_embedder(), **kw)
        with kb.bulk_add_docs() as add:
            for i in range(64):
                add(f"angle:{(i * 7) % 360}", meta={"bucket": i % 8})
        return kb

    plain = build(tmp_path / "pf_plain.sqlite")
    want = plain.retrieve("angle:33", 4, where={"bucket": 3})
    plain.close()

    kb = build(tmp_path / "pf_mesh.sqlite", mesh=default_mesh())
    calls = []
    real = kb.engine.subset_topk

    def spy(corpus, vectors, ids, n, key=None):
        res = real(corpus, vectors, ids, n, key)
        calls.append(res is not None)
        return res

    kb.engine.subset_topk = spy  # type: ignore[method-assign]
    got = kb.retrieve("angle:33", 4, where={"bucket": 3})
    assert calls == [True], "mesh subset route did not engage"
    key = lambda hits: [(h["doc"]["text"], h["score"]) for h in hits]
    assert [t for t, _ in key(got)] == [t for t, _ in key(want)]
    assert [s for _, s in key(got)] == pytest.approx(
        [s for _, s in key(want)], abs=1e-6
    )
    ladder = kb.retrieve(
        "angle:33", 4, where=lambda d: d["meta"] == {"bucket": 3}
    )
    ids = lambda hits: [h["doc"]["id"] for h in hits]
    assert ids(got) == ids(ladder)
    # cached second call (device rows reused) stays correct
    again = kb.retrieve("angle:33", 4, where={"bucket": 3})
    assert ids(again) == ids(got) and calls == [True, True]
    kb.close()
