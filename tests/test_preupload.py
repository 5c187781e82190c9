"""Pre-upload query answering: a deferred pack publishes immediately
with host arrays, queries answer exactly from the host f32 cache while
the device upload runs in the background, and the device copies swap in
when the upload lands.  Cold first query is bounded by the host scan,
not the multi-GB device transfer (the reference's floor is its scan,
``svs/kb.py:573-618`` — this keeps ours at or under that floor always).
"""

import threading

import numpy as np
import pytest

from svs_tpu import KB
from tests.kb_helpers import make_angle_embedder


@pytest.fixture
def gated_upload(monkeypatch):
    """Force tiny packs onto the deferred path and hold the background
    upload at a gate the test controls."""
    import svs_tpu.engine.packing as packing

    monkeypatch.setattr(packing, "DEFER_MIN_BYTES", 0)
    gate = threading.Event()
    real = packing.staged_device_put

    def gated(host, device, chunk_bytes=None, throttle=None):
        assert gate.wait(timeout=30), "test forgot to release the gate"
        return real(host, device, chunk_bytes=chunk_bytes, throttle=throttle)

    monkeypatch.setattr(packing, "staged_device_put", gated)
    return gate


def _build(db_path, n=40):
    kb = KB(db_path, make_angle_embedder(), force_fresh_db=True)
    with kb.bulk_add_docs() as add:
        for i in range(n):
            add(f"angle:{(i * 11) % 360}")
    return kb


def test_queries_answer_during_upload_then_device_takes_over(
    db_path, gated_upload
):
    kb = _build(db_path)
    try:
        kb.engine.host_dispatch = "auto"
        # first retrieve triggers the deferred pack: upload is gated,
        # so this answer MUST come from the host path
        hits_cold = kb.retrieve("angle:33", 6)
        assert len(hits_cold) == 6
        corpus = kb.engine.corpus
        assert corpus is not None
        assert not corpus.device_ready
        assert isinstance(corpus.data, np.ndarray)
        assert kb.engine.pack_uploading
        assert kb.stats()["host_search"]["count"] >= 1

        gated_upload.set()
        assert kb.engine.wait_for_mirror(timeout=60)
        assert corpus.device_ready
        import jax

        assert isinstance(corpus.data, jax.Array)

        # device path now; results identical
        kb.engine._rpc_floor = 0.0  # force the dispatch rule to device
        hits_warm = kb.retrieve("angle:33", 6)
        assert [h["doc"]["id"] for h in hits_warm] == [
            h["doc"]["id"] for h in hits_cold
        ]
        np.testing.assert_allclose(
            [h["score"] for h in hits_warm],
            [h["score"] for h in hits_cold],
            atol=1e-6,
        )
    finally:
        gated_upload.set()
        kb.close()


def test_batch_queries_answer_during_upload(db_path, gated_upload):
    """The pre-upload host route takes ANY batch size (slabbed scan)."""
    kb = _build(db_path)
    try:
        kb.engine.host_dispatch = "auto"
        queries = [f"angle:{a}" for a in (0, 45, 90, 135, 180, 225)]
        res = kb.retrieve_batch(queries, 4)
        assert len(res) == 6 and all(len(r) == 4 for r in res)
        assert not kb.engine.corpus.device_ready
        # oracle check for one query: nearest angles to 90
        top = [h["doc"]["text"] for h in res[2]]
        assert top[0] == "angle:88"  # 8*11=88 is the closest stored angle
    finally:
        gated_upload.set()
        kb.close()


def test_wait_device_blocks_device_paths_until_upload(db_path, gated_upload):
    """A path that NEEDS the device (host dispatch off) blocks on the
    gate instead of touching host arrays, then proceeds."""
    kb = _build(db_path)
    try:
        kb.engine.host_dispatch = "off"
        results = {}

        def query():
            results["hits"] = kb.retrieve("angle:100", 3)

        t = threading.Thread(target=query)
        t.start()
        t.join(timeout=1.0)
        assert t.is_alive(), "device path ran before the upload landed"
        gated_upload.set()
        t.join(timeout=60)
        assert not t.is_alive()
        assert len(results["hits"]) == 3
    finally:
        gated_upload.set()
        kb.close()


def test_sidecar_cold_start_answers_during_upload(
    tmp_path, gated_upload
):
    """The sidecar cold-start path defers its upload too: a publish-time
    sidecar carries the exact f32 cache, so a reopened KB answers from
    it while the pack crosses the link in the background."""
    path = tmp_path / "side.sqlite"
    kb = KB(path, make_angle_embedder(), force_fresh_db=True, sidecar=True)
    gated_upload.set()  # the build/publish phase may upload freely
    with kb.bulk_add_docs() as add:
        for i in range(40):
            add(f"angle:{(i * 11) % 360}")
    baseline = kb.retrieve("angle:33", 6)
    kb.close()  # writes the .svsx sidecar next to the db
    assert any(p.suffix == ".svsx" for p in tmp_path.iterdir())

    gated_upload.clear()  # now hold the reopen's upload
    kb2 = KB(path, make_angle_embedder(), sidecar=True)
    try:
        kb2.engine.host_dispatch = "auto"
        hits = kb2.retrieve("angle:33", 6)
        corpus = kb2.engine.corpus
        assert corpus is not None and not corpus.device_ready
        assert kb2.engine.pack_events["sidecar"] == 1
        assert [h["doc"]["id"] for h in hits] == [
            h["doc"]["id"] for h in baseline
        ]
        gated_upload.set()
        assert kb2.engine.wait_for_mirror(timeout=60)
        assert corpus.device_ready
    finally:
        gated_upload.set()
        kb2.close()


def test_upload_failure_degrades_not_deadlocks(db_path, monkeypatch, caplog):
    """A permanently failing upload publishes the host arrays (implicit
    per-call device transfer — correct, slow, logged) so waiters never
    hang."""
    import logging

    import svs_tpu.engine.index as index_mod
    import svs_tpu.engine.packing as packing

    monkeypatch.setattr(packing, "DEFER_MIN_BYTES", 0)

    def boom(host, device, chunk_bytes=None, throttle=None):
        raise RuntimeError("link down")

    monkeypatch.setattr(packing, "staged_device_put", boom)
    monkeypatch.setattr(index_mod.time, "sleep", lambda s: None)

    kb = _build(db_path)
    try:
        kb.engine.host_dispatch = "off"  # force the device-path wait
        with caplog.at_level(logging.WARNING, logger="svs_tpu.engine.index"):
            hits = kb.retrieve("angle:11", 3)
        assert len(hits) == 3
        assert kb.engine.wait_for_mirror(timeout=30)
        corpus = kb.engine.corpus
        assert corpus.device_ready  # released, host arrays in place
        assert any("failed permanently" in r.message for r in caplog.records)
    finally:
        kb.close()
