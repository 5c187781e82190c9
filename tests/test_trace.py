"""Observability: phase timers and KB stats plumbing."""

import time

from svs_tpu import KB, make_mock_embeddings_func
from svs_tpu.utils.trace import QueryStats, phase


def test_query_stats_window_and_snapshot():
    stats = QueryStats(window=4)
    for i in range(10):
        stats.record("x", 0.001 * (i + 1))
    snap = stats.snapshot()["x"]
    assert snap["count"] == 10
    assert snap["last_s"] == 0.01
    assert 0.007 <= snap["p50_s"] <= 0.01  # window keeps the last 4
    stats.reset()
    assert stats.snapshot() == {}


def test_phase_records():
    stats = QueryStats()
    with phase("sleepy", stats):
        time.sleep(0.005)
    snap = stats.snapshot()["sleepy"]
    assert snap["last_s"] >= 0.004


def test_kb_exposes_phase_stats(db_path):
    kb = KB(db_path, make_mock_embeddings_func())
    with kb.bulk_add_docs() as add:
        add("a"), add("b")
    kb.retrieve("q", 1)
    snap = kb.stats()
    for expected in ("pack", "embed", "device_search", "finalize"):
        assert expected in snap, snap
        assert snap[expected]["count"] >= 1
    kb.close()
