"""Utility tests: top-k oracle edge cases, async cache/lock semantics,
chunkify, gzip/URL resolution.  Mirrors ``tests/test_util.py`` of the
reference (boundary values, concurrency dedup, atomic downloads)."""

import asyncio
import gzip
import os
import time

import numpy as np
import pytest

from svs_tpu.utils import (
    atomic_gzip_file,
    cached,
    chunkify,
    delete_file_if_exists,
    locked,
    resolve_to_local_uncompressed_file,
    top_k_numpy,
    top_pairs_numpy,
)


# -- top_k_numpy ------------------------------------------------------------


def test_top_k_basic():
    scores = np.array([0.1, 0.9, 0.5, -0.2], dtype=np.float32)
    assert top_k_numpy(scores, 2) == [
        (pytest.approx(0.9), 1),
        (pytest.approx(0.5), 2),
    ]


def test_top_k_k_larger_than_n():
    scores = np.array([1.0, 2.0], dtype=np.float32)
    assert [i for _, i in top_k_numpy(scores, 10)] == [1, 0]


def test_top_k_zero_and_negative_k():
    scores = np.array([1.0], dtype=np.float32)
    assert top_k_numpy(scores, 0) == []
    assert top_k_numpy(scores, -3) == []


def test_top_k_empty():
    assert top_k_numpy(np.array([], dtype=np.float32), 5) == []


def test_top_k_all_negative():
    scores = np.array([-3.0, -1.0, -2.0], dtype=np.float32)
    assert [i for _, i in top_k_numpy(scores, 2)] == [1, 2]


def test_top_k_ties_break_by_larger_index():
    scores = np.array([0.5, 0.5, 0.5], dtype=np.float32)
    assert [i for _, i in top_k_numpy(scores, 2)] == [2, 1]


# -- top_pairs_numpy ----------------------------------------------------------


def test_top_pairs_upper_triangle_only():
    m = np.array(
        [
            [9.0, 0.1, 0.8],
            [0.7, 9.0, 0.3],
            [0.6, 0.2, 9.0],
        ],
        dtype=np.float32,
    )
    # diagonal (9.0) and lower triangle (0.7, 0.6, 0.2) must be ignored
    assert top_pairs_numpy(m, 2) == [
        (pytest.approx(0.8), 0, 2),
        (pytest.approx(0.3), 1, 2),
    ]


def test_top_pairs_k_exceeds_pairs():
    m = np.eye(3, dtype=np.float32)
    assert len(top_pairs_numpy(m, 100)) == 3  # only 3 strict-upper entries


# -- chunkify -----------------------------------------------------------------


def test_chunkify():
    assert chunkify([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]
    assert chunkify([], 3) == []
    with pytest.raises(ValueError):
        chunkify([1], 0)


# -- async cache / lock --------------------------------------------------------


async def test_cached_dedupes_concurrent_calls():
    calls = []

    @cached(maxsize=10)
    async def slow(x):
        calls.append(x)
        await asyncio.sleep(0.02)
        return x * 2

    results = await asyncio.gather(*(slow(7) for _ in range(5)))
    assert results == [14] * 5
    assert calls == [7]  # one real computation
    assert await slow(7) == 14
    assert calls == [7]  # cache hit


async def test_cached_lru_eviction():
    calls = []

    @cached(maxsize=2)
    async def f(x):
        calls.append(x)
        return x

    await f(1)
    await f(2)
    await f(3)  # evicts 1
    await f(1)  # recompute
    assert calls == [1, 2, 3, 1]


async def test_cached_failure_not_cached():
    attempts = []

    @cached()
    async def flaky(x):
        attempts.append(x)
        if len(attempts) == 1:
            raise RuntimeError("first call fails")
        return x

    with pytest.raises(RuntimeError):
        await flaky(1)
    assert await flaky(1) == 1
    assert len(attempts) == 2


async def test_locked_serializes():
    running = 0
    peak = 0

    @locked()
    async def critical():
        nonlocal running, peak
        running += 1
        peak = max(peak, running)
        await asyncio.sleep(0.01)
        running -= 1

    await asyncio.gather(*(critical() for _ in range(5)))
    assert peak == 1


# -- files ----------------------------------------------------------------------


def test_delete_file_if_exists(tmp_path):
    p = tmp_path / "f"
    delete_file_if_exists(p)  # missing: no error
    p.write_text("x")
    delete_file_if_exists(p)
    assert not p.exists()


async def test_resolve_local_passthrough(tmp_path):
    p = tmp_path / "db.sqlite"
    p.write_text("data")
    assert await resolve_to_local_uncompressed_file(p) == p
    assert await resolve_to_local_uncompressed_file(f"file://{p}") == p


async def test_resolve_gunzips_and_freshness(tmp_path):
    raw = tmp_path / "kb.sqlite"
    gz = tmp_path / "kb.sqlite.gz"
    with gzip.open(gz, "wb") as f:
        f.write(b"version one")
    out = await resolve_to_local_uncompressed_file(gz)
    assert out == raw
    assert raw.read_bytes() == b"version one"

    # Fresh extraction is reused (not re-extracted)...
    mtime = raw.stat().st_mtime_ns
    await resolve_to_local_uncompressed_file(gz)
    assert raw.stat().st_mtime_ns == mtime

    # ...but a newer .gz wins.
    time.sleep(0.01)
    with gzip.open(gz, "wb") as f:
        f.write(b"version two")
    os.utime(gz, (time.time() + 5, time.time() + 5))
    await resolve_to_local_uncompressed_file(gz)
    assert raw.read_bytes() == b"version two"


def test_atomic_gzip_roundtrip(tmp_path):
    src = tmp_path / "a"
    src.write_bytes(b"payload" * 100)
    dest = tmp_path / "a.gz"
    atomic_gzip_file(src, dest)
    with gzip.open(dest, "rb") as f:
        assert f.read() == b"payload" * 100
    assert not (tmp_path / "a.gz.tmp").exists()


def test_load_env(tmp_path, monkeypatch):
    from svs_tpu.utils import load_env

    envfile = tmp_path / ".env"
    envfile.write_text(
        "# comment\nexport FOO_A=hello\nFOO_B='quoted value'\nFOO_EXISTING=nope\n"
    )
    monkeypatch.delenv("FOO_A", raising=False)
    monkeypatch.delenv("FOO_B", raising=False)
    monkeypatch.setenv("FOO_EXISTING", "keep")
    assert load_env(envfile) is True
    import os

    assert os.environ["FOO_A"] == "hello"
    assert os.environ["FOO_B"] == "quoted value"
    assert os.environ["FOO_EXISTING"] == "keep"  # never overrides
    assert load_env(tmp_path / "missing.env") is False


def test_locked_and_cached_across_event_loops():
    """locked()/cached() state is module-level and this package runs
    several event loops at once (each sync KB owns one) — waiters on one
    loop must be woken from another loop's thread (the asyncio-primitive
    version deadlocked here)."""
    import threading
    import time

    from svs_tpu.utils.aio import EventLoopThread, cached, locked

    order = []

    @locked()
    async def critical(tag):
        order.append(tag)
        await asyncio.sleep(0.02)
        order.append(-tag - 1)  # pairs must nest: serialized
        return tag

    runs = [0]

    @cached()
    async def expensive(x):
        runs[0] += 1
        await asyncio.sleep(0.05)
        return x * 2

    loops = [EventLoopThread(f"xl{i}") for i in range(3)]
    try:
        results = [None] * 6

        def drive(i):
            results[i] = loops[i % 3].run(critical(i))

        ts = [threading.Thread(target=drive, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert all(not t.is_alive() for t in ts), "locked() deadlocked"
        assert sorted(results) == list(range(6))
        # serialization proof: enter/exit markers strictly alternate
        for a, b in zip(order[::2], order[1::2]):
            assert b == -a - 1, order

        res = [None] * 6

        def drive2(i):
            res[i] = loops[i % 3].run(expensive(7))

        ts = [threading.Thread(target=drive2, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert all(not t.is_alive() for t in ts), "cached() deadlocked"
        assert res == [14] * 6
        assert runs[0] <= 3  # cross-loop single-flight dedupe worked
    finally:
        for lt in loops:
            lt.stop()
