"""Kernel-dispatch auto-calibration: measured winners override the
static one-v5e priors (GUARD_MIN_BATCH), with persistence and sound
sticky behavior."""

import json

import numpy as np
import pytest

from svs_tpu.engine.calibrate import (
    DispatchCalibrator,
    dispatch_key,
    get_calibrator,
    reset_calibrator,
)


@pytest.fixture
def calib_cache(tmp_path, monkeypatch):
    """Point the process-wide calibrator at a throwaway cache file."""
    path = tmp_path / "dispatch.json"
    monkeypatch.setenv("SVS_TPU_CALIB_CACHE", str(path))
    reset_calibrator()
    yield path
    reset_calibrator()


def test_calibrator_roundtrip_and_persistence(calib_cache):
    cal = DispatchCalibrator(calib_cache)
    key = dispatch_key("TPU_v5e", "bf16", 1_015_808, 1536, 256, 400)
    assert cal.decide(key) is None
    assert cal.claim_probe(key)
    assert not cal.claim_probe(key)  # single flight
    cal.record(key, "v2", 0.004, 0.006)
    assert cal.decide(key) == "v2"
    # a fresh instance reads the persisted file
    cal2 = DispatchCalibrator(calib_cache)
    assert cal2.decide(key) == "v2"
    data = json.loads(calib_cache.read_text())
    assert data[key]["winner"] == "v2"
    # a measured key is never re-claimed
    assert not cal2.claim_probe(key)


def test_calibrator_corrupt_cache_degrades(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text("{not json")
    cal = DispatchCalibrator(path)
    assert cal.decide("anything") is None
    cal.record("k", "v3", 0.001, 0.0005)
    assert cal.decide("k") == "v3"


def test_shape_class_bucketing():
    # nearby sizes share a shape class; precision/d/b split them
    a = dispatch_key("v5e", "int8", 1_000_000, 1536, 256, 400)
    b = dispatch_key("v5e", "int8", 1_015_808, 1536, 200, 512)
    assert a == b
    assert a != dispatch_key("v5e", "bf16", 1_000_000, 1536, 256, 400)
    assert a != dispatch_key("v5e", "int8", 1_000_000, 768, 256, 400)
    assert a != dispatch_key("v4", "int8", 1_000_000, 1536, 256, 400)


def _fake_corpus(precision="bf16"):
    """A PackedCorpus with shape metadata that structurally supports
    BOTH v2 and v3 (block-aligned, nb=16) — the dispatch predicates
    only read shapes, so the data can be zeros (a real corpus at this
    size would make the test build 131k docs)."""
    import jax.numpy as jnp

    from svs_tpu.engine.packing import PackedCorpus
    from svs_tpu.ops.pallas_extract import (
        FUSED_BLOCK_N,
        fused2_supported,
        fused3_shape_ok,
    )

    n_pad = 16 * FUSED_BLOCK_N
    n_valid = n_pad - 100
    data = jnp.zeros((n_pad, 128), jnp.bfloat16)
    corpus = PackedCorpus(
        data=data,
        row_scales=None,
        emb_ids=np.arange(1, n_valid + 1, dtype=np.int64),
        n_valid=n_valid,
        dim=128,
        version=1,
        precision=precision,
    )
    # sanity: the shapes used below are inside the calibratable region
    assert fused3_shape_ok(n_pad, corpus.dim_padded, 32, 288)
    assert fused2_supported(n_pad, corpus.dim_padded, 32, 288)
    return corpus


def _device_kind():
    import jax

    return str(jax.devices()[0].device_kind).replace(" ", "_")


def test_calibration_overrides_wrong_prior(calib_cache):
    """Seeded measurements flip the dispatch BOTH ways relative to the
    static prior: demote v3 at a batch the prior gives to v3, and
    promote v3 below GUARD_MIN_BATCH."""
    from svs_tpu.engine.index import RetrievalEngine
    from svs_tpu.ops.pallas_extract import GUARD_MIN_BATCH

    corpus = _fake_corpus()
    eng = RetrievalEngine(precision="bf16")
    n_rows, d = corpus.n_padded, corpus.dim_padded

    b_hi, b_lo = GUARD_MIN_BATCH * 2, GUARD_MIN_BATCH // 2
    c = eng.candidate_count(64)
    # prior behavior first (no calibration entries): v3 at b_hi,
    # v2 below the floor
    assert eng._guarded_selection_possible(corpus, b_hi, c)
    assert not eng._guarded_selection_possible(corpus, b_lo, c)

    # measured winners say the opposite
    cal = get_calibrator()
    kind = _device_kind()
    cal.record(
        dispatch_key(kind, corpus.precision, n_rows, d, b_hi, c),
        "v2", 0.001, 0.002,
    )
    cal.record(
        dispatch_key(kind, corpus.precision, n_rows, d, b_lo, c),
        "v3", 0.002, 0.001,
    )

    # a FRESH engine (sticky map empty) follows the measurements
    eng2 = RetrievalEngine(precision="bf16")
    assert not eng2._guarded_selection_possible(corpus, b_hi, c)
    assert eng2._guarded_selection_possible(corpus, b_lo, c)


def test_sticky_decisions_survive_late_calibration(calib_cache):
    """A decision made under the prior must NOT flip mid-engine when a
    probe lands later (prescore_eps/dispatch coherence)."""
    from svs_tpu.engine.index import RetrievalEngine
    from svs_tpu.ops.pallas_extract import GUARD_MIN_BATCH

    corpus = _fake_corpus()
    eng = RetrievalEngine(precision="bf16")
    b = GUARD_MIN_BATCH * 2
    c = eng.candidate_count(64)
    assert eng._guarded_selection_possible(corpus, b, c)  # prior: v3
    get_calibrator().record(
        dispatch_key(
            _device_kind(), corpus.precision, corpus.n_padded,
            corpus.dim_padded, b, c,
        ),
        "v2", 0.001, 0.002,
    )
    # same engine: sticky v3 stands
    assert eng._guarded_selection_possible(corpus, b, c)


def test_probe_records_winner(calib_cache, monkeypatch):
    """With probing forced on (CPU backends are off by default) and the
    timing function stubbed, the background probe persists the faster
    kernel."""
    import time

    from svs_tpu.engine.index import RetrievalEngine

    corpus = _fake_corpus()
    monkeypatch.setenv("SVS_TPU_AUTOCALIB", "force")
    monkeypatch.setattr(
        "svs_tpu.engine.calibrate.time_kernel_pair",
        lambda corpus, q, nvd, c, wide: (0.007, 0.003),
    )
    eng = RetrievalEngine(precision="bf16")
    b = 32
    c = eng.candidate_count(64)
    eng._guarded_selection_possible(corpus, b, c)  # spawns the probe

    key = dispatch_key(
        _device_kind(), corpus.precision, corpus.n_padded,
        corpus.dim_padded, b, c,
    )
    deadline = time.time() + 10
    while time.time() < deadline:
        if get_calibrator().decide(key) is not None:
            break
        time.sleep(0.05)
    assert get_calibrator().decide(key) == "v3"  # 3 ms < 7 ms


def test_probing_disabled_on_cpu_by_default(calib_cache, monkeypatch):
    from svs_tpu.engine.calibrate import probing_enabled

    monkeypatch.delenv("SVS_TPU_AUTOCALIB", raising=False)
    assert not probing_enabled()  # CPU test backend
    monkeypatch.setenv("SVS_TPU_AUTOCALIB", "0")
    assert not probing_enabled()
    monkeypatch.setenv("SVS_TPU_AUTOCALIB", "force")
    assert probing_enabled()
