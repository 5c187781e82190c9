"""Kernel-dispatch auto-calibration: measured winners, not hardcoded
crossovers.

The v2 (keyed) vs v3 (guarded) selection kernels trade off differently
with batch size, block count, and precision; the static dispatch
constants (``GUARD_MIN_BATCH``, ``GUARD_STAGE_MIN_BLOCKS``) are point
measurements from one v5e.  On a different chip generation — or a shape
class those sweeps never visited — the static rule can leave 1.5-2x on
the table (measured: wide-corpus b=256 selection, BENCHMARKS.md
2026-08-19 crossover ladder).

This module makes the crossover *derived*: on first real-device use of
a (device kind, precision, shape-class) the engine spawns a one-time
background probe that times both kernels at the live shape on the live
corpus and persists the winner.  Until the probe lands (and on CPU
test backends, where interpret-mode timings are meaningless), the
static constants act as the prior.  Decisions are sticky per engine
instance so the prescore-error bound and the dispatch can never drift
within one engine's lifetime (``RetrievalEngine._calib_winner``).

Cache file: ``$SVS_TPU_CALIB_CACHE`` or
``~/.cache/svs_tpu/dispatch.json``; delete it to re-calibrate.  Disable
probing entirely with ``SVS_TPU_AUTOCALIB=0``.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from pathlib import Path
from typing import TYPE_CHECKING, Callable, Dict, Optional, Tuple

if TYPE_CHECKING:  # pragma: no cover - annotations only
    import jax

    from .packing import PackedCorpus

log = logging.getLogger(__name__)


def _bucket_pow2(x: int) -> int:
    """Round up to a power of two — shape-class granularity: a probe at
    n=1,015,808 should also serve n=1,000,000-ish repacks."""
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def dispatch_key(
    device_kind: str, precision: str, n_rows: int, d: int, b: int, c: int
) -> str:
    """Shape-class key: device kind + precision + bucketed rows/batch/
    candidates + exact dim (dim changes the kernel's inner loop shape
    directly).  The trailing ``m2`` versions the MEASUREMENT method
    (chained-iteration device-time isolation): entries recorded by the
    earlier fetch-based probe — whose ~30 ms RPC noise swamped the
    1-3 ms kernel deltas on tunneled links — never match and get
    re-measured."""
    return (
        f"{device_kind}|{precision}|n{_bucket_pow2(n_rows)}"
        f"|d{d}|b{_bucket_pow2(b)}|c{_bucket_pow2(c)}|m2"
    )


class DispatchCalibrator:
    """Persistent (winner per shape-class) store with single-flight
    probe claiming.  Thread-safe; loads lazily; a corrupt or unwritable
    cache file degrades to in-memory-only operation."""

    def __init__(self, path: Optional[Path] = None) -> None:
        self._lock = threading.Lock()
        self._loaded = False
        self._entries: Dict[str, Dict[str, object]] = {}
        self._probing: set = set()
        self._path = path

    def path(self) -> Optional[Path]:
        if self._path is None:
            env = os.environ.get("SVS_TPU_CALIB_CACHE")
            if env:
                self._path = Path(env)
            else:
                self._path = (
                    Path.home() / ".cache" / "svs_tpu" / "dispatch.json"
                )
        return self._path

    def _ensure_loaded(self) -> None:
        if self._loaded:
            return
        self._loaded = True
        p = self.path()
        try:
            if p is not None and p.is_file():
                data = json.loads(p.read_text())
                if isinstance(data, dict):
                    self._entries = {
                        k: v for k, v in data.items() if isinstance(v, dict)
                    }
        except Exception as exc:  # corrupt cache: recalibrate, don't crash
            log.warning("ignoring unreadable calibration cache %s (%s)",
                        p, exc)
            self._entries = {}

    def decide(self, key: str) -> Optional[str]:
        """The persisted winner ('v2'/'v3') for this shape class, or
        ``None`` when it has not been measured."""
        with self._lock:
            self._ensure_loaded()
            entry = self._entries.get(key)
            winner = entry.get("winner") if entry else None
            return winner if winner in ("v2", "v3") else None

    def claim_probe(self, key: str) -> bool:
        """Single-flight probe claim: True exactly once per un-measured
        key per process."""
        with self._lock:
            self._ensure_loaded()
            if key in self._entries or key in self._probing:
                return False
            self._probing.add(key)
            return True

    def release_probe(self, key: str) -> None:
        with self._lock:
            self._probing.discard(key)

    def record(self, key: str, winner: str, v2_s: float, v3_s: float) -> None:
        """Persist a measured winner (atomic tmp+replace; failures keep
        the in-memory entry so this process still benefits)."""
        assert winner in ("v2", "v3"), winner
        with self._lock:
            self._ensure_loaded()
            self._entries[key] = {
                "winner": winner,
                "v2_ms": round(v2_s * 1e3, 4),
                "v3_ms": round(v3_s * 1e3, 4),
            }
            self._probing.discard(key)
            snapshot = dict(self._entries)
        p = self.path()
        try:
            if p is not None:
                p.parent.mkdir(parents=True, exist_ok=True)
                tmp = p.with_suffix(".tmp")
                tmp.write_text(json.dumps(snapshot, indent=1, sort_keys=True))
                os.replace(tmp, p)
        except Exception as exc:
            log.warning("could not persist calibration cache %s (%s)", p, exc)
        log.info("dispatch calibration %s: winner=%s (v2 %.2f ms, "
                 "v3 %.2f ms)", key, winner, v2_s * 1e3, v3_s * 1e3)


_calibrator: Optional[DispatchCalibrator] = None
_calibrator_lock = threading.Lock()


def get_calibrator() -> DispatchCalibrator:
    global _calibrator
    with _calibrator_lock:
        if _calibrator is None:
            _calibrator = DispatchCalibrator()
        return _calibrator


def reset_calibrator() -> None:
    """Test hook: drop the process-wide calibrator (e.g. after changing
    ``SVS_TPU_CALIB_CACHE``)."""
    global _calibrator
    with _calibrator_lock:
        _calibrator = None


def probing_enabled() -> bool:
    """Active probing policy: off when disabled by env, off on CPU
    backends (interpret-mode timings say nothing about the TPU
    crossover).  ``SVS_TPU_AUTOCALIB=force`` probes even on CPU (tests).
    """
    mode = os.environ.get("SVS_TPU_AUTOCALIB", "1")
    if mode in ("0", "off"):
        return False
    if mode == "force":
        return True
    import jax

    return jax.default_backend() != "cpu"


#: Chained kernel iterations per timed probe run: the fetch RPC (tens
#: of ms on tunneled links — larger than the 1-6 ms kernel steps being
#: compared) amortizes over the chain and cancels between the two
#: kernels.
_PROBE_CHAIN = 8


def time_kernel_pair(
    corpus: "PackedCorpus",
    q: "jax.Array",
    n_valid_dev: "jax.Array",
    c: int,
    wide: bool,
) -> Tuple[float, float]:
    """Median-of-3 wall time (after one warmup/compile) of
    ``_PROBE_CHAIN`` dependent iterations of the v2 and v3 selection
    kernels at the live shape, on the live corpus.  The corpus rides as
    a jit ARGUMENT (a closure capture would embed it as a multi-GB
    constant in the lowered program — see bench.py)."""
    import functools as _ft
    import time as _time

    import jax as _jax
    import numpy as np

    from ..ops.pallas_extract import (
        score_topk_fused2_int8_packed,
        score_topk_fused2_packed,
        score_topk_fused3_int8_packed,
        score_topk_fused3_packed,
    )

    int8 = corpus.precision == "int8"

    def step(
        kernel_v3: bool,
        data: "jax.Array",
        scales: "Optional[jax.Array]",
        qq: "jax.Array",
        nv: "jax.Array",
    ) -> "jax.Array":
        if int8:
            fn = (
                score_topk_fused3_int8_packed
                if kernel_v3 else score_topk_fused2_int8_packed
            )
            return fn(data, scales, qq, nv, c, wide=wide)
        fn = (
            score_topk_fused3_packed if kernel_v3
            else score_topk_fused2_packed
        )
        return fn(data, qq, nv, c, wide=wide)

    @_ft.partial(_jax.jit, static_argnums=(0,))
    def chained(
        kernel_v3: bool,
        data: "jax.Array",
        scales: "Optional[jax.Array]",
        qq: "jax.Array",
        nv: "jax.Array",
    ) -> "jax.Array":
        def body(i: "jax.Array", qc: "jax.Array") -> "jax.Array":
            out = step(kernel_v3, data, scales, qc, nv)
            return qc + 0.0 * out[0, 0].astype(qc.dtype)

        qf = _jax.lax.fori_loop(0, _PROBE_CHAIN, body, qq)
        return step(kernel_v3, data, scales, qf, nv)

    def median_time(kernel_v3: bool) -> float:
        args = (corpus.data, corpus.row_scales, q, n_valid_dev)
        np.asarray(chained(kernel_v3, *args))  # warmup + compile
        times = []
        for _ in range(3):
            t0 = _time.perf_counter()
            np.asarray(chained(kernel_v3, *args))
            times.append(_time.perf_counter() - t0)
        return sorted(times)[1]

    return median_time(False), median_time(True)
