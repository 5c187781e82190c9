"""ctypes loader for the native fastpack library, with NumPy fallbacks.

The shared object is compiled lazily on first use (``g++ -O3 -shared``)
and cached next to the source; environments without a toolchain silently
fall back to the NumPy implementations, so the native layer accelerates
but never gates.  Disable entirely with ``SVS_TPU_NO_NATIVE=1``.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Any, List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SRC = _HERE / "fastpack.cpp"
_SO = _HERE / "_fastpack.so"
_ABI = 4

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_failed = False

_N_THREADS = min(16, os.cpu_count() or 1)


def _build() -> Optional[ctypes.CDLL]:
    base = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", str(_SO), str(_SRC),
    ]
    # -march=native first: the int8 prescore scan vectorizes ~4x wider
    # with AVX2 maddubs/pmaddwd-class code, and the artifact is built
    # lazily ON this host so native tuning is safe; fall back to the
    # portable build if the flag is unsupported.
    for flags, tag in (
        (["-march=native"], None),  # None -> this host's fingerprint
        ([], "portable"),  # ISA-independent: valid on ANY host
    ):
        try:
            subprocess.run(
                base + flags, check=True, capture_output=True, timeout=120
            )
            try:
                _HOST_TAG.write_text(tag or _host_fingerprint())
            except OSError:
                pass  # unwritable dir: the legacy "" tag is accepted
            return ctypes.CDLL(str(_SO))
        except (OSError, subprocess.SubprocessError) as exc:
            last = exc
    log.info("fastpack native build unavailable (%s); using NumPy paths", last)
    return None


_HOST_TAG = _SO.with_suffix(".so.host")


def _host_fingerprint() -> str:
    """ISA fingerprint of THIS host.  The .so is compiled with
    -march=native, so a cached artifact is only valid on hosts with the
    same instruction-set features — a package directory on a shared
    filesystem (NFS home across heterogeneous nodes) would otherwise
    serve an AVX-512 binary to an AVX2 host and SIGILL on first use."""
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats += "|" + " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:16]


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if os.environ.get("SVS_TPU_NO_NATIVE") == "1" or _build_failed:
        return None
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        lib = None
        untagged_fallback = False
        if _SO.exists():
            try:
                cached_host = _HOST_TAG.read_text().strip()
            except OSError:
                cached_host = ""
            # "portable" = ISA-independent fallback build: valid on any
            # host.  This host's fingerprint: valid here.  Anything else
            # — a DIFFERENT host's fingerprint, or no tag at all (legacy
            # -march=native builds predate the tag; a failed tag write
            # leaves none) — prefers a fresh rebuild: the artifact may
            # carry another machine's vector ISA and SIGILL on first
            # use.  If rebuilding is impossible (no toolchain, read-only
            # package dir — the prebaked-deployment case), the untagged
            # artifact is loaded with a warning rather than silently
            # dropping native entirely.
            if cached_host == "portable" or (
                cached_host == _host_fingerprint()
            ):
                try:
                    lib = ctypes.CDLL(str(_SO))
                except OSError:
                    lib = None
            else:
                log.info(
                    "fastpack artifact has no/foreign host ISA tag; "
                    "rebuilding"
                )
                untagged_fallback = cached_host == ""
        if lib is None:
            lib = _build()
            if lib is None and untagged_fallback and _SO.exists():
                log.warning(
                    "fastpack: no toolchain to rebuild; loading the "
                    "untagged cached artifact — if this package dir is "
                    "shared across hosts with different vector ISAs, "
                    "set SVS_TPU_NO_NATIVE=1 instead"
                )
                try:
                    lib = ctypes.CDLL(str(_SO))
                except OSError:
                    lib = None

        def abi_of(candidate: "ctypes.CDLL") -> int:
            # a cached .so predating the ABI symbol raises AttributeError
            # — exactly the stale-artifact case the check exists for;
            # treat it as version 0 so the rebuild path runs
            try:
                return int(candidate.fastpack_abi_version())
            except AttributeError:
                return 0

        if lib is None or abi_of(lib) != _ABI:
            if lib is not None:
                log.warning("fastpack ABI mismatch; rebuilding")
                try:
                    _SO.unlink()
                except OSError:
                    pass
                lib = _build()
        if lib is None:
            _build_failed = True
            return None
        _configure(lib)
        _lib = lib
        return _lib


def _configure(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.fastpack_f32_to_bf16.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_uint16), c.c_size_t, c.c_int
    ]
    lib.fastpack_quantize_int8.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_int8), c.POINTER(c.c_float),
        c.c_size_t, c.c_size_t, c.c_int,
    ]
    lib.fastpack_normalize_rows.argtypes = [
        c.POINTER(c.c_float), c.c_size_t, c.c_size_t, c.c_int
    ]
    lib.fastpack_topk_f32.argtypes = [
        c.POINTER(c.c_float), c.c_size_t, c.c_int,
        c.POINTER(c.c_float), c.POINTER(c.c_int32),
    ]
    lib.fastpack_scan_embeddings.argtypes = [
        c.c_char_p, c.c_longlong, c.c_longlong, c.c_longlong,
        c.POINTER(c.c_longlong), c.POINTER(c.c_ubyte),
    ]
    lib.fastpack_scan_embeddings.restype = c.c_longlong
    lib.fastpack_scan_embeddings_range.argtypes = [
        c.c_char_p, c.c_longlong, c.c_longlong, c.c_longlong, c.c_longlong,
        c.POINTER(c.c_longlong), c.POINTER(c.c_ubyte),
    ]
    lib.fastpack_scan_embeddings_range.restype = c.c_longlong
    lib.fastpack_permute_cast_bf16.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_int64), c.POINTER(c.c_uint16),
        c.c_size_t, c.c_size_t, c.c_size_t, c.c_int,
    ]
    lib.fastpack_permute_cast_f32.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_int64), c.POINTER(c.c_float),
        c.c_size_t, c.c_size_t, c.c_size_t, c.c_int,
    ]
    lib.fastpack_permute_cast_int8.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_int64), c.POINTER(c.c_int8),
        c.POINTER(c.c_float), c.c_size_t, c.c_size_t, c.c_size_t, c.c_int,
    ]
    lib.fastpack_int8_topc.argtypes = [
        c.POINTER(c.c_int8), c.POINTER(c.c_float), c.POINTER(c.c_int32),
        c.c_size_t, c.c_size_t,
        c.POINTER(c.c_int8), c.POINTER(c.c_float),
        c.c_size_t, c.c_int,
        c.POINTER(c.c_float), c.POINTER(c.c_int32), c.c_int,
    ]


def native_available() -> bool:
    return _get_lib() is not None


def _fptr(arr: np.ndarray, ctype: "Any") -> "Any":
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def f32_to_bf16(matrix: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 -> bf16 (multithreaded when native)."""
    import ml_dtypes

    matrix = np.ascontiguousarray(matrix, dtype=np.float32)
    lib = _get_lib()
    if lib is None:
        return matrix.astype(ml_dtypes.bfloat16)
    out = np.empty(matrix.shape, dtype=np.uint16)
    lib.fastpack_f32_to_bf16(
        _fptr(matrix, ctypes.c_float), _fptr(out, ctypes.c_uint16),
        matrix.size, _N_THREADS,
    )
    return out.view(ml_dtypes.bfloat16)


def quantize_int8(matrix: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization on the host."""
    matrix = np.ascontiguousarray(matrix, dtype=np.float32)
    rows, cols = matrix.shape
    lib = _get_lib()
    if lib is None:
        absmax = np.abs(matrix).max(axis=1)
        scales = np.maximum(absmax, 1e-30) / 127.0
        q = np.clip(np.rint(matrix / scales[:, None]), -127, 127).astype(np.int8)
        return q, scales.astype(np.float32)
    q = np.empty((rows, cols), dtype=np.int8)
    scales = np.empty((rows,), dtype=np.float32)
    lib.fastpack_quantize_int8(
        _fptr(matrix, ctypes.c_float), _fptr(q, ctypes.c_int8),
        _fptr(scales, ctypes.c_float), rows, cols, _N_THREADS,
    )
    return q, scales


def int8_topc_prescore(
    docs_i8: np.ndarray,
    row_scales: np.ndarray,
    row_sums: Optional[np.ndarray],
    queries_i8: np.ndarray,
    q_scales: np.ndarray,
    c: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Host int8 prescore + top-``c`` candidate selection per query —
    first pass of the host two-pass search (``RetrievalEngine.
    host_topk_exact``).  ``row_sums`` (int32 per-row sums of the int8
    matrix, precomputed once per corpus) feeds the VNNI bias trick — see
    ``fastpack.cpp``.  Returns ``(vals f32 [b, c'], idx int32 [b, c'])``
    with ``c' = min(c, rows)``, rows in descending reconstruction-score
    order (ties to the larger row index); ``None`` when the native
    library is unavailable (callers run the full f32 scan instead — a
    NumPy int8 matmul is slower than BLAS f32, so there is no useful
    Python fallback for this one)."""
    lib = _get_lib()
    if lib is None:
        return None
    docs_i8 = np.ascontiguousarray(docs_i8, dtype=np.int8)
    queries_i8 = np.atleast_2d(np.ascontiguousarray(queries_i8, np.int8))
    row_scales = np.ascontiguousarray(row_scales, dtype=np.float32)
    q_scales = np.ascontiguousarray(q_scales, dtype=np.float32)
    rows, cols = docs_i8.shape
    b = queries_i8.shape[0]
    assert queries_i8.shape[1] == cols and q_scales.shape == (b,)
    sums_ptr = None
    if row_sums is not None:
        row_sums = np.ascontiguousarray(row_sums, dtype=np.int32)
        assert row_sums.shape == (rows,)
        sums_ptr = _fptr(row_sums, ctypes.c_int32)
    c_eff = min(int(c), rows)
    vals = np.empty((b, c_eff), dtype=np.float32)
    idx = np.empty((b, c_eff), dtype=np.int32)
    lib.fastpack_int8_topc(
        _fptr(docs_i8, ctypes.c_int8), _fptr(row_scales, ctypes.c_float),
        sums_ptr,
        rows, cols,
        _fptr(queries_i8, ctypes.c_int8), _fptr(q_scales, ctypes.c_float),
        b, c_eff,
        _fptr(vals, ctypes.c_float), _fptr(idx, ctypes.c_int32),
        _N_THREADS,
    )
    return vals, idx


def normalize_rows(matrix: np.ndarray) -> np.ndarray:
    """L2-normalize rows in a copy of ``matrix``."""
    matrix = np.array(matrix, dtype=np.float32, copy=True, order="C")
    lib = _get_lib()
    if lib is None:
        norms = np.linalg.norm(matrix, axis=1, keepdims=True)
        np.divide(matrix, norms, out=matrix, where=norms > 1e-15)
        return matrix
    lib.fastpack_normalize_rows(
        _fptr(matrix, ctypes.c_float), matrix.shape[0], matrix.shape[1],
        _N_THREADS,
    )
    return matrix


def scan_embeddings(
    path: str, after_id: int, n: int, dim: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Scan committed embedding rows with id > ``after_id`` straight into
    NumPy buffers via the SQLite C API — no Python objects per row (the
    cold-start bottleneck; see ``fastpack.cpp``).  Returns ``(matrix
    [n, dim] f32, ids [n] int64)`` or ``None`` when the native library or
    libsqlite3 is unavailable or the scan didn't see exactly ``n`` rows
    (caller falls back to the Python streaming scan)."""
    lib = _get_lib()
    if lib is None or n <= 0 or dim <= 0:
        return None
    ids = np.empty((n,), dtype=np.int64)
    matrix = np.empty((n, dim), dtype=np.float32)
    got = lib.fastpack_scan_embeddings(
        str(path).encode(), after_id, n, dim * 4,
        _fptr(ids, ctypes.c_longlong), _fptr(matrix, ctypes.c_ubyte),
    )
    if got != n:
        log.debug("native embedding scan declined (rc=%d, want %d)", got, n)
        return None
    return matrix, ids


def scan_embeddings_parallel(
    path: str, ranges: "List[Tuple[int, int, int]]", n: int, dim: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Parallel variant of :func:`scan_embeddings`: each ``(after_id,
    upto_id, count)`` range is scanned on its own thread with its own
    read-only SQLite connection (disjoint btree walks parallelize the
    overflow-chain traversal that dominates the single-threaded scan).
    ``ranges`` must partition the id space in ascending order with counts
    summing to ``n``."""
    lib = _get_lib()
    if lib is None or n <= 0 or dim <= 0:
        return None
    assert sum(cnt for _, _, cnt in ranges) == n
    ids = np.empty((n,), dtype=np.int64)
    matrix = np.empty((n, dim), dtype=np.float32)
    path_b = str(path).encode()
    results: List[int] = [0] * len(ranges)

    def scan_one(i: int, after: int, upto: int, off: int, cnt: int) -> None:
        # row-sliced views are contiguous; ctypes releases the GIL
        results[i] = lib.fastpack_scan_embeddings_range(
            path_b, after, upto, cnt, dim * 4,
            _fptr(ids[off : off + cnt], ctypes.c_longlong),
            _fptr(matrix[off : off + cnt], ctypes.c_ubyte),
        )

    import concurrent.futures as cf

    off = 0
    jobs = []
    with cf.ThreadPoolExecutor(max_workers=len(ranges)) as pool:
        for i, (after, upto, cnt) in enumerate(ranges):
            if cnt:
                jobs.append(pool.submit(scan_one, i, after, upto, off, cnt))
            off += cnt
        for j in jobs:
            j.result()
    for i, (_, _, cnt) in enumerate(ranges):
        if cnt and results[i] != cnt:
            log.debug(
                "parallel embedding scan declined (range %d rc=%d want %d)",
                i, results[i], cnt,
            )
            return None
    return matrix, ids


def permute_cast_pack(
    matrix: np.ndarray,
    perm: np.ndarray,
    precision: str,
    n_pad: int,
    d_pad: int,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Fused permute + pad + cast into the packed host layout, one
    multithreaded pass (the separate gather/pad/cast passes measured 84 s
    at 1M x 1536 on slow-memory hosts).  Returns ``(data [n_pad, d_pad],
    scales [n_pad] | None)`` or ``None`` when the native library is
    unavailable.  Padding rows/cols are zero (int8 padding scales match
    the reference quantizer's zero-row value)."""
    lib = _get_lib()
    if lib is None:
        return None
    matrix = np.ascontiguousarray(matrix, dtype=np.float32)
    n, d = matrix.shape
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    assert perm.shape == (n,)
    if precision == "bf16":
        import ml_dtypes

        out = np.zeros((n_pad, d_pad), dtype=np.uint16)
        lib.fastpack_permute_cast_bf16(
            _fptr(matrix, ctypes.c_float), _fptr(perm, ctypes.c_int64),
            _fptr(out, ctypes.c_uint16), n, d, d_pad, _N_THREADS,
        )
        return out.view(ml_dtypes.bfloat16), None
    if precision == "f32":
        out = np.zeros((n_pad, d_pad), dtype=np.float32)
        lib.fastpack_permute_cast_f32(
            _fptr(matrix, ctypes.c_float), _fptr(perm, ctypes.c_int64),
            _fptr(out, ctypes.c_float), n, d, d_pad, _N_THREADS,
        )
        return out, None
    if precision == "int8":
        out = np.zeros((n_pad, d_pad), dtype=np.int8)
        # zero rows quantize with scale 1e-30/127 — same as quantize_int8
        scales = np.full(
            (n_pad,), np.float32(1e-30) / np.float32(127.0), dtype=np.float32
        )
        lib.fastpack_permute_cast_int8(
            _fptr(matrix, ctypes.c_float), _fptr(perm, ctypes.c_int64),
            _fptr(out, ctypes.c_int8), _fptr(scales, ctypes.c_float),
            n, d, d_pad, _N_THREADS,
        )
        return out, scales
    raise ValueError(f"unknown precision: {precision!r}")


def topk_f32(scores: np.ndarray, k: int) -> List[Tuple[float, int]]:
    """Exact top-k over a score vector — native CPU fallback mirroring the
    device kernel and the Python oracle's tie semantics."""
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    kk = min(int(k), scores.size)
    if kk <= 0:
        return []
    lib = _get_lib()
    if lib is None:
        from ..utils.topk_np import top_k_numpy

        return top_k_numpy(scores, kk)
    vals = np.empty((kk,), dtype=np.float32)
    idx = np.empty((kk,), dtype=np.int32)
    lib.fastpack_topk_f32(
        _fptr(scores, ctypes.c_float), scores.size, kk,
        _fptr(vals, ctypes.c_float), _fptr(idx, ctypes.c_int32),
    )
    return [(float(v), int(i)) for v, i in zip(vals, idx)]
