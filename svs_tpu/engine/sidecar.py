"""Sidecar cold-start cache: the packed corpus persisted next to the DB.

The reference pays a full BLOB rescan on every cold open (~100 s at 1M docs,
``svs/kb.py:573-618``).  Here the packed matrix (already padded, already in
its storage dtype) is written once to ``<db>.svsx`` and mmap'd straight to
the device on the next open.  Staleness is exact: the header records the
store's ``matrix_version``; any embedding mutation bumps that counter, so a
stale sidecar is silently ignored and rebuilt.

Layout (little-endian):

    8 bytes   magic ``SVSTPUSC``
    4 bytes   u32 JSON header length L
    L bytes   JSON: {format, n_valid, dim, n_padded, dim_padded,
                      precision, matrix_version}
    n_valid*8 emb_ids (int64)
    [n_padded*4 row_scales (f32) — int8 precision only]
    n_padded*dim_padded*itemsize packed matrix (row-major)

All writes go through a ``.tmp`` + ``os.replace`` so a crash never leaves a
torn sidecar.
"""

from __future__ import annotations

import json
import logging
import os
import struct
from pathlib import Path
from typing import TYPE_CHECKING, Optional, Sequence, Tuple, Union

if TYPE_CHECKING:  # avoid a runtime import cycle with .packing
    from .packing import HostPack, PackedCorpus

import numpy as np
import ml_dtypes

log = logging.getLogger(__name__)

_MAGIC = b"SVSTPUSC"
_FORMAT = 1

_NP_DTYPES = {
    "f32": np.dtype("<f4"),
    "bf16": np.dtype(ml_dtypes.bfloat16),
    "int8": np.dtype(np.int8),
}


def sidecar_path_for(db_path: Union[str, Path]) -> Path:
    return Path(f"{db_path}.svsx")


def save_sidecar(
    path: Union[str, Path],
    corpus: "PackedCorpus",
    fingerprint: Optional[Sequence[int]] = None,
    host_pack: "Optional[HostPack]" = None,
) -> None:
    """Persist a :class:`~svs_tpu.engine.packing.PackedCorpus` to ``path``.

    ``fingerprint`` is the store's full ``(matrix_version, count, max_id)``
    at pack time; staleness is checked against all three so even databases
    mutated by tools that don't bump the version counter (e.g. the
    reference implementation) can never serve a stale sidecar.
    ``host_pack`` (a ``packing.HostPack``) supplies the bytes without
    reading them back from the device.
    """
    header = {
        "format": _FORMAT,
        "n_valid": corpus.n_valid,
        "dim": corpus.dim,
        "n_padded": corpus.n_padded,
        "dim_padded": corpus.dim_padded,
        "precision": corpus.precision,
        "matrix_version": corpus.version,
        "fingerprint": list(fingerprint) if fingerprint is not None else None,
    }
    header_bytes = json.dumps(header).encode()
    if host_pack is not None:
        # The packer's host-side bytes — avoids a device->host pull of the
        # whole matrix (minutes over tunneled links).
        data_np = host_pack.data
        scales_np = host_pack.row_scales
    else:
        data_np = np.asarray(corpus.data)  # device -> host, packed dtype
        scales_np = (
            np.asarray(corpus.row_scales)
            if corpus.row_scales is not None
            else None
        )
    tmp = Path(f"{path}.tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header_bytes)))
        f.write(header_bytes)
        f.write(np.asarray(corpus.emb_ids, dtype="<i8").tobytes())
        if corpus.row_scales is not None:
            f.write(np.asarray(scales_np, dtype="<f4").tobytes())
        f.write(np.ascontiguousarray(data_np).tobytes())
    os.replace(tmp, path)
    log.info("wrote sidecar %s (%d docs, %s)", path, corpus.n_valid, corpus.precision)


def load_sidecar(
    path: Union[str, Path],
    expected_version: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, dict]]:
    """Load a sidecar as memory-mapped arrays.

    Returns ``(data, row_scales, emb_ids, header)`` or ``None`` when the
    file is missing, unreadable, or stale versus ``expected_version``.
    """
    path = Path(path)
    try:
        with open(path, "rb") as f:
            if f.read(8) != _MAGIC:
                log.warning("sidecar %s: bad magic; ignoring", path)
                return None
            (header_len,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(header_len))
            base = f.tell()
    except (OSError, ValueError, json.JSONDecodeError):
        return None
    if header.get("format") != _FORMAT:
        log.warning("sidecar %s: unsupported format; ignoring", path)
        return None
    stored = header.get("fingerprint")
    if expected_version is not None:
        expected = (
            list(expected_version)
            if isinstance(expected_version, (tuple, list))
            else [expected_version]
        )
        have = stored if stored is not None else [header["matrix_version"]]
        if have[: len(expected)] != expected:
            log.info(
                "sidecar %s is stale (has %s, store at %s); rebuilding",
                path,
                have,
                expected,
            )
            return None

    dtype = _NP_DTYPES[header["precision"]]
    n_valid = header["n_valid"]
    n_padded, dim_padded = header["n_padded"], header["dim_padded"]

    offset = base
    emb_ids = np.fromfile(path, dtype="<i8", count=n_valid, offset=offset)
    offset += n_valid * 8
    row_scales = None
    if header["precision"] == "int8":
        row_scales = np.fromfile(path, dtype="<f4", count=n_padded, offset=offset)
        offset += n_padded * 4
    expected_bytes = offset + n_padded * dim_padded * dtype.itemsize
    if path.stat().st_size < expected_bytes:
        log.warning("sidecar %s: truncated; ignoring", path)
        return None
    data = np.memmap(
        path, dtype=dtype, mode="r", offset=offset, shape=(n_padded, dim_padded)
    )
    return data, row_scales, emb_ids, header
