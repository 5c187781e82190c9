"""Persistent XLA compilation cache (process-wide, one-time setup).

A cold server at 1M x 1536 pays 5-20 s of jit compilation per (kernel,
batch-shape) first use — ~9 shapes for the serve micro-batcher's bucket
ladder, several minutes per restart on a tunneled device.  XLA's
persistent compilation cache makes every later process hit disk instead
of recompiling (observed: a warm ladder drops from minutes to seconds).

Enabled lazily by the first :class:`RetrievalEngine` construction.
``SVS_TPU_COMPILE_CACHE`` overrides the location (default
``~/.cache/svs_tpu/xla``); ``0``/``off`` disables.
"""

from __future__ import annotations

import logging
import os
import threading
from pathlib import Path

log = logging.getLogger(__name__)

_lock = threading.Lock()
_done = False


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at a local directory
    (idempotent; safe to call from every engine construction)."""
    global _done
    with _lock:
        if _done:
            return
        _done = True
        raw = os.environ.get("SVS_TPU_COMPILE_CACHE", "")
        if raw in ("0", "off"):
            return
        path = Path(raw) if raw else (
            Path.home() / ".cache" / "svs_tpu" / "xla"
        )
        try:
            import jax

            existing = getattr(
                jax.config, "jax_compilation_cache_dir", None
            )
            if existing and not raw:
                # The user already configured a cache directory (env
                # JAX_COMPILATION_CACHE_DIR or jax.config before import)
                # — respect it like SVS_TPU_COMPILE_CACHE=off instead of
                # silently clobbering their location/policy.  An
                # EXPLICIT SVS_TPU_COMPILE_CACHE path still wins: that
                # is this knob's documented contract.
                log.debug(
                    "XLA compilation cache already configured at %s; "
                    "leaving it alone", existing,
                )
                return
            if not raw and jax.default_backend() == "cpu":
                # XLA:CPU AOT cache entries embed compile-machine
                # feature sets that the loader cross-checks against the
                # host (mismatches log SIGILL warnings and can crash);
                # CPU compiles are fast anyway.  An explicit env path
                # opts in.
                return
            path.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(path))
            # cache everything that took meaningful compile time; the
            # default 1 s floor would skip many of the mid-size kernels
            # whose aggregate dominates warmup
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.2
            )
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            log.info("XLA compilation cache at %s", path)
        except Exception as exc:  # never fail engine startup over a cache
            log.debug("compilation cache unavailable (%s)", exc)
