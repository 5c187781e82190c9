"""``.env`` convenience for examples and scripts.

The reference's examples call ``dotenv.load_dotenv()`` for API keys
(``/root/reference/examples/quickstart.py:4``); this gives the same UX
without a hard dependency: use ``python-dotenv`` when installed, else a
minimal built-in parser (KEY=VALUE lines, ``#`` comments, optional quotes;
never overrides variables already set in the environment).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union


def load_env(path: Union[str, Path] = ".env") -> bool:
    """Load ``path`` into ``os.environ``; returns True if a file was read."""
    try:
        from dotenv import load_dotenv  # type: ignore[import-not-found]

        return bool(load_dotenv(path))
    except ImportError:
        pass
    p = Path(path)
    if not p.is_file():
        return False
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key = key.strip()
        if key.startswith("export "):
            key = key[len("export "):].strip()
        val = val.strip().strip("'\"")
        if key and key not in os.environ:
            os.environ[key] = val
    return True
