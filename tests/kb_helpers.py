"""Deterministic embedding functions for KB tests (the reference's
strategy: hand-written embedders keyed on the text make retrieval ordering
exactly predictable — ``tests/test_kb.py:1206-1219``)."""

import math
from typing import List


def make_onehot_embedder(dim: int = 16):
    """Texts of the form ``'vec:<i>'`` map to one-hot basis vector i; any
    other text maps to a fixed diagonal unit vector."""

    async def embed(texts: List[str]) -> List[List[float]]:
        out = []
        for t in texts:
            v = [0.0] * dim
            if t.startswith("vec:"):
                v[int(t.split(":")[1]) % dim] = 1.0
            else:
                s = 1.0 / math.sqrt(dim)
                v = [s] * dim
            out.append(v)
        return out

    embed.__embedding_func_params__ = {"provider": "mock"}  # storable tag
    return embed


def make_angle_embedder():
    """Texts ``'angle:<deg>'`` map to 2-D unit vectors, giving a continuous,
    exactly predictable similarity ordering."""

    async def embed(texts: List[str]) -> List[List[float]]:
        out = []
        for t in texts:
            deg = float(t.split(":")[1]) if t.startswith("angle:") else 0.0
            rad = math.radians(deg)
            out.append([math.cos(rad), math.sin(rad)])
        return out

    return embed
