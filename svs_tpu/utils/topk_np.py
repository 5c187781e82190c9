"""NumPy top-k selection: the CPU oracle and fallback path.

These functions define the *reference semantics* that every accelerated
path (XLA ``lax.top_k``, the Pallas streaming kernel, the sharded merge)
must reproduce — the reference's exact algorithm
(``svs/util.py:190-233``): ``np.argpartition`` selects the top-``k``
set, then ``sorted(..., reverse=True)`` over ``(score, index)`` tuples
orders it, so ties WITHIN the returned set break to the larger index.

Tie caveat (true of the reference too, by construction): when scores TIE
exactly at the k-th boundary, which of the tied entries make the cut is
whatever ``argpartition`` picked — deterministic for a given array, but
not the larger-index rule.  The score multiset is unaffected (the tied
entries are equal).  Retrieval results don't inherit this ambiguity:
the engine's rescore stage re-selects with the deterministic rule
(equal scores -> larger emb id) over an over-provisioned candidate set.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def top_k_numpy(scores: np.ndarray, k: int) -> List[Tuple[float, int]]:
    """Top ``k`` entries of a 1-D score vector as ``(score, index)`` tuples,
    sorted descending.  ``k`` is clamped to ``len(scores)``; ``k <= 0``
    returns ``[]``.  O(n + k log k) via argpartition."""
    assert scores.ndim == 1
    k = min(int(k), len(scores))
    if k <= 0:
        return []
    part = np.argpartition(scores, -k)[-k:]
    return sorted(((float(scores[i]), int(i)) for i in part), reverse=True)


def top_pairs_numpy(pairwise: np.ndarray, k: int) -> List[Tuple[float, int, int]]:
    """Top ``k`` entries of the strict upper triangle of a square pairwise
    score matrix, as ``(score, row, col)`` tuples sorted descending.

    Note: materializes the upper triangle — O(n^2) memory.  The blocked
    device kernel (:mod:`svs_tpu.ops.pairwise`) exists precisely to avoid
    this; this version is the small-n oracle it is tested against.
    """
    assert pairwise.ndim == 2 and pairwise.shape[0] == pairwise.shape[1]
    rows, cols = np.triu_indices_from(pairwise, k=1)
    vals = pairwise[rows, cols]
    return [
        (score, int(rows[i]), int(cols[i])) for score, i in top_k_numpy(vals, k)
    ]
