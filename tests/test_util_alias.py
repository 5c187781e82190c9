"""``svs_tpu.util`` — drop-in alias for the reference's ``svs.util``
(ref: ``src/svs/util.py``): direct imports of its helpers must survive
a package swap, and the selection functions must return bit-identical
results (same tie behavior) as the reference implementation."""

import asyncio
import sys

import numpy as np
import pytest

REF = "/root/reference/src"


def test_alias_surface():
    from svs_tpu.util import (  # noqa: F401
        cached,
        chunkify,
        delete_file_if_exists,
        file_cached_wget,
        get_top_k,
        get_top_pairs,
        locked,
        resolve_to_local_uncompressed_file,
    )


def _ref_util():
    sys.path.insert(0, REF)
    try:
        import svs.util as ref_util
    except ImportError:
        pytest.skip("reference implementation not available")
    finally:
        sys.path.remove(REF)
    return ref_util


def test_get_top_k_matches_reference_bitwise():
    ref = _ref_util()
    from svs_tpu.util import get_top_k

    rng = np.random.default_rng(7)
    for n, k in [(100, 10), (50, 50), (10, 99), (1000, 1)]:
        scores = rng.standard_normal(n).astype(np.float32)
        # plant exact ties including at the boundary
        scores[::7] = scores[0]
        assert get_top_k(scores, k) == ref.get_top_k(scores, k)
    assert get_top_k(np.zeros(5, np.float32), 0) == []


def test_get_top_pairs_matches_reference_bitwise():
    ref = _ref_util()
    from svs_tpu.util import get_top_pairs

    rng = np.random.default_rng(11)
    m = rng.standard_normal((40, 40)).astype(np.float32)
    m[3, 9] = m[5, 21] = m[0, 1]  # planted ties
    for k in (1, 10, 2000):
        assert get_top_pairs(m, k) == ref.get_top_pairs(m, k)


def test_locked_honors_caller_lock():
    """Reference semantics: two functions sharing one explicit lock are
    mutually exclusive."""
    from svs_tpu.util import locked

    async def main():
        lock = asyncio.Lock()
        order = []

        @locked(lock)
        async def a():
            order.append("a0")
            await asyncio.sleep(0.02)
            order.append("a1")

        @locked(lock)
        async def b():
            order.append("b0")
            await asyncio.sleep(0)
            order.append("b1")

        await asyncio.gather(a(), b())
        assert order == ["a0", "a1", "b0", "b1"]

    asyncio.run(main())


def test_chunkify_matches_reference():
    ref = _ref_util()
    from svs_tpu.util import chunkify

    for n in (1, 3, 7):
        assert chunkify(list(range(10)), n) == ref.chunkify(list(range(10)), n)
    with pytest.raises(ValueError):
        chunkify([1], 0)
