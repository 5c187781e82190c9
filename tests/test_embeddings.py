"""Embedding-provider tests: param tagging, factory round trip, the
unit-norm guard, and exact blob serialization goldens.  (Reference:
``tests/test_embeddings.py``.)  No HTTP calls are made."""

import numpy as np
import pytest

from svs_tpu.embeddings import (
    embedding_from_bytes,
    embedding_to_bytes,
    make_embeddings_func,
    make_mock_embeddings_func,
    make_ollama_embeddings_func,
    make_openai_embeddings_func,
    wrap_embeddings_func_check_magnitude,
)
from svs_tpu.store.blob import matrix_from_blob_rows, vector_from_bytes


def test_blob_roundtrip_and_golden_bytes():
    vec = [1.0, -2.5, 0.0]
    blob = embedding_to_bytes(vec)
    assert blob == b"\x00\x00\x80?\x00\x00 \xc0\x00\x00\x00\x00"
    assert embedding_from_bytes(blob) == vec
    assert isinstance(embedding_from_bytes(blob)[0], float)


def test_matrix_from_blob_rows():
    blobs = [embedding_to_bytes([float(i), 0.0]) for i in range(4)]
    m = matrix_from_blob_rows(blobs, 2)
    assert m.shape == (4, 2)
    np.testing.assert_array_equal(m[:, 0], [0, 1, 2, 3])
    assert matrix_from_blob_rows([], 0).shape == (0, 0)


def test_vector_from_bytes_zero_copy_view():
    v = vector_from_bytes(embedding_to_bytes([3.0, 4.0]))
    assert v.dtype == np.dtype("<f4")
    np.testing.assert_array_equal(v, [3.0, 4.0])


async def test_mock_provider():
    f = make_mock_embeddings_func()
    assert f.__embedding_func_params__ == {"provider": "mock"}
    assert await f(["a", "b"]) == [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]


def test_provider_param_tags():
    f = make_openai_embeddings_func(model="m", dimensions=7, api_key="k")
    assert f.__embedding_func_params__ == {
        "provider": "openai",
        "model": "m",
        "dimensions": 7,
    }
    g = make_ollama_embeddings_func(model="mm", base_url="http://h:1")
    assert g.__embedding_func_params__ == {
        "provider": "ollama",
        "model": "mm",
        "truncate": True,
        "keep_alive": "5m",
        "base_url": "http://h:1",
    }


async def test_factory_round_trip():
    f = make_mock_embeddings_func()
    g = make_embeddings_func(dict(f.__embedding_func_params__))
    assert await g(["x"]) == [[1.0, 0.0, 0.0]]
    rebuilt = make_embeddings_func(
        {"provider": "openai", "model": "m", "dimensions": None}
    )
    assert rebuilt.__embedding_func_params__["model"] == "m"
    with pytest.raises(ValueError, match="unknown embedding provider"):
        make_embeddings_func({"provider": "nope"})


async def test_magnitude_guard():
    async def bad(texts):
        return [[1.0, 1.0, 0.0] for _ in texts]

    async def good(texts):
        return [[0.6, 0.8, 0.0] for _ in texts]

    with pytest.raises(ValueError, match="magnitude"):
        await wrap_embeddings_func_check_magnitude(bad, 0.001)(["x"])
    assert await wrap_embeddings_func_check_magnitude(good, 0.001)(["x"])

    # tolerance is respected
    async def slightly_off(texts):
        return [[1.0005, 0.0] for _ in texts]

    assert await wrap_embeddings_func_check_magnitude(slightly_off, 0.001)(["x"])
    with pytest.raises(ValueError):
        await wrap_embeddings_func_check_magnitude(slightly_off, 0.0001)(["x"])

    # empty batch is fine
    assert await wrap_embeddings_func_check_magnitude(good, 0.001)([]) == []


def test_embeddings_util_alias_module():
    """The reference exposes svs.embeddings.util; imports of its helpers
    must survive a package swap (ref: src/svs/embeddings/util.py)."""
    from svs_tpu.embeddings.util import (
        EMBEDDINGS_MAX_CACHE_SIZE,
        embedding_from_bytes,
        embedding_to_bytes,
        wrap_embeddings_func_check_magnitude,
    )

    blob = embedding_to_bytes([0.5, -0.25])
    assert embedding_from_bytes(blob) == [0.5, -0.25]
    assert EMBEDDINGS_MAX_CACHE_SIZE > 0
    assert callable(wrap_embeddings_func_check_magnitude)
