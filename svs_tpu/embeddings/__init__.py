"""Pluggable embedding providers.

Every provider factory returns an :data:`~svs_tpu.types.EmbeddingFunc`
(async ``List[str] -> List[List[float]]``) tagged with an
``__embedding_func_params__`` dict.  The tag is what makes a knowledge base
self-describing: at open time the KB persists the params into the database,
and a re-opened database rebuilds its embedding function via
:func:`make_embeddings_func` without the caller passing anything
(reference behavior: ``svs/embeddings/__init__.py:19-31``,
``svs/kb.py:896-922``).
"""

from typing import Any, Dict

from ..types import EmbeddingFunc
from .base import (
    EMBEDDINGS_MAX_CACHE_SIZE,
    wrap_embeddings_func_check_magnitude,
)
from ..store.blob import embedding_from_bytes, embedding_to_bytes
from .local import make_local_embeddings_func
from .mock import make_mock_embeddings_func
from .ollama import make_ollama_embeddings_func
from .openai import make_openai_embeddings_func

_PROVIDERS = {
    "mock": make_mock_embeddings_func,
    "openai": make_openai_embeddings_func,
    "ollama": make_ollama_embeddings_func,
    "local": make_local_embeddings_func,
}


def make_embeddings_func(embedding_func_params: Dict[str, Any]) -> EmbeddingFunc:
    """Rebuild an embedding function from its persisted params dict.

    ``params['provider']`` selects the factory; the remaining keys are
    passed through as keyword arguments.
    """
    params = dict(embedding_func_params)
    provider = params.pop("provider")
    try:
        factory = _PROVIDERS[provider]
    except KeyError:
        raise ValueError(f"unknown embedding provider name: {provider}")
    return factory(**params)


__all__ = [
    "EMBEDDINGS_MAX_CACHE_SIZE",
    "embedding_to_bytes",
    "embedding_from_bytes",
    "wrap_embeddings_func_check_magnitude",
    "make_mock_embeddings_func",
    "make_openai_embeddings_func",
    "make_ollama_embeddings_func",
    "make_local_embeddings_func",
    "make_embeddings_func",
]
