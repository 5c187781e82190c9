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


def make_embeddings_func(
    embedding_func_params: Dict[str, Any], *, trusted: bool = True
) -> EmbeddingFunc:
    """Rebuild an embedding function from its persisted params dict.

    ``params['provider']`` selects the factory; the remaining keys are
    passed through as keyword arguments.

    ``trusted=False`` marks params that came from an untrusted source —
    a downloaded/shared database file.  In that mode:

    - a ``local`` provider whose ``model`` is not an existing local
      directory is refused (it would otherwise trigger an arbitrary
      Hugging Face hub download + model instantiation on first retrieve)
      unless the operator opts in with ``SVS_TPU_ALLOW_HUB_MODELS=1``;
    - a stored ``ollama`` ``base_url`` is DROPPED (the endpoint resolves
      from the operator's own ``OLLAMA_BASE_URL``/default instead): a
      malicious database storing an attacker URL would otherwise receive
      every query and document text the moment the KB is used.
    """
    import logging
    import os

    params = dict(embedding_func_params)
    provider = params.pop("provider")
    try:
        factory = _PROVIDERS[provider]
    except KeyError:
        raise ValueError(f"unknown embedding provider name: {provider}")
    if provider == "ollama" and not trusted and params.get("base_url"):
        logging.getLogger(__name__).warning(
            "ignoring the ollama base_url stored in this database (%r): "
            "endpoints from untrusted database files are not honored — "
            "set OLLAMA_BASE_URL or pass make_ollama_embeddings_func("
            "base_url=...) explicitly to use a non-default server",
            params["base_url"],
        )
        params["base_url"] = None
    if (
        provider == "local"
        and not trusted
        and not os.path.isdir(str(params.get("model", "")))
        and os.environ.get("SVS_TPU_ALLOW_HUB_MODELS") != "1"
    ):
        raise RuntimeError(
            "This database's stored embedding params name a 'local' "
            f"provider with a non-local model {params.get('model')!r}. "
            "Loading it would download and run an arbitrary checkpoint "
            "from the Hugging Face hub. If you trust this database, set "
            "SVS_TPU_ALLOW_HUB_MODELS=1 or pass the embedding function "
            "explicitly: KB(path, make_local_embeddings_func(...))."
        )
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
