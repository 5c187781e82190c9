"""Shared HTTP machinery for the embedding providers.

The reference providers issue bare ``aiohttp`` POSTs with no timeout and no
retry (``svs/embeddings/openai.py:62-92``); production embedding backfills
(200-text chunks, thousands of requests) deserve better.  This helper adds:

- a total-request timeout (``SVS_TPU_HTTP_TIMEOUT`` seconds, default 120);
- bounded retries with exponential backoff + jitter on transport errors
  and on retryable statuses (429 and 5xx) — never on other 4xx, which are
  caller bugs;
- one place that shapes provider errors (:class:`ProviderHTTPError`).
"""

from __future__ import annotations

import asyncio
import logging
import os
import random
from typing import Any, Dict, Optional

log = logging.getLogger(__name__)

DEFAULT_TIMEOUT_S = float(os.environ.get("SVS_TPU_HTTP_TIMEOUT", "120"))
DEFAULT_RETRIES = int(os.environ.get("SVS_TPU_HTTP_RETRIES", "3"))
_RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


class ProviderHTTPError(RuntimeError):
    """An embeddings backend rejected the request (terminally)."""

    def __init__(
        self, provider: str, status: Optional[int], detail: str
    ) -> None:
        self.provider = provider
        self.status = status
        super().__init__(
            f"{provider} embeddings request failed"
            + (f" (HTTP {status})" if status is not None else "")
            + f": {detail}"
        )


async def post_json(
    provider: str,
    url: str,
    payload: Dict[str, Any],
    headers: Optional[Dict[str, str]] = None,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    retries: int = DEFAULT_RETRIES,
) -> Any:
    """POST ``payload`` as JSON; return the decoded JSON response body.

    Raises :class:`ProviderHTTPError` after exhausting ``retries`` attempts
    (transport errors / retryable statuses) or immediately on a
    non-retryable error status.
    """
    import aiohttp  # deferred: optional dependency

    last_detail = "no attempts made"
    timeout = aiohttp.ClientTimeout(total=timeout_s)
    # ONE session (connection pool) for the whole call, retries included —
    # a session per attempt paid a fresh TCP+TLS handshake on every
    # embedding request.  Sessions are loop-bound, so it lives inside
    # this coroutine rather than at module scope (the package runs
    # several event loops at once).
    async with aiohttp.ClientSession(
        timeout=timeout, raise_for_status=False
    ) as session:
        for attempt in range(retries + 1):
            if attempt:
                delay = min(30.0, 0.5 * 2 ** (attempt - 1)) * (
                    1 + random.random()
                )
                log.warning(
                    "%s request retry %d/%d in %.1fs (%s)",
                    provider, attempt, retries, delay, last_detail,
                )
                await asyncio.sleep(delay)
            try:
                async with session.post(
                    url, headers=headers, json=payload
                ) as response:
                    status = response.status
                    try:
                        data = await response.json(content_type=None)
                    except Exception:
                        data = None
                    if status == 200:
                        if data is None:
                            # 200 with an unparseable/empty body (proxy
                            # splash page, truncated response): retryable
                            # malformed response, never a None return that
                            # crashes the provider with a bare TypeError
                            last_detail = "HTTP 200 with non-JSON body"
                            continue
                        return data
                    detail = _error_detail(data)
                    if status not in _RETRYABLE_STATUSES:
                        raise ProviderHTTPError(provider, status, detail)
                    last_detail = f"HTTP {status}: {detail}"
            except ProviderHTTPError:
                raise
            except (aiohttp.ClientError, asyncio.TimeoutError, OSError) as exc:
                last_detail = f"{type(exc).__name__}: {exc}"
    raise ProviderHTTPError(provider, None, f"retries exhausted; last: {last_detail}")


def _error_detail(data: Any) -> str:
    """Best-effort human detail from a JSON error body."""
    if isinstance(data, dict):
        err = data.get("error")
        if isinstance(err, dict) and "message" in err:
            return str(err["message"])
        if isinstance(err, str):
            return err
        return str(data)
    return repr(data)
