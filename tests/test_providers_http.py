"""HTTP providers against a loopback server: exact request bodies (golden),
bounded retry on 5xx/429, terminal failure on 4xx, and timeouts.

Beats the reference's coverage: its provider HTTP layer is entirely
untested (SURVEY.md section 4 — "the actual HTTP POST bodies are
untested").
"""

import asyncio
import json
import threading

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp import web  # noqa: E402

from svs_tpu.embeddings import (  # noqa: E402
    make_ollama_embeddings_func,
    make_openai_embeddings_func,
)
from svs_tpu.embeddings.http import ProviderHTTPError, post_json  # noqa: E402


class PostServer:
    """Loopback POST recorder with a scriptable response queue."""

    def __init__(self):
        self.requests = []  # (path, headers dict, json body)
        self.responses = []  # queue of (status, json body); last repeats
        self.port = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(10)

    def _run(self):
        async def handler(request):
            body = await request.json()
            self.requests.append(
                (request.path, dict(request.headers), body)
            )
            status, payload = (
                self.responses.pop(0) if len(self.responses) > 1
                else self.responses[0]
            )
            if isinstance(payload, dict) and "__raw__" in payload:
                return web.Response(text=payload["__raw__"], status=status)
            return web.json_response(payload, status=status)

        async def main():
            app = web.Application()
            app.router.add_post("/{tail:.*}", handler)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = site._server.sockets[0].getsockname()[1]
            self._started.set()
            await asyncio.Event().wait()

        loop = asyncio.new_event_loop()
        try:
            loop.run_until_complete(main())
        except RuntimeError:
            pass

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"


def _openai_ok(vectors):
    return {
        "data": [
            {"index": i, "embedding": [float(x) for x in v]}
            for i, v in enumerate(vectors)
        ]
    }


def test_openai_request_body_golden(monkeypatch):
    srv = PostServer()
    srv.responses = [(200, _openai_ok([[1.0, 0.0], [0.0, 1.0]]))]
    monkeypatch.setenv("OPENAI_BASE_URL", f"{srv.url}/v1/embeddings")
    fn = make_openai_embeddings_func(
        model="text-embedding-3-small", api_key="sk-test", dimensions=2
    )
    out = asyncio.run(fn(["alpha", "beta"]))
    assert out == [[1.0, 0.0], [0.0, 1.0]]
    path, headers, body = srv.requests[0]
    assert path == "/v1/embeddings"
    assert headers["Authorization"] == "Bearer sk-test"
    assert body == {
        "input": ["alpha", "beta"],
        "model": "text-embedding-3-small",
        "encoding_format": "float",
        "dimensions": 2,
    }


def test_ollama_request_body_golden():
    srv = PostServer()
    srv.responses = [(200, {"embeddings": [[0.5, 0.5]]})]
    fn = make_ollama_embeddings_func(model="mxbai", base_url=srv.url)
    out = asyncio.run(fn(["hello"]))
    assert out == [[0.5, 0.5]]
    path, _, body = srv.requests[0]
    assert path == "/api/embed"
    assert body == {
        "model": "mxbai",
        "truncate": True,
        "keep_alive": "5m",
        "input": ["hello"],
    }


def test_retry_on_5xx_then_success(monkeypatch):
    # kill the jitter so the two real backoffs stay ~0.5s + 1s
    monkeypatch.setattr("svs_tpu.embeddings.http.random.random", lambda: 0.0)
    srv = PostServer()
    srv.responses = [
        (503, {"error": "overloaded"}),
        (429, {"error": "slow down"}),
        (200, {"ok": True}),
    ]
    data = asyncio.run(
        post_json("test", f"{srv.url}/x", {"a": 1}, timeout_s=5, retries=3)
    )
    assert data == {"ok": True}
    assert len(srv.requests) == 3


def test_no_retry_on_terminal_4xx():
    srv = PostServer()
    srv.responses = [(401, {"error": {"message": "bad key"}})]
    with pytest.raises(ProviderHTTPError) as exc:
        asyncio.run(
            post_json("openai", f"{srv.url}/x", {}, timeout_s=5, retries=3)
        )
    assert exc.value.status == 401
    assert "bad key" in str(exc.value)
    assert len(srv.requests) == 1  # no retries burned on a caller bug


def test_retries_exhausted_raises():
    srv = PostServer()
    srv.responses = [(503, {"error": "down"})]
    with pytest.raises(ProviderHTTPError) as exc:
        asyncio.run(
            post_json("ollama", f"{srv.url}/x", {}, timeout_s=5, retries=1)
        )
    assert exc.value.status is None
    assert "retries exhausted" in str(exc.value)
    assert len(srv.requests) == 2  # initial + 1 retry


def test_timeout_then_failure():
    # connect to a port that's bound but never accepts payloads usefully:
    # use an unroutable address to force a transport error quickly
    with pytest.raises(ProviderHTTPError):
        asyncio.run(
            post_json(
                "test", "http://127.0.0.1:9/none", {}, timeout_s=0.5, retries=0
            )
        )


def test_200_with_non_json_body_is_retried_then_raises():
    """A proxy's 200 with an HTML/garbage body must surface as a
    ProviderHTTPError (after retries), never a None return that crashes
    the provider with a bare TypeError."""
    server = PostServer()
    server.responses = [(200, {"__raw__": "<html>splash</html>"})]
    with pytest.raises(ProviderHTTPError, match="non-JSON"):
        asyncio.run(
            post_json("test", server.url + "/x", {}, retries=1, timeout_s=5)
        )


def test_200_non_json_then_good_json_succeeds():
    server = PostServer()
    server.responses = [
        (200, {"__raw__": "garbage"}),
        (200, {"ok": 1}),
    ]
    out = asyncio.run(
        post_json("test", server.url + "/x", {}, retries=2, timeout_s=5)
    )
    assert out == {"ok": 1}


def test_untrusted_params_drop_ollama_base_url(caplog):
    """A downloaded database storing an attacker base_url must NOT have
    its endpoint honored — queries and texts would be exfiltrated."""
    import logging

    from svs_tpu.embeddings import make_embeddings_func

    params = {
        "provider": "ollama",
        "model": "m",
        "truncate": True,
        "keep_alive": "5m",
        "base_url": "https://attacker.example",
    }
    with caplog.at_level(logging.WARNING):
        fn = make_embeddings_func(params, trusted=False)
    assert any("attacker.example" in r.message for r in caplog.records)
    # the rebuilt function's own persisted params no longer carry it
    assert fn.__embedding_func_params__["base_url"] is None
    # trusted path (explicit constructor / same-process params) keeps it
    fn2 = make_embeddings_func(params, trusted=True)
    assert fn2.__embedding_func_params__["base_url"] == (
        "https://attacker.example"
    )
