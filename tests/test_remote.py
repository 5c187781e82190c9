"""Remote-KB flows against a loopback HTTP server (no external network):
content-addressed download cache, atomic failure behavior, and the full
"open a published KB from a URL" path through the KB facade.

The reference tests these against the live internet
(``tests/test_util.py:60-139``); a local aiohttp server gives the same
coverage hermetically.
"""

import asyncio
import os
import threading

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp import web  # noqa: E402

from svs_tpu import KB, make_mock_embeddings_func  # noqa: E402
from svs_tpu.utils import file_cached_wget  # noqa: E402
from svs_tpu.utils.files import REMOTE_CACHE_DIR  # noqa: E402


class LoopbackServer:
    """Serves a dict of path -> bytes on 127.0.0.1; '/boom' dies mid-body."""

    def __init__(self, files):
        self.files = files
        self.hits = []
        self.port = None
        self._loop = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(10)

    def _run(self):
        async def handler(request):
            self.hits.append(request.path)
            if request.path == "/boom":
                response = web.StreamResponse()
                response.content_length = 10_000_000
                await response.prepare(request)
                await response.write(b"partial")
                request.transport.close()
                return response
            data = self.files.get(request.path)
            if data is None:
                raise web.HTTPNotFound()
            return web.Response(body=data)

        async def main():
            app = web.Application()
            app.router.add_get("/{tail:.*}", handler)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = site._server.sockets[0].getsockname()[1]
            self._started.set()
            await asyncio.Event().wait()  # run forever

        self._loop = asyncio.new_event_loop()
        try:
            self._loop.run_until_complete(main())
        except RuntimeError:
            pass

    def url(self, path):
        return f"http://127.0.0.1:{self.port}{path}"


@pytest.fixture
def in_tmp_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # .remote_cache lands in the test dir
    return tmp_path


def test_wget_caches_by_content_address(in_tmp_cwd):
    server = LoopbackServer({"/kb.bin": b"payload-123"})
    url = server.url("/kb.bin")
    path1 = asyncio.run(file_cached_wget(url))
    assert path1.read_bytes() == b"payload-123"
    assert path1.parent == REMOTE_CACHE_DIR
    path2 = asyncio.run(file_cached_wget(url))  # second call: cache hit
    assert path2 == path1
    assert server.hits == ["/kb.bin"]


def test_failed_download_leaves_no_cache_entry(in_tmp_cwd):
    server = LoopbackServer({})
    with pytest.raises(Exception):
        asyncio.run(file_cached_wget(server.url("/boom")))
    leftovers = (
        list(REMOTE_CACHE_DIR.glob("*")) if REMOTE_CACHE_DIR.exists() else []
    )
    assert [p for p in leftovers if not p.name.endswith(".tmp")] == []


def test_kb_opens_from_url_gz(in_tmp_cwd, tmp_path):
    # publish a KB, serve its .gz, open it via http://
    src = tmp_path / "pub.sqlite"
    kb = KB(src, make_mock_embeddings_func())
    with kb.bulk_add_docs() as add:
        add("served over http")
    kb.close(vacuum=True, also_gzip=True)
    blob = (tmp_path / "pub.sqlite.gz").read_bytes()

    server = LoopbackServer({"/pub.sqlite.gz": blob})
    remote = KB(server.url("/pub.sqlite.gz"))  # provider restored from DB
    assert len(remote) == 1
    assert remote.retrieve("q", 1)[0]["doc"]["text"] == "served over http"
    remote.close()
