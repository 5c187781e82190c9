"""Publish flow: close() leaves a current sidecar so consumers never pay
the cold-start BLOB rescan, and remote consumers fetch the published
``.svsx`` sibling automatically.

Reference counterpart: the publish flow is ``close(vacuum, also_gzip)``
(``svs/kb.py:969-995``) — which ships nothing for cold start, so every
consumer rebuilds the matrix (~100 s at 1M docs).
"""

import pytest

from svs_tpu import KB
from svs_tpu.engine.sidecar import sidecar_fingerprint, sidecar_path_for
from svs_tpu.store import tx as tx_module

from kb_helpers import make_onehot_embedder


@pytest.fixture
def scan_counter(monkeypatch):
    """Counts Tx.build_embeddings_matrix calls (the cold-start scan)."""
    calls = []
    orig = tx_module.Tx.build_embeddings_matrix

    def counting(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(tx_module.Tx, "build_embeddings_matrix", counting)
    return calls


def _build(db_path, n=12, **kb_kwargs):
    kb = KB(db_path, make_onehot_embedder(), force_fresh_db=True, **kb_kwargs)
    with kb.bulk_add_docs() as add:
        for i in range(n):
            add(f"vec:{i}")
    return kb


def test_close_writes_sidecar_and_consumer_skips_scan(db_path, scan_counter):
    kb = _build(db_path, sidecar=True)
    kb.close(write_sidecar=True)
    sc = sidecar_path_for(db_path)
    assert sc.exists()
    assert scan_counter, "publisher pays the scan once"

    scan_counter.clear()
    consumer = KB(db_path, make_onehot_embedder(), sidecar=True)
    hits = consumer.retrieve("vec:7", 3)
    assert hits[0]["doc"]["text"] == "vec:7"
    assert scan_counter == [], (
        "consumer must cold-start from the sidecar with ZERO "
        "build_embeddings_matrix calls"
    )
    consumer.close()


def test_close_reuses_live_host_pack_without_second_scan(db_path, scan_counter):
    kb = _build(db_path, sidecar=True)
    kb.retrieve("vec:3", 1)  # packs the corpus (pays the scan)
    scans_after_query = len(scan_counter)
    kb.close(write_sidecar=True)
    # close wrote the sidecar from the live host pack — no extra scan
    assert len(scan_counter) == scans_after_query
    assert sidecar_path_for(db_path).exists()


def test_close_policy_auto_skips_small_corpora(db_path):
    kb = _build(db_path)  # default sidecar='auto'; 12 docs < threshold
    kb.close()
    assert not sidecar_path_for(db_path).exists()


def test_close_policy_false_and_override(db_path):
    kb = _build(db_path, sidecar=False)
    kb.close()  # instance policy False -> nothing
    assert not sidecar_path_for(db_path).exists()

    kb = KB(db_path, make_onehot_embedder(), sidecar=False)
    kb.close(write_sidecar=True)  # explicit override wins
    assert sidecar_path_for(db_path).exists()

    # explicit False wins over instance True
    sidecar_path_for(db_path).unlink()
    kb = KB(db_path, make_onehot_embedder(), sidecar=True)
    kb.close(write_sidecar=False)
    assert not sidecar_path_for(db_path).exists()


def test_close_skips_rewrite_when_current(db_path):
    kb = _build(db_path, sidecar=True)
    kb.close(write_sidecar=True)
    sc = sidecar_path_for(db_path)
    fp1 = sidecar_fingerprint(sc)
    mtime1 = sc.stat().st_mtime_ns
    kb = KB(db_path, make_onehot_embedder(), sidecar=True)
    kb.retrieve("vec:1", 1)
    kb.close(write_sidecar=True)  # store unchanged -> no rewrite
    assert sc.stat().st_mtime_ns == mtime1
    assert sidecar_fingerprint(sc) == fp1


def test_close_refreshes_stale_sidecar_after_writes(db_path):
    kb = _build(db_path, sidecar=True)
    kb.close(write_sidecar=True)
    sc = sidecar_path_for(db_path)
    fp1 = sidecar_fingerprint(sc)

    kb = KB(db_path, make_onehot_embedder(), sidecar=True)
    with kb.bulk_add_docs() as add:
        add("vec:30")
    kb.close(write_sidecar=True)
    fp2 = sidecar_fingerprint(sc)
    assert fp2 != fp1

    consumer = KB(db_path, make_onehot_embedder(), sidecar=True)
    assert consumer.retrieve("vec:30", 1)[0]["doc"]["text"] == "vec:30"
    consumer.close()


def test_remote_consumer_fetches_published_sidecar(tmp_path, monkeypatch,
                                                   scan_counter):
    """Publisher ships <db>.gz + <db>.svsx; a URL consumer cold-starts
    with zero scans."""
    from test_remote import LoopbackServer

    monkeypatch.chdir(tmp_path)
    src = tmp_path / "pub.sqlite"
    kb = _build(src, sidecar=True)
    kb.close(vacuum=True, also_gzip=True, write_sidecar=True)
    gz = (tmp_path / "pub.sqlite.gz").read_bytes()
    svsx = (tmp_path / "pub.sqlite.svsx").read_bytes()

    server = LoopbackServer(
        {"/pub.sqlite.gz": gz, "/pub.sqlite.svsx": svsx}
    )
    scan_counter.clear()
    remote = KB(server.url("/pub.sqlite.gz"), make_onehot_embedder())
    hits = remote.retrieve("vec:5", 2)
    assert hits[0]["doc"]["text"] == "vec:5"
    assert scan_counter == [], "remote consumer must use the fetched sidecar"
    assert "/pub.sqlite.svsx" in server.hits
    remote.close()


def test_remote_consumer_survives_missing_sidecar(tmp_path, monkeypatch):
    from test_remote import LoopbackServer

    monkeypatch.chdir(tmp_path)
    src = tmp_path / "pub.sqlite"
    kb = _build(src)
    kb.close(vacuum=True, also_gzip=True, write_sidecar=False)
    gz = (tmp_path / "pub.sqlite.gz").read_bytes()

    server = LoopbackServer({"/pub.sqlite.gz": gz})
    remote = KB(server.url("/pub.sqlite.gz"), make_onehot_embedder())  # 404 on .svsx is non-fatal
    assert remote.retrieve("vec:5", 1)[0]["doc"]["text"] == "vec:5"
    remote.close()


def test_stale_fetched_sidecar_is_ignored(tmp_path, monkeypatch,
                                          scan_counter):
    """A published sidecar that doesn't match the DB (publisher error)
    must be ignored by the fingerprint check, not served."""
    from test_remote import LoopbackServer

    monkeypatch.chdir(tmp_path)
    src = tmp_path / "pub.sqlite"
    kb = _build(src, sidecar=True)
    kb.close(write_sidecar=True)
    stale_svsx = sidecar_path_for(src).read_bytes()

    # mutate the DB after the sidecar snapshot, then publish the pair
    kb = KB(src, make_onehot_embedder())
    with kb.bulk_add_docs() as add:
        add("vec:31")
    kb.close(vacuum=True, also_gzip=True, write_sidecar=False)
    gz = (tmp_path / "pub.sqlite.gz").read_bytes()

    server = LoopbackServer(
        {"/pub.sqlite.gz": gz, "/pub.sqlite.svsx": stale_svsx}
    )
    scan_counter.clear()
    remote = KB(server.url("/pub.sqlite.gz"), make_onehot_embedder())
    assert (
        remote.retrieve("vec:31", 1)[0]["doc"]["text"]
        == "vec:31"
    )
    assert scan_counter, "stale sidecar must force a real scan"
    remote.close()
