"""CLI surface tests (in-process, through svs_tpu.cli.main)."""

import json

import pytest

from svs_tpu import KB, make_mock_embeddings_func
from svs_tpu.cli import main


@pytest.fixture
def populated_db(db_path):
    kb = KB(db_path, make_mock_embeddings_func())
    with kb.bulk_add_docs() as add:
        ids = [add(f"doc {i}") for i in range(4)]
    with kb.bulk_graph_update() as g:
        g.add_edge(ids[0], ids[1], ids[2])
    kb.close()
    return db_path


def test_info(populated_db, capsys):
    assert main(["info", str(populated_db)]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["docs"] == 4
    assert info["embeddings"] == 4
    assert info["embedding_dim"] == 3
    assert info["edges"] == 1
    assert info["embedding_func_params"] == {"provider": "mock"}


def test_query(populated_db, capsys):
    assert main(["query", str(populated_db), "anything", "-n", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("+1.000000")


def test_query_meta_filter(db_path, capsys):
    kb = KB(db_path, make_mock_embeddings_func())
    with kb.bulk_add_docs() as add:
        for i in range(6):
            add(f"doc {i}", meta={"lang": "de" if i % 2 else "en"})
    kb.close()
    assert main([
        "query", str(db_path), "x", "-n", "6",
        "--meta-filter", '{"lang": "de"}',
    ]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3  # only the 3 de-tagged docs
    # malformed filter: exit 2, no traceback
    assert main([
        "query", str(db_path), "x", "--meta-filter", '["lang"]',
    ]) == 2
    assert main([
        "query", str(db_path), "x", "--meta-filter", '{"lang": de}',
    ]) == 2  # invalid JSON, not just non-object JSON


def test_pack_writes_sidecar(populated_db, capsys):
    assert main(["pack", str(populated_db)]) == 0
    assert "sidecar written" in capsys.readouterr().out
    from svs_tpu.engine import sidecar_path_for

    assert sidecar_path_for(populated_db).exists()


def test_pairs(populated_db, capsys):
    assert main(["pairs", str(populated_db), "-n", "3"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3


def test_gzip(populated_db, capsys, tmp_path):
    assert main(["gzip", str(populated_db)]) == 0
    assert (tmp_path / "testdb.sqlite.gz").exists()


def test_pairs_meta_filter(db_path, capsys):
    kb = KB(db_path, make_mock_embeddings_func())
    with kb.bulk_add_docs() as add:
        for i in range(8):
            add(f"doc {i}", meta={"lang": "de" if i % 2 else "en"})
    kb.close()
    assert main([
        "pairs", str(db_path), "-n", "100",
        "--meta-filter", '{"lang": "de"}',
    ]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 4 * 3 // 2  # all pairs among the 4 de docs
    assert main([
        "pairs", str(db_path), "--meta-filter", 'nope',
    ]) == 2


def test_cli_warm(tmp_path, capsys):
    from svs_tpu import KB
    from svs_tpu.cli import main
    from tests.kb_helpers import make_onehot_embedder

    path = tmp_path / "warm.sqlite"
    kb = KB(path, make_onehot_embedder(), force_fresh_db=True)
    with kb.bulk_add_docs() as add:
        for i in range(12):
            add(f"vec:{i}")
    kb.close()
    assert main(["warm", str(path), "--batches", "1,2", "-n", "4"]) == 0
    out = capsys.readouterr().out
    assert "warmup (2 batch shapes" in out
    assert "uploads settled: True" in out
