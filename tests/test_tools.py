"""Maintenance workflows: re-embedding and near-duplicate discovery."""

import math

import pytest

from svs_tpu import KB, make_mock_embeddings_func
from svs_tpu.cli import main
from svs_tpu.tools import find_near_duplicates, reembed

from kb_helpers import make_angle_embedder, make_onehot_embedder


def _angle16(deg_dim=16):
    """A second, distinguishable deterministic provider (2-D rotations
    padded to 16 dims) tagged as storable."""

    async def embed(texts):
        out = []
        for t in texts:
            deg = float(t.split(":")[1]) if t.startswith("angle:") else 0.0
            rad = math.radians(deg)
            v = [math.cos(rad), math.sin(rad)] + [0.0] * (deg_dim - 2)
            out.append(v)
        return out

    embed.__embedding_func_params__ = {"provider": "mock"}
    return embed


def test_reembed_preserves_everything(tmp_path):
    src_path = tmp_path / "src.sqlite"
    src = KB(src_path, make_angle_embedder())
    with src.bulk_add_docs() as add:
        root = add("angle:0", meta={"kind": "root"})
        kid = add("angle:10", parent_id=root)
        bare = add("angle:20", no_embedding=True)
    with src.bulk_graph_update() as g:
        g.add_edge(root, kid, root, weight=1.25)
    with src.bulk_keyval_update() as kv:
        kv["source"] = "unit-test"
    src.close()

    dest_path = tmp_path / "dest.sqlite"
    count = reembed(src_path, dest_path, _angle16())
    assert count == 3

    # reopen with the new provider passed explicitly (the tag we faked for
    # storage points at the real 3-dim mock, which would mismatch)
    dest = KB(dest_path, _angle16())
    with dest.bulk_query_docs() as q:
        assert q.count() == 3
        docs = list(q.dfs_traversal(include_embedding=True))
        by_text = {d["text"]: d for d in docs}
        assert by_text["angle:10"]["parent_id"] == by_text["angle:0"]["id"]
        assert by_text["angle:0"]["meta"] == {"kind": "root"}
        assert len(by_text["angle:0"]["embedding"]) == 16  # new provider dim
        assert by_text["angle:20"]["embedding"] is None  # stayed bare
    with dest.bulk_graph_update() as g:
        assert g.count_edges() == 1
    with dest.bulk_keyval_update() as kv:
        assert kv["source"] == "unit-test"
    hits = dest.retrieve("angle:9", 1)
    assert hits[0]["doc"]["text"] == "angle:10"
    dest.close()


def test_find_near_duplicates(db_path):
    kb = KB(db_path, make_angle_embedder())
    with kb.bulk_add_docs() as add:
        for deg in [0, 1, 90, 180]:
            add(f"angle:{deg}")
    dups = find_near_duplicates(kb, threshold=0.999)
    assert len(dups) == 1  # only the 0/1-degree pair
    score, d1, d2 = dups[0]
    assert score == pytest.approx(math.cos(math.radians(1)), abs=1e-6)
    kb.close()


def test_cli_reembed(tmp_path, capsys):
    src = tmp_path / "s.sqlite"
    kb = KB(src, make_onehot_embedder())
    with kb.bulk_add_docs() as add:
        add("vec:1"), add("vec:2")
    kb.close()
    out = tmp_path / "d.sqlite"
    assert (
        main(
            [
                "reembed",
                str(src),
                str(out),
                "--provider-params",
                '{"provider": "mock"}',
            ]
        )
        == 0
    )
    assert "re-embedded 2 documents" in capsys.readouterr().out
    dest = KB(out)
    assert len(dest) == 2
    dest.close()

def test_reembed_faithful_with_mixed_edges(tmp_path):
    """Regression: with directed AND undirected edges, the copy must keep
    each undirected edge as ONE row with d=0 (a networkx round trip would
    materialize it as two directed arcs)."""
    src_path = tmp_path / "src.sqlite"
    src = KB(src_path, make_angle_embedder())
    with src.bulk_add_docs() as add:
        a = add("angle:0")
        b = add("angle:10")
        c = add("angle:20")
    with src.bulk_graph_update() as g:
        g.add_edge(a, b, c, weight=0.5)          # undirected
        g.add_directed_edge(b, c, a, weight=2.0)  # directed
    src.close()

    dest_path = tmp_path / "dest.sqlite"
    reembed(src_path, dest_path, make_angle_embedder())

    from svs_tpu.store import Database

    for path in (src_path, dest_path):
        db = Database(path)
        with db.transaction() as tx:
            rows = [(w, d) for _, _, _, w, d in tx.iter_edges()]
        db.close()
        assert rows == [(0.5, False), (2.0, True)], (path, rows)


# -- selfcheck --------------------------------------------------------------


def _build_kb(tmp_path, n_docs=30, dim=16):
    path = tmp_path / "check.sqlite"
    kb = KB(path, make_angle_embedder())
    with kb.bulk_add_docs() as add:
        root = add("angle:0", meta={"kind": "root"})
        for i in range(1, n_docs):
            add(f"angle:{i * 7 % 360}", parent_id=root if i % 3 else None)
    kb.close()
    return path


@pytest.mark.parametrize("precision", ["bf16", "int8", "f32"])
def test_selfcheck_clean_kb_passes(tmp_path, precision):
    from svs_tpu.tools import selfcheck

    path = _build_kb(tmp_path)
    report = selfcheck(path, queries=4, n=5, precision=precision)
    assert report["ok"], report
    names = set(report["checks"])
    assert names == {
        "sqlite", "schema", "counts", "levels", "embeddings",
        "sidecar", "retrieval",
    }
    assert report["checks"]["retrieval"]["mismatches"] == []


def test_selfcheck_catches_orphan_embedding(tmp_path):
    import sqlite3

    from svs_tpu.store.blob import embedding_to_bytes
    from svs_tpu.tools import selfcheck

    path = _build_kb(tmp_path)
    conn = sqlite3.connect(path)
    conn.execute(
        "INSERT INTO embeddings (embedding) VALUES (?);",
        (embedding_to_bytes([1.0, 0.0]),),
    )
    conn.commit()
    conn.close()
    report = selfcheck(path, queries=2, n=3)
    assert not report["ok"]
    assert not report["checks"]["counts"]["ok"]
    assert report["checks"]["counts"]["orphan_embeddings"] == 1


def test_selfcheck_catches_level_and_magnitude_corruption(tmp_path):
    import sqlite3

    from svs_tpu.store.blob import embedding_to_bytes
    from svs_tpu.tools import selfcheck

    path = _build_kb(tmp_path)
    conn = sqlite3.connect(path)
    conn.execute("UPDATE docs SET level = 5 WHERE parent_id IS NULL;")
    # non-unit blob (double a stored vector)
    conn.execute(
        "UPDATE embeddings SET embedding = ? WHERE id = 1;",
        (embedding_to_bytes([2.0, 0.0]),),
    )
    conn.commit()
    conn.close()
    report = selfcheck(path, queries=0)
    assert not report["ok"]
    assert not report["checks"]["levels"]["ok"]
    assert report["checks"]["levels"]["bad_roots"] > 0
    assert not report["checks"]["embeddings"]["ok"]
    assert report["checks"]["embeddings"]["max_magnitude_deviation"] > 0.5


def test_selfcheck_catches_dangling_refs_and_bad_maintained_count(tmp_path):
    import sqlite3

    from svs_tpu.tools import selfcheck

    path = _build_kb(tmp_path)
    conn = sqlite3.connect(path)
    # break the trigger-maintained count, then dangle a doc->embedding ref
    # (drop the triggers first so the count stays broken)
    conn.execute("DROP TRIGGER svs_tpu_emb_cnt_insert;")
    conn.execute("DROP TRIGGER svs_tpu_emb_cnt_delete;")
    conn.execute(
        "UPDATE keyval SET val = val + 7 WHERE key = 'svs_tpu_emb_count';"
    )
    conn.execute(
        "UPDATE docs SET embedding = 999999 WHERE id = "
        "(SELECT MAX(id) FROM docs WHERE embedding IS NOT NULL);"
    )
    conn.commit()
    conn.close()
    report = selfcheck(path, queries=0)
    assert not report["ok"]
    assert not report["checks"]["sqlite"]["ok"]
    assert report["checks"]["sqlite"]["dangling_embedding_refs"] == 1
    assert not report["checks"]["counts"]["ok"]


def test_selfcheck_fails_when_retrieval_pipeline_crashes(tmp_path, monkeypatch):
    """A retrieve_batch crash must surface as ok=False — the except
    branch's error record must not be overwritten by the (vacuous,
    zero-comparison) parity record afterwards."""
    from svs_tpu import kb as kb_mod
    from svs_tpu.tools import selfcheck

    path = _build_kb(tmp_path)

    def boom(self, queries, n=10, **kw):
        raise RuntimeError("hydration failed on corrupt row")

    monkeypatch.setattr(kb_mod.KB, "retrieve_batch", boom)
    report = selfcheck(path, queries=2, n=3)
    assert not report["ok"], report
    retrieval = report["checks"]["retrieval"]
    assert not retrieval["ok"]
    assert "hydration failed" in retrieval["error"]


def test_selfcheck_tie_cluster_reorder_is_not_a_mismatch(tmp_path):
    """Two docs whose scores differ by (1e-5, TIE] form one tie cluster;
    returning them in either order must pass the audit (the positional
    score check uses the cluster range, not a strict 1e-5)."""
    import math

    from svs_tpu.tools import selfcheck

    # Embedder with two nearly-tied directions: angle 0 and a tiny angle
    # eps such that cos(0)=1 vs cos(eps)≈1-1.5e-5 — inside the TIE=2e-5
    # cluster but outside the strict 1e-5 tolerance relative to each
    # other when reordered.
    eps = math.acos(1 - 1.5e-5)

    async def embed(batch):
        out = []
        for t in batch:
            a = eps if t.endswith("b") else 0.0
            out.append([math.cos(a), math.sin(a)])
        return out

    path = tmp_path / "ties.sqlite"
    kb = KB(path, embed)
    with kb.bulk_add_docs() as add:
        add("doc a")
        add("doc b")
        add("doc a2")
    kb.close()
    report = selfcheck(path, queries=3, n=3)
    assert report["ok"], report["checks"]["retrieval"]


def test_selfcheck_sidecar_states(tmp_path):
    import sqlite3

    from svs_tpu.store.blob import embedding_to_bytes
    from svs_tpu.tools import selfcheck

    path = _build_kb(tmp_path)
    report = selfcheck(path, queries=0)
    assert report["checks"]["sidecar"]["status"] == "absent"

    kb = KB(path, make_angle_embedder(), sidecar=True)
    kb.load()
    kb.close()
    report = selfcheck(path, queries=0)
    assert report["checks"]["sidecar"]["status"] == "fresh"

    # foreign write -> fingerprint moves on -> sidecar reported stale
    conn = sqlite3.connect(path)
    conn.execute(
        "INSERT INTO embeddings (embedding) VALUES (?);",
        (embedding_to_bytes([1.0, 0.0]),),
    )
    conn.execute(
        "INSERT INTO docs (parent_id, level, text, embedding, meta) "
        "VALUES (NULL, 0, 'foreign', last_insert_rowid(), NULL);"
    )
    conn.commit()
    conn.close()
    report = selfcheck(path, queries=0)
    assert report["checks"]["sidecar"]["status"] == "stale"
    assert report["checks"]["sidecar"]["ok"]  # stale is not a failure
    assert report["ok"]


def test_selfcheck_cli_exit_codes(tmp_path, capsys):
    import json
    import sqlite3

    path = _build_kb(tmp_path)
    assert main(["selfcheck", str(path), "-q", "2", "-n", "3"]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["ok"]

    conn = sqlite3.connect(path)
    conn.execute("UPDATE docs SET level = 9 WHERE parent_id IS NULL;")
    conn.commit()
    conn.close()
    assert main(["selfcheck", str(path), "-q", "0"]) == 1
    assert main(["selfcheck", str(tmp_path / "missing.sqlite")]) == 1
