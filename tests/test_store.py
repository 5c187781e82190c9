"""Storage-engine tests: real SQLite files, raw-table golden assertions.

Mirrors the reference's layer-1 strategy (``tests/test_kb.py:42-918``):
drive the transaction/query layer directly and assert on raw table dumps,
persistence across close/reopen cycles, exact BLOB bytes, and transactional
rollback.
"""

import numpy as np
import pytest

from svs_tpu.store import Database, embedding_to_bytes
from svs_tpu.store.db import SCHEMA_VERSION


def test_keyval_roundtrip_and_persistence(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        with pytest.raises(KeyError):
            tx.get_key("a")
        tx.set_key("a", 1)
        tx.set_key("b", "x")
        assert tx.get_key("a") == 1
        tx.set_key("a", 2)  # upsert
        assert tx.get_key("a") == 2
    db.close()

    db = Database(db_path)
    with db.transaction() as tx:
        assert tx.get_key("a") == 2
        assert tx.get_key("b") == "x"
        tx.del_key("a")
        with pytest.raises(KeyError):
            tx.del_key("a")
    db.close()


def test_user_keyval_independent_of_internal(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        tx.set_key("k", "internal")
        tx.set_key_user("k", "user")
        assert tx.get_key("k") == "internal"
        assert tx.get_key_user("k") == "user"
        assert tx.has_key_user("k")
        assert not tx.has_key_user("nope")
        assert tx.count_keys_user() == 1
        assert list(tx.iter_keyval_user()) == [("k", "user")]
        assert list(tx.iter_keys_user()) == ["k"]
    db.close()


def test_add_doc_levels_and_blob_bytes(db_path):
    db = Database(db_path)
    emb = embedding_to_bytes([1.0, 0.0, 0.0])
    with db.transaction() as tx:
        root = tx.add_doc("root", None, None, emb)
        child = tx.add_doc("child", root, {"k": 1}, emb)
        grand = tx.add_doc("grand", child, None, None)
        assert tx.fetch_doc(root, False)["level"] == 0
        assert tx.fetch_doc(child, False)["level"] == 1
        assert tx.fetch_doc(grand, False)["level"] == 2
        with pytest.raises(ValueError):
            tx.add_doc("orphan", 999, None, None)
        # exact on-disk BLOB bytes: little-endian f32
        rows = tx._debug_embeddings()
        assert rows[0][1] == b"\x00\x00\x80?\x00\x00\x00\x00\x00\x00\x00\x00"
        # raw docs table shape
        docs = tx._debug_docs()
        assert docs[0] == (root, None, 0, "root", 1, None)
        assert docs[1][5] == '{"k": 1}'
    db.close()


def test_fetch_doc_embedding_flag_semantics(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        with_emb = tx.add_doc("a", None, None, embedding_to_bytes([0.0, 1.0]))
        without = tx.add_doc("b", None, None, None)
        assert tx.fetch_doc(with_emb, False)["embedding"] is True
        assert tx.fetch_doc(without, False)["embedding"] is False
        assert tx.fetch_doc(with_emb, True)["embedding"] == [0.0, 1.0]
        assert tx.fetch_doc(without, True)["embedding"] is None
        with pytest.raises(KeyError):
            tx.fetch_doc(999, False)
    db.close()


def test_del_doc_rules_and_cascade(db_path):
    db = Database(db_path)
    emb = embedding_to_bytes([1.0])
    with db.transaction() as tx:
        a = tx.add_doc("a", None, None, emb)
        b = tx.add_doc("b", a, None, emb)
        r = tx.add_doc("r", None, None, None)
        tx.add_edge(a, b, r, 0.5)
        with pytest.raises(RuntimeError):
            tx.del_doc(a)  # has a child
        tx.del_doc(b)  # cascades: edge gone, embedding row gone
        assert tx.count_edges() == 0
        assert tx.count_embeddings() == 1
        with pytest.raises(KeyError):
            tx.del_doc(999)
    db.close()


def test_update_doc_meta(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        d = tx.add_doc("a", None, {"x": 1}, None)
        tx.update_doc_meta(d, {"y": [1, 2]})
        assert tx.fetch_doc(d, False)["meta"] == {"y": [1, 2]}
        tx.update_doc_meta(d, None)
        assert tx.fetch_doc(d, False)["meta"] is None
        with pytest.raises(KeyError):
            tx.update_doc_meta(999, {})
    db.close()


def test_set_doc_embedding_replaces_old_row(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        d = tx.add_doc("a", None, None, embedding_to_bytes([1.0]))
        tx.set_doc_embedding(d, embedding_to_bytes([2.0]))
        assert tx.count_embeddings() == 1
        assert tx.fetch_doc(d, True)["embedding"] == [2.0]
        tx.set_doc_embedding(d, None)
        assert tx.count_embeddings() == 0
        assert tx.fetch_doc(d, True)["embedding"] is None
    db.close()


def test_build_embeddings_matrix(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        ids = []
        for i in range(5):
            vec = [float(i), float(i + 1), 0.0]
            ids.append(tx.add_doc(f"d{i}", None, None, embedding_to_bytes(vec)))
        tx.add_doc("no-emb", None, None, None)
        matrix, emb_ids = tx.build_embeddings_matrix()
        assert matrix.shape == (5, 3)
        assert matrix.dtype == np.float32
        np.testing.assert_array_equal(matrix[:, 0], np.arange(5, dtype=np.float32))
        assert len(emb_ids) == 5
        # row -> emb id -> doc id round trip
        for row, emb_id in enumerate(emb_ids):
            doc = tx.fetch_doc(tx.doc_id_for_emb_id(int(emb_id)), False)
            assert doc["text"] == f"d{row}"
    db.close()


def test_build_embeddings_matrix_empty(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        matrix, emb_ids = tx.build_embeddings_matrix()
        assert matrix.shape[0] == 0
        assert len(emb_ids) == 0
    db.close()


def test_edges_uniqueness_and_networkx(db_path):
    import networkx as nx

    db = Database(db_path)
    with db.transaction() as tx:
        a = tx.add_doc("a", None, None, None)
        b = tx.add_doc("b", None, None, None)
        r = tx.add_doc("r", None, None, None)
        e1 = tx.add_edge(a, b, r, None)
        with pytest.raises(RuntimeError):
            tx.add_edge(a, b, r, 1.0)  # duplicate triplet
        assert tx.count_edges() == 1

        # undirected-only graph
        g = tx.build_networkx_graph()
        assert isinstance(g, nx.MultiGraph)
        g = tx.build_networkx_graph(multigraph=False)
        assert isinstance(g, nx.Graph)

        # adding a directed edge flips the graph directed, and the
        # undirected edge gets an explicit back-edge
        tx.add_directed_edge(b, a, r, 2.0)
        g = tx.build_networkx_graph(multigraph=False)
        assert isinstance(g, nx.DiGraph)
        assert g.has_edge(a, b) and g.has_edge(b, a)
        assert g[b][a]["weight"] == 2.0
        assert g[a][b]["edge_doc"] == r

        tx.del_edge(e1)
        assert tx.count_edges() == 1
        with pytest.raises(KeyError):
            tx.del_edge(e1)
    db.close()


def test_transaction_rollback(db_path):
    db = Database(db_path)
    with pytest.raises(RuntimeError, match="boom"):
        with db.transaction() as tx:
            tx.add_doc("doomed", None, None, None)
            raise RuntimeError("boom")
    with db.transaction() as tx:
        assert tx.count_docs() == 0
    db.close()


def test_schema_version_checked(db_path):
    db = Database(db_path)
    db.check_or_set_schema_version()
    with db.transaction() as tx:
        assert tx.get_key("schema_version") == SCHEMA_VERSION
        assert "created_datetime" in tx._debug_keyval()
        tx.set_key("schema_version", 999)
    db.close()
    db = Database(db_path)
    with pytest.raises(RuntimeError, match="schema version"):
        db.check_or_set_schema_version()
    db.close()


def test_matrix_version_and_fingerprint(db_path):
    db = Database(db_path)
    with db.transaction() as tx:
        assert tx.matrix_version() == 0
        assert tx.bump_matrix_version() == 1
        assert tx.bump_matrix_version() == 2
        assert tx.embeddings_fingerprint() == (0, 0, 0)
        tx.add_doc("a", None, None, embedding_to_bytes([1.0]))
        count, max_id, gen = tx.embeddings_fingerprint()
        assert (count, max_id, gen) == (1, 1, 1)
    db.close()


def test_embeddings_generation_counts_every_write(db_path):
    """The trigger-maintained generation moves on ANY embeddings write —
    including a DELETE+INSERT pair that reuses the max rowid, which leaves
    (count, max id) unchanged (SQLite hands back the freed max rowid)."""
    db = Database(db_path)
    with db.transaction() as tx:
        for name in ("a", "b", "c"):
            tx.add_doc(name, None, None, embedding_to_bytes([1.0]))
        count, max_id, gen = tx.embeddings_fingerprint()
    assert (count, max_id, gen) == (3, 3, 3)

    # re-embed the max-id doc the way the reference does: DELETE + INSERT
    with db.transaction() as tx:
        doc_id = tx.doc_id_for_emb_id(3)
        tx._conn.execute("UPDATE docs SET embedding = NULL WHERE id = ?;", (doc_id,))
        tx._conn.execute("DELETE FROM embeddings WHERE id = 3;")
        tx.set_doc_embedding(doc_id, embedding_to_bytes([-1.0]))
        count, max_id, gen = tx.embeddings_fingerprint()
    assert (count, max_id) == (3, 3)  # invisible to count/max...
    assert gen == 5  # ...but not to the generation counter
    db.close()


def test_generation_fires_for_foreign_connections(db_path):
    """Triggers live in the database file, so a writer that knows nothing
    about this framework still bumps the generation."""
    import sqlite3

    db = Database(db_path)
    with db.transaction() as tx:
        tx.add_doc("a", None, None, embedding_to_bytes([1.0]))

    foreign = sqlite3.connect(db_path)  # raw connection, no framework code
    foreign.execute("UPDATE embeddings SET embedding = ? WHERE id = 1;",
                    (embedding_to_bytes([0.5]),))
    foreign.commit()
    foreign.close()

    with db.transaction() as tx:
        assert tx.embeddings_generation() == 2
    db.close()


def test_emb_count_stays_exact_without_full_scans(db_path):
    """The trigger-maintained count (what lets the fingerprint skip the
    O(n) COUNT(*) on every cold open) tracks adds AND deletes exactly,
    for our own writes and for raw foreign connections."""
    import sqlite3

    db = Database(db_path)
    with db.transaction() as tx:
        for name in ("a", "b", "c", "d"):
            tx.add_doc(name, None, None, embedding_to_bytes([1.0]))
        assert tx.embeddings_fingerprint()[0] == 4

    # foreign writer: triggers live in the file, so the count follows
    foreign = sqlite3.connect(db_path)
    foreign.execute("UPDATE docs SET embedding = NULL WHERE id = 2;")
    foreign.execute("DELETE FROM embeddings WHERE id = 2;")
    foreign.execute(
        "INSERT INTO embeddings (embedding) VALUES (?);",
        (embedding_to_bytes([0.5]),),
    )
    foreign.commit()
    foreign.close()

    with db.transaction() as tx:
        count = tx.embeddings_fingerprint()[0]
        (true_count,) = tx._conn.execute(
            "SELECT COUNT(*) FROM embeddings;"
        ).fetchone()
    assert count == true_count == 4
    db.close()


def test_emb_count_seeded_for_preexisting_stores(db_path):
    """Stores that predate the counter (reference-created, or written by
    an older version of this package) get the key seeded at open with the
    TRUE row count — and a rolled-back seed transaction can't leave a
    wrong value behind."""
    import sqlite3

    db = Database(db_path)
    with db.transaction() as tx:
        for name in ("a", "b", "c"):
            tx.add_doc(name, None, None, embedding_to_bytes([1.0]))
    db.close()

    # simulate a pre-counter store: drop the key (and the triggers, as a
    # reference-created file would lack them)
    raw = sqlite3.connect(db_path)
    raw.execute("DELETE FROM keyval WHERE key = 'svs_tpu_emb_count';")
    raw.execute("DROP TRIGGER svs_tpu_emb_cnt_insert;")
    raw.execute("DROP TRIGGER svs_tpu_emb_cnt_delete;")
    raw.execute(
        "INSERT INTO embeddings (embedding) VALUES (?);",
        (embedding_to_bytes([0.25]),),
    )
    raw.commit()
    raw.close()

    db2 = Database(db_path)  # re-open: triggers re-created, count seeded
    with db2.transaction() as tx:
        assert tx.embeddings_fingerprint()[0] == 4
        tx.add_doc("e", None, None, embedding_to_bytes([1.0]))
        assert tx.embeddings_fingerprint()[0] == 5
    db2.close()


def test_open_readonly_media_existing_db(tmp_path):
    """A pre-existing database on read-only media must open (the trigger
    DDL is a write, but nothing can write the file anyway)."""
    import os
    from svs_tpu.store import Database, embedding_to_bytes

    p = tmp_path / "ro.sqlite"
    db = Database(p)
    with db.transaction() as tx:
        tx.add_doc("a", None, None, embedding_to_bytes([1.0, 0.0]))
    db.close()
    os.chmod(p, 0o444)
    try:
        db2 = Database(p)
        with db2.transaction() as tx:
            assert tx.count_docs() == 1
            m, ids = tx.build_embeddings_matrix()
            assert m.shape == (1, 2)
        db2.close()
    finally:
        os.chmod(p, 0o644)


def test_add_docs_bulk_matches_row_at_a_time(db_path):
    """The executemany bulk-load fast path must produce the same store
    state as row-at-a-time add_doc (ids, blobs, docs linkage)."""
    import numpy as np

    from svs_tpu.store.blob import matrix_rows_to_blobs
    from svs_tpu.store.db import Database

    rng = np.random.default_rng(3)
    m = rng.standard_normal((50, 8)).astype(np.float32)
    blobs = matrix_rows_to_blobs(m)

    db = Database(db_path)
    with db.transaction() as tx:
        tx.add_docs_bulk([f"b{i}" for i in range(50)], blobs)
    with db.transaction() as tx:
        matrix, ids = tx.build_embeddings_matrix()
        assert matrix.shape == (50, 8)
        np.testing.assert_array_equal(matrix, m)
        doc = tx.fetch_docs_by_emb_ids([int(ids[7])])[int(ids[7])]
        assert doc["text"] == "b7"
        assert tx.count_docs() == 50
        # interleaves with the scalar path without id collisions
        tx.add_doc("scalar", None, None, blobs[0])
        assert tx.count_docs() == 51
    db.close()
