"""Incremental-delete engine path: deletes compact the packed matrix in
place (live tail rows swap into the deleted slots, ``n_valid`` shrinks)
instead of paying a full BLOB rescan — the delete-side completion of the
append fast path (reference invalidates wholesale: ``svs/kb.py:861-864``)."""

import logging

import numpy as np
import pytest

from svs_tpu.engine import RetrievalEngine
from svs_tpu.store import Database, embedding_to_bytes
from svs_tpu.store.tx import Tx
from svs_tpu.utils.topk_np import top_k_numpy


def _fill(db_path, vectors, prefix="d"):
    db = Database(db_path)
    with db.transaction() as tx:
        for i, v in enumerate(vectors):
            tx.add_doc(
                f"{prefix}{i}", None, None,
                embedding_to_bytes(list(map(float, v))),
            )
        tx.bump_matrix_version()
    return db


def _delete_emb_rows(db, corpus, pack_rows):
    """Delete the docs whose embeddings sit at the given pack rows."""
    ids = [int(corpus.emb_ids[r]) for r in pack_rows]
    with db.transaction() as tx:
        for emb_id in ids:
            tx.del_doc(tx.doc_id_for_emb_id(emb_id))
        tx.bump_matrix_version()
    return ids


def _boom(monkeypatch):
    def boom(self):
        raise AssertionError("full repack should not happen")

    monkeypatch.setattr(Tx, "build_embeddings_matrix", boom)


@pytest.mark.parametrize("precision", ["f32", "bf16", "int8"])
def test_incremental_delete_no_full_repack(
    db_path, unit_rows, precision, monkeypatch
):
    """Deleting a scattered handful of docs (head, middle run, tail, the
    max-id row) compacts the pack without a rescan; every surviving row's
    device bytes (and int8 scale) are bit-identical to its original."""
    m = unit_rows(300, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision=precision)
    c1 = eng.ensure_fresh(db)
    d1 = np.asarray(c1.data)
    s1 = np.asarray(c1.row_scales) if c1.row_scales is not None else None

    doomed = [0, 150, 151, 152, 298, 299]  # includes the max-id embedding
    _delete_emb_rows(db, c1, doomed)

    _boom(monkeypatch)
    c2 = eng.ensure_fresh(db)
    assert c2.n_valid == 294
    assert c2.data.shape == c1.data.shape  # capacity kept, boundary moved

    survivors = np.delete(c1.emb_ids, doomed)
    assert set(map(int, c2.emb_ids)) == set(map(int, survivors))

    d2 = np.asarray(c2.data)
    s2 = np.asarray(c2.row_scales) if c2.row_scales is not None else None
    old_row = {int(e): r for r, e in enumerate(c1.emb_ids)}
    for r, emb_id in enumerate(c2.emb_ids):
        np.testing.assert_array_equal(d2[r], d1[old_row[int(emb_id)]])
        if s2 is not None:
            assert s2[r] == s1[old_row[int(emb_id)]]

    # retrieval parity vs a NumPy oracle over the survivors
    keep_rows = np.delete(np.arange(300), doomed)
    full = m[keep_rows]
    q = unit_rows(1, 8)[0]
    vals, rows = eng.topk(c2, q, eng.candidate_count(5))
    emb_ids = c2.emb_ids[rows[0]]
    with db.transaction() as tx:
        exact = tx.fetch_embedding_rows(emb_ids) @ q
    got = [int(emb_ids[i]) for _, i in top_k_numpy(exact, 5)]
    oracle = [
        int(c1.emb_ids[keep_rows[i]]) for _, i in top_k_numpy(full @ q, 5)
    ]
    assert got == oracle
    db.close()


def test_tail_delete_moves_nothing(db_path, unit_rows, monkeypatch):
    """Deleting only the most recently added docs is free: the device
    buffer is reused untouched, only ``n_valid`` shrinks."""
    m = unit_rows(40, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="f32")
    c1 = eng.ensure_fresh(db)
    _delete_emb_rows(db, c1, [37, 38, 39])
    _boom(monkeypatch)
    c2 = eng.ensure_fresh(db)
    assert c2.n_valid == 37
    assert c2.data is c1.data  # same device buffer, no row moves
    np.testing.assert_array_equal(c2.emb_ids, c1.emb_ids[:37])
    db.close()


def test_delete_then_append_both_incremental(
    db_path, unit_rows, monkeypatch
):
    """A delete followed by a later bulk add stays on the fast paths and
    keeps the f32 rescore cache coherent through its row map."""
    m = unit_rows(60, 16)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="bf16")
    c1 = eng.ensure_fresh(db)
    assert c1.host_f32 is not None

    _delete_emb_rows(db, c1, [2, 3, 59])
    _boom(monkeypatch)
    c2 = eng.ensure_fresh(db)
    assert c2.n_valid == 57 and c2.host_f32 is not None
    assert c2.host_row_map is not None  # compaction makes the map explicit

    extra = unit_rows(9, 16)
    with db.transaction() as tx:
        for i, v in enumerate(extra):
            tx.add_doc(
                f"x{i}", None, None, embedding_to_bytes(list(map(float, v)))
            )
        tx.bump_matrix_version()
    c3 = eng.ensure_fresh(db)
    assert c3.n_valid == 66

    # the mapped cache rows equal the store's exact f32 rows, pack order
    rows = c3.host_f32[c3.host_row_map]
    with db.transaction() as tx:
        fetched = tx.fetch_embedding_rows([int(e) for e in c3.emb_ids])
    np.testing.assert_array_equal(rows, fetched)
    db.close()


def test_rescore_stays_exact_after_delete(db_path, unit_rows, monkeypatch):
    """The verified-rescore pipeline (bf16 prescore -> f32 rescore through
    the re-pointed cache map) returns the exact oracle after compaction."""
    m = unit_rows(500, 24)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="bf16")
    c1 = eng.ensure_fresh(db)
    doomed = [5, 6, 7, 100, 497]
    _delete_emb_rows(db, c1, doomed)
    _boom(monkeypatch)
    c2 = eng.ensure_fresh(db)

    keep_rows = np.delete(np.arange(500), doomed)
    q = m[10:11]  # a surviving doc: its own vector must win
    vals, rows = eng.topk(c2, q[0], eng.candidate_count(10))
    emb_ids = c2.emb_ids[rows[0]]
    with db.transaction() as tx:
        exact = tx.fetch_embedding_rows(emb_ids) @ q[0]
    got = [int(emb_ids[i]) for _, i in top_k_numpy(exact, 10)]
    full = m[keep_rows]
    oracle = [
        int(c1.emb_ids[keep_rows[i]])
        for _, i in top_k_numpy(full @ q[0], 10)
    ]
    assert got == oracle
    assert got[0] == int(c1.emb_ids[10])
    db.close()


def test_deleted_docs_never_surface(db_path, unit_rows, monkeypatch, rng):
    """Fuzz: random delete rounds interleaved with retrieves — results
    always match the survivor oracle and never contain a deleted id."""
    m = unit_rows(200, 12)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="f32")
    c = eng.ensure_fresh(db)
    id_of = {orig: int(e) for orig, e in enumerate(c.emb_ids)}
    alive = list(range(200))
    all_deleted = set()
    patched = False
    for _ in range(4):
        pick = sorted(
            rng.choice(len(alive), size=7, replace=False).tolist(),
            reverse=True,
        )
        doomed_orig = [alive[i] for i in pick]
        for i in pick:
            del alive[i]
        with db.transaction() as tx:
            for orig in doomed_orig:
                tx.del_doc(tx.doc_id_for_emb_id(id_of[orig]))
                all_deleted.add(id_of[orig])
            tx.bump_matrix_version()
        if not patched:
            _boom(monkeypatch)
            patched = True
        c = eng.ensure_fresh(db)
        assert c.n_valid == len(alive)
        q = unit_rows(1, 12)[0]
        vals, rows = eng.topk(c, q, eng.candidate_count(8))
        emb_ids = c.emb_ids[rows[0]]
        assert not (set(map(int, emb_ids)) & all_deleted)
        with db.transaction() as tx:
            exact = tx.fetch_embedding_rows(emb_ids) @ q
        got = [int(emb_ids[i]) for _, i in top_k_numpy(exact, 8)]
        full = m[alive]
        oracle = [
            id_of[alive[i]] for _, i in top_k_numpy(full @ q, 8)
        ]
        assert got == oracle
    db.close()


def test_bulk_wipe_falls_back_to_repack(db_path, unit_rows):
    """Deleting at least half the pack declines the fast path (the repack
    reclaims the oversized buffer) but stays correct."""
    m = unit_rows(64, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="f32")
    c1 = eng.ensure_fresh(db)
    calls = []
    orig = Tx.build_embeddings_matrix

    def spy(self):
        calls.append(1)
        return orig(self)

    import unittest.mock as mock

    with mock.patch.object(Tx, "build_embeddings_matrix", spy):
        _delete_emb_rows(db, c1, list(range(32)))
        c2 = eng.ensure_fresh(db)
    assert calls  # full repack ran
    assert c2.n_valid == 32
    db.close()


def test_delete_everything_falls_back_to_repack(db_path, unit_rows):
    m = unit_rows(10, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="f32")
    c1 = eng.ensure_fresh(db)
    _delete_emb_rows(db, c1, list(range(10)))
    c2 = eng.ensure_fresh(db)
    assert c2.n_valid == 0
    db.close()


def test_mixed_delete_add_falls_back_to_repack(db_path, unit_rows):
    """One transaction deleting AND adding moves the generation counter
    past the pure-delete budget -> full repack (correctness first)."""
    m = unit_rows(30, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="f32")
    c1 = eng.ensure_fresh(db)
    calls = []
    orig = Tx.build_embeddings_matrix

    def spy(self):
        calls.append(1)
        return orig(self)

    import unittest.mock as mock

    with mock.patch.object(Tx, "build_embeddings_matrix", spy):
        with db.transaction() as tx:
            tx.del_doc(tx.doc_id_for_emb_id(int(c1.emb_ids[4])))
            tx.del_doc(tx.doc_id_for_emb_id(int(c1.emb_ids[5])))
            tx.add_doc("new", None, None, embedding_to_bytes([1.0] + [0.0] * 7))
            tx.bump_matrix_version()
        c2 = eng.ensure_fresh(db)
    assert calls
    assert c2.n_valid == 29
    db.close()


def test_delete_on_mesh_falls_back_to_repack(db_path, unit_rows):
    """Mesh-sharded packs skip compaction (resharding anyway) and repack."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    m = unit_rows(48, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="f32", mesh=mesh, data_axis="data")
    c1 = eng.ensure_fresh(db)
    _delete_emb_rows(db, c1, [3])
    c2 = eng.ensure_fresh(db)  # full repack path (no AssertionError setup)
    assert c2.n_valid == 47
    assert int(c1.emb_ids[3]) not in set(map(int, c2.emb_ids))
    db.close()


def test_sidecar_loaded_pack_compacts_incrementally(
    db_path, unit_rows, tmp_path, monkeypatch
):
    """Deletes on a sidecar-loaded corpus compact without a rescan; the
    mmap'd f32 cache is never written (rows re-pointed via the map), and
    the engine forgets the sidecar source so a publish rewrites it."""
    m = unit_rows(50, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="bf16")
    eng.ensure_fresh(db)
    side = tmp_path / "s.svsx"
    eng.write_sidecar(side)

    eng2 = RetrievalEngine(precision="bf16")
    c1 = eng2.ensure_fresh(db, sidecar_path=side)
    assert c1.host_f32 is not None
    _delete_emb_rows(db, c1, [0, 25])
    _boom(monkeypatch)
    c2 = eng2.ensure_fresh(db, sidecar_path=side)
    assert c2.n_valid == 48
    assert eng2._sidecar_source is None
    rows = (
        c2.host_f32
        if c2.host_row_map is None
        else c2.host_f32[c2.host_row_map]
    )
    with db.transaction() as tx:
        fetched = tx.fetch_embedding_rows([int(e) for e in c2.emb_ids])
    np.testing.assert_array_equal(rows, fetched)
    db.close()


def test_pack_event_counters(db_path, unit_rows):
    """``pack_events`` records how each freshness check was satisfied."""
    m = unit_rows(30, 8)
    db = _fill(db_path, m)
    eng = RetrievalEngine(precision="f32")
    c1 = eng.ensure_fresh(db)
    eng.ensure_fresh(db)  # token hit
    assert eng.pack_events["scan"] == 1 and eng.pack_events["reuse"] == 1

    with db.transaction() as tx:
        tx.add_doc("x", None, None, embedding_to_bytes([1.0] + [0.0] * 7))
        tx.bump_matrix_version()
    eng.ensure_fresh(db)
    _delete_emb_rows(db, c1, [3])
    eng.ensure_fresh(db)
    assert eng.pack_events["append"] == 1
    assert eng.pack_events["delete"] == 1
    assert eng.pack_events["scan"] == 1  # never rescanned
    db.close()


def test_kb_stats_expose_pack_events(db_path):
    from kb_helpers import make_onehot_embedder

    from svs_tpu import KB

    kb = KB(str(db_path), make_onehot_embedder())
    with kb.bulk_add_docs() as add_doc:
        for i in range(8):
            add_doc(f"vec:{i}")
    kb.retrieve("vec:1", 2)
    kb.retrieve("vec:2", 2)
    ev = kb.stats()["pack_events"]
    assert ev["scan"] == 1.0 and ev["reuse"] >= 1.0
    kb.close()


def test_kb_delete_uses_fast_path(db_path, caplog):
    """Facade-level: bulk_del_docs rides the compaction path and retrieval
    excludes the deleted doc."""
    from kb_helpers import make_onehot_embedder

    from svs_tpu import KB

    kb = KB(str(db_path), make_onehot_embedder())
    with kb.bulk_add_docs() as add_doc:
        ids = [add_doc(f"vec:{i}") for i in range(16)]
    kb.retrieve("vec:0", 3)  # packs
    with caplog.at_level(logging.INFO, logger="svs_tpu.engine.index"):
        with kb.bulk_del_docs() as del_doc:
            del_doc(ids[7])
        hits = kb.retrieve("vec:7", 5)
    assert any("incremental delete" in r.message for r in caplog.records)
    assert ids[7] not in [h["doc"]["id"] for h in hits]
    kb.close()
