"""Higher-level maintenance workflows over knowledge bases.

These correspond to flows the reference ships as notebooks
(``examples/dad_jokes/Re-embed Dad Jokes with Ollama.ipynb``): re-embedding
an existing KB with a different provider, and near-duplicate pruning via
pairwise similarity.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

from .kb import KB
from .types import DocumentId, EmbeddingFunc

log = logging.getLogger(__name__)


def reembed(
    src_path: Union[str, Path],
    dest_path: Union[str, Path],
    embedding_func: EmbeddingFunc,
    batch_docs: int = 2000,
) -> int:
    """Rebuild a knowledge base with a different embedding provider.

    Copies every document (hierarchy, meta), the graph, and the user KV
    store from ``src_path`` into a fresh KB at ``dest_path``, re-embedding
    all documents through ``embedding_func``.  Docs stored without an
    embedding stay embedding-less.  Returns the number of documents copied.
    """

    async def _read_only_embedder(texts: List[str]) -> List[List[float]]:
        raise RuntimeError("reembed never embeds through the source KB")

    # The source is only read; a dummy (non-introspectable, so it is never
    # persisted) satisfies open-time reconciliation even for KBs whose
    # provider params were never stored.
    src = KB(src_path, _read_only_embedder)
    dest = KB(dest_path, embedding_func, force_fresh_db=True)
    id_map: Dict[DocumentId, DocumentId] = {}
    try:
        # Documents: DFS preserves parent-before-child ordering.
        with src.bulk_query_docs() as query:
            docs = list(query.dfs_traversal())
        from .utils.chunks import chunkify

        count = 0
        for chunk in chunkify(docs, batch_docs):
            with dest.bulk_add_docs() as add:
                for doc in chunk:
                    parent = (
                        id_map[doc["parent_id"]]
                        if doc["parent_id"] is not None
                        else None
                    )
                    id_map[doc["id"]] = add(
                        doc["text"],
                        parent_id=parent,
                        meta=doc["meta"],
                        no_embedding=doc["embedding"] is False,
                    )
                    count += 1
            log.info("reembed: %d/%d documents", count, len(docs))

        # Graph edges copied row-by-row at the store level (a, b, r, w, d)
        # so the copy is faithful: a networkx round trip materializes each
        # undirected edge as two arcs whenever any directed edge exists,
        # which would double those rows and lose the undirected flag.
        assert src.db is not None
        with src.db.transaction() as tx:
            edge_rows = list(tx.iter_edges())
        if edge_rows:
            with dest.bulk_graph_update() as g:
                for a, b, r, w, directed in edge_rows:
                    if directed:
                        g.add_directed_edge(
                            id_map[a], id_map[b], id_map[r], weight=w
                        )
                    else:
                        g.add_edge(id_map[a], id_map[b], id_map[r], weight=w)

        # User key/value store.
        with src.bulk_keyval_update() as src_kv:
            items = list(src_kv.items())
        if items:
            with dest.bulk_keyval_update() as kv:
                for key, val in items:
                    kv[key] = val
        return count
    finally:
        src.close()
        dest.close(vacuum=True)


def find_near_duplicates(
    kb: KB,
    threshold: float = 0.9,
    max_pairs: int = 10_000,
) -> List[Tuple[float, DocumentId, DocumentId]]:
    """Document pairs with cosine similarity above ``threshold`` — the
    dedup/NSFW-filter flow of the reference's Dad Jokes notebook, running on
    the blocked device kernel instead of an O(n^2) host matrix."""
    pairs = kb.document_top_pairwise_scores(max_pairs)
    return [
        (score, d1["id"], d2["id"])
        for score, d1, d2 in pairs
        if score >= threshold
    ]


def selfcheck(
    path: Union[str, Path],
    queries: int = 8,
    n: int = 10,
    precision: str = "auto",
    seed: int = 0,
) -> Dict[str, object]:
    """Integrity audit of a knowledge base: store invariants, embedding
    integrity, sidecar freshness, and device-vs-oracle retrieval parity.

    An operational tool the reference has no equivalent of — after a
    migration, a partial download, or a foreign-writer session, one
    command answers "is this KB internally consistent, and does the
    device engine return exactly what a NumPy scan of the store says it
    should?".  Checks:

    - ``sqlite``: ``PRAGMA quick_check`` plus declared-FK dangling
      references (SQLite does not enforce FKs unless the pragma is on,
      and the reference relies on application logic —
      ``/root/reference/src/svs/kb.py:360-414``);
    - ``schema``: stored schema version matches (``kb.py:841-853``);
    - ``counts``: the trigger-maintained embeddings count agrees with
      ``COUNT(*)``; no orphan embedding rows (every delete cascades in
      the reference, ``kb.py:394-400``);
    - ``levels``: every child's level is parent.level + 1, roots are 0
      (the invariant of ``kb.py:292-305``);
    - ``embeddings``: every BLOB decodes to ``[dim]`` f32 and is
      unit-norm within the magnitude tolerance (``kb.py:55-58``);
    - ``sidecar``: a packed sidecar, when present, matches the store's
      current fingerprint (stale is reported but not a failure — the
      engine detects and rescans);
    - ``retrieval``: ``queries`` stored vectors are replayed through the
      FULL retrieval pipeline (pack, fused device kernels, verified
      rescore, hydration) and compared against an exact NumPy oracle
      over the scanned matrix — scores to 1e-5, ids exactly, with
      near-ties (within 2e-5) compared as sets.

    Scans the full embeddings table (O(n·d) host memory), so expect
    cold-start-scan cost on large stores.  Run against a quiesced KB —
    a concurrent writer between phases shows up as a parity failure.
    Returns ``{"ok": bool, "checks": {name: {"ok": bool, ...}}}``.
    """
    import asyncio
    import json as _json

    import numpy as np

    from .embeddings.base import MAGNITUDE_TOLERANCE
    from .engine.sidecar import sidecar_fingerprint, sidecar_path_for
    from .store.db import SCHEMA_VERSION, Database, _EMB_COUNT_KEY
    from .utils import resolve_to_local_uncompressed_file
    from .utils.topk_np import top_k_numpy

    try:
        asyncio.get_running_loop()
    except RuntimeError:
        local = asyncio.run(resolve_to_local_uncompressed_file(str(path)))
    else:
        # called from inside a running loop (notebook kernels): resolve on
        # a scratch loop thread, same pattern as the sync KB facade
        from .utils.aio import EventLoopThread

        lt = EventLoopThread("svs-tpu-selfcheck")
        try:
            local = lt.run(resolve_to_local_uncompressed_file(str(path)))
        finally:
            lt.stop()
    if not Path(local).exists():
        raise FileNotFoundError(local)

    checks: Dict[str, Dict[str, object]] = {}

    def record(name: str, ok: bool, **detail: object) -> None:
        checks[name] = {"ok": bool(ok), **detail}

    db = Database(local)
    try:
        with db.transaction() as tx:
            conn = tx._conn

            # -- sqlite structural integrity + dangling declared FKs
            (qc,) = conn.execute("PRAGMA quick_check;").fetchone()
            dangling_emb = conn.execute(
                "SELECT COUNT(*) FROM docs WHERE embedding IS NOT NULL "
                "AND embedding NOT IN (SELECT id FROM embeddings);"
            ).fetchone()[0]
            dangling_parent = conn.execute(
                "SELECT COUNT(*) FROM docs WHERE parent_id IS NOT NULL "
                "AND parent_id NOT IN (SELECT id FROM docs);"
            ).fetchone()[0]
            dangling_edge = conn.execute(
                "SELECT COUNT(*) FROM edges WHERE "
                "a NOT IN (SELECT id FROM docs) OR "
                "b NOT IN (SELECT id FROM docs) OR "
                "r NOT IN (SELECT id FROM docs);"
            ).fetchone()[0]
            record(
                "sqlite",
                qc == "ok"
                and not (dangling_emb or dangling_parent or dangling_edge),
                quick_check=qc,
                dangling_embedding_refs=dangling_emb,
                dangling_parent_refs=dangling_parent,
                dangling_edge_refs=dangling_edge,
            )

            # -- schema version
            try:
                version = int(tx.get_key("schema_version"))
            except KeyError:
                version = None
            record(
                "schema", version == SCHEMA_VERSION, stored=version,
                expected=SCHEMA_VERSION,
            )

            # -- trigger-maintained count vs COUNT(*); orphan embeddings
            true_count = tx.count_embeddings()
            row = conn.execute(
                "SELECT val FROM keyval WHERE key = ?;", (_EMB_COUNT_KEY,)
            ).fetchone()
            maintained = int(row[0]) if row is not None else None
            orphans = conn.execute(
                "SELECT COUNT(*) FROM embeddings WHERE id NOT IN "
                "(SELECT embedding FROM docs WHERE embedding IS NOT NULL);"
            ).fetchone()[0]
            record(
                "counts",
                (maintained is None or maintained == true_count)
                and orphans == 0,
                embeddings=true_count,
                maintained_count=maintained,
                orphan_embeddings=orphans,
            )

            # -- level derivation invariant
            bad_child = conn.execute(
                "SELECT COUNT(*) FROM docs d JOIN docs p "
                "ON d.parent_id = p.id WHERE d.level != p.level + 1;"
            ).fetchone()[0]
            bad_root = conn.execute(
                "SELECT COUNT(*) FROM docs "
                "WHERE parent_id IS NULL AND level != 0;"
            ).fetchone()[0]
            record(
                "levels", bad_child == 0 and bad_root == 0,
                bad_children=bad_child, bad_roots=bad_root,
            )

            # -- full scan: decodes every BLOB (shape errors raise) and
            # yields the oracle matrix
            matrix, emb_ids = tx.build_embeddings_matrix()
            if matrix.shape[1] > 0 and matrix.shape[0] > 0:
                norms = np.linalg.norm(matrix, axis=1)
                max_dev = float(np.abs(norms - 1.0).max())
            else:
                max_dev = 0.0
            record(
                "embeddings",
                max_dev <= MAGNITUDE_TOLERANCE,
                rows=int(matrix.shape[0]),
                dim=int(matrix.shape[1]),
                max_magnitude_deviation=max_dev,
                tolerance=MAGNITUDE_TOLERANCE,
            )

            # -- sidecar freshness (stale != failure: the engine rescans)
            fingerprint = [tx.matrix_version(), *tx.embeddings_fingerprint()]

        sc_path = sidecar_path_for(local)
        if not sc_path.exists():
            record("sidecar", True, status="absent")
        else:
            stored = sidecar_fingerprint(sc_path)
            fresh = stored == fingerprint
            record(
                "sidecar", stored is not None,
                status="fresh" if fresh else "stale",
                path=str(sc_path),
            )
    finally:
        db.close()

    # -- retrieval parity: replay stored vectors through the full KB
    # pipeline and compare with the NumPy oracle
    n_rows = int(matrix.shape[0])
    if n_rows == 0 or matrix.shape[1] == 0 or queries <= 0:
        record("retrieval", True, status="skipped (no embedded documents)")
    else:
        rng = np.random.default_rng(seed)
        q_count = min(int(queries), n_rows)
        sample = rng.choice(n_rows, size=q_count, replace=False)
        qvecs = np.ascontiguousarray(matrix[sample], dtype=np.float32)
        texts = [f"__selfcheck_{i}__" for i in range(q_count)]
        by_text = {t: qvecs[i] for i, t in enumerate(texts)}

        async def replay(batch: List[str]) -> List[List[float]]:
            return [by_text[t].tolist() for t in batch]

        k = min(int(n), n_rows)
        # Oracle headroom past k so a tie cluster straddling the cut is
        # fully visible for the set comparison below.
        k_wide = min(n_rows, k + 256)
        TIE = 2e-5

        # The replay embedder is deliberately ephemeral; the handshake's
        # "cannot store this function" warning is expected noise here and
        # would pollute every audit log — drop exactly that one record.
        kb_log = logging.getLogger("svs_tpu.kb")
        flt = logging.Filter()
        flt.filter = (  # type: ignore[method-assign]
            lambda rec: "Cannot store" not in rec.getMessage()
        )
        kb_log.addFilter(flt)
        try:
            kb = KB(local, replay, precision=precision)
        finally:
            kb_log.removeFilter(flt)
        try:
            if n_rows <= 1_000_000:
                doc_of_emb = {}
                with kb.db.transaction() as tx:  # type: ignore[union-attr]
                    for e in emb_ids:
                        try:
                            doc_of_emb[int(e)] = tx.doc_id_for_emb_id(int(e))
                        except KeyError:
                            # orphan embedding row: flagged by the counts
                            # check; parity falls back to score-only for it
                            doc_of_emb[int(e)] = None
            else:
                doc_of_emb = None
            try:
                hits = kb.retrieve_batch(texts, k)
            except Exception as exc:
                # an audit must not crash on the corruption it exists to
                # find (e.g. a retrievable orphan row failing hydration)
                record(
                    "retrieval", False,
                    error=f"{type(exc).__name__}: {exc}",
                )
                hits = None
        finally:
            kb.close()

        mismatches: List[Dict[str, object]] = []
        for qi in range(q_count if hits is not None else 0):
            scores = matrix @ qvecs[qi]
            oracle = top_k_numpy(scores, k_wide)
            got = hits[qi]
            if len(got) != k:
                mismatches.append({"query": qi, "returned": len(got)})
                continue
            # cluster the oracle by near-ties, then compare positionally
            pos = 0
            oi = 0
            ok_q = True
            while pos < k and ok_q:
                hi = oi
                while (
                    hi + 1 < len(oracle)
                    and oracle[hi][0] - oracle[hi + 1][0] <= TIE
                ):
                    hi += 1
                cluster = oracle[oi : hi + 1]
                want_docs = {
                    doc_of_emb[int(emb_ids[r])]
                    if doc_of_emb is not None
                    else None
                    for _, r in cluster
                }
                span = min(hi + 1, k)
                for p in range(pos, span):
                    hit = got[p]
                    # Within a multi-member tie cluster any ordering of the
                    # tied docs is legitimate, so the score check must use
                    # the cluster's own range at the TIE tolerance — a
                    # strict positional 1e-5 check would flag a reorder of
                    # two docs whose scores differ by (1e-5, TIE].  The
                    # strict check applies only to singleton clusters
                    # (i.e. across cluster boundaries).
                    if len(cluster) > 1:
                        score_ok = (
                            cluster[-1][0] - TIE
                            <= hit["score"]
                            <= cluster[0][0] + TIE
                        )
                    else:
                        score_ok = abs(hit["score"] - oracle[p][0]) <= 1e-5
                    if not score_ok:
                        mismatches.append(
                            {
                                "query": qi,
                                "rank": p,
                                "got_score": hit["score"],
                                "oracle_score": oracle[p][0],
                            }
                        )
                        ok_q = False
                        break
                    if (
                        doc_of_emb is not None
                        and hit["doc"]["id"] not in want_docs
                    ):
                        mismatches.append(
                            {
                                "query": qi,
                                "rank": p,
                                "got_doc": hit["doc"]["id"],
                            }
                        )
                        ok_q = False
                        break
                pos = span
                oi = hi + 1
        if hits is not None:
            # hits is None means retrieve_batch raised and the except
            # branch already recorded the failure — recording here would
            # overwrite it with a vacuous ok=True (zero comparisons ran).
            record(
                "retrieval",
                not mismatches,
                queries=q_count,
                n=k,
                precision=precision,
                mismatches=mismatches[:10],
            )

    ok = all(bool(c["ok"]) for c in checks.values())
    report: Dict[str, object] = {"ok": ok, "path": str(local), "checks": checks}
    log.info("selfcheck %s: %s", local, _json.dumps(report)[:500])
    return report
