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
