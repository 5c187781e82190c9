"""Subprocess body for the hard-crash durability tests.

Opens a KB at ``sys.argv[2]``, commits one baseline doc, then enters a
``bulk_add_docs`` transaction and parks at a well-defined point so the
parent test can SIGKILL this process mid-transaction:

- mode ``mid_add``: parks after ``add_doc`` calls, before the context
  exits (transaction open, docs inserted but uncommitted)
- mode ``mid_embed``: parks inside the embedding call that runs on
  context exit (transaction open, docs inserted, embeddings half done —
  the reference's atomicity pledge: an exception OR a crash mid-embed
  must roll back every doc of the batch, ``svs/kb.py:1017-1063``)

The park is announced by printing ``PARKED`` on stdout; the parent kills
-9 on seeing it.  Nothing here ever commits the bulk transaction, so a
correct store shows exactly ONE doc on reopen.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from typing import List  # noqa: E402

from svs_tpu import KB  # noqa: E402


def main() -> None:
    mode, db_path = sys.argv[1], sys.argv[2]

    calls = 0

    async def embed(texts: List[str]) -> List[List[float]]:
        nonlocal calls
        calls += 1
        # Call 1: the baseline doc.  Call 2: the bulk backfill's first
        # chunk (200 embeddings written inside the open transaction).
        # Call 3: park — the batch is half-embedded at the kill.
        if calls >= 3 and mode == "mid_embed":
            print("PARKED", flush=True)
            time.sleep(120)
        return [[1.0, 0.0, 0.0] for _ in texts]

    embed.__embedding_func_params__ = {"provider": "mock"}  # type: ignore[attr-defined]

    kb = KB(db_path, embed)
    with kb.bulk_add_docs() as add_doc:
        add_doc("baseline doc")
    assert len(kb) == 1

    if mode == "mid_add":
        with kb.bulk_add_docs() as add_doc:
            for i in range(50):
                add_doc(f"uncommitted doc {i}")
            print("PARKED", flush=True)
            time.sleep(120)
    elif mode == "mid_embed":
        # > one embedding chunk, so the backfill calls embed() at least
        # twice and the second call parks with chunk 1 already written.
        from svs_tpu.kb import BULK_EMBEDDING_CHUNK_SIZE

        with kb.bulk_add_docs() as add_doc:
            for i in range(BULK_EMBEDDING_CHUNK_SIZE + 5):
                add_doc(f"uncommitted doc {i}")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
