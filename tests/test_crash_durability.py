"""Hard-crash (SIGKILL) durability: a process killed mid-transaction
must leave a store that reopens clean with the whole batch rolled back.

The existing rollback tests cover *exceptions* (the transaction object
unwinds); these cover the case where nothing unwinds — the process dies
with the SQLite journal mid-flight and recovery happens at the NEXT
open.  Reference behavior contract: one bulk context = one transaction,
atomic against any failure (``/root/reference/src/svs/kb.py:1017-1063``,
rollback at ``kb.py:804-821``).

The worker (``tests/crash_worker.py``) commits one baseline doc, then
parks inside an open bulk transaction (after the inserts, or half-way
through the embedding backfill) and announces ``PARKED``; the test
SIGKILLs it by exact pid and reopens the store in-process.
"""

from __future__ import annotations

import os
import signal
import sqlite3
import subprocess
import sys
import time
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "crash_worker.py"


def _run_and_kill(mode: str, db_path: Path) -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, str(WORKER), mode, str(db_path)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    try:
        deadline = time.monotonic() + 120
        line = ""
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if "PARKED" in line:
                break
            if not line and proc.poll() is not None:
                pytest.fail(f"worker exited rc={proc.returncode} before parking")
        else:
            pytest.fail("worker never parked")
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


@pytest.mark.parametrize("mode", ["mid_add", "mid_embed"])
def test_sigkill_mid_bulk_add_rolls_back_batch(tmp_path, mode):
    db_path = tmp_path / "crash.sqlite"
    _run_and_kill(mode, db_path)

    # A hot journal / -wal may exist; recovery happens at open.
    from svs_tpu import KB
    from svs_tpu.embeddings import make_mock_embeddings_func

    kb = KB(db_path, make_mock_embeddings_func())
    try:
        assert len(kb) == 1  # the committed baseline doc only
        with kb.bulk_query_docs() as q:
            docs = q.query_level(0)
        assert [d["text"] for d in docs] == ["baseline doc"]
        # The store must also be physically sound and writable again.
        with kb.bulk_add_docs() as add_doc:
            add_doc("post-recovery doc")
        assert len(kb) == 2
    finally:
        kb.close()

    conn = sqlite3.connect(str(db_path))
    try:
        assert conn.execute("PRAGMA integrity_check").fetchone()[0] == "ok"
        # No orphaned embedding rows from the killed backfill.
        n_emb = conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
        n_docs = conn.execute(
            "SELECT COUNT(*) FROM docs WHERE embedding IS NOT NULL"
        ).fetchone()[0]
        assert n_emb == n_docs == 2
    finally:
        conn.close()
