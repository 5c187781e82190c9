"""Model-based fuzz: random op sequences on a KB vs a naive in-memory
model.  Catches cross-op interaction bugs (level bookkeeping, cascade
deletes, retrieval freshness after mutations) that example-based tests
miss."""

import math

import numpy as np
import pytest

from svs_tpu import KB


def _embedder(dim=8):
    async def embed(texts):
        out = []
        for t in texts:
            seed = abs(hash(t)) % (2**32)
            v = np.random.default_rng(seed).standard_normal(dim)
            v /= np.linalg.norm(v)
            out.append([float(x) for x in v])
        return out

    return embed


class Model:
    """The naive, obviously-correct in-memory twin."""

    def __init__(self, embed_fn):
        self.docs = {}  # id -> (text, parent, level, vec or None)
        self.kv = {}
        self.embed = embed_fn

    def add(self, doc_id, text, parent, no_embedding):
        level = 0 if parent is None else self.docs[parent][2] + 1
        vec = None if no_embedding else self.embed(text)
        self.docs[doc_id] = (text, parent, level, vec)

    def can_delete(self, doc_id):
        return all(p != doc_id for _, p, _, _ in self.docs.values())

    def delete(self, doc_id):
        del self.docs[doc_id]

    def retrieve(self, qvec, n):
        scored = [
            (float(np.dot(vec, qvec)), doc_id)
            for doc_id, (_, _, _, vec) in self.docs.items()
            if vec is not None
        ]
        scored.sort(key=lambda t: (-t[0], -t[1]))
        return scored[:n]


@pytest.mark.parametrize("engine_mode", ["device", "host"])
@pytest.mark.parametrize("seed", [7, 99])
def test_random_operation_sequences(db_path, seed, engine_mode):
    rng = np.random.default_rng(seed)
    dim = 8

    def sync_vec(text):
        s = abs(hash(text)) % (2**32)
        v = np.random.default_rng(s).standard_normal(dim)
        return v / np.linalg.norm(v)

    kb = KB(db_path, _embedder(dim), precision="f32", rescore=True,
            force_fresh_db=True)
    if engine_mode == "host":
        # the automatic host-path dispatch must stay exact across every
        # mutation (adds invalidating packs, cascade deletes, meta
        # updates) — same oracle, forced host engine
        kb.engine.host_dispatch = "force"
    model = Model(sync_vec)
    next_text = 0

    for step in range(30):
        op = rng.choice(["add", "del", "retrieve", "kv", "meta"])
        if op == "add" or not model.docs:
            with kb.bulk_add_docs() as add:
                for _ in range(int(rng.integers(1, 4))):
                    text = f"doc-{next_text}"
                    next_text += 1
                    parent = None
                    if model.docs and rng.random() < 0.3:
                        parent = int(rng.choice(list(model.docs)))
                    no_emb = bool(rng.random() < 0.2)
                    doc_id = add(text, parent_id=parent, no_embedding=no_emb)
                    model.add(doc_id, text, parent, no_emb)
        elif op == "del":
            deletable = [d for d in model.docs if model.can_delete(d)]
            if deletable:
                victim = int(rng.choice(deletable))
                with kb.bulk_del_docs() as dd:
                    dd(victim)
                model.delete(victim)
        elif op == "retrieve":
            qtext = f"doc-{int(rng.integers(0, max(next_text, 1)))}"
            got = kb.retrieve(qtext, 3)
            want = model.retrieve(sync_vec(qtext), 3)
            assert [h["doc"]["id"] for h in got] == [i for _, i in want], step
            for hit, (score, _) in zip(got, want):
                assert hit["score"] == pytest.approx(score, abs=1e-5)
        elif op == "kv":
            key = f"k{int(rng.integers(0, 5))}"
            with kb.bulk_keyval_update() as kv:
                if rng.random() < 0.7:
                    kv[key] = int(rng.integers(0, 100))
                    model.kv[key] = kv[key]
                elif key in model.kv:
                    del kv[key]
                    del model.kv[key]
                assert sorted(kv.items()) == sorted(model.kv.items())
        else:  # meta + hierarchy checks
            with kb.bulk_query_docs() as q:
                assert q.count() == len(model.docs)
                if model.docs:
                    doc_id = int(rng.choice(list(model.docs)))
                    rec = q.query_doc(doc_id)
                    text, parent, level, vec = model.docs[doc_id]
                    assert rec["text"] == text
                    assert rec["parent_id"] == parent
                    assert rec["level"] == level
                    assert rec["embedding"] is (vec is not None)

    kb.close()
