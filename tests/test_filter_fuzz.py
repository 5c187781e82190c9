"""Model-based fuzz for FILTERED retrieval: random mutations (adds,
deletes, meta updates) interleaved with filtered retrieves, where every
retrieve runs three ways — the pre-filter fast path (``where=dict``),
the post-filter widen ladder (opaque callable), and a naive in-memory
oracle — and all three must agree exactly.  Catches subset-cache
staleness across mutations, meta-index invalidation bugs, gate-boundary
routing (``f <= n``, selectivity ceiling), SQL-vs-Python equality
divergence, and tie handling, in combinations example tests miss."""

import numpy as np
import pytest

from svs_tpu import KB
from svs_tpu.kb import meta_filter_predicate

DIM = 8

# Value pool exercising Python's equality quirks: bool/int/float
# equivalence, text-vs-number, null-vs-absent, non-scalars.
VALUES = ["a", "b", 1, 1.0, True, 0, False, None, "1", [1], {"x": 1}]
KEYS = ["k", "tag", "n"]


def _embedder():
    async def embed(texts):
        out = []
        for t in texts:
            seed = abs(hash(t)) % (2**32)
            v = np.random.default_rng(seed).standard_normal(DIM)
            v /= np.linalg.norm(v)
            out.append([float(x) for x in v])
        return out

    return embed


def _sync_vec(text):
    s = abs(hash(text)) % (2**32)
    v = np.random.default_rng(s).standard_normal(DIM)
    return v / np.linalg.norm(v)


def _rand_meta(rng):
    if rng.random() < 0.15:
        return None
    meta = {}
    for key in KEYS:
        if rng.random() < 0.6:
            meta[key] = VALUES[int(rng.integers(0, len(VALUES)))]
    return meta or None


def _rand_filter(rng):
    flt = {}
    for _ in range(1 if rng.random() < 0.7 else 2):
        key = KEYS[int(rng.integers(0, len(KEYS)))]
        flt[key] = VALUES[int(rng.integers(0, len(VALUES)))]
    return flt


def _oracle(model, qvec, n, flt):
    pred = meta_filter_predicate(flt)
    scored = [
        (float(np.dot(vec, qvec)), doc_id)
        for doc_id, (vec, meta) in model.items()
        if vec is not None and pred({"meta": meta})
    ]
    scored.sort(key=lambda t: (-t[0], -t[1]))
    return [(i, s) for s, i in scored[:n]]


@pytest.mark.parametrize("seed", [3, 41])
def test_filtered_retrieval_fuzz(db_path, seed):
    rng = np.random.default_rng(seed)
    kb = KB(db_path, _embedder(), precision="f32", rescore=True,
            force_fresh_db=True)
    model = {}  # id -> (vec or None, meta)
    next_text = 0

    for step in range(40):
        op = rng.choice(
            ["add", "del", "meta", "retrieve", "retrieve", "retrieve"]
        )
        if op == "add" or not model:
            with kb.bulk_add_docs() as add:
                for _ in range(int(rng.integers(1, 5))):
                    text = f"doc-{next_text}"
                    next_text += 1
                    meta = _rand_meta(rng)
                    no_emb = bool(rng.random() < 0.1)
                    doc_id = add(text, meta=meta, no_embedding=no_emb)
                    model[doc_id] = (
                        None if no_emb else _sync_vec(text), meta,
                    )
        elif op == "del":
            victim = int(rng.choice(list(model)))
            with kb.bulk_del_docs() as dd:
                dd(victim)
            del model[victim]
        elif op == "meta":
            doc_id = int(rng.choice(list(model)))
            new_meta = _rand_meta(rng)
            with kb.bulk_query_docs() as q:
                q.update_doc_meta(doc_id, new_meta)
            model[doc_id] = (model[doc_id][0], new_meta)
        else:
            qtext = f"doc-{int(rng.integers(0, max(next_text, 1)))}"
            n = int(rng.integers(1, 6))
            flt = _rand_filter(rng)
            pred = meta_filter_predicate(flt)
            fast = kb.retrieve(qtext, n, where=flt)
            ladder = kb.retrieve(qtext, n, where=lambda d: pred(d))
            want = _oracle(model, _sync_vec(qtext), n, flt)
            key = lambda hits: [(h["doc"]["id"], h["score"]) for h in hits]
            assert [i for i, _ in key(fast)] == [i for i, _ in want], (
                step, flt,
            )
            assert key(fast) == key(ladder), (step, flt)
            for (_, got_s), (_, want_s) in zip(key(fast), want):
                assert got_s == pytest.approx(want_s, abs=1e-5)

    kb.close()
