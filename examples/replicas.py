"""Replica mode: multiply retrieval throughput across devices.

When the corpus FITS one chip, sharding it over a mesh buys nothing —
the right scale-out is replication: every device holds a full copy of
the pack and each query batch splits across them, so QPS scales
~linearly with devices while every query keeps single-chip latency
(`KB(replicas=N)`; the serving analog is `svs-tpu serve --replicas N`).

This demo builds a small KB, retrieves the same batch through a plain
single-device KB and a replicated one, verifies the results are
IDENTICAL (same docs, same scores, same tie ordering — the replica
contract), and prints the device fan-out.

Run:  python examples/replicas.py
(On CPU, JAX exposes one device unless XLA_FLAGS requests more; the
example forces 4 virtual devices so it works anywhere.)
"""

from __future__ import annotations

import os

# Demo portability: 4 virtual devices when running on CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

from svs_tpu import KB  # noqa: E402


def make_embedder(dim: int = 64):
    async def embed(texts):
        out = []
        for t in texts:
            v = [0.0] * dim
            v[hash_bucket(t, dim)] = 1.0
            out.append(v)
        return out

    embed.__embedding_func_params__ = {"provider": "mock"}
    return embed


def hash_bucket(text: str, dim: int) -> int:
    import zlib

    return zlib.crc32(text.encode()) % dim


def main() -> None:
    import jax

    devices = jax.devices()
    print(f"devices: {[str(d) for d in devices]}")

    texts = [f"note {i}: the quick brown fact #{i}" for i in range(200)]

    kb_solo = KB("replicas_solo.sqlite", make_embedder(), force_fresh_db=True)
    kb_rep = KB(
        "replicas_demo.sqlite",
        make_embedder(),
        force_fresh_db=True,
        replicas=min(4, len(devices)),
    )
    for kb in (kb_solo, kb_rep):
        with kb.bulk_add_docs() as add:
            for t in texts:
                add(t)

    queries = texts[:32]
    solo = kb_solo.retrieve_batch(queries, 3)
    rep = kb_rep.retrieve_batch(queries, 3)

    for s_hits, r_hits in zip(solo, rep):
        assert [h["doc"]["id"] for h in r_hits] == [
            h["doc"]["id"] for h in s_hits
        ]
        # device-rescored f32 scores can differ in the last ulp across
        # differently-shaped compiled programs (batch 32 vs the 8-query
        # replica slices); doc identity and ordering must be exact
        for hs, hr in zip(s_hits, r_hits):
            assert abs(hs["score"] - hr["score"]) <= 2e-6
    print(
        f"{len(queries)} queries through "
        f"{min(4, len(devices))} replicas == single chip "
        f"(docs, tie order exact; scores to 2e-6) -- verified"
    )
    eng = kb_rep.engine
    corpus = eng.corpus
    clones = [corpus, *(corpus.replica_clones or ())]
    homes = [tuple(str(d) for d in c.data.devices()) for c in clones]
    print("pack copies live on:", homes)

    kb_solo.close()
    kb_rep.close()


if __name__ == "__main__":
    main()
