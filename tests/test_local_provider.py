"""Local (on-device Flax encoder) embedding provider tests.

A tiny randomly-initialized BERT checkpoint is written to disk once per
session and loaded through the real ``transformers`` Flax path — the
same code that loads a production checkpoint — so these cover
tokenization, bucketed padding, jitted forward, pooling, normalization,
params round-trip through a database, and the full KB flow, all with no
network.  (The reference has no local provider at all:
``svs/embeddings/__init__.py:19-31``.)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("transformers")

from svs_tpu import KB, make_embeddings_func
from svs_tpu.embeddings import make_local_embeddings_func
from svs_tpu.embeddings.local import _buckets

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the a cat dog sat mat on ran red "
    "blue fast slow happy sad big small jumps sleeps eats barks meows"
).split()


@pytest.fixture(scope="session")
def tiny_checkpoint(tmp_path_factory) -> Path:
    from transformers import BertConfig, BertTokenizer, FlaxBertModel

    path = tmp_path_factory.mktemp("tiny_bert")
    vocab_file = path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    tokenizer = BertTokenizer(str(vocab_file), do_lower_case=True)
    tokenizer.save_pretrained(str(path))
    config = BertConfig(
        vocab_size=len(VOCAB),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    model = FlaxBertModel(config, seed=7)
    model.save_pretrained(str(path))
    return path


def test_bucket_ladder():
    assert _buckets(1) == [1]
    assert _buckets(8) == [1, 2, 4, 8]
    assert _buckets(6) == [1, 2, 4, 6]
    # the last bucket always fits a full batch, however large
    assert _buckets(50_000)[-1] == 50_000


def test_untrusted_db_params_refuse_hub_models(monkeypatch):
    """Params from an untrusted database may not trigger a hub
    download; an existing local directory or an explicit env opt-in
    is required (a trusted/explicit call is never gated)."""
    hub = {"provider": "local", "model": "someone/huge-model"}
    monkeypatch.delenv("SVS_TPU_ALLOW_HUB_MODELS", raising=False)
    with pytest.raises(RuntimeError, match="SVS_TPU_ALLOW_HUB_MODELS"):
        make_embeddings_func(dict(hub), trusted=False)
    # opt-in: factory returns (lazily — nothing downloads until use)
    monkeypatch.setenv("SVS_TPU_ALLOW_HUB_MODELS", "1")
    f = make_embeddings_func(dict(hub), trusted=False)
    assert f.__embedding_func_params__["model"] == "someone/huge-model"
    # trusted (caller-provided) params are never gated
    monkeypatch.delenv("SVS_TPU_ALLOW_HUB_MODELS")
    g = make_embeddings_func(dict(hub))
    assert g.__embedding_func_params__["provider"] == "local"


def test_result_cache_lives_on_the_encoder(tiny_checkpoint):
    """Dropping the provider drops the cache and the loaded weights —
    nothing module-level pins them."""
    import gc
    import weakref

    from svs_tpu.embeddings.local import _LocalEncoder

    f = make_local_embeddings_func(
        str(tiny_checkpoint), max_length=16, compute_dtype="float32"
    )
    enc = f.__closure__  # the factory closes over the encoder
    refs = [
        weakref.ref(c.cell_contents)
        for c in (enc or [])
        if isinstance(c.cell_contents, _LocalEncoder)
    ]
    assert len(refs) == 1
    del f, enc
    gc.collect()
    assert refs[0]() is None


def test_factory_validation(tiny_checkpoint):
    with pytest.raises(ValueError, match="pooling"):
        make_local_embeddings_func(str(tiny_checkpoint), pooling="max")
    with pytest.raises(ValueError, match="compute_dtype"):
        make_local_embeddings_func(
            str(tiny_checkpoint), compute_dtype="float16"
        )
    with pytest.raises(ValueError, match="max_length"):
        make_local_embeddings_func(str(tiny_checkpoint), max_length=0)
    with pytest.raises(ValueError, match="batch_size"):
        make_local_embeddings_func(str(tiny_checkpoint), batch_size=0)


def test_param_tag_and_factory_roundtrip(tiny_checkpoint):
    f = make_local_embeddings_func(
        str(tiny_checkpoint), pooling="cls", max_length=16,
        compute_dtype="float32",
    )
    params = f.__embedding_func_params__
    assert params == {
        "provider": "local",
        "model": str(tiny_checkpoint),
        "pooling": "cls",
        "max_length": 16,
        "compute_dtype": "float32",
        "normalize": True,
    }
    # a KB reopened from disk rebuilds the function from these params
    g = make_embeddings_func(dict(params))
    assert g.__embedding_func_params__ == params


async def test_embeddings_unit_norm_and_deterministic(tiny_checkpoint):
    f = make_local_embeddings_func(
        str(tiny_checkpoint), max_length=16, compute_dtype="float32"
    )
    texts = ["the cat sat", "a dog ran fast", "red mat"]
    out = await f(texts)
    assert len(out) == 3
    m = np.asarray(out, dtype=np.float32)
    assert m.shape == (3, 32)
    np.testing.assert_allclose(
        np.linalg.norm(m, axis=1), 1.0, atol=1e-5
    )
    # distinct texts embed differently; repeat calls are identical
    assert not np.allclose(m[0], m[1])
    again = np.asarray(await f(texts), dtype=np.float32)
    np.testing.assert_array_equal(m, again)
    assert await f([]) == []


async def test_batch_invariance_across_buckets(tiny_checkpoint):
    """One text embeds identically alone (bucket 1), co-batched
    (bucket 4), and split across internal batches (batch_size 2)."""
    texts = ["the cat sat", "a dog ran", "red mat", "blue dog"]
    f1 = make_local_embeddings_func(
        str(tiny_checkpoint), max_length=16, compute_dtype="float32"
    )
    solo = np.asarray(await f1(["the cat sat"]), np.float32)
    batched = np.asarray(await f1(texts), np.float32)
    np.testing.assert_allclose(solo[0], batched[0], atol=2e-6)
    f2 = make_local_embeddings_func(
        str(tiny_checkpoint), max_length=16, compute_dtype="float32",
        batch_size=2,
    )
    split = np.asarray(await f2(texts), np.float32)
    np.testing.assert_allclose(batched, split, atol=2e-6)


async def test_pooling_modes_differ(tiny_checkpoint):
    fm = make_local_embeddings_func(
        str(tiny_checkpoint), max_length=16, compute_dtype="float32"
    )
    fc = make_local_embeddings_func(
        str(tiny_checkpoint), pooling="cls", max_length=16,
        compute_dtype="float32",
    )
    (vm,) = await fm(["the cat sat on the mat"])
    (vc,) = await fc(["the cat sat on the mat"])
    assert not np.allclose(vm, vc)


def test_kb_end_to_end_with_local_provider(tiny_checkpoint, tmp_path):
    """Build a KB with the local provider, retrieve, close, reopen with
    NO embedding function (rebuilt from persisted params), retrieve
    again — identical results."""
    db = tmp_path / "local_kb.sqlite"
    f = make_local_embeddings_func(
        str(tiny_checkpoint), max_length=16, compute_dtype="float32"
    )
    kb = KB(db, f)
    docs = [
        "the cat sat on the mat",
        "a dog ran fast",
        "the dog barks",
        "a happy cat meows",
        "red and blue",
    ]
    with kb.bulk_add_docs() as add_doc:
        for d in docs:
            add_doc(d)
    first = kb.retrieve("cat sleeps", n=3)
    assert len(first) == 3
    assert all(isinstance(r["score"], float) for r in first)
    kb.close()

    kb2 = KB(db)  # no func passed: rebuilt from the stored params
    second = kb2.retrieve("cat sleeps", n=3)
    assert [r["doc"]["text"] for r in second] == [
        r["doc"]["text"] for r in first
    ]
    np.testing.assert_allclose(
        [r["score"] for r in second],
        [r["score"] for r in first],
        atol=1e-6,
    )
    kb2.close()
