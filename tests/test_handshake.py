"""Open-time embedding-function handshake: all four (ctor, DB) cases,
including every warn path (caplog-asserted — the reference tests these
override warnings, ``svs/kb.py:896-922``)."""

import logging

import pytest

from svs_tpu import KB, make_mock_embeddings_func


def _tagged(tag):
    async def embed(texts):
        return [[1.0, 0.0, 0.0] for _ in texts]

    embed.__embedding_func_params__ = {"provider": "mock", "tag": tag}
    return embed


def _untagged():
    async def embed(texts):
        return [[1.0, 0.0, 0.0] for _ in texts]

    return embed


def test_ctor_vs_db_mismatch_warns_ctor_wins(db_path, caplog):
    kb = KB(db_path, _tagged("a"), force_fresh_db=True)
    with kb.bulk_add_docs() as add:
        add("x")
    kb.close()

    with caplog.at_level(logging.WARNING, logger="svs_tpu.kb"):
        kb2 = KB(db_path, _tagged("b"))
    msg = "\n".join(r.getMessage() for r in caplog.records)
    assert "overriding the embedding function" in msg
    assert "'tag': 'b'" in msg and "'tag': 'a'" in msg  # both sides named
    kb2.close()


def test_non_introspectable_override_warns(db_path, caplog):
    kb = KB(db_path, make_mock_embeddings_func(), force_fresh_db=True)
    kb.close()
    with caplog.at_level(logging.WARNING, logger="svs_tpu.kb"):
        kb2 = KB(db_path, _untagged())
    msg = "\n".join(r.getMessage() for r in caplog.records)
    assert "*unknown params*" in msg
    kb2.close()


def test_non_storable_func_on_fresh_db_warns(db_path, caplog):
    with caplog.at_level(logging.WARNING, logger="svs_tpu.kb"):
        kb = KB(db_path, _untagged(), force_fresh_db=True)
    msg = "\n".join(r.getMessage() for r in caplog.records)
    assert "Cannot store this non-standard embeddings function" in msg
    kb.close()
    # ...and a later open with no function at all must fail loudly
    with pytest.raises(RuntimeError, match="No embedding function"):
        KB(db_path)


def test_matching_params_no_warning(db_path, caplog):
    kb = KB(db_path, _tagged("same"), force_fresh_db=True)
    kb.close()
    with caplog.at_level(logging.WARNING, logger="svs_tpu.kb"):
        kb2 = KB(db_path, _tagged("same"))
    assert not [r for r in caplog.records if "overriding" in r.getMessage()]
    kb2.close()
