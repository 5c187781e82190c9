"""On-disk compatibility with the reference implementation (Rhobota/svs).

These tests import the reference package itself (read-only mount) and
round-trip databases in both directions.  They are the executable proof of
the format guarantee documented in ``svs_tpu.store``.  Skipped when the
reference isn't present (e.g. on an end-user machine).
"""

import sys

import pytest

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_SRC)
    try:
        import svs  # the reference package

        yield svs
    except ImportError:
        pytest.skip("reference implementation not available")
    finally:
        sys.path.remove(REF_SRC)


def test_reference_db_opens_here(ref, tmp_path):
    path = tmp_path / "ref.sqlite"
    kb = ref.KB(path, ref.make_mock_embeddings_func())
    with kb.bulk_add_docs() as add:
        a = add("hello", meta={"n": 1})
        b = add("world", parent_id=a)
    with kb.bulk_graph_update() as g:
        g.add_edge(a, b, a, weight=2.0)
    with kb.bulk_keyval_update() as kv:
        kv["k"] = "v"
    kb.close(vacuum=True, also_gzip=True)

    from svs_tpu import KB

    t = KB(f"{path}.gz")  # embedding func restored from reference-written params
    assert len(t) == 2
    hits = t.retrieve("anything", 2)
    assert {h["doc"]["text"] for h in hits} == {"hello", "world"}
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-6)
    with t.bulk_query_docs() as q:
        assert q.query_doc(b)["level"] == 1
    with t.bulk_keyval_update() as kv:
        assert kv["k"] == "v"
    with t.bulk_graph_update() as g:
        assert g.count_edges() == 1
    t.close()


def test_our_db_opens_in_reference(ref, tmp_path):
    from svs_tpu import KB, make_mock_embeddings_func

    path = tmp_path / "ours.sqlite"
    t = KB(path, make_mock_embeddings_func())
    with t.bulk_add_docs() as add:
        add("written by svs_tpu", meta={"x": [1, 2]})
    with t.bulk_keyval_update() as kv:
        kv["flag"] = 7
    t.close(vacuum=True)

    kb = ref.KB(path)
    assert len(kb) == 1
    hit = kb.retrieve("q", 1)[0]
    assert hit["doc"]["text"] == "written by svs_tpu"
    assert hit["doc"]["meta"] == {"x": [1, 2]}
    with kb.bulk_keyval_update() as kv:
        assert kv["flag"] == 7
    kb.close()


def test_blob_format_identical(ref, tmp_path):
    from svs_tpu.store.blob import embedding_to_bytes

    from svs.embeddings import embedding_to_bytes as ref_to_bytes

    vec = [0.1, -0.9, 1e-8, 42.0]
    assert embedding_to_bytes(vec) == ref_to_bytes(vec)
