"""Build a document graph and materialize it as a NetworkX graph.

Mirrors the reference's ``examples/graph.py``: documents are nodes, the
relationship of each edge is itself a document, and the graph exports to
NetworkX for analysis/visualization (pydot/matplotlib optional).
"""

from svs_tpu import KB, make_mock_embeddings_func

kb = KB("graph.sqlite", make_mock_embeddings_func(), force_fresh_db=True)

with kb.bulk_add_docs() as add_doc:
    alice = add_doc("Alice")
    bob = add_doc("Bob")
    carol = add_doc("Carol")
    knows = add_doc("relationship: knows")
    manages = add_doc("relationship: manages")

with kb.bulk_graph_update() as graph:
    graph.add_edge(alice, bob, knows)            # undirected
    graph.add_edge(bob, carol, knows, weight=0.8)
    graph.add_directed_edge(alice, carol, manages)

    g = graph.build_networkx_graph(multigraph=False)
    print(f"{g.number_of_nodes()} nodes, {g.number_of_edges()} edges")
    print("directed:", g.is_directed())
    for a, b, attrs in g.edges(data=True):
        print(f"  {a} -> {b}  {attrs}")

kb.close()
