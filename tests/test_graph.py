"""connected_components unit tests — topology, not SQL parity (that's
q_dup_clusters' recursive-CTE oracle)."""

from __future__ import annotations

from weightlifting_wod_etl_spark.operators.graph import connected_components


def test_cc_chain_triangle_pair(spark):
    # chain 1-2-3-4-5 (diameter 4 — forces multiple propagation rounds),
    # triangle 10-11-12, disjoint pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["src", "dst"],
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges, max_iter=25).collect()
    }
    want = (
        {(n, 1) for n in (1, 2, 3, 4, 5)}
        | {(n, 10) for n in (10, 11, 12)}
        | {(n, 20) for n in (20, 21)}
    )
    assert got == want


def test_cc_reversed_edge_direction_irrelevant(spark):
    # labels must flow against edge direction too (undirected semantics)
    edges = spark.createDataFrame([(5, 4), (4, 3), (3, 2), (2, 1)], ["src", "dst"])
    got = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert got == {(n, 1) for n in (1, 2, 3, 4, 5)}


def test_pagerank_empty_edges_returns_empty(spark):
    """ADVICE r6: n=0 nodes must not ZeroDivisionError."""
    from weightlifting_wod_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long, w double")
    out = pagerank(edges)
    assert out.columns == ["node", "r"]
    assert out.count() == 0


def test_connected_components_nonconvergence_is_loud(spark):
    """Review r10: exhausting max_iter used to return intermediate labels
    silently — one true component reported as several clusters. A chain
    whose diameter exceeds max_iter must raise, not lie."""
    import pytest

    from weightlifting_wod_etl_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # ample rounds: one component labeled by its min node id
    got = {r.node: r.component for r in connected_components(chain).collect()}
    assert set(got.values()) == {0}
