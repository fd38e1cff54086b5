"""Connected components over near-dup pair graphs (operators/graph.py)."""

from __future__ import annotations

from data_ingestion_bra_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    rows = connected_components(df).collect()
    return {r.doc: r.cluster_id for r in rows}


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4 forces several propagation rounds; every
    # node must land on the min id even though (1,5) was never an edge.
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_keep_separate_labels(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32), (30, 32)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_label_direction_is_symmetric(spark):
    # min id arriving via the "wrong" edge direction must still win: edge
    # list gives (big, small) ordering.
    got = _cc(spark, [(9, 7), (7, 5), (5, 1)])
    assert got == {9: 1, 7: 1, 5: 1, 1: 1}


def test_empty_edges(spark):
    assert _cc(spark, []) == {}
