"""Graph operators for dedup pipelines: connected components over the
near-duplicate pair graph, so clusters of mutual near-dups collapse to one
canonical document (pairwise dedup alone can't do this — A~B and B~C must
put A, B, C in ONE cluster even when A~C was never a candidate pair).

Two algorithms over the same (doc, cluster_id = component-min) contract:

- **min-label propagation** — one equi-join + min-aggregate per round,
  O(|E|) per round, rounds = component diameter. The right default for LSH
  near-dup graphs (dense stars/cliques around a template, diameter 2-4).
- **star contraction** (Kiveris et al., "Connected Components in MapReduce
  and Beyond", alternating large-star/small-star) — same join primitive,
  O(log²) rounds on ANY topology, so a path-shaped dup chain of length
  100k converges in ~tens of rounds instead of 100k.

``algorithm='auto'`` runs min-label and falls back to star contraction iff
the witness has not converged by ``max_iter`` — the adversarial-diameter
escape hatch, chosen by observed behavior rather than a guessed topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edges in canonical (s > t) orientation, self-loops
    dropped, deduped."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    return (
        e.filter(F.col("s") != F.col("t"))
        .select(
            F.greatest("s", "t").alias("s"),
            F.least("s", "t").alias("t"),
        )
        .distinct()
    )


def _symmetric(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))


def _is_star_forest(e: DataFrame) -> bool:
    """True iff the canonical edge relation is a depth-1 star forest —
    every source has exactly ONE target, and no target is also a source.
    This is precisely the joint fixed point of the large-star/small-star
    steps, so it certifies convergence independently of the scalar witness
    (one cheap two-aggregate action over the just-checkpointed relation)."""
    multi_target = e.groupBy("s").agg(F.countDistinct("t").alias("n")).filter(
        F.col("n") > 1
    )
    target_is_source = e.join(
        e.select(F.col("t").alias("s")).distinct(), "s", "left_semi"
    )
    return multi_target.isEmpty() and target_is_source.isEmpty()


def pagerank(
    edges: DataFrame,
    src: str = "s",
    dst: str = "t",
    *,
    damping_e9: int = 850_000_000,
    n_iter: int = 5,
    checkpoint_every: int = 5,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """PageRank over a directed link graph in EXACT integer fixed point
    (rank ≈ probability × 1e9) — the classic link-based quality signal for
    web corpora (Page et al. 1999), here with every operation
    engine-portable: integer floor division and order-free integer sums, so
    the result is bit-identical on any engine and any partitioning.

    Per iteration: r'(v) = (1e9 - d)/N + Σ_{u→v} (d · r(u)) div (1e9 ·
    outdeg(u)), all BIGINT (d=damping_e9; products stay < 2^63 for any
    N ≥ 1). Dangling-node mass is DROPPED by default (the oracle unrolls
    that form); ``redistribute_dangling=True`` adds the standard uniform
    redistribution term — each node additionally receives
    ``(d · Σ_{u dangling} r(u)) div (1e9 · N)``, computed as a 1-row
    aggregate broadcast-attached to the rank update (still exact integer,
    still order-free; no driver scalar per round).

    Scale shape: ranks live one row per NODE (for web corpora: per
    registered domain — millions of rows, not trillions), edges one row
    per link; each iteration is one equi-join on src + one
    partial-aggregable groupBy on dst. N and the per-node constants are
    driver scalars (two counts — convergence witnesses, not data-plane
    collects). ``n_iter`` is fixed, not convergence-tested, so the oracle
    can unroll the same number of rounds.

    Lineage: every ``checkpoint_every`` rounds the rank relation is
    localCheckpoint-ed eagerly (the ``connected_components`` pattern), so
    deep runs (n_iter 20+) keep a bounded plan instead of unrolling every
    join into one lazy tree. The final ranks are checkpointed too, which
    makes the returned DataFrame self-contained: the internal edge/degree
    caches are unpersisted before returning (they previously leaked for the
    session lifetime — round-7 ADVICE).
    """
    scale = 1_000_000_000
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .filter(F.col("s") != F.col("t"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("s").alias("v"))
        .union(e.select(F.col("t").alias("v")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # scalar N for the teleport constant
    deg = e.groupBy("s").agg(F.count("*").alias("outdeg")).persist()
    teleport = (scale - damping_e9) // n
    r = nodes.withColumn("r", F.lit(scale // n).cast("bigint"))
    for it in range(1, n_iter + 1):
        contrib = (
            e.join(r, e["s"] == r["v"])
            .join(deg, "s")
            .select(
                F.col("t").alias("v"),
                F.expr(f"({damping_e9} * r) div ({scale} * outdeg)").alias("c"),
            )
        )
        inflow = contrib.groupBy("v").agg(F.sum("c").alias("inflow"))
        prev = r
        r = nodes.join(inflow, "v", "left")
        if redistribute_dangling:
            # Σ r(u) over nodes with no out-edges (from the PREVIOUS round's
            # ranks), as a 1-row relation: the broadcast attach keeps the
            # whole term inside the plan (exact BIGINT, no per-round driver
            # action).
            dangling = (
                prev.join(deg.select(F.col("s").alias("v")), "v", "left_anti")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dmass"))
            )
            r = r.join(F.broadcast(dangling)).select(
                "v",
                (
                    F.lit(teleport)
                    + F.coalesce(F.col("inflow"), F.lit(0))
                    # denominator precomputed in Python: an int32*int32
                    # literal product (1e9 * N) overflows Catalyst's
                    # constant folding under ANSI and wraps silently without
                    + F.expr(
                        f"({damping_e9} * dmass) div CAST({scale * n} AS BIGINT)"
                    )
                )
                .cast("bigint")
                .alias("r"),
            )
        else:
            r = r.select(
                "v",
                (F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0)))
                .cast("bigint")
                .alias("r"),
            )
        if it % checkpoint_every == 0 and it < n_iter:
            r = r.localCheckpoint(eager=True)
    out = r.select(F.col("v").alias("node"), F.col("r").alias("rank_e9"))
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    deg.unpersist()
    return out


def star_contraction_components(
    edges: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 40,
    return_rounds: bool = False,
):
    """Connected components by alternating large-star / small-star
    contraction; returns ``(doc, cluster_id = component min)``.

    Each round is two grouped-min + equi-join passes over the edge relation
    — O(|E|) work, no quadratic blowup — and the edge set contracts toward
    a star per component in O(log² n) rounds regardless of diameter
    (Kiveris et al. §3). Per round:

    - **large-star**: for each node u (symmetric neighborhoods), let
      m = min(Γ(u) ∪ {u}); rewire every LARGER neighbor v > u to m.
    - **small-star**: for each node u over its smaller neighbors
      Γ⁻(u) = {v ∈ Γ(u) : v < u}, let m = min(Γ⁻(u)); rewire u and every
      v ∈ Γ⁻(u), v ≠ m, to m.

    Convergence witness: (edge count, sum s, sum t) — ONE scalar action per
    round. A stationary triple is a cheap NECESSARY signal; before trusting
    it the loop confirms the state is structurally a star forest (every
    source has exactly one target and no target reappears as a source),
    which IS the fixed point of both contraction steps — so a hypothetical
    witness collision across distinct states can never end the loop early.
    If ``max_rounds`` exhausts without a verified fixed point the function
    raises rather than labeling from a half-contracted graph. Labels come
    off the converged stars; isolated/self-loop-only nodes rejoin as their
    own cluster via a left join against the original node set (they leave
    the edge relation at canonicalization).
    """
    nodes = (
        _symmetric(edges.select(F.col(src).alias("s"), F.col(dst).alias("t")))
        .select(F.col("s").alias("doc"))
        .distinct()
    )
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    prev = None
    rounds = 0
    converged = False
    for rounds in range(1, max_rounds + 1):
        sym = _symmetric(e)
        mins = (
            sym.groupBy("s")
            .agg(F.min("t").alias("mn"))
            .select("s", F.least("s", "mn").alias("m"))
        )
        # large-star: m <= s < t, so output is canonical and loop-free
        e = (
            sym.join(mins, "s")
            .filter(F.col("t") > F.col("s"))
            .select(F.col("t").alias("s"), F.col("m").alias("t"))
            .distinct()
        )
        # small-star over canonical (s > t) edges: m = min of s's smaller
        # neighborhood; rewire s and each non-min smaller neighbor to m
        mins2 = e.groupBy("s").agg(F.min("t").alias("m"))
        # LAZY checkpoint: the witness aggregate right below is the round's
        # first action and materializes it — one control-plane action per
        # round instead of the former eager-checkpoint + witness pair
        # (halves driver round-trips on deep graphs; semantics unchanged).
        e = (
            mins2.select("s", F.col("m").alias("t"))
            .union(
                e.join(mins2, "s")
                .filter(F.col("t") != F.col("m"))
                .select(F.col("t").alias("s"), F.col("m").alias("t"))
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = tuple(
            e.agg(
                F.count(F.lit(1)), F.coalesce(F.sum("s"), F.lit(0)),
                F.coalesce(F.sum("t"), F.lit(0)),
            ).collect()[0]
        )
        if cur == prev and _is_star_forest(e):
            converged = True
            break
        prev = cur
    else:  # pragma: no cover - adversarial escape, exercised via unit test
        converged = _is_star_forest(e)
    if not converged:
        raise RuntimeError(
            f"star contraction did not reach a verified fixed point within "
            f"{max_rounds} rounds; raise max_rounds"
        )
    star = e.select(F.col("s").alias("doc"), F.col("t").alias("cluster_id")).union(
        e.select(F.col("t").alias("doc"), F.col("t").alias("cluster_id"))
    ).groupBy("doc").agg(F.min("cluster_id").alias("cluster_id"))
    out = nodes.join(star, "doc", "left").select(
        "doc", F.coalesce("cluster_id", "doc").alias("cluster_id")
    )
    return (out, rounds) if return_rounds else out


def connected_components(
    edges: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    check_every: int = 1,
    algorithm: str = "auto",
) -> DataFrame:
    """Connected components over an undirected edge list; returns
    ``(doc, cluster_id)`` with ``cluster_id`` = the minimum node id in the
    component (deterministic canonical representative).

    ``algorithm``: ``'minlabel'`` (propagation only), ``'star'``
    (``star_contraction_components``), or ``'auto'`` (default): min-label,
    falling back to star contraction iff the witness has not converged by
    ``max_iter`` — an adversarial long-chain graph costs the exhausted
    min-label rounds once, then finishes in O(log²) star rounds instead of
    running silently incomplete.

    Min-label propagation: each round is one equi-join (edge × label) plus
    one min-aggregate — two shuffles over the EDGE relation, nothing
    quadratic ever materializes, so a round costs O(|E|) however large the
    corpus. Rounds needed = component diameter; LSH near-dup clusters are
    dense (stars/cliques around a template), so diameter is 2-4 in practice.

    Labels start at the node id and only ever decrease, so ``sum(label)`` is
    a monotone convergence witness — one scalar action per check (control
    plane, not a data collect; no pre-loop action, the first round's witness
    doubles as the baseline). ``check_every`` sets the cadence; the measured
    default is EVERY round: the witness scans the just-checkpointed (tiny)
    label table and is nearly free, while each propagation round past the
    fixed point is a full join+aggregate+checkpoint — on the sf0.01
    near-dup graph, check_every=1/2/3 ran 0.93/1.22/1.70 s for the same
    fixed point. Raise it only for adversarial long-diameter graphs that run
    to ``max_iter`` anyway (there the skipped witnesses are pure savings and
    no overshoot rounds exist). Each round's labels are localCheckpoint-ed
    to truncate lineage, the standard pattern for iterative DataFrame
    algorithms.
    """
    if algorithm not in ("auto", "minlabel", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "star":
        return star_contraction_components(edges, src=src, dst=dst)
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    sym = e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t"))).persist()
    labels = (
        sym.select(F.col("s").alias("doc"))
        .distinct()
        .select("doc", F.col("doc").alias("cluster_id"))
        .localCheckpoint(eager=False)
    )
    prev_sum = None
    converged = False
    for it in range(1, max_iter + 1):
        prop = sym.join(labels.withColumnRenamed("doc", "s"), "s").select(
            F.col("t").alias("doc"), "cluster_id"
        )
        # LAZY checkpoint (round-13, the star-contraction pattern): the
        # logical plan still truncates at the LogicalRDD boundary every
        # round, but materialization rides the witness aggregate below —
        # ONE driver action per round instead of the former eager-checkpoint
        # job + witness collect pair (halves control-plane jobs per round;
        # rounds between witnesses materialize with the next action).
        labels = (
            labels.union(prop)
            .groupBy("doc")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=False)
        )
        if it % check_every == 0 or it == max_iter:
            cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    sym.unpersist()
    if not converged and algorithm == "auto":
        return star_contraction_components(edges, src=src, dst=dst)
    return labels


def triangle_counts(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Per-node triangle counts via degree-ordered orientation (the
    "compact-forward" scheme, Latapy 2008; Suri & Vassilvitskii WWW'11 for
    the MapReduce form). Input is an arbitrary directed multigraph; it is
    first canonicalized to distinct undirected edges with self-loops
    dropped.

    Every edge is oriented from its lower to its higher endpoint in the
    total order (degree, node id), so each triangle has exactly one vertex
    with two out-edges and is enumerated exactly once as a wedge
    (x -> y1, x -> y2 with y1 before y2) closed by the oriented edge
    (y1 -> y2). The orientation bound is the whole scale story: out-degree
    under degree ordering is O(sqrt(|E|)) — on a power-law web graph the
    hub's millions of neighbors become IN-edges, so the wedge self-join is
    sum(out_deg^2) = O(|E|^1.5) worst-case instead of the hub-degree^2
    blowup a naive id-ordering suffers. All joins are equi-joins; counts
    are exact BIGINT, so a plain canonical a<b<c triple-join oracle replays
    the result exactly.

    Returns (node, degree, n_triangles) for every node of the canonical
    graph (zero-triangle nodes included — the auditing use case wants the
    zeros)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        # consumed three times (degree count, oriented edges, closing-edge
        # probe): materialize the slim (u, v) relation once instead of
        # re-running the distinct per consumer — the same lazy-self-join
        # lesson measured on simhash_near_pairs (round 9)
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    ed = e.join(du, "u").join(dv, "v")
    before = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(before, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(before, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(before, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_y"),
    )
    e1 = o.select("x", F.col("y").alias("y1"), F.col("deg_y").alias("dy1"))
    e2 = o.select("x", F.col("y").alias("y2"), F.col("deg_y").alias("dy2"))
    wedges = e1.join(e2, "x").filter(
        (F.col("dy1") < F.col("dy2"))
        | ((F.col("dy1") == F.col("dy2")) & (F.col("y1") < F.col("y2")))
    )
    closing = o.select(F.col("x").alias("y1"), F.col("y").alias("y2"))
    tris = wedges.join(closing, ["y1", "y2"]).select("x", "y1", "y2")
    per_node = (
        tris.select(F.explode(F.array("x", "y1", "y2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
    )


def label_propagation(
    edges: DataFrame, src: str, dst: str, *, n_iter: int = 4
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007, arXiv:0709.2938) over the undirected
    canonicalized graph. Every node starts labeled with its own id; each
    round it adopts the most frequent label among its neighbors AND
    ITSELF, ties broken by the SMALLEST label — the deterministic variant
    (the paper's random tie-break and asynchronous order would make the
    result partitioning-dependent, which the oracle-hash contract
    forbids). The self-inclusion is load-bearing, not cosmetic: pure
    synchronous LPA two-cycles on bipartite structures (a pendant pair
    swaps labels forever; a star's hub and leaves trade majorities), while
    voting over the closed neighborhood breaks every two-cycle
    deterministically — the pendant pair ties 1-1 and both take the min,
    a star collapses to the hub's component in one round (pytest-pinned
    fixtures). A fixed round budget bounds the remaining cases.

    Scale shape: per round, ONE equi-join (adjacency x labels, shuffled on
    node id) + one partial-aggregable (node, label) count + a row_number
    over per-node label candidates — the same per-round cost class as
    ``pagerank``. Labels are checkpointed per round to truncate the plan.
    Returns (node, community, community_size) with BIGINT labels; all
    arithmetic is counting, so any engine replays it exactly."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nodes = sym.select(F.col("u").alias("node")).distinct()
    # closed neighborhood: every node is its own neighbor (breaks the
    # synchronous two-cycles; see docstring)
    adj = sym.union(
        nodes.select(F.col("node").alias("u"), F.col("node").alias("v"))
    ).localCheckpoint(eager=True)
    # LAZY per-round checkpoints (round-13): the plan still truncates at
    # every round's LogicalRDD boundary, but nothing forces a per-round
    # driver action — the caller's single action materializes all rounds
    # (each round's RDD is cached as it computes), collapsing n_iter
    # checkpoint jobs into the consumer's one.
    labels = nodes.select("node", F.col("node").alias("lbl")).localCheckpoint(
        eager=False
    )
    for _ in range(n_iter):
        nbr = labels.select(F.col("node").alias("v"), F.col("lbl").alias("nbr_lbl"))
        cnt = (
            adj.join(nbr, "v")
            .groupBy("u", "nbr_lbl")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        w = Window.partitionBy("u").orderBy(F.desc("n"), F.asc("nbr_lbl"))
        top = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("node"), F.col("nbr_lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(top, "node", "left")
            .select("node", F.coalesce("new_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return labels.join(sizes, "lbl").select(
        "node",
        F.col("lbl").cast("bigint").alias("community"),
        "community_size",
    )
