"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query set
  against the candidate table; candidates stream through a single stage, and
  top-k is a per-query row_number, so nothing pairs-shaped ever shuffles
  except the k winners. The dot product is a higher-order ``zip_with`` +
  ``aggregate`` fold — JVM expressions, no UDF, no explode.
- ``ivf_topk``: the scale path — IVF with data-derived centroids: every
  vector is assigned to its nearest centroid once; queries search only their
  own cell (probe=1). Recall < 1 by construction, like any IVF index.

Cosines are rounded to 4 dp before ranking so the SQL oracle (which sums in
a different order) ranks identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def with_double_vec(df: DataFrame, vec_col: str, out: str = "vec") -> DataFrame:
    return df.withColumn(out, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query vector. Queries broadcast; candidates
    never shuffle until the final per-query k-row window."""
    q = with_double_vec(queries, vec_col, "qv").select(
        F.col(id_col).alias("query_id"), "qv", norm_expr(F.col(vec_col).cast("array<double>")).alias("qn")
    )
    c = with_double_vec(candidates, vec_col, "cv").select(
        F.col(id_col).alias("cand_id"), "cv", norm_expr(F.col(vec_col).cast("array<double>")).alias("cn")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def assign_cells(
    vectors: DataFrame, centroids: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid (cosine) cell assignment; centroids broadcast."""
    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col).alias("vid"), "v", norm_expr(F.col(vec_col).cast("array<double>")).alias("vn")
    )
    c = with_double_vec(centroids, vec_col, "c").select(
        F.col(id_col).alias("cell"), "c", norm_expr(F.col(vec_col).cast("array<double>")).alias("cn")
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        "vid",
        "v",
        "cell",
        F.round(dot_expr(F.col("v"), F.col("c")) / (F.col("vn") * F.col("cn")), 4).alias("sim"),
    )
    w = Window.partitionBy("vid").orderBy(F.col("sim").desc(), F.col("cell").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select("vid", "cell", "v")


def ivf_topk(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    query_ids: list[int] | None = None,
    k: int = 5,
) -> DataFrame:
    """IVF top-k with probe=1. Centroids = the first ``n_centroids`` vectors
    by id (deterministic, data-derived — a stand-in for k-means at fixture
    scale; the cell-assignment/search machinery is the real operator)."""
    centroids = vectors.filter(F.col(id_col) < n_centroids)
    cells = assign_cells(vectors, centroids, id_col=id_col, vec_col=vec_col)
    norms = cells.withColumn("vn", norm_expr(F.col("v")))
    qs = norms.filter(F.col("vid").isin(query_ids) if query_ids else F.lit(True)).select(
        F.col("vid").alias("query_id"), F.col("cell"), F.col("v").alias("qv"), F.col("vn").alias("qn")
    )
    cs = norms.select(F.col("vid").alias("cand_id"), "cell", F.col("v").alias("cv"), F.col("vn").alias("cn"))
    scored = (
        F.broadcast(qs)
        .join(cs, "cell")  # probe=1: same-cell candidates only
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )
