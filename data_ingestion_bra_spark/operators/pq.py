"""Product quantization (PQ) for embedding compression + ADC search.

The public IVF-PQ design (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): split each vector into ``m``
subvectors, learn a tiny per-subspace codebook (k-means), store each
vector as ``m`` small codes (here 8 x 4 bits = 4 bytes per 64-dim vector,
a 64x compression over float32), and answer queries with Asymmetric
Distance Computation — a per-query lookup table of subspace distances, so
scoring a candidate is ``m`` table lookups + adds, never a full-vector
scan.

Everything here is BIGINT fixed-point on the repo's quantized vectors
(``operators/similarity.py:quantize_expr``, 1e-6 resolution): seeds,
the Lloyd refinement's element-wise integer means, squared-L2 distances,
code assignment (min over (dist, code) structs — lexicographic in both
Spark and DuckDB, and map-side combinable), and the ADC sums. No float
enters any compared value, so the SQL oracle replays codebook training,
encoding, and search bit-for-bit.

Scale shape: codebooks are ``m*k`` rows (tiny, broadcast); training
iterates over subvectors with partial-aggregable sums; encoding is one
broadcast join + a map-side-combinable struct-min groupBy (the corpus
never shuffles by pair); ADC joins the per-query LUT (``m*k`` rows per
query, broadcast) to the stored codes and sums — linear in candidates by
design, with IVF cell-pruning (``similarity_topk_ivf``) as the recall
path that bounds the candidate set.

Reference parity: the reference has no ANN tier at all (SURVEY.md §2) —
this extends the engine's similarity family (brute-force / IVF / RP-LSH)
with the compressed-domain scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators.similarity import quantize_expr, quantize_sql

#: subspaces x codes: 64-dim fixture vectors -> 8 subvectors of 8 dims,
#: 16 codewords each (4-bit codes).
M_SUB = 8
K_CODES = 16


def subvector_expr(qvec: Column, s: int, d_sub: int) -> Column:
    """Subspace ``s`` of a quantized vector (1-based slice, length d_sub)."""
    return F.slice(qvec, s * d_sub + 1, d_sub)


def subvectors(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, m: int = M_SUB,
) -> DataFrame:
    """(id, s, sub: array<bigint>) — every vector split into ``m``
    quantized subvectors. The explode is row-local (no shuffle).

    Built as two selectExpr strings: the Column-API form cost ~25 py4j
    lambda round trips per call (optimization guide §4), and by embedding
    the quantize transform once in a prior projection the m slices share
    ONE evaluation per row instead of re-quantizing per subspace."""
    d_sub = dim // m
    parts_sql = "array(" + ", ".join(
        f"struct({s} as s, slice(__q, {s * d_sub + 1}, {d_sub}) as sub)"
        for s in range(m)
    ) + ")"
    return (
        df.selectExpr(id_col, f"{quantize_sql(vec_col)} as __q")
        .selectExpr(id_col, f"explode({parts_sql}) as p")
        .selectExpr(id_col, "p.s as s", "p.sub as sub")
    )


def _isq_dist_sql(a: str, b: str) -> str:
    """SQL text of the exact integer squared L2 between two subvectors."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        f" 0L, (acc, x) -> acc + x)"
    )


def _isq_dist(a: Column, b: Column) -> Column:
    """Exact integer squared L2 between two quantized subvectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _argmin_code(assigned: DataFrame, id_col: str) -> DataFrame:
    """(id, s, code): nearest codeword per (vector, subspace) — min over
    (dist, code) structs, lexicographic ties to the lowest code; a
    partial-aggregable groupBy, never a window shuffle."""
    return (
        assigned.groupBy(id_col, "s")
        .agg(F.min(F.struct(F.col("dist"), F.col("code"))).alias("best"))
        .select(id_col, "s", F.col("best.code").alias("code"))
    )


def pq_train(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
    k: int = K_CODES,
    n_iter: int = 1,
) -> DataFrame:
    """Deterministic per-subspace codebooks: seeds are the subvectors of
    the first ``k`` vector ids (the ``seed_centroids`` recipe, per
    subspace), refined by ``n_iter`` Lloyd iterations in pure BIGINT
    (assign by integer squared L2, update by element-wise integer mean
    ``floor(sum/count + 0.5)`` — the ``kmeans_train`` convention). Returns
    (s, code, cvec: array<bigint>) — ``m*k`` rows, broadcast-sized at any
    corpus scale."""
    from pyspark.sql.window import Window

    sub = subvectors(vectors, id_col=id_col, vec_col=vec_col, dim=dim, m=m)
    w = Window.partitionBy("s").orderBy(F.col(id_col).asc())
    cb = (
        sub.filter(F.col(id_col) < k)
        .select("s", (F.row_number().over(w) - 1).alias("code"), F.col("sub").alias("cvec"))
    )
    for _ in range(n_iter):
        assigned = sub.join(F.broadcast(cb), "s").selectExpr(
            id_col, "s", "code", f"{_isq_dist_sql('sub', 'cvec')} as dist"
        )
        member = _argmin_code(assigned, id_col).join(
            sub, [id_col, "s"]
        )
        dim_stats = (
            member.selectExpr("s", "code", "posexplode(sub) as (pos, x)")
            .groupBy("s", "code", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
        )
        cb = dim_stats.groupBy("s", "code").agg(
            F.expr(
                # floor(x + 0.5): round()'s half-boundary behavior is
                # engine-specific; floor of a correctly-rounded double isn't
                "transform(array_sort(collect_list(struct(pos, sx, n))),"
                " t -> cast(floor(cast(t.sx as double) / t.n + 0.5D) as bigint))"
            ).alias("cvec")
        )
        cb = cb.localCheckpoint(eager=True)
    return cb


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
) -> DataFrame:
    """(id, s, code): each vector compressed to ``m`` codes — one
    broadcast codebook join + the struct-min groupBy. Thin projection of
    ``pq_encode_with_err`` so the batch and streaming-maintenance encode
    paths cannot diverge (the maintenance equality tests depend on the
    codes being identical)."""
    return pq_encode_with_err(
        vectors, codebook, id_col=id_col, vec_col=vec_col, dim=dim, m=m
    ).drop("qerr")


def adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
    k_top: int = 10,
) -> DataFrame:
    """Asymmetric Distance Computation top-k: per query, a lookup table of
    exact integer subspace distances to every codeword (``m*k`` rows per
    query, broadcast), joined to the stored codes on (s, code) and summed
    per candidate — each candidate costs ``m`` adds, the whole scan never
    touches a full vector. Output (query_id, rank, cand_id, adc_dist),
    rank by (adc_dist asc, cand_id asc)."""
    from pyspark.sql.window import Window

    qsub = subvectors(
        queries, id_col=id_col, vec_col=vec_col, dim=dim, m=m
    ).withColumnRenamed(id_col, "query_id")
    lut = qsub.join(F.broadcast(codebook), "s").selectExpr(
        "query_id", "s", "code", f"{_isq_dist_sql('sub', 'cvec')} as pdist"
    )
    dists = (
        codes.withColumnRenamed(id_col, "cand_id")
        .join(F.broadcast(lut), ["s", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("pdist").cast("bigint").alias("adc_dist"))
    )
    # two-phase top-k (the BM25 shape): a salted window keeps k per
    # (query, cand_id%64) slice, the global window ranks <= 64k survivors
    # per query — no single-reducer-per-query bottleneck at corpus scale
    order = [F.col("adc_dist").asc(), F.col("cand_id").asc()]
    salted = Window.partitionBy("query_id", F.col("cand_id") % 64).orderBy(*order)
    survivors = (
        dists.withColumn("srank", F.row_number().over(salted))
        .filter(F.col("srank") <= k_top)
        .drop("srank")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cand_id",
            "adc_dist",
        )
    )


def pq_encode_with_err(
    vectors: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
) -> DataFrame:
    """(id, s, code, qerr): ``pq_encode`` plus the winning codeword's exact
    integer squared-L2 quantization error — the PQ analogue of the IVF
    tier's winner-centroid cosine, and the drift signal streaming code
    maintenance monitors (mean qerr grows when arriving vectors leave the
    distribution the codebook was trained on). Same plan shape as
    ``pq_encode``: one broadcast codebook join + a map-side-combinable
    struct-min groupBy; the error rides the min struct for free."""
    sub = subvectors(vectors, id_col=id_col, vec_col=vec_col, dim=dim, m=m)
    assigned = sub.join(F.broadcast(codebook), "s").selectExpr(
        id_col, "s", "code", f"{_isq_dist_sql('sub', 'cvec')} as dist"
    )
    return (
        assigned.groupBy(id_col, "s")
        .agg(F.min(F.struct(F.col("dist"), F.col("code"))).alias("best"))
        .select(
            id_col,
            "s",
            F.col("best.code").alias("code"),
            F.col("best.dist").alias("qerr"),
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    inverted_lists: DataFrame,
    centroids: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
    n_probe: int = 2,
    shortlist: int = 20,
    k_top: int = 5,
) -> DataFrame:
    """IVF-PQ+R — the full Jégou et al. (TPAMI 2011, §VII) serve pipeline,
    composed from the two verified tiers:

    1. **IVF cell pruning**: queries multi-probe their ``n_probe`` nearest
       cells (broadcast centroids); candidates come from the PERSISTED
       inverted lists by cell equi-join — cost tracks cell sizes, never
       the corpus.
    2. **ADC in the compressed domain**: per-query integer LUT (m*k rows,
       broadcast) joined to the candidates' stored codes — each candidate
       is ``m`` adds against 4 bytes of state, and only cell-pruned
       candidates are ever scored (the piece neither tier had alone:
       ``similarity_topk_ivf`` scores full vectors, ``similarity_pq_adc``
       scans every code).
    3. **Exact re-rank**: the ``shortlist`` ADC survivors join back to the
       full-precision vectors for an exact integer-L2 top-``k_top``.

    At 100 TB: the index artifacts (centroids m*k codebook, 4-byte codes,
    cell ids) are the only per-corpus state the query path reads; the
    full-precision read is |queries| × shortlist rows. All arithmetic
    BIGINT (the two tiers' own primitives), so the SQL oracle replays the
    whole composition bit-for-bit. Output (query_id, rank, cand_id,
    l2_dist), rank by (l2_dist asc, cand_id asc)."""
    from pyspark.sql.window import Window

    from data_ingestion_bra_spark.operators.similarity import (
        assign_cells,
        inline_probe_cells,
    )

    qcells = inline_probe_cells(
        queries, centroids, id_col=id_col, vec_col=vec_col, n_probe=n_probe
    )
    if qcells is None:
        qcells = assign_cells(
            queries, centroids, id_col=id_col, vec_col=vec_col,
            n_probe=n_probe, spread=False,
        )
    qcells = qcells.select(F.col("vid").alias("query_id"), "cell")
    cand = (
        F.broadcast(qcells)
        .join(inverted_lists.select(F.col("vid").alias("cand_id"), "cell"), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()  # multi-probe may reach a candidate via two cells
    )
    qsub = subvectors(
        queries, id_col=id_col, vec_col=vec_col, dim=dim, m=m
    ).withColumnRenamed(id_col, "query_id")
    lut = qsub.join(F.broadcast(codebook), "s").selectExpr(
        "query_id", "s", "code", f"{_isq_dist_sql('sub', 'cvec')} as pdist"
    )
    adc = (
        cand.join(codes.withColumnRenamed(id_col, "cand_id"), "cand_id")
        .join(F.broadcast(lut), ["query_id", "s", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("pdist").cast("bigint").alias("adc_dist"))
    )
    order = [F.col("adc_dist").asc(), F.col("cand_id").asc()]
    salted = Window.partitionBy("query_id", F.col("cand_id") % 64).orderBy(*order)
    ws = Window.partitionBy("query_id").orderBy(*order)
    short = (
        adc.withColumn("srank", F.row_number().over(salted))
        .filter(F.col("srank") <= shortlist)
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= shortlist)
        .select("query_id", "cand_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(F.col(vec_col)).alias("qv")
    )
    cv = vectors.select(
        F.col(id_col).alias("cand_id"), quantize_expr(F.col(vec_col)).alias("cv")
    )
    exact = (
        short.join(cv, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .selectExpr("query_id", "cand_id", f"{_isq_dist_sql('qv', 'cv')} as l2_dist")
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("cand_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k_top)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cand_id",
            "l2_dist",
        )
    )


def adc_rerank(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
    shortlist: int = 50,
    k_top: int = 10,
) -> DataFrame:
    """ADC + R (the paper's §VII refinement): the compressed-domain scan
    shortlists ``shortlist`` candidates per query, then ONLY those rows
    join back to the full vectors for an exact integer-L2 re-rank. At
    100 TB the full-precision read is |queries| * shortlist rows — the
    expensive exactness is paid on a constant-size set, never the corpus.
    Output (query_id, rank, cand_id, l2_dist), all BIGINT."""
    from pyspark.sql.window import Window

    short = adc_topk(
        queries, codes, codebook,
        id_col=id_col, vec_col=vec_col, dim=dim, m=m, k_top=shortlist,
    ).select("query_id", "cand_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), quantize_expr(F.col(vec_col)).alias("qv")
    )
    cv = vectors.select(
        F.col(id_col).alias("cand_id"), quantize_expr(F.col(vec_col)).alias("cv")
    )
    exact = (
        short.join(cv, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.aggregate(
                F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("l2_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("cand_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "cand_id",
            "l2_dist",
        )
    )


def load_or_build_pq_index(
    spark,
    vectors: DataFrame,
    sf_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = M_SUB,
    k: int = K_CODES,
    n_iter: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Train-once / serve-many PQ index: ``(codebook, codes)``, persisted
    exactly like the IVF tier's centroids + inverted lists
    (``similarity.load_or_build_ivf_index``) and keyed by the same dataset
    content fingerprint — a regenerated dataset retrains instead of
    serving stale codes. Before this loader, BOTH PQ serve entries re-ran
    codebook training and corpus encoding on every invocation (~25 Spark
    jobs each); at 100 TB the index artifacts are the only per-corpus
    state a query should read (Jégou et al. §VII — the codebook is
    trained once, queries pay only the LUT + ADC scan).

    Training and encoding are deterministic BIGINT, so the persisted
    artifacts are bit-identical to an inline run and the unrolled SQL
    oracle (which replays training + encoding from the raw table) stays
    valid. Writes are atomic (tmp + rename); the codebook is a tiny JSON
    control-plane artifact, the codes one parquet of (id, s, code).

    CONTRACT (round-12 advice item 2): ``vectors`` must be the FULL
    ``sf_dir/embeddings.parquet`` relation (unfiltered, unprojected) —
    the cache key is that dataset's content fingerprint plus every
    training parameter INCLUDING ``id_col``/``vec_col``, so a caller that
    renames columns gets its own artifacts, but a caller that pre-filters
    rows would still train a different index under the full-table key.
    Filter AFTER the index is loaded (the serve entries all do), or don't
    use the shared cache.
    """
    import json
    import os
    from pathlib import Path

    from data_ingestion_bra_spark.operators.similarity import (
        _dataset_fingerprint,
        _ivf_cache_root,
    )
    from data_ingestion_bra_spark.sources.tables import (
        _PLAN_CACHE,
        _stat_sig,
        read_parquet_cached,
    )

    cache_dir = _ivf_cache_root()
    src = Path(sf_dir) / "embeddings.parquet"
    cols = "" if (id_col, vec_col) == ("vec_id", "embedding") else f"-{id_col}-{vec_col}"
    stem = (
        f"{Path(sf_dir).name}-pq-m{m}-k{k}-i{n_iter}-d{dim}{cols}"
        f"-{_dataset_fingerprint(src)}"
    )
    cb_path = cache_dir / f"{stem}-codebook.json"
    codes_dir = cache_dir / f"{stem}-codes.parquet"
    schema = "s int, code int, cvec array<bigint>"
    if cb_path.exists():
        per_session = _PLAN_CACHE.setdefault(spark, {})
        ckey = (f"pq-codebook:{cb_path}", _stat_sig(str(cb_path)))
        cb = per_session.get(ckey)
        if cb is None:
            rows = json.loads(cb_path.read_text())
            cb = spark.createDataFrame(
                [(r["s"], r["code"], r["cvec"]) for r in rows], schema
            )
            per_session[ckey] = cb
    else:
        trained = pq_train(
            vectors, id_col=id_col, vec_col=vec_col, dim=dim, m=m, k=k, n_iter=n_iter
        )
        local = sorted(
            (int(r["s"]), int(r["code"]), [int(x) for x in r["cvec"]])
            for r in trained.collect()
        )
        cache_dir.mkdir(parents=True, exist_ok=True)
        tmp = cb_path.with_suffix(f".tmp{os.getpid()}")
        tmp.write_text(
            json.dumps([{"s": s, "code": c, "cvec": v} for s, c, v in local])
        )
        os.replace(tmp, cb_path)
        cb = spark.createDataFrame(local, schema)
    if not codes_dir.exists():
        codes = pq_encode(vectors, cb, id_col=id_col, vec_col=vec_col, dim=dim, m=m)
        tmp_dir = codes_dir.with_name(codes_dir.name + f".tmp{os.getpid()}")
        codes.write.mode("overwrite").parquet(str(tmp_dir))
        try:
            os.replace(tmp_dir, codes_dir)
        except OSError:  # a concurrent builder won the rename; use theirs
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
    return cb, read_parquet_cached(spark, str(codes_dir))
