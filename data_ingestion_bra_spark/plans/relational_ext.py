"""Extended relational tier: grouping sets, full outer join, scalar-function
suites (predicates / string / date / array), exact percentiles, min_by/
max_by, correlated comparisons, and skew-safe salted aggregation.

Together with plans/relational.py this covers the full "ABSENT in the
reference, free in Spark" surface from SURVEY §2 — each with a DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_bra_spark.operators.skew import salted_agg_sum
from data_ingestion_bra_spark.plans.registry import register
from data_ingestion_bra_spark.plans.temporal import TS_FMT_DUCK, TS_FMT_SPARK
from data_ingestion_bra_spark.sources.tables import load_table


@register(
    "shipping_priority_top10",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS revenue_e4,
           CAST(o.o_orderdate AS DATE)::VARCHAR AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e4 DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch-q3"),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join chain → aggregate →
    top-k. The filtered customer side broadcasts; lineitem (the big fact)
    joins orders on its own key, so the only large shuffle is the final
    group-by; top-10 runs as TakeOrderedAndProject on the rounded revenue
    with a key tie-break (deterministic)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("bigint")
            ).alias("revenue_e4")
        )
        .select(
            "l_orderkey",
            "revenue_e4",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue_e4").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "nation_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS revenue_e4,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
    tags=("join", "agg", "tpch-q5"),
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact-to-fact join (lineitem⋈orders) plus broadcast
    dims (supplier, nation). Revenue per supplier nation for finished
    orders."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("bigint")
            ).alias("revenue_e4"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "set_ops_multiset",
    """
    WITH l AS (SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 500),
         s AS (SELECT s_suppkey AS k FROM supplier)
    SELECT 'except_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT k FROM l EXCEPT ALL SELECT k FROM s) GROUP BY k
    UNION ALL
    SELECT 'intersect_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT k FROM l INTERSECT ALL SELECT k FROM s) GROUP BY k
    """,
    tags=("setop", "multiset"),
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (EXCEPT ALL / INTERSECT ALL — occurrence
    counting, not set semantics): lineitem's supplier-key multiset against
    the supplier key set."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500).select(
        F.col("l_suppkey").alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    ex = (
        li.exceptAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    inter = (
        li.intersectAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    return ex.unionAll(inter)


@register(
    "grouping_sets_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("grouping-sets", "agg"),
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (distinct from rollup/cube): per-status,
    per-priority, and grand-total rows in one pass."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "join_full_outer_nation_activity",
    """
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT CAST(c_nationkey AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT CAST(s_nationkey AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_supp
                     FROM supplier GROUP BY 1) s
      ON c.k = s.k
    """,
    tags=("join", "full-outer"),
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join preserving keys present on either side only."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").cast("bigint").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "k", "full_outer").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "predicates_suite",
    """
    SELECT p_partkey,
           CASE WHEN p_size BETWEEN 10 AND 20 THEN 'mid'
                WHEN p_size < 10 THEN 'small' ELSE 'large' END AS size_class,
           CAST(CASE WHEN p_type LIKE 'ECON%' THEN 1 ELSE 0 END AS BIGINT) AS is_econ,
           CAST(CASE WHEN p_brand IN ('Brand#1', 'Brand#2') THEN 1 ELSE 0 END AS BIGINT) AS in_brands,
           COALESCE(NULLIF(p_type, 'SMALL'), '(was-small)') AS type_or_default,
           CAST(CASE WHEN p_name IS NULL THEN 1 ELSE 0 END AS BIGINT) AS name_is_null
    FROM part
    """,
    tags=("predicates", "scalar", "case-when"),
)
def predicates_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate family the reference lacks (SURVEY §2.2 note: equality
    only): BETWEEN, LIKE, IN, IS NULL, NULLIF/COALESCE, CASE WHEN."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.when(F.col("p_size").between(10, 20), "mid")
        .when(F.col("p_size") < 10, "small")
        .otherwise("large")
        .alias("size_class"),
        F.when(F.col("p_type").like("ECON%"), 1).otherwise(0).cast("bigint").alias("is_econ"),
        F.when(F.col("p_brand").isin("Brand#1", "Brand#2"), 1).otherwise(0).cast("bigint").alias("in_brands"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("SMALL")), F.lit("(was-small)")).alias("type_or_default"),
        F.col("p_name").isNull().cast("bigint").alias("name_is_null"),
    )


@register(
    "string_funcs_suite",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 10, 6) AS name_mid,
           CAST(length(c_name) AS BIGINT) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           replace(c_name, 'Customer#', 'C') AS name_short,
           string_split(c_name, '#')[2] AS after_hash
    FROM customer
    """,
    tags=("string", "scalar"),
)
def string_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (ABSENT in reference beyond trim/quote-strip,
    SURVEY §2.8): case, substring, length, pad, concat, regexp extract,
    replace, split+index."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 10, 6).alias("name_mid"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.expr("replace(c_name, 'Customer#', 'C')").alias("name_short"),
        F.element_at(F.split("c_name", "#"), 2).alias("after_hash"),
    )


@register(
    "date_funcs_suite",
    """
    SELECT o_orderkey,
           CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS order_year,
           CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS order_month,
           CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS order_day,
           (CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)::DATE::VARCHAR AS due_date,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
           date_trunc('month', CAST(o_orderdate AS DATE))::DATE::VARCHAR AS order_month_start,
           last_day(CAST(o_orderdate AS DATE))::VARCHAR AS month_end
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("date", "scalar"),
)
def date_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family (ABSENT in reference — dates are opaque
    partition strings there, SURVEY §1.2)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("order_year"),
        F.month(d).cast("bigint").alias("order_month"),
        F.dayofmonth(d).cast("bigint").alias("order_day"),
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_epoch_start"),
        F.trunc(d, "month").cast("string").alias("order_month_start"),
        F.last_day(d).cast("string").alias("month_end"),
    )


@register(
    "array_funcs_suite",
    """
    SELECT vec_id,
           CAST(len(e) AS BIGINT) AS dim,
           ROUND(CAST(list_min(e) AS DOUBLE), 4) AS v_min,
           ROUND(CAST(list_max(e) AS DOUBLE), 4) AS v_max,
           CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_positive,
           ROUND(sqrt(list_sum(list_transform(CAST(e AS DOUBLE[]), x -> x * x))), 4) AS l2_norm,
           ROUND(CAST(e[1] AS DOUBLE) + CAST(e[2] AS DOUBLE) + CAST(e[3] AS DOUBLE), 4) AS first3_sum
    FROM (SELECT vec_id, embedding AS e FROM embeddings)
    """,
    tags=("array", "scalar", "higher-order"),
)
def array_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function family over the embedding column: size,
    min/max, filter-count, fold (L2 norm), element access."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", F.col("embedding").alias("e"))
    ed = F.col("e").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("e").cast("bigint").alias("dim"),
        F.round(F.array_min("e").cast("double"), 4).alias("v_min"),
        F.round(F.array_max("e").cast("double"), 4).alias("v_max"),
        F.size(F.filter("e", lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.round(
            F.sqrt(F.aggregate(F.transform(ed, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)), 4
        ).alias("l2_norm"),
        F.round(
            F.element_at(ed, 1) + F.element_at(ed, 2) + F.element_at(ed, 3), 4
        ).alias("first3_sum"),
    )


@register(
    "map_funcs_suite",
    """
    WITH m AS (
      SELECT p_partkey,
             map(['size', 'retail_cents'],
                 [CAST(p_size AS BIGINT), CAST(ROUND(p_retailprice * 100) AS BIGINT)]) AS mm
      FROM part WHERE p_partkey < 500
    )
    SELECT p_partkey,
           (mm['size'])[1] AS size_val,
           (mm['retail_cents'])[1] AS retail_cents,
           (mm['missing'])[1] AS missing_val,
           CAST(cardinality(mm) AS BIGINT) AS n_entries
    FROM m
    """,
    tags=("map", "scalar"),
)
def map_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column family (ABSENT in reference, SURVEY §2.8): build,
    element access (missing key → NULL), cardinality. Output is scalars so
    engine map reprs never enter the hash."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    m = F.create_map(
        F.lit("size"),
        F.col("p_size").cast("bigint"),
        F.lit("retail_cents"),
        F.round(F.col("p_retailprice") * 100).cast("bigint"),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "size").alias("size_val"),
        F.element_at(m, "retail_cents").alias("retail_cents"),
        F.element_at(m, "missing").alias("missing_val"),
        F.size(m).cast("bigint").alias("n_entries"),
    )


@register(
    "percentiles_quantity",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("percentile", "agg"),
)
def percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines define p via linear
    interpolation at rank (n-1)*p). approx_percentile is the 100 TB path;
    it's engine-specific, so the oracle checks the exact form."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
    )


@register(
    "minby_maxby_per_status",
    """
    SELECT o_orderstatus,
           arg_max(o_custkey, o_orderkey) AS latest_order_cust,
           arg_min(o_custkey, o_orderkey) AS first_order_cust,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "argminmax"),
)
def minby_maxby_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregates) keyed on the UNIQUE o_orderkey so
    the result is deterministic (ties on a non-unique ordering key would be
    engine-dependent)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("max_by(o_custkey, o_orderkey)").alias("latest_order_cust"),
        F.expr("min_by(o_custkey, o_orderkey)").alias("first_order_cust"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "window_rank_family",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_orderpriority) AS BIGINT) AS priority_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS price_quartile,
           CAST(RANK() OVER (PARTITION BY o_orderstatus
                             ORDER BY o_orderpriority) AS BIGINT) AS priority_rank
    FROM orders WHERE o_orderkey < 3000
    """,
    tags=("window", "rank"),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile — integer window ranks with deterministic
    orderings (ties only on the rank-semantics column, quartile order made
    total with the key tie-break)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w_pri = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    w_price = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.dense_rank().over(w_pri).cast("bigint").alias("priority_dense_rank"),
        F.ntile(4).over(w_price).cast("bigint").alias("price_quartile"),
        F.rank().over(w_pri).cast("bigint").alias("priority_rank"),
    )


@register(
    "grouped_map_rank_per_lang",
    """
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY n_chars DESC, doc_id) AS BIGINT) AS size_rank
    FROM documents
    """,
    tags=("grouped-map", "applyInPandas"),
)
def grouped_map_rank_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map via applyInPandas: per-language size ranking computed in
    pandas per group (Arrow-batched, one shuffle on the group key) — the
    grouped escape hatch for per-group logic window functions can't express;
    output is integer-exact so the window-function oracle must agree."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def rank_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        pdf = pdf.reset_index(drop=True)
        pdf["size_rank"] = pdf.index + 1
        return pdf[["doc_id", "lang", "size_rank"]]

    return d.groupBy("lang").applyInPandas(
        rank_group, schema="doc_id bigint, lang string, size_rank bigint"
    )


_SUBQUERIES_SQL = """
    SELECT c_custkey,
           CAST(CASE WHEN c_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 0)
                     THEN 1 ELSE 0 END AS BIGINT) AS nation_has_supplier,
           CAST(CASE WHEN EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_custkey = c.c_custkey
                                    AND o.o_orderstatus = 'P')
                     THEN 1 ELSE 0 END AS BIGINT) AS has_pending_order,
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_nations
    FROM customer c
    WHERE c_custkey < 500
"""


@register(
    "subqueries_suite",
    _SUBQUERIES_SQL,
    tags=("subquery", "exists", "in"),
)
def subqueries_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery family: uncorrelated IN, correlated EXISTS, scalar subquery.
    Catalyst rewrites these into semi joins / cross-joined scalar aggregates
    — same SQL text runs on both engines."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_SUBQUERIES_SQL)


@register(
    "orders_above_customer_avg",
    """
    WITH s AS (SELECT o_custkey, o_orderkey,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    a AS (SELECT o_custkey, SUM(cents) AS sc, COUNT(*) AS n FROM s GROUP BY o_custkey)
    SELECT s.o_orderkey, s.o_custkey
    FROM s JOIN a ON s.o_custkey = a.o_custkey
    WHERE s.cents * a.n > a.sc
    """,
    tags=("correlated", "window"),
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders strictly above their customer's average price — the correlated
    aggregate comparison done in integer cents so the threshold is exact
    (float averages would make boundary rows engine-dependent).

    Spark form uses a window (ONE shuffle on o_custkey); the oracle uses the
    equivalent group-by + self-join formulation."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    s = o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return (
        s.withColumn("sc", F.sum("cents").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .filter(F.col("cents") * F.col("n") > F.col("sc"))
        .select("o_orderkey", "o_custkey")
    )


@register(
    "salted_agg_quantity",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("skew", "agg", "salted"),
)
def salted_agg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (operators/skew.py): identical results
    to a plain group-by — the oracle IS the plain group-by — but the hot
    keys (l_returnflag has 3 values over the whole table: maximal skew) are
    spread across 8 subkeys in stage one."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg_sum(
        li,
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("bigint"),
        salt_col="l_orderkey",
        n_salts=8,
        sum_alias="sum_qty_cents",
        count_alias="n",
    )
    return out.withColumn("sum_qty_cents", F.col("sum_qty_cents").cast("bigint"))


@register(
    "salted_distinct_parts",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("skew", "agg", "salted", "holistic", "distinct"),
)
def salted_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLISTIC salted aggregation (operators/skew.py
    salted_count_distinct): exact COUNT(DISTINCT l_partkey) per
    l_returnflag (3 keys over the whole table — maximal skew) computed as
    VALUE-hash-salted partials + an algebraic sum merge. Unlike the
    algebraic ``salted_agg_quantity`` (which ties plain by design), this
    is the shape where salting is the only thing standing between a hot
    key and a single multi-million-element set-merge task — the skew bench
    carries the measured number. The oracle IS the plain count-distinct:
    value-hash salts partition the distinct classes disjointly, so the
    result is identical by construction."""
    from data_ingestion_bra_spark.operators.skew import salted_count_distinct

    li = load_table(spark, sf_dir, "lineitem")
    return salted_count_distinct(
        li, "l_returnflag", F.col("l_partkey"), n_salts=8, alias="n_distinct"
    )


@register(
    "sample_stratified_orders",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6) <
          CASE o_orderstatus
               WHEN 'F' THEN '0ccccc'   -- 5%
               WHEN 'O' THEN '199999'   -- 10%
               WHEN 'P' THEN '400000'   -- 25%
               ELSE '' END
    GROUP BY o_orderstatus
    """,
    tags=("sampling", "stratified", "deterministic"),
)
def sample_stratified_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling (operators/sampling.py): per-status
    keep rates via a content-hash threshold. Unlike ``sampleBy(seed)`` the
    membership is invariant to physical layout — the same rows survive after
    a compaction or on a 1000-executor reshard. Plan: one narrow filter in
    codegen over the scan; no shuffle until the checking aggregate."""
    from data_ingestion_bra_spark.operators.sampling import stratified_sample

    o = load_table(spark, sf_dir, "orders")
    s = stratified_sample(
        o, "o_orderstatus", {"F": 0.05, "O": 0.10, "P": 0.25}, key_cols=["o_orderkey"]
    )
    return s.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("sum_cents"),
    )


@register(
    "embedding_dim_stats",
    """
    SELECT CAST(ord - 1 AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           ROUND(CAST(MIN(v) AS DOUBLE), 4) AS min_v,
           ROUND(CAST(MAX(v) AS DOUBLE), 4) AS max_v
    FROM (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS ord
          FROM embeddings)
    GROUP BY dim
    """,
    tags=("explode", "lateral", "array", "embeddings"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array explosion: ``posexplode`` flattens the 64-dim embedding
    column into (dim, value) rows, then per-dimension stats. The generator
    runs inside the scan stage (no shuffle before the aggregate), and the
    aggregate groups on a 64-value key — map-side partial aggregation
    collapses it before the exchange. Oracle: unnest + generate_subscripts."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(F.posexplode("embedding").alias("dim", "v"))
    return flat.groupBy(F.col("dim").cast("bigint").alias("dim")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("v") > 0, 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.round(F.min(F.col("v").cast("double")), 4).alias("min_v"),
        F.round(F.max(F.col("v").cast("double")), 4).alias("max_v"),
    )


@register(
    "window_range_frame_trailing30d",
    """
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_custkey < 200
    )
    SELECT o_orderkey, o_custkey, CAST(day AS BIGINT) AS day,
           CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_cents
    FROM t
    """,
    tags=("window", "range-frame", "temporal"),
)
def window_range_frame_trailing30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: per customer, revenue over the trailing 30 days
    (value-based frame over a day number, not a row count — same-day peer
    rows all enter the frame, unlike a ROWS frame). One shuffle on
    o_custkey; integer cents keep the running sums exact."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    t = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-29, 0)
    return t.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.sum("cents").over(w).alias("trailing_cents"),
    )


@register(
    "agg_filtered_counts",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_high_disc,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 30) AS BIGINT) AS n_bulk,
           CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                         FILTER (WHERE l_tax = 0), 0) AS BIGINT) AS taxfree_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "conditional", "filter-clause"),
)
def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER-clause semantics) — several
    differently-filtered aggregates in ONE pass over the fact table instead
    of N filtered scans; each conditional collapses map-side before the
    single exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).cast("bigint").alias("n_high_disc"),
        F.sum(F.when(F.col("l_quantity") >= 30, 1).otherwise(0)).cast("bigint").alias("n_bulk"),
        F.coalesce(F.sum(F.when(F.col("l_tax") == 0, cents)), F.lit(0)).cast("bigint").alias("taxfree_cents"),
    )


@register(
    "scd2_customer_status_history",
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey, o_orderstatus,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
      FROM orders WHERE o_custkey < 300
    ), chg AS (
      SELECT *,
             CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
                  THEN 1 ELSE 0 END AS is_chg
      FROM s
      WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
    ), v AS (SELECT * FROM chg WHERE is_chg = 1)
    SELECT o_custkey,
           o_orderstatus,
           CAST(row_number() OVER w2 AS BIGINT) AS version,
           CAST(day AS BIGINT) AS valid_from_day,
           CAST(lead(day) OVER w2 - 1 AS BIGINT) AS valid_to_day
    FROM v
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
    """,
    tags=("scd2", "temporal", "window", "versioning"),
)
def scd2_customer_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) history build: collapse each
    customer's order-status timeline into versioned validity intervals
    [valid_from_day, valid_to_day] (open-ended current row = NULL). Change
    detection via lag, interval close via lead — one shuffle on o_custkey
    shared by all three window functions (same partitioning + ordering, so
    Catalyst plans a single Window sort, not three)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    s = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    chg = s.withColumn(
        "is_chg",
        F.when(
            ~F.lag("o_orderstatus").over(w).eqNullSafe(F.col("o_orderstatus")), 1
        ).otherwise(0),
    )
    v = chg.filter(F.col("is_chg") == 1)
    return v.select(
        "o_custkey",
        "o_orderstatus",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("day").cast("bigint").alias("valid_from_day"),
        (F.lead("day").over(w) - 1).cast("bigint").alias("valid_to_day"),
    )


@register(
    "window_value_funcs",
    """
    WITH t AS (
      SELECT o_custkey, o_orderkey,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
      FROM orders WHERE o_custkey < 200
    )
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w2 AS first_ok,
           last_value(o_orderkey) OVER w2 AS last_ok,
           nth_value(o_orderkey, 2) OVER w2 AS second_ok
    FROM t
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY day, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "value-functions"),
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions (first/last/nth) over an explicit full-
    partition ROWS frame — the frame spec is what makes last_value
    deterministic (the default frame stops at CURRENT ROW). Total order
    inside the partition via (day, o_orderkey) tie-break."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    t = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
    )
    w2 = (
        Window.partitionBy("o_custkey")
        .orderBy("day", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w2).alias("first_ok"),
        F.last("o_orderkey").over(w2).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w2).alias("second_ok"),
    )


@register(
    "unpivot_lineitem_metrics",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           CAST(ROUND(l_quantity * 10000) AS BIGINT) AS val_e4
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount',
           CAST(ROUND(l_discount * 10000) AS BIGINT) FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax',
           CAST(ROUND(l_tax * 10000) AS BIGINT) FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("unpivot", "melt", "reshape"),
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (the inverse of `pivot_orders_status`): one
    ``unpivot`` Expand node emits 3 rows per input row in the scan stage —
    no shuffle, and at scale no UNION-ALL re-scan of the fact table (the
    oracle's UNION ALL form reads it 3×; Spark reads once)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    up = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return up.select(
        "l_orderkey",
        "l_linenumber",
        "metric",
        F.round(F.col("val") * 10000).cast("bigint").alias("val_e4"),
    )


@register(
    "events_gap_fill_daily",
    """
    WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                      event_type, value
               FROM events WHERE user_id < 30),
    b AS (SELECT user_id, min(day) AS dmin, max(day) AS dmax FROM e GROUP BY user_id),
    spine AS (SELECT user_id, CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE) AS day
              FROM b),
    p AS (SELECT user_id, day, SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
          FROM e WHERE event_type = 'purchase' GROUP BY user_id, day)
    SELECT s.user_id,
           strftime(s.day, '%Y-%m-%d') AS day,
           CAST(p.cents IS NULL AS BIGINT) AS was_gap,
           last_value(p.cents IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day) AS filled_cents
    FROM spine s LEFT JOIN p ON s.user_id = p.user_id AND s.day = p.day
    """,
    tags=("timeseries", "gap-fill", "forward-fill", "spine"),
)
def events_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: build a continuous per-user day spine
    (sequence+explode — generated row-locally from each user's min/max, no
    driver loop), left-join the sparse daily purchase sums, and forward-fill
    with last-non-null over an ordered window. Days before a user's first
    purchase stay NULL (no value to carry). One shuffle on user_id shared
    by the join and the window."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    e = e.withColumn("day", F.to_date("ts"))
    bounds = e.groupBy("user_id").agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    spine = bounds.select(
        "user_id", F.explode(F.sequence("dmin", "dmax")).alias("day")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    )
    j = spine.join(p, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cents").isNull().cast("bigint").alias("was_gap"),
        F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
    )


@register(
    "histogram_order_totals",
    """
    SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM orders
    GROUP BY bucket
    """,
    tags=("histogram", "binning", "profiling"),
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals ($50k buckets) — the data-
    profiling primitive. Binning is integer floor-division on exact cents
    (engine-portable: float division would flap on bucket boundaries);
    partial aggregation collapses each map task to ≤n_buckets rows before
    the one exchange."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.select(cents.alias("cents"))
        .groupBy(F.expr("cents div 5000000").cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@register(
    "funnel_click_to_purchase",
    f"""
    WITH c AS (SELECT user_id, MIN(ts) AS first_click
               FROM events WHERE event_type = 'click' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
          GROUP BY e.user_id)
    SELECT c.user_id,
           strftime(c.first_click, '{TS_FMT_DUCK}') AS first_click,
           strftime(p.first_purchase, '{TS_FMT_DUCK}') AS first_purchase,
           CAST(p.user_id IS NOT NULL AS BIGINT) AS converted
    FROM c LEFT JOIN p ON c.user_id = p.user_id
    """,
    tags=("funnel", "behavioral", "temporal"),
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step conversion funnel: first click → first purchase at-or-after
    it, per user. Both stages are min-aggregates on user_id (partial+final),
    and every join is on user_id — one shuffle partitioning reused end to
    end, no ordering state."""
    e = load_table(spark, sf_dir, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    j = c.join(p, "user_id", "left")
    return j.select(
        "user_id",
        F.date_format("first_click", TS_FMT_SPARK).alias("first_click"),
        F.date_format("first_purchase", TS_FMT_SPARK).alias("first_purchase"),
        F.col("first_purchase").isNotNull().cast("bigint").alias("converted"),
    )


@register(
    "arrayagg_orders_per_customer",
    """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
    FROM orders
    WHERE o_custkey < 150
    GROUP BY o_custkey
    """,
    tags=("array-agg", "collect", "ordered"),
)
def arrayagg_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered grouped collection: collect_list is unordered across
    partitions (assembly order follows task completion), so the engine
    sorts the collected numeric array (array_sort) before stringifying —
    the deterministic equivalent of string_agg(... ORDER BY)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col("o_orderkey"))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("order_keys"),
        )
    )


@register(
    "bilateral_trade_volumes",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS revenue_e4,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY supp_nation, cust_nation
    """,
    tags=("join", "self-role", "tpch-q7"),
)
def bilateral_trade_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the SAME dimension (nation) joined twice under two
    roles (supplier's vs customer's nation) — aliased scans, both broadcast.
    The only large shuffle is lineitem⋈orders on the order key; everything
    downstream (supplier, customer, both nation roles) broadcasts, and the
    final group-by key is 25×25 so partial aggregation collapses it
    map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("bigint")
            ).alias("revenue_e4"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "approx_percentile_quantity",
    """
    SELECT ROUND(CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE), 2) AS q25,
           ROUND(CAST(quantile_disc(l_quantity, 0.50) AS DOUBLE), 2) AS q50,
           ROUND(CAST(quantile_disc(l_quantity, 0.75) AS DOUBLE), 2) AS q75,
           ROUND(CAST(quantile_disc(l_quantity, 0.95) AS DOUBLE), 2) AS q95
    FROM lineitem
    """,
    tags=("agg", "percentile", "sketch"),
)
def approx_percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles: percentile_approx (Greenwald-Khanna, one
    pass, mergeable partial sketches — the 100 TB path, where exact
    percentiles would need a full sort). Accuracy is set high enough that
    the sketch is EXACT at oracle scale (rank error < 1 row), so the
    discrete-quantile oracle validates it; production lowers accuracy to
    trade error for memory."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile_approx("l_quantity", [0.25, 0.50, 0.75, 0.95], 1_000_000)
    return li.agg(pct.alias("p")).select(
        F.round(F.col("p")[0], 2).alias("q25"),
        F.round(F.col("p")[1], 2).alias("q50"),
        F.round(F.col("p")[2], 2).alias("q75"),
        F.round(F.col("p")[3], 2).alias("q95"),
    )


@register(
    "sole_returning_suppliers",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("join", "semi", "anti", "agg", "tpch-q21"),
)
def sole_returning_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (correlated EXISTS + NOT EXISTS over the same fact):
    suppliers who were the ONLY supplier with returned lineitems in
    multi-supplier finished orders (reference has no joins at all — SURVEY
    §2.3; l_returnflag='R' stands in for the receipt-late predicate since
    the fixture lineitem carries no receipt/commit dates).

    Scale note: the oracle's literal plan rescans lineitem three times and
    runs two correlated self-joins. The Spark build instead aggregates the
    fact ONCE per (order, supplier) — returned-item counts — then derives
    the per-order supplier/returner counts with a window over that
    already-reduced frame (no self-join, no second fact scan), turning
    both EXISTS into a single `n_supp > 1 AND n_ret_supp == 1` predicate.
    One lineitem scan, two shuffles over reduced data; supplier broadcasts
    at the end (plan shape asserted in tests/test_plans.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", F.lit(1))).alias("n_ret")
    )
    w = Window.partitionBy("l_orderkey")
    return (
        per_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_ret_supp", F.sum((F.col("n_ret") > 0).cast("int")).over(w))
        .filter(
            (F.col("n_ret") > 0) & (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
        )
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_ret").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "order_count_distribution",
    """
    SELECT order_cnt AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority NOT LIKE '1-%'
        GROUP BY c.c_custkey
    )
    GROUP BY order_cnt
    """,
    tags=("join", "outer", "agg", "two-level", "tpch-q13"),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer distribution by non-urgent order count.
    The distinctive pieces the catalog lacked: a NON-KEY predicate inside
    the LEFT JOIN's ON clause (filters the right side without dropping
    order-less customers — semantically different from a WHERE) and a
    second-level aggregation over a first aggregate's result.

    Scale note: first group-by shuffles on c_custkey (the join's own key,
    so AQE can chain them); the second groups ~tens of distinct counts —
    partial aggregation collapses it map-side to almost nothing.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (~o.o_orderpriority.like("1-%")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
        .groupBy("order_cnt")
        .agg(F.count("*").alias("custdist"))
        .select(F.col("order_cnt").alias("c_count"), "custdist")
    )


@register(
    "window_distribution_funcs",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(FLOOR(PERCENT_RANK() OVER (PARTITION BY o_orderstatus
                                           ORDER BY o_totalprice, o_orderkey)
                      * 10000.0 + 0.5) AS BIGINT) AS price_pct_rank_e4,
           CAST(FLOOR(CUME_DIST() OVER (PARTITION BY o_orderstatus
                                        ORDER BY o_totalprice, o_orderkey)
                      * 10000.0 + 0.5) AS BIGINT) AS price_cume_dist_e4
    FROM orders WHERE o_orderkey < 3000
    """,
    tags=("window", "distribution"),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — the distribution members of the window
    family, completing rank/dense_rank/ntile/row_number. Both are exact
    small-integer ratios ((rank-1)/(n-1), rank/n) computed identically by
    every engine, emitted as e4 fixed-point BIGINT per the registry's
    no-rounded-doubles doctrine; the ordering is made total with the key
    tie-break so ranks are deterministic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")

    def e4(x):
        return F.floor(x * F.lit(10000.0) + F.lit(0.5)).cast("bigint")

    return o.select(
        "o_orderkey",
        "o_orderstatus",
        e4(F.percent_rank().over(w)).alias("price_pct_rank_e4"),
        e4(F.cume_dist().over(w)).alias("price_cume_dist_e4"),
    )


def _merge_upsert_oracle() -> str:
    from data_ingestion_bra_spark.operators.sampling import hex_threshold

    thr = hex_threshold(0.1)
    cents = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
    return f"""
    WITH base AS (SELECT o_orderkey, o_orderstatus, {cents} AS total_cents,
                         'base' AS src
                  FROM orders),
    samp AS (SELECT * FROM orders
             WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6) < '{thr}'),
    upd AS (SELECT o_orderkey, 'U' AS o_orderstatus,
                   CAST(FLOOR(({cents} * 105) / 100.0) AS BIGINT) AS total_cents,
                   'upd' AS src
            FROM samp),
    ins AS (SELECT -o_orderkey AS o_orderkey, 'N' AS o_orderstatus,
                   {cents} AS total_cents, 'ins' AS src
            FROM samp),
    chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
    SELECT b.o_orderkey, b.o_orderstatus, b.total_cents, b.src
    FROM base b ANTI JOIN chg c ON b.o_orderkey = c.o_orderkey
    UNION ALL
    SELECT * FROM chg
    """


@register(
    "incremental_merge_upsert",
    _merge_upsert_oracle(),
    tags=("merge", "upsert", "cdc", "incremental"),
)
def incremental_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO-shaped upsert without a table format (the incremental
    surface the reference's full-snapshot bronze never had): a CDC batch —
    derived deterministically from ``orders`` by content-hash sampling 10%
    of keys as updates (+5% price, status 'U') and re-emitting them as
    inserts under NEGATED keys (TPC-H orderkeys are positive at every SF,
    so negation can never collide with a real base key the way a fixed
    +10M offset did from ~sf2.5 up) — merges into the base by key. The base side
    never shuffles: matched keys are removed via an anti-join against a
    BROADCAST of the changeset keys, then the changeset unions in; at
    100 TB the only cost is one base scan, and with a partitioned base the
    replaced keys prune to their partitions (dynamic partition overwrite is
    the write-side twin in sinks/)."""
    from data_ingestion_bra_spark.operators.merge import merge_upsert
    from data_ingestion_bra_spark.operators.sampling import deterministic_sample

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.select(
        "o_orderkey", "o_orderstatus", cents.alias("total_cents"), F.lit("base").alias("src")
    )
    samp = deterministic_sample(orders, ["o_orderkey"], 0.1)
    updates = samp.select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.floor((cents * 105) / F.lit(100.0)).cast("bigint").alias("total_cents"),
        F.lit("upd").alias("src"),
    )
    inserts = samp.select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        cents.alias("total_cents"),
        F.lit("ins").alias("src"),
    )
    return merge_upsert(base, updates.unionByName(inserts), ["o_orderkey"])


@register(
    "customer_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT MAX(last_order) AS maxd FROM base),
    rfm AS (
      SELECT custkey,
             CAST(a.maxd - last_order AS BIGINT) AS recency_days,
             frequency, monetary_cents,
             NTILE(4) OVER (ORDER BY a.maxd - last_order ASC, custkey) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m
      FROM base, anchor a
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
           CAST(MIN(recency_days) AS BIGINT) AS min_recency_days,
           CAST(MAX(frequency) AS BIGINT) AS max_frequency
    FROM rfm GROUP BY r, f, m
    """,
    tags=("analytics", "rfm", "segmentation", "window"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles — the
    classic customer-value grid), rolled up per (r, f, m) cell. NTILE
    boundaries are deterministic because every NTILE orders with a custkey
    tie-break, and both engines compute NTILE by the same row-count split
    rule; money stays integer cents and recency exact date arithmetic
    against the corpus max-date anchor (a 1-row broadcast).

    Scale shape: one partial-aggregable groupBy(custkey) over orders, a
    1-row anchor attach, three NTILE windows over the |customers|-sized
    aggregate (single total order each — the documented small-aggregate
    exception; at true 100 TB customer counts, swap NTILE for the
    percentile-rank bucketing over a distributed sort), one final
    |cells|-sized roll-up."""
    base = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
    )
    anchor = base.agg(F.max("last_order").alias("maxd"))
    rfm = (
        base.join(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("maxd", "last_order").cast("bigint"))
        .withColumn(
            "r",
            F.ntile(4).over(Window.orderBy(F.col("recency_days").asc(), "custkey")),
        )
        .withColumn(
            "f", F.ntile(4).over(Window.orderBy(F.col("frequency").desc(), "custkey"))
        )
        .withColumn(
            "m",
            F.ntile(4).over(
                Window.orderBy(F.col("monetary_cents").desc(), "custkey")
            ),
        )
    )
    return rfm.groupBy(
        F.col("r").cast("bigint").alias("r"),
        F.col("f").cast("bigint").alias("f"),
        F.col("m").cast("bigint").alias("m"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
        F.min("recency_days").cast("bigint").alias("min_recency_days"),
        F.max("frequency").cast("bigint").alias("max_frequency"),
    )


@register(
    "linkage_customers_fellegi_sunter",
    """
    WITH a AS (
      SELECT c_custkey AS a_key, c_name AS name_a,
             substr(c_name, length(c_name) - 2, 3) AS suffix_a,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents_a,
             c_nationkey AS nation_a,
             c_mktsegment AS blk_seg,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) // 10000 AS bucket
      FROM customer
    ),
    b AS (
      SELECT c_custkey AS b_key,
             CASE WHEN c_custkey % 5 = 0
                  THEN replace(c_name, 'Customer', 'Custmer')
                  ELSE c_name END AS name_b,
             substr(c_name, length(c_name) - 2, 3) AS suffix_b,
             CAST(ROUND(c_acctbal * 100) AS BIGINT)
               + (c_custkey % 7) * 100 AS cents_b,
             CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25
                  ELSE c_nationkey END AS nation_b,
             CASE WHEN c_custkey % 13 = 0 THEN reverse(c_mktsegment)
                  ELSE c_mktsegment END AS blk_seg,
             (CAST(ROUND(c_acctbal * 100) AS BIGINT)
              + (c_custkey % 7) * 100) // 10000 AS bucket
      FROM customer
    ),
    p AS (SELECT * FROM a JOIN b USING (blk_seg, bucket)),
    scored AS (
      SELECT a_key, b_key,
             CASE WHEN levenshtein(name_a, name_b) <= 1 THEN 1 ELSE 0 END AS f0,
             CASE WHEN suffix_a = suffix_b THEN 1 ELSE 0 END AS f1,
             CASE WHEN ABS(cents_a - cents_b) <= 700 THEN 1 ELSE 0 END AS f2,
             CASE WHEN nation_a = nation_b THEN 1 ELSE 0 END AS f3
      FROM p
    ),
    s AS (
      SELECT a_key, b_key,
             CAST(f0 + f1*2 + f2*4 + f3*8 AS BIGINT) AS pattern,
             CAST(CASE WHEN f0 = 1 THEN 320 ELSE -160 END
                + CASE WHEN f1 = 1 THEN 300 ELSE -100 END
                + CASE WHEN f2 = 1 THEN 250 ELSE -180 END
                + CASE WHEN f3 = 1 THEN 120 ELSE -220 END AS BIGINT) AS score_e2
      FROM scored
    )
    SELECT a_key, b_key, pattern, score_e2,
           CASE WHEN score_e2 >= 600 THEN 'match'
                WHEN score_e2 >= 150 THEN 'possible'
                ELSE 'non_match' END AS verdict,
           CAST(a_key = b_key AS BIGINT) AS is_true
    FROM s
    """,
    tags=("linkage", "entity-resolution", "fellegi-sunter", "blocking"),
)
def linkage_customers_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBABILISTIC record linkage by the Fellegi-Sunter decision model
    (JASA 1969) — the scoring tier entity resolution needs ABOVE candidate
    generation (SNM/LSH say which pairs to look at; this says how much the
    evidence supports a link). The fixture is the classic linkage
    evaluation setup: the customer file linked against a deterministically
    CORRUPTED mirror of itself (name typo every 5th key, acctbal drift
    (k%7)*100 cents, nation bump every 11th, segment scramble every 13th)
    so candidate pairs carry realistic mixed agreement patterns AND known
    ground truth (``is_true``).

    Chain (operators/linkage.py): BLOCKING equi-join on (market segment,
    $100-acctbal bucket) — never an all-pairs product; four deterministic
    field comparators (bounded Levenshtein, equality, difference window)
    -> bit-packed agreement ``pattern``; committed integer centi-log-odds
    weights (the langid/LM committed-weights discipline; EM would fit
    these in production) -> ``score_e2``; two Fellegi-Sunter thresholds ->
    match / possible / non_match. Every stage is integer/boolean SQL the
    oracle replays bit-for-bit.

    Scale shape: the corpus-sized work is two projections + one blocking
    equi-join; scoring is row-local (zero added exchanges). Blocking-key
    recall losses (acctbal drift across a bucket edge, segment scramble)
    are the documented real-world trade; production adds passes with
    rotated blocking keys exactly like the SNM multi-pass."""
    from data_ingestion_bra_spark.operators.linkage import fellegi_sunter_score

    c = load_table(spark, sf_dir, "customer")
    cents = F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)")
    a = c.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("name_a"),
        F.expr("substring(c_name, length(c_name) - 2, 3)").alias("suffix_a"),
        cents.alias("cents_a"),
        F.col("c_nationkey").alias("nation_a"),
        F.col("c_mktsegment").alias("blk_seg"),
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT) div 10000").alias("bucket"),
    )
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.expr(
            "CASE WHEN c_custkey % 5 = 0"
            " THEN replace(c_name, 'Customer', 'Custmer') ELSE c_name END"
        ).alias("name_b"),
        F.expr("substring(c_name, length(c_name) - 2, 3)").alias("suffix_b"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) + (c_custkey % 7) * 100"
        ).alias("cents_b"),
        F.expr(
            "CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25"
            " ELSE c_nationkey END"
        ).alias("nation_b"),
        F.expr(
            "CASE WHEN c_custkey % 13 = 0 THEN reverse(c_mktsegment)"
            " ELSE c_mktsegment END"
        ).alias("blk_seg"),
        F.expr(
            "(CAST(ROUND(c_acctbal * 100) AS BIGINT) + (c_custkey % 7) * 100)"
            " div 10000"
        ).alias("bucket"),
    )
    pairs = a.join(b, ["blk_seg", "bucket"])
    comparators = [
        ("name", F.expr("levenshtein(name_a, name_b) <= 1"), 320, -160),
        ("suffix", F.col("suffix_a") == F.col("suffix_b"), 300, -100),
        ("acctbal", F.expr("abs(cents_a - cents_b) <= 700"), 250, -180),
        ("nation", F.col("nation_a") == F.col("nation_b"), 120, -220),
    ]
    scored = fellegi_sunter_score(
        pairs, comparators, match_threshold_e2=600, possible_threshold_e2=150
    )
    return scored.select(
        "a_key",
        "b_key",
        "pattern",
        "score_e2",
        "verdict",
        (F.col("a_key") == F.col("b_key")).cast("bigint").alias("is_true"),
    )


@register(
    "approx_quantiles_histogram",
    """
    WITH v AS (SELECT l_returnflag,
                      CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
               FROM lineitem),
    hist AS (SELECT l_returnflag,
                    LEAST(GREATEST(c // 4096, 0), 4095) AS bin,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM v GROUP BY l_returnflag, bin),
    qs AS (SELECT unnest([5000, 9000, 9900]) AS q_e4),
    cum AS (SELECT l_returnflag, bin, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY l_returnflag
                                       ORDER BY bin) AS BIGINT) AS cum,
                   CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
            FROM hist),
    hit AS (SELECT l_returnflag, q_e4, n, MIN(bin) AS bin
            FROM cum CROSS JOIN qs
            WHERE cum >= (q_e4 * n + 9999) // 10000
            GROUP BY l_returnflag, q_e4, n),
    est AS (SELECT l_returnflag, CAST(q_e4 AS BIGINT) AS q_e4, n,
                   CAST((bin + 1) * 4096 - 1 AS BIGINT) AS est_hi_cents
            FROM hit),
    ranked AS (SELECT l_returnflag, c,
                      ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn,
                      COUNT(*) OVER (PARTITION BY l_returnflag) AS nn
               FROM v),
    exact AS (SELECT r.l_returnflag, CAST(q.q_e4 AS BIGINT) AS q_e4,
                     CAST(r.c AS BIGINT) AS exact_cents
              FROM ranked r CROSS JOIN qs q
              WHERE r.rn = (q.q_e4 * r.nn + 9999) // 10000)
    SELECT e.l_returnflag, e.q_e4, e.n, e.est_hi_cents, x.exact_cents,
           CAST(x.exact_cents <= e.est_hi_cents
                AND x.exact_cents > e.est_hi_cents - 4096 AS BIGINT) AS within_bin
    FROM est e JOIN exact x
      ON e.l_returnflag = x.l_returnflag AND e.q_e4 = x.q_e4
    """,
    tags=("sketch", "quantile", "histogram", "approx", "mergeable-summary"),
)
def approx_quantiles_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from an EQUI-WIDTH HISTOGRAM summary — the
    QUANTILE member of the mergeable-summary family (LSH: membership, MG:
    frequent keys, KMV: distinct counts, CMS: any-key frequency, this:
    distribution shape). The deterministic fixed-bin alternative to
    GK/KLL: on a bounded integer domain (price cents here; micros, day
    numbers, token counts generally), 4096 bins x 4096-cent width give a
    HARD derived error bound of one bin width — the true discrete
    quantile provably lies in (est - 4096, est] — with exact cell-wise-sum
    mergeability (counting is linear, the CMS argument) and a summary of
    at most n_bins rows per group forever. p50/p90/p99 of extended price
    per return flag, with the exact rank-based quantile riding alongside
    and the containment verdict hash-gated corpus-wide.

    Plan shape (operators/sketch.py): the corpus-sized work is ONE
    partial-aggregable (group, bin) groupBy; the cumsum window and the
    rank selection run over <= n_bins summary rows per group. The exact
    side (a full per-group sort window) exists for the self-audit at
    fixture scale — at 100 TB only the histogram build touches the data.
    Power-of-two bin widths keep every edge computation exact in BIGINT on
    both engines."""
    from pyspark.sql.window import Window as W

    from data_ingestion_bra_spark.operators.sketch import (
        histogram_quantiles,
        histogram_summaries,
    )

    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("c"),
    ).localCheckpoint(eager=True)  # feeds the histogram AND the exact audit
    hist = histogram_summaries(
        v, ["l_returnflag"], "c", lo=0, bin_width=4096, n_bins=4096
    )
    est = histogram_quantiles(
        hist, ["l_returnflag"], [5000, 9000, 9900], lo=0, bin_width=4096
    ).select(
        "l_returnflag",
        "q_e4",
        "n",
        F.col("est_hi").alias("est_hi_cents"),
    )
    ranked = v.withColumn(
        "rn", F.row_number().over(W.partitionBy("l_returnflag").orderBy("c"))
    ).withColumn(
        "nn", F.count(F.lit(1)).over(W.partitionBy("l_returnflag")).cast("bigint")
    )
    qs = spark.createDataFrame([(5000,), (9000,), (9900,)], "q_e4 bigint")
    exact = (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.expr("rn = (q_e4 * nn + 9999) div 10000"))
        .select("l_returnflag", "q_e4", F.col("c").cast("bigint").alias("exact_cents"))
    )
    return est.join(exact, ["l_returnflag", "q_e4"]).select(
        "l_returnflag",
        "q_e4",
        "n",
        "est_hi_cents",
        "exact_cents",
        (
            (F.col("exact_cents") <= F.col("est_hi_cents"))
            & (F.col("exact_cents") > F.col("est_hi_cents") - 4096)
        )
        .cast("bigint")
        .alias("within_bin"),
    )


def _bloom_md5_positions(m_bits: int, k: int):
    """Engine-portable bloom probe positions: hash j of a key is the 48-bit
    md5 prefix of ``"j:" || key`` mod m_bits (the ``operators/sketch.py``
    md5-prefix discipline; DuckDB replays it as
    ``('0x' || substr(md5(j || ':' || key), 1, 12))::BIGINT % m``), so the
    BITMAP ITSELF — not just the exact-join result — is oracle-checkable.
    The xxhash64 default in ``operators/bloom.py`` is faster and right for
    production; this variant exists for audited, cross-engine parity."""

    def pos(c):
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{j}:"), c.cast("string"))), 1, 12
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(m_bits),
            )
            for j in range(k)
        ]

    return pos


@register(
    "join_bloom_runtime_filter",
    """
    WITH keys AS (
      SELECT DISTINCT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    pos AS (
      SELECT ('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                                 || CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT
             % 65536 AS p
      FROM keys, (SELECT UNNEST([0, 1, 2]) AS i)
    ),
    words AS (
      SELECT p // 64 AS w,
             bit_or((1::HUGEINT) << CAST(p % 64 AS INT)) AS word
      FROM pos GROUP BY 1
    ),
    probe AS (
      SELECT l_orderkey, l_returnflag,
             ('0x' || substr(md5('0:' || CAST(l_orderkey AS VARCHAR)), 1, 12))::BIGINT % 65536 AS p0,
             ('0x' || substr(md5('1:' || CAST(l_orderkey AS VARCHAR)), 1, 12))::BIGINT % 65536 AS p1,
             ('0x' || substr(md5('2:' || CAST(l_orderkey AS VARCHAR)), 1, 12))::BIGINT % 65536 AS p2
      FROM lineitem
    ),
    verdict AS (
      SELECT pr.l_orderkey, pr.l_returnflag,
             CASE WHEN COALESCE((w0.word >> CAST(pr.p0 % 64 AS INT)) & 1, 0) = 1
                   AND COALESCE((w1.word >> CAST(pr.p1 % 64 AS INT)) & 1, 0) = 1
                   AND COALESCE((w2.word >> CAST(pr.p2 % 64 AS INT)) & 1, 0) = 1
                  THEN 1 ELSE 0 END AS pass
      FROM probe pr
      LEFT JOIN words w0 ON w0.w = pr.p0 // 64
      LEFT JOIN words w1 ON w1.w = pr.p1 // 64
      LEFT JOIN words w2 ON w2.w = pr.p2 // 64
    ),
    base AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(pass) AS BIGINT) AS n_pass_bloom
      FROM verdict GROUP BY l_returnflag
    ),
    matched AS (
      SELECT v.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_match_exact
      FROM verdict v JOIN keys k ON v.l_orderkey = k.o_orderkey
      WHERE v.pass = 1
      GROUP BY v.l_returnflag
    )
    SELECT b.l_returnflag, b.n_rows, b.n_pass_bloom,
           CAST(COALESCE(m.n_match_exact, 0) AS BIGINT) AS n_match_exact,
           CAST(b.n_pass_bloom - COALESCE(m.n_match_exact, 0) AS BIGINT)
             AS n_false_pos,
           CAST(CASE WHEN b.n_rows = COALESCE(m.n_match_exact, 0) THEN NULL
                     ELSE (b.n_pass_bloom - COALESCE(m.n_match_exact, 0))
                          * 1000000 // (b.n_rows - COALESCE(m.n_match_exact, 0))
                END AS BIGINT) AS fp_rate_e6
    FROM base b LEFT JOIN matched m USING (l_returnflag)
    """,
    tags=("join", "bloom", "runtime-filter", "engine-internals"),
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNTIME-FILTER join audit — the build/ship/probe discipline of
    Spark's own ``InjectRuntimeFilter`` bloom join, expressed as an
    explicit, measurable operator. The 100 TB join problem it models: a
    full fact scan (lineitem) shuffled into a join against a SELECTIVE dim
    (urgent orders) wastes the shuffle on rows that can never match; a
    bloom filter built from the dim keys and broadcast as a FIXED-SIZE
    bitmap (here 64 Kb = 8 KiB, 3 probes) strikes non-matching fact rows
    row-locally BEFORE any exchange, and only bloom survivors (true
    matches + a measured sliver of false positives) reach the exact
    confirm join.

    Unlike ``dedup_contamination_bloom`` (whose oracle checks the exact
    RESULT, treating the bitmap as transparent), this entry's OUTPUT is
    the filter audit itself: per returnflag, probed rows, bloom-pass
    count, exact-match count, false positives, and the false-positive
    rate over true negatives (e6 fixed point). That makes the bitmap
    cross-engine-checkable bit for bit, so the md5-prefix position hash
    (``operators/sketch.py`` discipline) replaces the production xxhash64:
    DuckDB rebuilds the identical bitmap and must count identical FPs.

    Scale shape: the build side is one distinct + 3-position explode over
    the (small) filtered dim; the bitmap rides the allow-listed 1-row
    broadcast attach (the ``dedup_contamination_bloom`` shape); probes are
    whole-stage-codegen md5 expressions; the exact confirm join carries
    ONLY bloom survivors against the broadcast dim keys — at fixture
    selectivity that's ~20% of the fact relation ever reaching a join,
    and the fact table is never shuffled at all (broadcast-hash confirm).
    """
    from data_ingestion_bra_spark.operators import bloom

    m_bits, k = 65536, 3
    pos_fn = _bloom_md5_positions(m_bits, k)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .distinct()
    )
    # the 1-row bitmap feeds BOTH audit branches (per-flag base counts and
    # the survivor confirm join); checkpoint so the build subtree
    # (distinct + explode + bit_or groupBy + range densify) runs once, not
    # once per branch — 8 KiB of control-plane state
    bf = bloom.build_bloom_df(
        keys, "o_orderkey", m_bits=m_bits, pos_fn=pos_fn
    ).localCheckpoint(eager=True)
    probed = bloom.bloom_probe(
        li, "l_orderkey", bf, "pass", m_bits=m_bits, pos_fn=pos_fn
    )
    base = probed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("pass").cast("bigint").alias("n_pass_bloom"),
    )
    survivors = probed.filter(F.col("pass") == 1)
    matched = (
        survivors.join(
            F.broadcast(keys),
            survivors["l_orderkey"] == keys["o_orderkey"],
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_match_exact"))
    )
    out = base.join(matched, "l_returnflag", "left").select(
        "l_returnflag",
        "n_rows",
        "n_pass_bloom",
        F.coalesce("n_match_exact", F.lit(0)).cast("bigint").alias("n_match_exact"),
        (F.col("n_pass_bloom") - F.coalesce("n_match_exact", F.lit(0)))
        .cast("bigint")
        .alias("n_false_pos"),
    )
    return out.withColumn(
        "fp_rate_e6",
        F.expr(
            "CAST(CASE WHEN n_rows = n_match_exact THEN NULL"
            "     ELSE n_false_pos * 1000000 div (n_rows - n_match_exact)"
            "     END AS BIGINT)"
        ),
    )
