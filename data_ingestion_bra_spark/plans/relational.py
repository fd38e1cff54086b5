"""Relational query tier — reference operators (SURVEY §2) + the Spark
free-tier the reference provably lacks (joins, group-by, windows, set ops,
rollup/cube, pivot).

Scale notes are inline per query: broadcast hints on dimension sides, single
shuffle per aggregation, deterministic tie-breaks wherever row order feeds a
limit (SURVEY §2.6 note on O3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_bra_spark.functions.cleaning import to_float_pt, to_int, to_str
from data_ingestion_bra_spark.plans.registry import register
from data_ingestion_bra_spark.sources.tables import load_table

FLAGSHIP_CUSTOMER = "Customer#000000042"


# --------------------------------------------------------------------------
# Flagship: the reference's one semantic join (SURVEY §2.3) — "posts of the
# user named X" ≡ "orders of the customer named X". Reference executes it as
# filter → scalar extract → key-parameterized rescan
# (app/ingestao_api.py:161-170); Spark-first form is a broadcast hash join.
# --------------------------------------------------------------------------
@register(
    "flagship_customer_orders",
    f"""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE)::VARCHAR AS order_date,
           ROUND(o.o_totalprice, 2) AS total_price,
           c.c_name AS customer_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_name = '{FLAGSHIP_CUSTOMER}'
    ORDER BY o.o_orderkey
    """,
    tags=("join", "filter", "sort", "flagship"),
)
def flagship_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of a named customer: filter + broadcast join + project + sort.

    Ref pattern: app/ingestao_api.py:161-170 (users→posts semi-join reduction).
    At 100 TB: the filtered dimension is tiny → broadcast join, no shuffle of
    the fact side; Parquet scan gets the o_custkey filter only via the join,
    so AQE converts it to a DPP-style reduction when partitioned by custkey.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_name") == FLAGSHIP_CUSTOMER)
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("c_name").alias("customer_name"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Group-by aggregation (ABSENT in reference, SURVEY §2.4) — TPC-H Q1 shape.
# --------------------------------------------------------------------------
@register(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
             AS sum_disc_e4,
           CAST((SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) * 100) // COUNT(*) AS BIGINT)
             AS avg_qty_e4,
           CAST((SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) * 100) // COUNT(*) AS BIGINT)
             AS avg_disc_e4,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with map-side partial agg; one shuffle on the group keys.

    Money/quantity sums are exact fixed-point BIGINT (2 dp for stored-2dp
    columns, 4 dp for the price×(1-disc) product, which has exactly 4
    decimals) — a summed double depends on Spark's partial-merge order and
    is a latent cross-engine hash flap; integers cannot drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("sum_qty_e2"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("sum_base_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("bigint")
            ).alias("sum_disc_e4"),
            # fixed-point averages (see temporal.py note on float boundaries)
            F.expr(
                "CAST((SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) * 100) div COUNT(*) AS BIGINT)"
            ).alias("avg_qty_e4"),
            F.expr(
                "CAST((SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) * 100) div COUNT(*) AS BIGINT)"
            ).alias("avg_disc_e4"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projection + equality filter (P1/P2/F1 — app/ingestao_api.py:161-162,183)
# --------------------------------------------------------------------------
@register(
    "filter_project_segment",
    """
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("filter", "project"),
)
def filter_project_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter + column-subset projection; filter and the 3-column
    ReadSchema both push into the Parquet scan (verified via explain)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )


# --------------------------------------------------------------------------
# Sort + limit (O1/O2/O3) with deterministic tie-break — SURVEY §2.6 note.
# --------------------------------------------------------------------------
@register(
    "sort_limit_top_orders",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps, no full
    sort, no single-node shuffle. o_orderkey tie-break makes it deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "o_orderpriority")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Join family (ABSENT tier, SURVEY §2.3): inner chain, outer, semi, anti.
# --------------------------------------------------------------------------
@register(
    "join_customers_per_region",
    """
    SELECT r.r_name AS region_name, CAST(COUNT(*) AS BIGINT) AS customer_cnt,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join", "agg"),
)
def join_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join chain: both dims broadcast (25 / 5 rows at any SF —
    nation and region are fixed-cardinality), so the fact side never shuffles
    for the join; the only shuffle is the final tiny group-by."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("customer_cnt"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("sum_acctbal_cents"),
        )
    )


@register(
    "join_left_outer_order_counts",
    """
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "outer", "agg"),
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_semi_customers_with_open_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    tags=("join", "semi"),
)
def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence check without duplicating the left side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Distinct / count-distinct (ABSENT tier, SURVEY §2.4).
# --------------------------------------------------------------------------
@register(
    "distinct_mktsegments",
    "SELECT DISTINCT c_mktsegment FROM customer",
    tags=("distinct",),
)
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct = hash aggregate on the projected column (partial+final)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "count_distinct_customers_per_status",
    """
    SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("distinct", "agg"),
)
def count_distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (expand + two-phase agg under the hood)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(F.countDistinct("o_custkey").alias("n_customers"))


@register(
    "approx_count_distinct_customers",
    # Sketch estimates are engine-specific, so the raw approx value can't be
    # hash-compared. Instead each engine validates ITS OWN sketch against its
    # own exact count in-query; the compared columns are (group, exact,
    # rel_err_ok) — an error-bound gate that is hash-checkable.
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
           (abs(CAST(approx_count_distinct(o_custkey) AS BIGINT)
                - COUNT(DISTINCT o_custkey))
              <= 0.05 * COUNT(DISTINCT o_custkey)) AS rel_err_ok
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("distinct", "approx"),
)
def approx_count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.02): the 100 TB-scale path
    for cardinality — one pass, constant memory, no expand. The query emits
    the exact count plus ``rel_err_ok`` (sketch within 5% of exact), so the
    sketch's error bound — not its engine-specific estimate — is what the
    oracle hash-verifies."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers_exact"),
            F.approx_count_distinct("o_custkey", 0.02).alias("_approx"),
        )
        .select(
            "o_orderstatus",
            "n_customers_exact",
            (
                F.abs(F.col("_approx") - F.col("n_customers_exact"))
                <= 0.05 * F.col("n_customers_exact")
            ).alias("rel_err_ok"),
        )
    )


# --------------------------------------------------------------------------
# Set operations (ABSENT tier, SURVEY §2.7).
# --------------------------------------------------------------------------
@register(
    "set_union_active_keys",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    UNION
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_active_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("bigint").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("bigint").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect_nation_keys",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present in BOTH customer and supplier: INTERSECT."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("bigint").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("bigint").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except_nation_keys",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey FROM nation
    EXCEPT
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_except_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with no supplier: EXCEPT (distinct)."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").cast("bigint").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("bigint").alias("nationkey"))
    return n.exceptAll(s).distinct()


# --------------------------------------------------------------------------
# Window functions (ABSENT tier, SURVEY §2.5).
# --------------------------------------------------------------------------
@register(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total_price,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-k via row_number; deterministic tie-break on o_orderkey.

    At scale: one shuffle on o_custkey; rank filter is applied before any
    further join (Spark pushes the rn<=3 filter into the window via
    WindowGroupLimit in recent versions)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


@register(
    "window_running_total_per_customer",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS running_cents
    FROM orders
    """,
    tags=("window", "analytic"),
)
def window_running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit rows frame over integer cents — exact
    arithmetic, so neither frame evaluation order nor DuckDB's HUGEINT
    window-sum representation can perturb the hash (the oracle casts back
    to BIGINT per the registry convention)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .over(w)
        .cast("bigint")
        .alias("running_cents"),
    )


@register(
    "window_lag_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           CAST(DATE_DIFF('day',
                CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey) AS DATE),
                CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
    FROM orders
    """,
    tags=("window", "analytic"),
)
def window_lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: days since the customer's previous order (null for first)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate")).over(w).cast("date"),
        )
        .cast("bigint")
        .alias("gap_days"),
    )


# --------------------------------------------------------------------------
# Rollup / cube / grouping sets / pivot (ABSENT tier, SURVEY §2.4).
# --------------------------------------------------------------------------
@register(
    "rollup_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup", "agg"),
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) → (status) → grand total."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("sum_cents"),
    )


@register(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube", "agg"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of (status, priority)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@register(
    "pivot_orders_status",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cnt_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cnt_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS cnt_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot", "agg"),
)
def pivot_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit values list (no extra distinct-values job —
    the pattern that matters at scale)."""
    o = load_table(spark, sf_dir, "orders")
    p = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


# --------------------------------------------------------------------------
# Scalar cast suite — the reference's distinctive semantics (SURVEY §2.8).
# Strings are synthesized deterministically from lineitem so the pt-BR parse
# chain, quote-strip, and null-coercion are all exercised with an oracle.
# --------------------------------------------------------------------------
@register(
    "scalar_cast_suite",
    r"""
    SELECT l_orderkey, l_linenumber,
           CAST(replace(replace(qty_pt, '.', ''), ',', '.') AS DOUBLE) AS qty_parsed,
           regexp_replace(trim(quoted_flag), '^"|"$', '', 'g') AS flag_clean,
           CAST(TRY_CAST(TRY_CAST(int_str AS DOUBLE) AS BIGINT) AS BIGINT) AS int_parsed
    FROM (
      SELECT l_orderkey, l_linenumber,
             replace(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR), '.', ',') AS qty_pt,
             concat('  "', l_returnflag, '"  ') AS quoted_flag,
             CASE WHEN l_linenumber = 1 THEN 'not-a-number'
                  ELSE CAST(l_orderkey AS VARCHAR) END AS int_str
      FROM lineitem
      WHERE l_orderkey < 500
    )
    """,
    tags=("cast", "scalar", "reference-parity"),
)
def scalar_cast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_float_pt / to_str / to_int on synthesized strings (SURVEY §1.2).

    Ref: app/utils/casting.py:5-24. Inputs are built from lineitem columns so
    both engines see identical strings; invalid ints coerce to NULL (non-ANSI
    cast ≙ pandas errors="coerce")."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    staged = li.select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace(
            F.col("l_quantity").cast("decimal(12,2)").cast("string"), r"\.", ","
        ).alias("qty_pt"),
        F.concat(F.lit('  "'), F.col("l_returnflag"), F.lit('"  ')).alias("quoted_flag"),
        F.when(F.col("l_linenumber") == 1, F.lit("not-a-number"))
        .otherwise(F.col("l_orderkey").cast("string"))
        .alias("int_str"),
    )
    return staged.select(
        "l_orderkey",
        "l_linenumber",
        to_float_pt("qty_pt").alias("qty_parsed"),
        to_str("quoted_flag").alias("flag_clean"),
        to_int("int_str").alias("int_parsed"),
    )


# --------------------------------------------------------------------------
# Manifest aggregates (A1/A2, app/utils/metadata.py:123,32-33): single-pass
# row count + per-column null counts.
# --------------------------------------------------------------------------
@register(
    "manifest_null_counts_documents",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS linhas,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_doc_id,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_text,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_lang,
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_source,
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_n_chars
    FROM documents
    """,
    tags=("agg", "manifest", "reference-parity"),
)
def manifest_null_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One job computes the manifest's linhas + nulos map (SURVEY §2.4 A1/A2)
    instead of the reference's per-column passes."""
    d = load_table(spark, sf_dir, "documents")
    aggs = [F.count("*").alias("linhas")] + [
        F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulos_{c}") for c in d.columns
    ]
    return d.agg(*aggs)


# --------------------------------------------------------------------------
# JSON extraction (scale analog of the reference's resp.json() validation,
# SURVEY §2.8 J1): from_json/get_json_object over the events.props column.
# --------------------------------------------------------------------------
@register(
    "json_extract_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("json", "scalar"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object + cast + aggregate, all JVM-side expressions."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count("*").alias("n"),
    )
