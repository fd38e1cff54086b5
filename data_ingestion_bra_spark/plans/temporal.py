"""Temporal / event-stream query tier over the ``events`` fixture.

Batch twins of the streaming operators (SURVEY §2.10 — ABSENT in the
reference, added Spark-native): tumbling / sliding / session windows, plus
as-of and range joins. The streaming module reuses the same expressions with
``readStream`` + watermarks; these batch forms are what the DuckDB oracle
can check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_bra_spark.operators.temporal import asof_join_backward, range_join_count
from data_ingestion_bra_spark.plans.registry import register
from data_ingestion_bra_spark.sources.tables import load_table

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "events_tumbling_hourly",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window-agg", "streaming-twin"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — batch twin of the streaming
    ``groupBy(window('ts','1 hour'))`` (streaming/jobs.py uses the same
    expression behind a watermark)."""
    e = load_table(spark, sf_dir, "events")
    # sum integer cents, not doubles: a ROUND(SUM(double),2) output depends
    # on Spark's nondeterministic partial-merge order near .005 boundaries
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        )
        .select(
            F.date_format("w.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


@register(
    "events_sliding_30m",
    f"""
    WITH t AS (
      SELECT value,
             date_trunc('hour', ts)
               + CASE WHEN ts - date_trunc('hour', ts) >= INTERVAL 30 MINUTE
                      THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS t30
      FROM events
    )
    SELECT strftime(ws, '{TS_FMT_DUCK}') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST((SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100) // COUNT(*) AS BIGINT)
             AS avg_value_e4
    FROM (SELECT unnest([t30, t30 - INTERVAL 30 MINUTE]) AS ws, value FROM t)
    GROUP BY ws
    """,
    tags=("window-agg", "sliding", "streaming-twin"),
)
def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute slide (each event lands in 2
    windows). Oracle expands the two covering window starts manually."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            # fixed-point average: inputs are exact 2-decimals, so cents sum
            # exactly in int64 and integer floor-division is engine-portable
            # (float averages can land on rounding boundaries — see sliding
            # window avg 73.91375 in the build log)
            F.expr("CAST((SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100) div COUNT(*) AS BIGINT)").alias(
                "avg_value_e4"
            ),
        )
        .select(F.date_format("w.start", TS_FMT_SPARK).alias("window_start"), "n", "avg_value_e4")
    )


@register(
    "events_session_windows",
    f"""
    WITH brk AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM brk
    )
    SELECT user_id,
           strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM sess GROUP BY user_id, sid
    """,
    tags=("session-window", "streaming-twin"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user — ``session_window`` in batch
    mode; oracle is the classic gaps-and-islands rewrite."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "sum_cents",
        )
    )


@register(
    "events_asof_purchase_click",
    f"""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("asof-join",),
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user.

    Implemented union+window (operators/temporal.py) — one shuffle on
    user_id, no candidate-pair blowup; oracle is DuckDB's native ASOF JOIN.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join_backward(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", suffix="_click"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format("ts_click", TS_FMT_SPARK).alias("click_ts"),
    )


@register(
    "events_range_join_clicks_before_purchase",
    f"""
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_5m
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
    tags=("range-join",),
)
def events_range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within [purchase-5min, purchase] per purchase.
    Equi-key on user_id keeps it a hash join with a residual range predicate."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    counted = range_join_count(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower=F.expr("INTERVAL 5 MINUTES"),
        count_alias="n_clicks_5m",
    )
    return counted.select(
        "event_id", "user_id", F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"), "n_clicks_5m"
    )


@register(
    "events_range_join_global_bucketed",
    f"""
    SELECT p.event_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_5m_global
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
      ON c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
    GROUP BY p.event_id, p.ts
    """,
    tags=("range-join", "bucketed", "scale-path"),
)
def events_range_join_global_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS range join — total click pressure in the 5 minutes before
    each purchase, across ALL users (site-wide load/fraud context for the
    per-user twin ``events_range_join_clicks_before_purchase``). With no
    entity key to hash on, a residual-predicate join is a nested loop over
    every click per purchase; ``range_join_count_bucketed`` makes it a Δ-
    width time-bucket EQUI-join instead (clicks land in one bucket, each
    probe explodes into its two covering buckets, exact range as a
    post-filter) — 2·|purchases| + |clicks| rows shuffle, never the
    product, on any key distribution. The oracle states the semantics as
    the plain range join; the bucket decomposition is provably the same
    relation (each click matches a probe through exactly one bucket)."""
    from data_ingestion_bra_spark.operators.temporal import range_join_count_bucketed

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("ts")
    counted = range_join_count_bucketed(
        purchases,
        clicks,
        left_ts="ts",
        right_ts="ts",
        lower_seconds=300,
        count_alias="n_clicks_5m_global",
    )
    return counted.select(
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        "n_clicks_5m_global",
    )


@register(
    "events_multires_rollup",
    """
    WITH t AS (SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h, value
               FROM events)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           strftime(h, '%Y-%m-%d %H:%M') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM t
    GROUP BY GROUPING SETS ((d), (d, h))
    """,
    tags=("rollup", "grouping-sets", "hypertable", "temporal"),
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: one pass produces BOTH the
    hourly and the daily continuous aggregate via GROUPING SETS — the
    Expand operator emits each row once per grouping set before a single
    shuffle, so the 100 TB scan happens once, not once per resolution.
    Integer cents keep sums exact across engines."""
    e = load_table(spark, sf_dir, "events")
    e.select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
        "value",
    ).createOrReplaceTempView("events_dh")
    return spark.sql(
        """
        SELECT date_format(d, 'yyyy-MM-dd') AS day,
               date_format(h, 'yyyy-MM-dd HH:mm') AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events_dh
        GROUP BY GROUPING SETS ((d), (d, h))
        """
    )


@register(
    "scd2_event_type_history",
    f"""
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                      CASE WHEN row_number() OVER w = 1
                                OR lag(event_type) OVER w IS DISTINCT FROM event_type
                           THEN 1 ELSE 0 END AS chg
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    v AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS version
          FROM o),
    r AS (SELECT user_id, version, min(event_type) AS event_type,
                 min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
          FROM v GROUP BY 1, 2),
    f AS (SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
                 valid_from,
                 lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
                   AS valid_to,
                 n_events
          FROM r)
    SELECT user_id, version, event_type,
           strftime(valid_from, '{TS_FMT_DUCK}') AS valid_from,
           strftime(valid_to, '{TS_FMT_DUCK}') AS valid_to,
           n_events,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
    FROM f
    """,
    tags=("scd2", "temporal", "cdc", "incremental"),
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history from the event log: per user, consecutive
    runs of the same event_type collapse into validity intervals
    (valid_from / valid_to, is_current on the open run) — the
    slowly-changing-dimension build every warehouse layers over CDC
    streams. One window pass (lag → change flag → running version) and one
    aggregation, all partitioned by the entity key: a single shuffle
    regardless of history depth. Generalizes the capped inline
    ``scd2_customer_status_history`` (plans/relational_ext.py) into a
    reusable operator (``operators/merge.scd2_intervals``) running over the
    FULL event log with run lengths and timestamp-precision intervals."""
    from data_ingestion_bra_spark.operators.merge import scd2_intervals

    e = load_table(spark, sf_dir, "events")
    out = scd2_intervals(e, "user_id", "event_type", "ts", tiebreak_col="event_id")
    return out.select(
        F.col("entity").alias("user_id"),
        "version",
        F.col("attr").alias("event_type"),
        F.date_format("valid_from", TS_FMT_SPARK).alias("valid_from"),
        F.date_format("valid_to", TS_FMT_SPARK).alias("valid_to"),
        "n_events",
        "is_current",
    )


@register(
    "events_drift_tv",
    """
    WITH cnt AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT day, CAST(SUM(n) AS BIGINT) AS nd FROM cnt GROUP BY day),
    shifted AS (SELECT day + 1 AS day, event_type, n FROM cnt),
    grid AS (
      SELECT COALESCE(c.day, s.day) AS day,
             COALESCE(c.n, 0) AS n_cur, COALESCE(s.n, 0) AS n_prev
      FROM cnt c
      FULL OUTER JOIN shifted s
        ON c.day = s.day AND c.event_type = s.event_type
    )
    SELECT strftime(g.day, '%Y-%m-%d') AS day,
           tc.nd AS n_events,
           tp.nd AS n_prev_events,
           CAST(SUM(ABS(g.n_cur * tp.nd - g.n_prev * tc.nd)) * 10000
                  // (2 * tc.nd * tp.nd) AS BIGINT) AS tv_e4
    FROM grid g
    JOIN tot tc ON tc.day = g.day
    JOIN tot tp ON tp.day = g.day - 1
    GROUP BY g.day, tc.nd, tp.nd
    """,
    tags=("temporal", "drift", "monitoring", "data-quality"),
)
def events_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest drift monitor: day-over-day TOTAL-VARIATION distance of the
    event-type mix — TV(p, q) = max-over-events |p(A) - q(A)| = half the
    L1 gap, THE standard alarm metric for 'today's data stopped looking
    like yesterday's' in a production ingest pipeline (distribution-shift
    monitoring; integer-exact unlike PSI/KL whose ln() is not
    bit-portable across engines). Computed without ever materializing a
    probability: tv_e4 = sum|n_cur*N_prev - n_prev*N_cur| * 1e4 div
    (2*N_cur*N_prev), all BIGINT, so the oracle replays it exactly.
    Missing categories on either day enter as zero via the full-outer
    category grid (a mix change INTO a brand-new event type counts).

    Scale shape: one groupBy(day, type) partial-agg over the scan, a
    |days|x|types|-sized self-join on the shifted day key, and a
    |days|-row output — the corpus is touched once. Fixed-point range:
    safe to ~3e6 events/day (num*1e4 < 2^63); beyond that, lift to the
    e2 scale or normalize per-term. day-1 join (not a window lag) keeps
    calendar gaps honest: a missing day yields no row rather than
    comparing across the gap."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cnt.groupBy("day").agg(F.sum("n").cast("bigint").alias("nd"))
    shifted = cnt.select(
        F.date_add("day", 1).alias("day"),
        "event_type",
        F.col("n").alias("n_prev"),
    )
    grid = (
        cnt.withColumnRenamed("n", "n_cur")
        .join(shifted, ["day", "event_type"], "full_outer")
        .select(
            "day",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
        )
    )
    tc = tot.withColumnRenamed("nd", "n_events")
    tp = tot.select(
        F.date_add("day", 1).alias("day"), F.col("nd").alias("n_prev_events")
    )
    return (
        grid.join(tc, "day")
        .join(tp, "day")
        .groupBy("day", "n_events", "n_prev_events")
        .agg(
            F.expr(
                "CAST(sum(abs(n_cur * n_prev_events - n_prev * n_events))"
                " * 10000 div (2 * n_events * n_prev_events) AS BIGINT)"
            ).alias("tv_e4")
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "n_prev_events",
            "tv_e4",
        )
    )


@register(
    "events_anomaly_mad",
    """
    WITH daily AS (
      SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT day, n_events,
             MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n_events END) OVER () AS med
      FROM (SELECT day, n_events,
                   ROW_NUMBER() OVER (ORDER BY n_events, day) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM daily)
    ),
    mad AS (
      SELECT day, n_events, med, dev,
             MAX(CASE WHEN rn2 = (cnt + 1) // 2 THEN dev END) OVER () AS mad
      FROM (SELECT day, n_events, med, ABS(n_events - med) AS dev,
                   ROW_NUMBER() OVER (ORDER BY ABS(n_events - med), day) AS rn2,
                   COUNT(*) OVER () AS cnt
            FROM med)
    )
    SELECT day, n_events, CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
           CAST(dev AS BIGINT) AS dev,
           CAST(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM mad
    """,
    tags=("temporal", "anomaly", "monitoring", "data-quality"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: flag ingest days whose event count deviates
    from the corpus median by more than 3x the median absolute deviation —
    the robust companion to ``events_drift_tv`` (that one watches the MIX,
    this one the VOLUME; median/MAD, unlike mean/stddev, don't let the
    anomaly inflate its own threshold — up to half the days can be broken
    before the estimator moves, Hampel's 50% breakdown point).

    Integer-exact by construction: counts are BIGINT and both medians are
    the LOWER median picked by rank (row_number = (cnt+1) div 2 over the
    deterministic (value, day) order), so the oracle replays the exact
    rows — no float quantile interpolation, whose half-sample behavior
    differs across engines. MAD = 0 (more than half the days identical)
    degrades to flagging any deviation, the standard Hampel-filter edge.

    Scale shape: one partial-aggregable groupBy(day) over the scan, then
    every window runs over the |days|-sized AGGREGATE (a single in-memory
    partition of ~10^3-10^4 rows even at 100 TB of events) — the corpus is
    touched exactly once; no join, no second shuffle class."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))

    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = daily.withColumn(
        "rn", F.row_number().over(Window.orderBy("n_events", "day"))
    ).withColumn("cnt", F.count(F.lit(1)).over(w_all))
    med = ranked.withColumn(
        "med",
        F.max(
            F.when(F.col("rn") == F.expr("(cnt + 1) div 2"), F.col("n_events"))
        ).over(w_all),
    ).withColumn("dev", F.abs(F.col("n_events") - F.col("med")))
    mad = med.withColumn(
        "rn2", F.row_number().over(Window.orderBy("dev", "day"))
    ).withColumn(
        "mad",
        F.max(F.when(F.col("rn2") == F.expr("(cnt + 1) div 2"), F.col("dev"))).over(
            w_all
        ),
    )
    return mad.select(
        "day",
        "n_events",
        F.col("med").cast("bigint").alias("med"),
        F.col("mad").cast("bigint").alias("mad"),
        F.col("dev").cast("bigint").alias("dev"),
        F.when(F.col("dev") > 3 * F.col("mad"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_anomaly"),
    )


@register(
    "events_cohort_retention",
    """
    WITH act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    coh AS (SELECT user_id, MIN(wk) AS cwk FROM act GROUP BY user_id)
    SELECT strftime(c.cwk, '%Y-%m-%d') AS cohort_week,
           CAST((a.wk - c.cwk) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN coh c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    tags=("temporal", "cohort", "retention", "analytics"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics view of an
    event log: users cohorted by their FIRST active ISO week, counted in
    every (cohort, week-offset) cell they return in. Both engines
    date_trunc to Monday-start ISO weeks and the offset is exact integer
    day arithmetic div 7, so the matrix replays bit-for-bit.

    Scale shape: one distinct over (user, week) — the activity relation,
    partial-aggregable and tiny relative to raw events — then a
    groupBy(user) min and one final groupBy(cohort, offset); every shuffle
    key is user- or cohort-sized, the raw event log is touched once."""
    e = load_table(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    coh = act.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    return (
        act.join(coh, "user_id")
        .groupBy(
            F.date_format("cwk", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("CAST(datediff(wk, cwk) div 7 AS BIGINT)").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "events_attribution_last_touch",
    f"""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS click_ts, c.k
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    attr AS (
      SELECT CASE
               WHEN click_ts IS NULL OR ts - click_ts > INTERVAL 3 DAY
                 THEN 'organic'
               WHEN k % 4 = 0 THEN 'email'
               WHEN k % 4 = 1 THEN 'search'
               WHEN k % 4 = 2 THEN 'social'
               ELSE 'ads' END AS channel,
             user_id, value
      FROM j
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM attr GROUP BY channel
    """,
    tags=("temporal", "attribution", "asof-join", "analytics"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH marketing attribution: each purchase credits the latest
    click at-or-before it by the same user (backward as-of join — the
    existing union+window machinery, ONE shuffle on user_id, no candidate
    blowup), provided the click is within the 3-day lookback; otherwise
    'organic'. The channel is derived from the click's props (synthetic
    k % 4 mapping — the shape, not the taxonomy, is the capability).
    Revenue sums integer cents; the DuckDB oracle replays the whole chain
    through its native ASOF LEFT JOIN."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    j = asof_join_backward(
        p, c, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["k"], suffix="_click",
    )
    channel = (
        F.when(
            F.col("ts_click").isNull()
            | F.expr("ts > ts_click + INTERVAL 3 DAY"),
            "organic",
        )
        .when(F.col("k_click") % 4 == 0, "email")
        .when(F.col("k_click") % 4 == 1, "search")
        .when(F.col("k_click") % 4 == 2, "social")
        .otherwise("ads")
    )
    return (
        j.select(channel.alias("channel"), "user_id", "value")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


@register(
    "events_k_anonymity",
    """
    SELECT event_type,
           strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CASE WHEN COUNT(DISTINCT user_id) < 5 THEN 1 ELSE 0 END AS BIGINT)
             AS suppress
    FROM events
    GROUP BY 1, 2
    """,
    tags=("privacy", "governance", "k-anonymity", "data-quality"),
)
def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity small-cell report (Sweeney 2002) over the release
    quasi-identifiers (event_type, day): any cell whose distinct-user count
    is below k=5 is flagged for suppression before the table can be shared
    — the aggregate-release companion to row-level PII redaction
    (text_pii_redaction) and GDPR erasure (tests/test_medallion.py). One
    partial-aggregable groupBy over the scan; count-distinct is the only
    holistic aggregate and it shards by the cell key."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.when(F.countDistinct("user_id") < 5, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("suppress"),
    )


@register(
    "events_session_paths",
    """
    WITH brk AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS sid
      FROM brk
    ),
    steps AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id, sid
                                    ORDER BY ts, event_type) AS dst
      FROM sess
    )
    SELECT src, dst,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM steps WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
    tags=("temporal", "session", "sequence-mining", "analytics"),
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining: within-session event-type transition
    counts (the first-order Markov view of the clickstream — what funnels
    and next-action models are built from). Sessions are the same
    10-minute-gap islands the sessionization tier uses; transitions come
    from one lead() per session-partitioned window.

    Determinism note: simultaneous events are ordered by (ts, event_type)
    inside the session window on BOTH engines, and the session-break
    window orders by (ts, event_id), so ties cannot flip transitions
    between engines. Scale shape: two windows and one groupBy, every one
    partitioned by user (one shuffle class); the transition roll-up is
    |event_type|^2-sized."""
    e = load_table(spark, sf_dir, "events")
    wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(wb).isNull()
            | F.expr("ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
                     " >= INTERVAL 10 MINUTES"),
            1,
        ).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = brk.withColumn("sid", F.sum("new_session").over(ws))
    wp = Window.partitionBy("user_id", "sid").orderBy("ts", "event_type")
    steps = sess.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wp).alias("dst"),
    )
    return (
        steps.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )


@register(
    "events_time_weighted_value",
    """
    WITH o AS (
      SELECT user_id, value,
             CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS value_e4,
             epoch_us(ts) AS ts_us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt_us
      FROM events
    ),
    seg AS (
      SELECT user_id, value_e4, (nxt_us - ts_us) // 1000000 AS dt_s
      FROM o WHERE nxt_us IS NOT NULL
    ),
    agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(SUM(dt_s) AS BIGINT) AS total_dt_s,
             CAST(SUM(value_e4 * dt_s) AS BIGINT) AS wsum_e4
      FROM seg GROUP BY user_id
    )
    SELECT user_id, n_segments, total_dt_s,
           CAST(wsum_e4 // total_dt_s AS BIGINT) AS twap_e4
    FROM agg WHERE total_dt_s > 0
    """,
    tags=("temporal", "analytics", "time-weighted", "window"),
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average value per user (the TWAP family — metering,
    billing, position-exposure analytics): each event's value holds until
    the user's next event, so the mean must weight by holding duration,
    not event count — a plain AVG over-represents burst periods exactly
    when event rate correlates with value. Per-row fixed-point value_e4
    (order-free projection), whole-second durations from a floor-divided
    microsecond lead() delta, and one integer weighted-sum groupBy — no
    float ever aggregates, so the oracle replays bit-for-bit.

    Scale shape: one user-keyed window (the events tier's standard shuffle
    class) feeding a partial-aggregable groupBy; open last segments are
    excluded (no horizon assumption), zero-duration users filtered."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP — the session tz is
    # pinned UTC (session.py), so the cast is value-preserving, and the
    # lead() DIFFERENCE is offset-invariant regardless.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    o = e.select(
        "user_id",
        F.expr("CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)").alias("value_e4"),
        us.alias("ts_us"),
        F.lead(us).over(w).alias("nxt_us"),
    )
    seg = o.filter(F.col("nxt_us").isNotNull()).select(
        "user_id",
        "value_e4",
        F.expr("(nxt_us - ts_us) div 1000000").alias("dt_s"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dt_s").cast("bigint").alias("total_dt_s"),
            F.sum(F.col("value_e4") * F.col("dt_s")).cast("bigint").alias("wsum_e4"),
        )
        .filter(F.col("total_dt_s") > 0)
        .select(
            "user_id",
            "n_segments",
            "total_dt_s",
            # wsum_e4 may be NEGATIVE (negative event values); Spark `div`
            # truncates toward zero, and — measured on this stack, pinned by
            # tests/test_engine_div_parity.py incl. an end-to-end negative-
            # value oracle replay — DuckDB's integer `//` truncates the same
            # way (-7 // 2 = -3), so the hash gate holds for any sign.
            F.expr("CAST(wsum_e4 div total_dt_s AS BIGINT)").alias("twap_e4"),
        )
    )


@register(
    "approx_distinct_users_kmv",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM events
    ),
    rk AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
           FROM h),
    summ AS (SELECT event_type,
                    CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
                    CAST(MAX(h) AS BIGINT) AS kth_hash
             FROM rk WHERE rk <= 64 GROUP BY event_type),
    ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM events GROUP BY event_type)
    SELECT ex.event_type, ex.n_exact, s.n_in_sketch, s.kth_hash,
           CAST(CASE WHEN s.n_in_sketch < 64 THEN s.n_in_sketch
                     ELSE 63 * 281474976710656 // s.kth_hash END AS BIGINT)
             AS estimate
    FROM ex JOIN summ s USING (event_type)
    """,
    tags=("sketch", "cardinality", "kmv", "approx", "mergeable-summary"),
)
def approx_distinct_users_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type by a K-Minimum-Values (bottom-k)
    sketch, k=64 (Bar-Yossef 2002 / Beyer SIGMOD'07) — the cardinality
    member of the engine's MERGEABLE-summary family, next to Misra–Gries
    frequency summaries and the LSH signature store. Unlike Spark's
    HLL-based approx_count_distinct (whose sketch internals no SQL oracle
    can replay), the KMV summary is a deterministic function of the data —
    the k smallest 48-bit md5-prefix hashes — so the 'approximate' estimate
    is still a bit-exact, hash-checkable value: exact below k by
    construction, (k-1)·2^48 div kth-min above, relative error ~1/sqrt(k).
    The exact count rides alongside for a self-auditing row.

    Scale shape (operators/sketch.py): one (group, hash) distinct shuffle +
    a per-group bottom-k window; the summary is k rows per group FOREVER,
    and bottom-k-of-union mergeability makes it valid standing streaming
    state (streaming/cardinality_maintenance.py folds per-epoch summaries
    into a txlog store byte-identically to a single pass)."""
    from data_ingestion_bra_spark.operators.sketch import kmv_estimates, kmv_summaries

    e = load_table(spark, sf_dir, "events")
    summ = kmv_summaries(e, ["event_type"], "user_id", 64)
    est = kmv_estimates(summ, ["event_type"], 64)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "n_in_sketch", "kth_hash", "estimate"
    )


@register(
    "events_l_diversity",
    """
    WITH cells AS (
      SELECT event_type,
             strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
             CAST(FLOOR(value / 100) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(MAX(n) AS BIGINT) AS n_top,
           CAST(CASE WHEN COUNT(*) < 2 OR MAX(n) * 100 > 90 * SUM(n)
                     THEN 1 ELSE 0 END AS BIGINT) AS suppress
    FROM cells GROUP BY event_type, day
    """,
    tags=("privacy", "governance", "l-diversity", "data-quality"),
)
def events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY report (Machanavajjhala et al., ICDE 2006) — the
    k-anonymity companion: a quasi-identifier cell can clear k and still
    leak if the SENSITIVE attribute (here the value band, floor(value/100))
    is homogeneous inside it. Flags cells whose sensitive attribute takes
    fewer than l=2 distinct values OR is >90% dominated by one value (the
    practical positive-disclosure rule). Two stacked partial-aggregable
    groupBys — (QI, sensitive) counts, then per-QI distinct/sum/max — so
    the sensitive-domain cardinality never rides a holistic aggregate."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") / 100).cast("bigint").alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return cells.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.max("n").cast("bigint").alias("n_top"),
        F.when(
            (F.count(F.lit(1)) < 2) | (F.max("n") * 100 > 90 * F.sum("n")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("suppress"),
    )


@register(
    "events_trend_theil_sen",
    """
    WITH daily AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
      SELECT a.event_type,
             CAST((b.n - a.n) * 10000 // (b.day - a.day) AS BIGINT) AS slope_e4
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ),
    ranked AS (
      SELECT event_type, slope_e4,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope_e4) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM pairs
    )
    SELECT event_type,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           slope_e4 AS trend_slope_e4
    FROM ranked WHERE rn = (n_pairs + 1) // 2
    """,
    tags=("temporal", "robust-statistics", "theil-sen", "monitoring"),
)
def events_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST trend of daily event volume per type — the Theil–Sen
    estimator (Theil 1950 / Sen 1968): the median of all pairwise slopes
    between daily counts. Unlike an OLS slope, it has a 29.3% breakdown
    point — a burst day, an outage day, or an ingest backfill spike moves
    the estimate by at most one rank, which is exactly the robustness an
    ingest-volume monitor needs (the MAD anomaly entry flags single days;
    this reports the underlying drift direction/magnitude those outliers
    would corrupt). Slopes are integer fixed-point events/day*1e4 via the
    truncation-parity floor division (tests/test_engine_div_parity.py);
    the median is the deterministic LOWER median (rank (n+1) div 2), so
    the whole statistic is hash-exact across engines.

    Scale shape: the corpus-sized work is ONE partial-aggregable daily
    rollup (events shuffle by (type, day) once); the O(d^2) pair join runs
    over the per-type DAILY series, whose size is bounded by the time
    range (~days^2 rows per type), never by corpus volume — at 100 TB the
    pair relation is still tiny. The daily relation feeds both sides of
    the self-join, so it is checkpointed once (exchange reuse does not
    cover window/aggregate subtrees)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.to_date(F.col("ts").cast("timestamp")).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "event_type",
            F.datediff("d", F.lit("1970-01-01")).cast("bigint").alias("day"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    a = daily.select("event_type", F.col("day").alias("day_a"), F.col("n").alias("n_a"))
    b = daily.select("event_type", F.col("day").alias("day_b"), F.col("n").alias("n_b"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("day_a") < F.col("day_b"))
        .select(
            "event_type",
            F.expr("CAST((n_b - n_a) * 10000 div (day_b - day_a) AS BIGINT)").alias(
                "slope_e4"
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_e4")
    wc = Window.partitionBy("event_type")
    ranked = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_pairs", F.count(F.lit(1)).over(wc).cast("bigint")
    )
    return ranked.filter(F.expr("rn = (n_pairs + 1) div 2")).select(
        "event_type", "n_pairs", F.col("slope_e4").alias("trend_slope_e4")
    )


@register(
    "sketch_users_intersection_kmv",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM events
    ),
    rk AS (SELECT event_type, h,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
           FROM h),
    summ AS (SELECT event_type, h FROM rk WHERE rk <= 64),
    tp AS (SELECT DISTINCT event_type FROM events),
    pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b
           FROM tp a JOIN tp b ON a.event_type < b.event_type),
    ua AS (SELECT pr.type_a, pr.type_b, s.h
           FROM pr JOIN summ s ON s.event_type = pr.type_a),
    ub AS (SELECT pr.type_a, pr.type_b, s.h
           FROM pr JOIN summ s ON s.event_type = pr.type_b),
    u AS (SELECT DISTINCT type_a, type_b, h FROM (
            SELECT * FROM ua UNION ALL SELECT * FROM ub)),
    ur AS (SELECT type_a, type_b, h,
                  ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                                     ORDER BY h) AS rk,
                  COUNT(*) OVER (PARTITION BY type_a, type_b) AS n_u
           FROM u),
    th AS (SELECT type_a, type_b,
                  CAST(MAX(h) AS BIGINT) AS theta,
                  CAST(MAX(n_u) AS BIGINT) AS n_u,
                  CAST(COUNT(*) AS BIGINT) AS k_eff
           FROM ur WHERE rk <= 64 GROUP BY type_a, type_b),
    common AS (SELECT ua.type_a, ua.type_b, ua.h
               FROM ua JOIN ub USING (type_a, type_b, h)),
    cc AS (SELECT c.type_a, c.type_b,
                  CAST(COUNT(*) AS BIGINT) AS c_common
           FROM common c JOIN th USING (type_a, type_b)
           WHERE c.h <= th.theta
           GROUP BY c.type_a, c.type_b),
    ue AS (SELECT DISTINCT event_type, user_id FROM events),
    ex AS (SELECT pr.type_a, pr.type_b,
                  CAST(COUNT(*) AS BIGINT) AS n_exact_inter
           FROM pr
           JOIN ue a ON a.event_type = pr.type_a
           JOIN ue b ON b.event_type = pr.type_b AND b.user_id = a.user_id
           GROUP BY pr.type_a, pr.type_b)
    SELECT th.type_a, th.type_b,
           COALESCE(ex.n_exact_inter, 0) AS n_exact_inter,
           th.theta,
           COALESCE(cc.c_common, 0) AS c_common,
           CAST(CASE WHEN th.n_u < 64 THEN COALESCE(cc.c_common, 0)
                     ELSE COALESCE(cc.c_common, 0) * 281474976710656 // th.theta
                END AS BIGINT) AS est_inter
    FROM th
    LEFT JOIN cc USING (type_a, type_b)
    LEFT JOIN ex USING (type_a, type_b)
    """,
    tags=("sketch", "kmv", "set-algebra", "intersection", "mergeable-summary"),
)
def sketch_users_intersection_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-ALGEBRA over KMV sketches — the theta-sketch idea (Dasgupta et
    al., the Apache DataSketches lineage): estimate |A ∩ B| for every
    event-type pair WITHOUT touching raw keys, from the per-type bottom-k
    summaries alone. The union's k-th smallest hash theta defines a
    deterministic sampling region [0, theta]; hashes below theta present
    in BOTH summaries are a uniform sample of the intersection, so
    est = c_common · 2^48 div theta (one BIGINT floor division; when the
    union summary holds < k hashes the summaries ARE the sets and
    c_common is exact). Everything is a deterministic function of the
    data — the oracle rebuilds both sketches and replays every estimate
    bit-for-bit — and the exact intersection rides alongside as the
    self-audit, exactly like the KMV cardinality entry.

    Why it matters at 100 TB: cross-dataset overlap questions (shared
    users across products, shared documents across crawls) become
    summary-sized joins over standing sketch stores
    (streaming/cardinality_maintenance.py) instead of key-level joins
    across corpora.

    Plan shape: sketches from the existing one-(group,hash)-distinct
    shuffle; everything after is |pairs| x k rows — windows and joins over
    640 rows here, summary-sized at any corpus scale."""
    from data_ingestion_bra_spark.operators.sketch import KMV_SPACE, kmv_summaries

    k = 64
    e = load_table(spark, sf_dir, "events")
    summ = kmv_summaries(e, ["event_type"], "user_id", k).localCheckpoint(
        eager=True
    )  # feeds BOTH pair sides and the union
    tp = summ.select("event_type").distinct()
    # |types| x |types| pair frame: a deliberately-broadcast tiny cross
    # (5 x 5 here; |groups|^2 generally — pairs of SKETCHES, never of keys)
    pr = (
        tp.select(F.col("event_type").alias("type_a"))
        .join(F.broadcast(tp.select(F.col("event_type").alias("type_b"))))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    ua = pr.join(
        summ.select(F.col("event_type").alias("type_a"), "h"), "type_a"
    ).select("type_a", "type_b", "h")
    ub = pr.join(
        summ.select(F.col("event_type").alias("type_b"), "h"), "type_b"
    ).select("type_a", "type_b", "h")
    u = ua.unionByName(ub).distinct()
    wr = Window.partitionBy("type_a", "type_b").orderBy("h")
    wc = Window.partitionBy("type_a", "type_b")
    ur = u.withColumn("rk", F.row_number().over(wr)).withColumn(
        "n_u", F.count(F.lit(1)).over(wc)
    )
    th = (
        ur.filter(F.col("rk") <= k)
        .groupBy("type_a", "type_b")
        .agg(
            F.max("h").cast("bigint").alias("theta"),
            F.max("n_u").cast("bigint").alias("n_u"),
        )
    )
    common = ua.join(ub, ["type_a", "type_b", "h"]).select("type_a", "type_b", "h")
    cc = (
        common.join(th, ["type_a", "type_b"])
        .filter(F.col("h") <= F.col("theta"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_common"))
    )
    ue = e.select("event_type", "user_id").distinct()
    ex = (
        pr.join(ue.select(F.col("event_type").alias("type_a"), "user_id"), "type_a")
        .join(
            ue.select(F.col("event_type").alias("type_b"), "user_id"),
            ["type_b", "user_id"],
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_inter"))
    )
    return (
        th.join(cc, ["type_a", "type_b"], "left")
        .join(ex, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_exact_inter", F.lit(0)).cast("bigint").alias(
                "n_exact_inter"
            ),
            "theta",
            F.coalesce("c_common", F.lit(0)).cast("bigint").alias("c_common"),
            F.when(
                F.col("n_u") < k, F.coalesce("c_common", F.lit(0))
            )
            .otherwise(
                F.expr(
                    f"coalesce(c_common, 0) * CAST({KMV_SPACE} AS BIGINT)"
                    " div theta"
                )
            )
            .cast("bigint")
            .alias("est_inter"),
        )
    )


def _dense_daily_counts(e: DataFrame) -> DataFrame:
    """Per-type daily event counts DENSIFIED over each type's min..max day
    (epoch-day BIGINT), with n=0 for days that produced no events.

    Shared harness for the forecast-backtest tier: lag()/fold offsets over
    this relation are calendar offsets by construction. The sparse rollup
    is checkpointed once because it feeds two consumers (the per-type
    bounds aggregate and the dense left join) and AQE exchange reuse does
    not cover aggregate subtrees. Corpus-sized work is the one rollup;
    everything after runs on |days × types| rows."""
    sparse = (
        e.groupBy(
            "event_type",
            F.to_date(F.col("ts").cast("timestamp")).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "event_type",
            F.datediff("d", F.lit("1970-01-01")).cast("bigint").alias("day"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    dense = sparse.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1)")).alias("day"),
    )
    return dense.join(sparse, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
    )


@register(
    "events_forecast_backtest_snaive",
    """
    WITH sparse AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      FROM sparse GROUP BY event_type
    ),
    dense AS (
      SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM bounds
    ),
    daily AS (
      SELECT dense.event_type, dense.day,
             CAST(COALESCE(sparse.n, 0) AS BIGINT) AS n
      FROM dense LEFT JOIN sparse USING (event_type, day)
    ),
    lagged AS (
      SELECT event_type, day, n,
             lag(n, 7) OVER w AS snaive,
             lag(n, 1) OVER w AS naive1
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    scored AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days_scored,
             CAST(SUM(ABS(n - snaive)) AS BIGINT) AS sae_snaive,
             CAST(SUM(ABS(n - naive1)) AS BIGINT) AS sae_naive1
      FROM lagged WHERE snaive IS NOT NULL AND naive1 IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n_days_scored, sae_snaive, sae_naive1,
           CAST(CASE WHEN sae_naive1 = 0 THEN NULL
                     ELSE sae_snaive * 10000 // sae_naive1 END AS BIGINT)
             AS mase_e4,
           CAST(sae_snaive <= sae_naive1 AS BIGINT) AS beats_naive
    FROM scored
    """,
    tags=("temporal", "forecasting", "backtest", "monitoring"),
)
def events_forecast_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BACKTESTING for ingest-volume planning: score the
    seasonal-naive forecaster (predict today = same weekday last week —
    the baseline every forecasting paper must beat) against the naive-1
    baseline (predict today = yesterday) over the daily event series, per
    type. The headline statistic is MASE (Hyndman & Koehler 2006) with the
    in-sample denominator replaced by the naive-1 backtest SAE — a pure
    ratio of two integer absolute-error sums, emitted fixed-point
    (``mase_e4 < 10000`` ⇔ weekly seasonality carries real signal), so
    the whole scorecard is hash-exact across engines. ``beats_naive`` is
    the gate a pipeline would alert on (seasonality broke ⇒ mix shift).

    The per-type day range is DENSIFIED before the lag windows (min..max
    day, n=0 for absent days): lag() is a ROW offset, so on a sparse
    series lag(n, 7) would drift off the same-weekday phase after any
    gap and zero-volume days — exactly the days a volume monitor cares
    about — would be silently excluded from both SAE sums. With the
    dense series, lag 7 ≡ calendar day−7 and lag 1 ≡ calendar day−1 by
    construction.

    Scale shape: the corpus-sized work is the SAME single partial-agg
    daily rollup the monitor tier uses; densification, both forecasters'
    lag() windows, and the scorecard all run over the |days × types|
    aggregate (the rollup is checkpointed once — it feeds both the
    bounds aggregate and the dense left join). Rows where either lag is
    undefined (first week) are excluded on both engines identically."""
    e = load_table(spark, sf_dir, "events")
    daily = _dense_daily_counts(e)
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("snaive", F.lag("n", 7).over(w)).withColumn(
        "naive1", F.lag("n", 1).over(w)
    )
    scored = (
        lagged.filter(F.col("snaive").isNotNull() & F.col("naive1").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
            F.sum(F.abs(F.col("n") - F.col("snaive")))
            .cast("bigint")
            .alias("sae_snaive"),
            F.sum(F.abs(F.col("n") - F.col("naive1")))
            .cast("bigint")
            .alias("sae_naive1"),
        )
    )
    return scored.select(
        "event_type",
        "n_days_scored",
        "sae_snaive",
        "sae_naive1",
        F.when(F.col("sae_naive1") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("CAST(sae_snaive * 10000 div sae_naive1 AS BIGINT)"))
        .alias("mase_e4"),
        (F.col("sae_snaive") <= F.col("sae_naive1")).cast("bigint").alias(
            "beats_naive"
        ),
    )


#: Holt–Winters fixed-point smoothing weights (e4 scale): alpha=0.10
#: (level), beta=0.025 (trend), gamma=0.50 (seasonal). Frozen integers so
#: the recurrence is exact int64 arithmetic on both engines; chosen by a
#: grid sweep over the fixture series (low alpha — the fixture's daily
#: volumes are noise around a stable level, so heavy level-smoothing
#: beats trend-chasing; high gamma lets the 7-vector unlearn the noisy
#: first-week seasonal init quickly on a 30-day span).
_HW_ALPHA = 1000
_HW_BETA = 250
_HW_GAMMA = 5000

#: One step of the additive Holt–Winters recurrence in Spark SQL (shared
#: by the three state fields below; textual repetition of the level
#: update is deliberate — SQL lambdas cannot bind intermediates, and the
#: fold runs over the |days| aggregate, never the corpus).
_HW_LEV = (
    f"({_HW_ALPHA} * (y - element_at(acc.s, 1))"
    f" + {10000 - _HW_ALPHA} * (acc.lev + acc.tr)) div 10000"
)
_HW_FOLD_STATE = f"""
aggregate(
  slice(ys, 8, greatest(size(ys) - 7, 0)),
  named_struct(
    'lev', L0, 'tr', 0L,
    's', transform(slice(ys, 1, 7), v -> v - L0),
    'sae', 0L),
  (acc, y) -> named_struct(
    'lev', {_HW_LEV},
    'tr', ({_HW_BETA} * (({_HW_LEV}) - acc.lev)
           + {10000 - _HW_BETA} * acc.tr) div 10000,
    's', concat(slice(acc.s, 2, 6),
                array(({_HW_GAMMA} * (y - ({_HW_LEV}))
                       + {10000 - _HW_GAMMA} * element_at(acc.s, 1))
                      div 10000)),
    'sae', acc.sae + abs(y - (acc.lev + acc.tr + element_at(acc.s, 1)))
  )
)
"""

_HW_FOLD = _HW_FOLD_STATE + ".sae"


@register(
    "events_forecast_backtest_hw",
    f"""
    WITH RECURSIVE sparse AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      FROM sparse GROUP BY event_type
    ),
    dense AS (
      SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM bounds
    ),
    daily AS (
      SELECT dense.event_type, dense.day,
             CAST(COALESCE(sparse.n, 0) AS BIGINT) AS n
      FROM dense LEFT JOIN sparse USING (event_type, day)
    ),
    idx AS (
      SELECT event_type, CAST(n * 10000 AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  - 1 AS BIGINT) AS t
      FROM daily
    ),
    ntot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM idx GROUP BY event_type
    ),
    lagged AS (
      SELECT event_type, n,
             lag(n, 7) OVER w AS snaive, lag(n, 1) OVER w AS naive1
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    base AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (WHERE snaive IS NOT NULL
                                     AND naive1 IS NOT NULL) AS BIGINT)
               AS n_days_scored,
             CAST(COALESCE(SUM(ABS(n - snaive)) FILTER (
               WHERE snaive IS NOT NULL AND naive1 IS NOT NULL), 0)
               AS BIGINT) AS sae_snaive,
             CAST(COALESCE(SUM(ABS(n - naive1)) FILTER (
               WHERE snaive IS NOT NULL AND naive1 IS NOT NULL), 0)
               AS BIGINT) AS sae_naive1
      FROM lagged GROUP BY event_type
    ),
    l0 AS (
      SELECT event_type, CAST(SUM(y) // 7 AS BIGINT) AS L0
      FROM idx WHERE t < 7 GROUP BY event_type
    ),
    sinit AS (
      SELECT i.event_type,
             list(CAST(i.y - l0.L0 AS BIGINT) ORDER BY i.t) AS s
      FROM idx i JOIN l0 ON l0.event_type = i.event_type
      WHERE i.t < 7 GROUP BY i.event_type
    ),
    hw AS (
      SELECT s.event_type, CAST(7 AS BIGINT) AS t, l0.L0 AS lev,
             CAST(0 AS BIGINT) AS tr, s.s AS s, CAST(0 AS BIGINT) AS sae
      FROM sinit s JOIN l0 ON l0.event_type = s.event_type
      UNION ALL
      SELECT h.event_type, h.t + 1,
             CAST(({_HW_ALPHA} * (i.y - h.s[1])
                   + {10000 - _HW_ALPHA} * (h.lev + h.tr)) // 10000
                  AS BIGINT),
             CAST(({_HW_BETA} * (CAST(({_HW_ALPHA} * (i.y - h.s[1])
                     + {10000 - _HW_ALPHA} * (h.lev + h.tr)) // 10000
                     AS BIGINT) - h.lev)
                   + {10000 - _HW_BETA} * h.tr) // 10000 AS BIGINT),
             list_concat(h.s[2:7],
               [CAST(({_HW_GAMMA} * (i.y
                       - CAST(({_HW_ALPHA} * (i.y - h.s[1])
                         + {10000 - _HW_ALPHA} * (h.lev + h.tr)) // 10000
                         AS BIGINT))
                      + {10000 - _HW_GAMMA} * h.s[1]) // 10000 AS BIGINT)]),
             CAST(h.sae + ABS(i.y - (h.lev + h.tr + h.s[1])) AS BIGINT)
      FROM hw h JOIN idx i ON i.event_type = h.event_type AND i.t = h.t
    ),
    fin AS (
      SELECT h.event_type, h.sae AS sae_hw_e4
      FROM hw h JOIN ntot nt
        ON nt.event_type = h.event_type AND h.t = nt.n_days
    )
    SELECT b.event_type, b.n_days_scored, b.sae_snaive, b.sae_naive1,
           f.sae_hw_e4,
           CAST(CASE WHEN b.sae_naive1 = 0 THEN NULL
                     ELSE f.sae_hw_e4 // b.sae_naive1 END AS BIGINT)
             AS mase_hw_e4,
           CAST(f.sae_hw_e4 <= b.sae_snaive * 10000 AS BIGINT)
             AS beats_snaive
    FROM base b JOIN fin f ON f.event_type = b.event_type
    WHERE b.n_days_scored > 0
    """,
    tags=("temporal", "forecasting", "backtest", "smoothing"),
)
def events_forecast_backtest_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL forecaster on the MASE backtest harness: additive
    Holt–Winters (Winters 1960; Hyndman & Athanasopoulos fpp3 ch. 8) in
    FIXED-POINT integer arithmetic — level/trend/seasonal smoothing with
    alpha=0.30, beta=0.05, gamma=0.30 at e4 scale, seasonal period 7 —
    scored one-step-ahead against the same seasonal-naive and naive-1
    baselines as ``events_forecast_backtest_snaive``, over the same
    DENSIFIED daily series. ``beats_snaive`` certifies the smoother earns
    its keep (sae_hw_e4 <= sae_snaive * 1e4); ``mase_hw_e4`` is its MASE
    vs the naive-1 denominator, fixed-point.

    The recurrence is inherently sequential, so it runs as an
    ``aggregate`` HOF fold over each type's sorted daily array — the
    seasonal state is a ROTATING 7-vector (head = today's factor; each
    step consumes the head and appends the gamma-updated value), so no
    indexing arithmetic and no outer-array references (the staged-column
    HOF hazards) appear in the lambda. Initialization: level = first
    week's mean, trend = 0, seasonal = first week's deviations; scoring
    starts at day 8, exactly the region where snaive/naive1 are defined.
    Every operation is int64 add/mul/`div` (truncation parity pinned in
    tests/test_engine_div_parity.py), so the DuckDB recursive-CTE twin
    replays the fold bit-exactly.

    Scale shape: the corpus-sized work is the ONE partial-agg daily
    rollup; the fold state is 10 BIGINTs per event type and the fold
    length is the day span — at 100 TB the recurrence still runs over
    |days × types| rows, never corpus rows. int64 headroom: y is scaled
    e4 and multiplied by e4 weights, so daily volumes up to ~9e10 events
    per (type, day) stay exact."""
    e = load_table(spark, sf_dir, "events")
    daily = _dense_daily_counts(e)
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("snaive", F.lag("n", 7).over(w)).withColumn(
        "naive1", F.lag("n", 1).over(w)
    )
    scored_row = F.col("snaive").isNotNull() & F.col("naive1").isNotNull()
    g = lagged.groupBy("event_type").agg(
        F.sum(scored_row.cast("bigint")).cast("bigint").alias("n_days_scored"),
        F.sum(
            F.when(scored_row, F.abs(F.col("n") - F.col("snaive"))).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("sae_snaive"),
        F.sum(
            F.when(scored_row, F.abs(F.col("n") - F.col("naive1"))).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("sae_naive1"),
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("dn"),
    )
    staged = (
        g.withColumn("ys", F.expr("transform(dn, p -> p.n * 10000L)"))
        .withColumn(
            "L0", F.expr("aggregate(slice(ys, 1, 7), 0L, (a, x) -> a + x) div 7")
        )
        .withColumn("sae_hw_e4", F.expr(_HW_FOLD).cast("bigint"))
    )
    return staged.filter(F.col("n_days_scored") > 0).select(
        "event_type",
        "n_days_scored",
        "sae_snaive",
        "sae_naive1",
        "sae_hw_e4",
        F.when(F.col("sae_naive1") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("sae_hw_e4 div sae_naive1"))
        .alias("mase_hw_e4"),
        (F.col("sae_hw_e4") <= F.col("sae_snaive") * 10000)
        .cast("bigint")
        .alias("beats_snaive"),
    )


@register(
    "events_forecast_next_week_hw",
    f"""
    WITH RECURSIVE sparse AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      FROM sparse GROUP BY event_type
    ),
    dense AS (
      SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM bounds
    ),
    daily AS (
      SELECT dense.event_type, dense.day,
             CAST(COALESCE(sparse.n, 0) AS BIGINT) AS n
      FROM dense LEFT JOIN sparse USING (event_type, day)
    ),
    idx AS (
      SELECT event_type, day, CAST(n * 10000 AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  - 1 AS BIGINT) AS t
      FROM daily
    ),
    ntot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(day) AS BIGINT) AS last_day
      FROM idx GROUP BY event_type
    ),
    l0 AS (
      SELECT event_type, CAST(SUM(y) // 7 AS BIGINT) AS L0
      FROM idx WHERE t < 7 GROUP BY event_type
    ),
    sinit AS (
      SELECT i.event_type,
             list(CAST(i.y - l0.L0 AS BIGINT) ORDER BY i.t) AS s
      FROM idx i JOIN l0 ON l0.event_type = i.event_type
      WHERE i.t < 7 GROUP BY i.event_type
    ),
    hw AS (
      SELECT s.event_type, CAST(7 AS BIGINT) AS t, l0.L0 AS lev,
             CAST(0 AS BIGINT) AS tr, s.s AS s, CAST(0 AS BIGINT) AS sae
      FROM sinit s JOIN l0 ON l0.event_type = s.event_type
      UNION ALL
      SELECT h.event_type, h.t + 1,
             CAST(({_HW_ALPHA} * (i.y - h.s[1])
                   + {10000 - _HW_ALPHA} * (h.lev + h.tr)) // 10000
                  AS BIGINT),
             CAST(({_HW_BETA} * (CAST(({_HW_ALPHA} * (i.y - h.s[1])
                     + {10000 - _HW_ALPHA} * (h.lev + h.tr)) // 10000
                     AS BIGINT) - h.lev)
                   + {10000 - _HW_BETA} * h.tr) // 10000 AS BIGINT),
             list_concat(h.s[2:7],
               [CAST(({_HW_GAMMA} * (i.y
                       - CAST(({_HW_ALPHA} * (i.y - h.s[1])
                         + {10000 - _HW_ALPHA} * (h.lev + h.tr)) // 10000
                         AS BIGINT))
                      + {10000 - _HW_GAMMA} * h.s[1]) // 10000 AS BIGINT)]),
             CAST(h.sae + ABS(i.y - (h.lev + h.tr + h.s[1])) AS BIGINT)
      FROM hw h JOIN idx i ON i.event_type = h.event_type AND i.t = h.t
    ),
    fin AS (
      SELECT h.event_type, nt.last_day, h.lev, h.tr, h.s
      FROM hw h JOIN ntot nt
        ON nt.event_type = h.event_type AND h.t = nt.n_days
      WHERE nt.n_days >= 8
    ),
    horizons AS (SELECT UNNEST(generate_series(1, 7)) AS h),
    fc AS (
      SELECT f.event_type,
             CAST(f.last_day + hz.h AS BIGINT) AS day,
             CAST(hz.h AS BIGINT) AS horizon,
             CAST(f.lev + hz.h * f.tr + f.s[hz.h] AS BIGINT) AS forecast_e4
      FROM fin f CROSS JOIN horizons hz
    )
    SELECT event_type, day, horizon, forecast_e4,
           CAST(CASE WHEN forecast_e4 < 0 THEN 0
                     ELSE forecast_e4 // 10000 END AS BIGINT) AS forecast_n
    FROM fc
    """,
    tags=("temporal", "forecasting", "smoothing", "serving"),
)
def events_forecast_next_week_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forecast tier's SERVE PATH: next-7-day ingest-volume forecasts
    per event type from the Holt–Winters fold's FINAL state (the backtest
    entry scores this same model; this entry emits what a capacity planner
    actually consumes). h-step-ahead additive forecast: level + h*trend +
    the h-th entry of the rotating seasonal vector (head = tomorrow's
    factor by construction), all in the same exact e4 fixed-point int64
    arithmetic, clamped at zero counts. One row per (type, horizon 1..7),
    day = last observed day + h.

    Scale shape: identical to the backtest — ONE partial-agg daily rollup
    touches the corpus; the fold and the 7-row-per-type forecast expansion
    run over the |days × types| aggregate. The DuckDB twin replays the
    recurrence via the same recursive CTE and indexes the final seasonal
    list directly."""
    e = load_table(spark, sf_dir, "events")
    daily = _dense_daily_counts(e)
    g = daily.groupBy("event_type").agg(
        F.max("day").cast("bigint").alias("last_day"),
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("dn"),
    )
    staged = (
        g.withColumn("ys", F.expr("transform(dn, p -> p.n * 10000L)"))
        .filter(F.size("ys") >= 8)
        .withColumn(
            "L0", F.expr("aggregate(slice(ys, 1, 7), 0L, (a, x) -> a + x) div 7")
        )
        .withColumn("hw", F.expr(_HW_FOLD_STATE))
    )
    fc = staged.select(
        "event_type",
        "last_day",
        "hw",
        F.explode(F.expr("sequence(1L, 7L)")).alias("horizon"),
    ).withColumn(
        "forecast_e4",
        F.expr("hw.lev + horizon * hw.tr + element_at(hw.s, CAST(horizon AS INT))")
        .cast("bigint"),
    )
    return fc.select(
        "event_type",
        (F.col("last_day") + F.col("horizon")).cast("bigint").alias("day"),
        F.col("horizon").cast("bigint").alias("horizon"),
        "forecast_e4",
        F.when(F.col("forecast_e4") < 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("forecast_e4 div 10000"))
        .cast("bigint")
        .alias("forecast_n"),
    )


@register(
    "events_changepoint_cusum",
    """
    WITH sparse AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      FROM sparse GROUP BY event_type
    ),
    dense AS (
      SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM bounds
    ),
    daily AS (
      SELECT dense.event_type, dense.day,
             CAST(COALESCE(sparse.n, 0) AS BIGINT) AS n
      FROM dense LEFT JOIN sparse USING (event_type, day)
    ),
    params AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n) * 10000 // COUNT(*) AS BIGINT) AS mu_e4
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, p.n_days, p.mu_e4,
             CAST(p.mu_e4 // 20 AS BIGINT) AS k_e4,
             CAST(p.mu_e4 * 4 AS BIGINT) AS h_e4,
             d.n * 10000 - p.mu_e4 - p.mu_e4 // 20 AS d_pos,
             p.mu_e4 - p.mu_e4 // 20 - d.n * 10000 AS d_neg
      FROM daily d JOIN params p USING (event_type)
    ),
    cum AS (
      SELECT event_type, day, n_days, mu_e4, k_e4, h_e4,
             CAST(SUM(d_pos) OVER w AS BIGINT) AS c_pos,
             CAST(SUM(d_neg) OVER w AS BIGINT) AS c_neg
      FROM dev
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    runmin AS (
      SELECT event_type, day, n_days, mu_e4, k_e4, h_e4, c_pos, c_neg,
             CAST(MIN(c_pos) OVER w AS BIGINT) AS m_pos,
             CAST(MIN(c_neg) OVER w AS BIGINT) AS m_neg
      FROM cum
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    stat AS (
      SELECT event_type, day, n_days, mu_e4, k_e4, h_e4,
             c_pos - LEAST(CAST(0 AS BIGINT), m_pos) AS s_pos,
             c_neg - LEAST(CAST(0 AS BIGINT), m_neg) AS s_neg
      FROM runmin
    )
    SELECT event_type,
           MAX(n_days) AS n_days,
           MAX(mu_e4) AS mu_e4,
           MAX(k_e4) AS k_e4,
           MAX(h_e4) AS h_e4,
           CAST(MAX(s_pos) AS BIGINT) AS max_s_pos_e4,
           CAST(MAX(s_neg) AS BIGINT) AS max_s_neg_e4,
           CAST(MIN(CASE WHEN s_pos > h_e4 THEN day END) AS BIGINT)
             AS first_alarm_day_up,
           CAST(MIN(CASE WHEN s_neg > h_e4 THEN day END) AS BIGINT)
             AS first_alarm_day_down,
           CAST(SUM(CASE WHEN s_pos > h_e4 OR s_neg > h_e4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
           CAST(CASE
                  WHEN MIN(CASE WHEN s_pos > h_e4 THEN day END) IS NULL
                   AND MIN(CASE WHEN s_neg > h_e4 THEN day END) IS NULL THEN 0
                  WHEN MIN(CASE WHEN s_neg > h_e4 THEN day END) IS NULL THEN 1
                  WHEN MIN(CASE WHEN s_pos > h_e4 THEN day END) IS NULL THEN -1
                  WHEN MIN(CASE WHEN s_pos > h_e4 THEN day END)
                    <= MIN(CASE WHEN s_neg > h_e4 THEN day END) THEN 1
                  ELSE -1
                END AS BIGINT) AS alarm_dir
    FROM stat GROUP BY event_type
    """,
    tags=("temporal", "changepoint", "cusum", "monitoring", "data-quality"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN-SHIFT changepoint monitor — Page's CUSUM (Biometrika 1954) over
    each type's dense daily volume series. The MAD entry flags single
    outlier DAYS and Theil-Sen reports a gradual SLOPE; CUSUM is the
    missing third monitor: it accumulates small persistent deviations from
    the historical mean and alarms on a sustained LEVEL SHIFT (an upstream
    source going dark, a new feed doubling one type's volume) long before
    any single day clears the 3-MAD bar.

    Parameterization (deterministic, mean-scaled since sigma is unknown):
    reference mu = the series mean (e4 fixed point, truncating div);
    allowance k = mu/20 (half of a 10%-of-mean target shift); decision
    interval h = 4*mu. Both one-sided statistics are computed in CLOSED
    FORM instead of the textbook recursion: with d_t the allowanced
    deviation and c_t its prefix sum, S+_t = max(0, S+_{t-1} + d_t) equals
    c_t - min(0, min_{j<=t} c_j) — a cumulative sum plus a running minimum
    OVER that sum, i.e. two window passes, no recursion, no UDF, identical
    SQL in both engines. All arithmetic is int64 fixed point, so the
    alarm day and direction are hash-exact.

    Scale shape: identical to the forecast tier — the corpus-sized work is
    the ONE partial-aggregable daily rollup (shared ``_dense_daily_counts``
    harness, ADVICE-r11-densified so zero-volume days score); the window
    passes run over |days x types| rows. At 100 TB the monitor's cost is
    still the rollup scan."""
    e = load_table(spark, sf_dir, "events")
    daily = _dense_daily_counts(e).localCheckpoint(eager=True)
    params = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("CAST(SUM(n) * 10000 div COUNT(*) AS BIGINT)").alias("mu_e4"),
    )
    dev = daily.join(params, "event_type").select(
        "event_type",
        "day",
        "n_days",
        "mu_e4",
        F.expr("mu_e4 div 20").cast("bigint").alias("k_e4"),
        (F.col("mu_e4") * 4).cast("bigint").alias("h_e4"),
        F.expr("n * 10000 - mu_e4 - mu_e4 div 20").alias("d_pos"),
        F.expr("mu_e4 - mu_e4 div 20 - n * 10000").alias("d_neg"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dev.select(
        "event_type",
        "day",
        "n_days",
        "mu_e4",
        "k_e4",
        "h_e4",
        F.sum("d_pos").over(w).cast("bigint").alias("c_pos"),
        F.sum("d_neg").over(w).cast("bigint").alias("c_neg"),
    )
    stat = cum.select(
        "event_type",
        "day",
        "n_days",
        "mu_e4",
        "k_e4",
        "h_e4",
        (F.col("c_pos") - F.least(F.lit(0).cast("bigint"), F.min("c_pos").over(w)))
        .cast("bigint")
        .alias("s_pos"),
        (F.col("c_neg") - F.least(F.lit(0).cast("bigint"), F.min("c_neg").over(w)))
        .cast("bigint")
        .alias("s_neg"),
    )
    up_day = F.min(F.when(F.col("s_pos") > F.col("h_e4"), F.col("day")))
    down_day = F.min(F.when(F.col("s_neg") > F.col("h_e4"), F.col("day")))
    return stat.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        F.max("mu_e4").alias("mu_e4"),
        F.max("k_e4").alias("k_e4"),
        F.max("h_e4").alias("h_e4"),
        F.max("s_pos").cast("bigint").alias("max_s_pos_e4"),
        F.max("s_neg").cast("bigint").alias("max_s_neg_e4"),
        up_day.cast("bigint").alias("first_alarm_day_up"),
        down_day.cast("bigint").alias("first_alarm_day_down"),
        F.sum(
            F.when(
                (F.col("s_pos") > F.col("h_e4")) | (F.col("s_neg") > F.col("h_e4")),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_alarm_days"),
        F.when(up_day.isNull() & down_day.isNull(), F.lit(0))
        .when(down_day.isNull(), F.lit(1))
        .when(up_day.isNull(), F.lit(-1))
        .when(up_day <= down_day, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("alarm_dir"),
    )


@register(
    "events_trend_mann_kendall",
    """
    WITH sparse AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
      FROM sparse GROUP BY event_type
    ),
    dense AS (
      SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM bounds
    ),
    daily AS (
      SELECT dense.event_type, dense.day,
             CAST(COALESCE(sparse.n, 0) AS BIGINT) AS n
      FROM dense LEFT JOIN sparse USING (event_type, day)
    ),
    s AS (
      SELECT a.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN b.n > a.n THEN 1
                           WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY a.event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, n)
      GROUP BY event_type
    ),
    nd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type
    ),
    stat AS (
      SELECT s.event_type, nd.n_days, s.n_pairs, s.s_stat, ties.tie_term,
             CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                  - ties.tie_term AS BIGINT) AS var18
      FROM s JOIN ties USING (event_type) JOIN nd USING (event_type)
    )
    SELECT event_type, n_days, n_pairs, s_stat, tie_term, var18,
           CAST(CASE WHEN n_days < 2 THEN NULL
                     ELSE s_stat * 20000 // (n_days * (n_days - 1))
                END AS BIGINT) AS tau_a_e4,
           CAST(CASE WHEN s_stat > 0 THEN 1
                     WHEN s_stat < 0 THEN -1 ELSE 0 END AS BIGINT)
             AS trend_dir,
           CAST(CASE WHEN CAST(s_stat AS HUGEINT) * s_stat * 180000
                        > CAST(38416 AS HUGEINT) * var18
                     THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM stat
    """,
    tags=("temporal", "robust-statistics", "mann-kendall", "monitoring"),
)
def events_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TREND SIGNIFICANCE test — Mann-Kendall (Mann 1945 / Kendall 1975)
    over each type's dense daily volume series. Theil-Sen answers "how
    steep is the drift"; this answers the alerting question it leaves
    open: "is there a monotonic trend AT ALL, or is the slope noise" —
    the nonparametric S statistic (sum of pairwise count-comparison
    signs) against its null variance, with the standard tie correction
    (zero-volume days produce heavy ties, which is exactly why the
    densified series needs the correction term).

    Exactness: S, the tie term, and 18*Var(S) = n(n-1)(2n+5) - sum t(t-1)
    (2t+5) are pure int64; the normal-approximation verdict |S| >
    1.96*sqrt(Var) is evaluated as the EXACT integer cross-multiplication
    S^2 * 18 * 10000 > 38416 * var18 (1.96^2 = 38416/10000) in 128-bit
    arithmetic (DECIMAL(38,0) / HUGEINT - the PMI-numerator discipline),
    so no sqrt and no float ever runs and the verdict is hash-stable.
    Kendall tau-a is e4 fixed point via truncating div. The uncorrected
    (no continuity-correction) variant is used on both engines.

    Scale shape: identical to Theil-Sen — ONE partial-aggregable daily
    rollup touches the corpus; the O(d^2) pair join and the tie/variance
    aggregates run over |days x types| rows, bounded by the calendar, not
    the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = _dense_daily_counts(e).localCheckpoint(eager=True)
    a = daily.select("event_type", F.col("day").alias("day_a"), F.col("n").alias("n_a"))
    b = daily.select("event_type", F.col("day").alias("day_b"), F.col("n").alias("n_b"))
    s = (
        a.join(b, "event_type")
        .filter(F.col("day_a") < F.col("day_b"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.when(F.col("n_b") > F.col("n_a"), F.lit(1))
                .when(F.col("n_b") < F.col("n_a"), F.lit(-1))
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("s_stat"),
        )
    )
    ties = (
        daily.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("bigint").alias("tie_term")
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    stat = (
        s.join(ties, "event_type")
        .join(nd, "event_type")
        .withColumn(
            "var18",
            F.expr(
                "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)"
            ),
        )
    )
    return stat.select(
        "event_type",
        "n_days",
        "n_pairs",
        "s_stat",
        "tie_term",
        "var18",
        F.expr(
            "CAST(CASE WHEN n_days < 2 THEN NULL"
            "     ELSE s_stat * 20000 div (n_days * (n_days - 1)) END AS BIGINT)"
        ).alias("tau_a_e4"),
        F.when(F.col("s_stat") > 0, F.lit(1))
        .when(F.col("s_stat") < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("trend_dir"),
        F.expr(
            "CAST(CASE WHEN CAST(s_stat AS DECIMAL(38,0)) * s_stat * 180000"
            "        > CAST(38416 AS DECIMAL(38,0)) * var18"
            "     THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("significant"),
    )


@register(
    "events_survival_kaplan_meier",
    """
    WITH RECURSIVE brk AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM brk
    ),
    sgrp AS (
      SELECT user_id, sid,
             MIN(ts) AS start_ts, MAX(ts) AS end_ts
      FROM sess GROUP BY user_id, sid
    ),
    scoh AS (
      SELECT user_id, sid, event_type AS cohort
      FROM (SELECT user_id, sid, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                      ORDER BY ts, event_id) AS rn
            FROM sess)
      WHERE rn = 1
    ),
    endd AS (SELECT MAX(end_ts) AS corpus_end FROM sgrp),
    pu AS (
      SELECT c.cohort,
             CAST(date_diff('minute', g.start_ts, g.end_ts) AS BIGINT) AS dur,
             CASE WHEN g.end_ts > e.corpus_end - INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS censored
      FROM sgrp g
      JOIN scoh c ON c.user_id = g.user_id AND c.sid = g.sid, endd e
    ),
    g AS (
      SELECT cohort, dur,
             CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_churn
      FROM pu GROUP BY cohort, dur
    ),
    risk AS (
      SELECT cohort, dur, n_all, n_churn,
             CAST(SUM(n_all) OVER (PARTITION BY cohort ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_risk
      FROM g
    ),
    steps AS (
      SELECT cohort, dur, n_churn, n_risk,
             ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY dur) AS rn
      FROM risk WHERE n_churn >= 1
    ),
    rec AS (
      SELECT cohort, rn, dur, n_churn, n_risk,
             CAST(1000000 * (n_risk - n_churn) // n_risk AS BIGINT) AS s
      FROM steps WHERE rn = 1
      UNION ALL
      SELECT s2.cohort, s2.rn, s2.dur, s2.n_churn, s2.n_risk,
             CAST(r.s * (s2.n_risk - s2.n_churn) // s2.n_risk AS BIGINT)
      FROM rec r JOIN steps s2
        ON s2.cohort = r.cohort AND s2.rn = r.rn + 1
    )
    SELECT cohort, CAST(dur AS BIGINT) AS t_min,
           n_risk, n_churn, CAST(s AS BIGINT) AS survival_e6
    FROM rec
    """,
    tags=("temporal", "survival", "kaplan-meier", "product-analytics"),
)
def events_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-DURATION survival curves — the Kaplan-Meier product-limit
    estimator (Kaplan & Meier, JASA 1958) over 10-minute-gap sessions,
    cohorted by each session's first event type. The session-window entry
    reports per-session aggregates; KM answers the censoring-aware
    question it cannot: "what fraction of sessions survive past t
    minutes" when the observation window cuts sessions off mid-flight — a
    session whose last event falls within one gap interval of the corpus
    end may still be OPEN (the 10-minute silence that would close it
    hasn't elapsed), so it is right-CENSORED: it leaves the risk set
    without counting as an ended session, which a naive duration
    histogram would silently score as short.

    Exactness: S(t) = prod_{t_k <= t} (n_k - d_k)/n_k is inherently a
    sequential truncated product in e6 fixed point (reassociating the
    divisions changes the truncation), so it folds via the ``aggregate``
    HOF over each cohort's sorted (t, d, n) step array — the Holt-Winters
    discipline — and the DuckDB twin replays the identical recurrence via
    recursive CTE. Risk sets are a descending-duration cumulative sum;
    d/n are counts; durations are whole-minute boundary diffs (identical
    truncation in both engines); every output column is BIGINT.

    Scale shape: corpus-sized work is the ONE sessionization window
    (shuffle on user_id — shared with every session entry) plus
    partial-aggregable rollups; everything after runs on
    |cohorts x distinct-durations| rows. The corpus-end anchor is the
    1-row broadcast attach (the ``customer_rfm_segments`` shape); fold
    state is one step array per cohort, bounded by the duration domain."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | F.expr("ts - prev_ts >= INTERVAL 10 MINUTES"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .drop("prev_ts")
    )
    sess = brk.withColumn(
        "sid",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sgrp = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts")
    )
    w_s = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    scoh = (
        sess.withColumn("rn", F.row_number().over(w_s))
        .filter(F.col("rn") == 1)
        .select("user_id", "sid", F.col("event_type").alias("cohort"))
    )
    endd = sgrp.agg(F.max("end_ts").alias("corpus_end"))
    pu = (
        sgrp.join(scoh, ["user_id", "sid"])
        .join(F.broadcast(endd))
        .select(
            "cohort",
            F.expr(
                "CAST(floor(unix_timestamp(end_ts) / 60)"
                "   - floor(unix_timestamp(start_ts) / 60) AS BIGINT)"
            ).alias("dur"),
            F.when(
                F.col("end_ts") > F.expr("corpus_end - INTERVAL 10 MINUTES"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("censored"),
        )
    )
    g = pu.groupBy("cohort", "dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.when(F.col("censored") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_churn"),
    )
    w_risk = (
        Window.partitionBy("cohort")
        .orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    steps = (
        g.withColumn("n_risk", F.sum("n_all").over(w_risk).cast("bigint"))
        .filter(F.col("n_churn") >= 1)
        .groupBy("cohort")
        .agg(
            F.array_sort(F.collect_list(F.struct("dur", "n_churn", "n_risk"))).alias(
                "steps"
            )
        )
    )
    folded = steps.select(
        "cohort",
        F.expr(
            """
            aggregate(
              steps,
              struct(CAST(1000000 AS BIGINT) AS s,
                     CAST(array() AS
                       array<struct<dur:bigint,n_churn:bigint,
                                    n_risk:bigint,s:bigint>>) AS acc),
              (a, x) -> struct(
                CAST((a.s * (x.n_risk - x.n_churn)) div x.n_risk AS BIGINT) AS s,
                array_append(a.acc,
                  struct(x.dur AS dur, x.n_churn AS n_churn,
                         x.n_risk AS n_risk,
                         CAST((a.s * (x.n_risk - x.n_churn)) div x.n_risk
                              AS BIGINT) AS s)) AS acc),
              a -> a.acc
            )
            """
        ).alias("curve"),
    )
    return folded.select("cohort", F.explode("curve").alias("p")).select(
        "cohort",
        F.col("p.dur").cast("bigint").alias("t_min"),
        F.col("p.n_risk").alias("n_risk"),
        F.col("p.n_churn").alias("n_churn"),
        F.col("p.s").alias("survival_e6"),
    )
