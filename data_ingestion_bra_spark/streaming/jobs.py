"""Structured Streaming jobs over the events schema (SURVEY §2.10 — the
tier the reference lacks entirely).

Each transformation is shared with its batch twin in ``plans/temporal.py``
(same expressions; the DuckDB oracle checks the batch form, streaming tests
check the incremental form through a memory sink). Watermarks bound state:
late events beyond the watermark are dropped instead of growing state
forever — the property that matters at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark, path: str, *, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over event parquet drops (each arriving file is a
    micro-batch — the standard replay/backfill harness)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, *, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling window counts+sums with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(
    events: DataFrame, *, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(events: DataFrame, *, gap: str = "10 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Session windows per user (gap-based), streaming-native."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("sw.start").alias("session_start"), "user_id", "n_events")
    )


def stream_stream_click_purchase_join(
    events: DataFrame, *, window: str = "10 minutes", watermark: str = "20 minutes"
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same user's
    clicks within the preceding ``window``. Both sides carry watermarks and
    the join has a time-range bound — the two conditions that let Spark
    expire join state instead of buffering both streams forever."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("user_id"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (purchases.user_id == clicks.user_id)
        & (clicks.c_ts >= purchases.p_ts - F.expr(f"INTERVAL {window}"))
        & (clicks.c_ts <= purchases.p_ts)
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id", purchases.user_id.alias("user_id"), "p_ts", "c_ts"
    )


def run_to_memory_sink(stream_df: DataFrame, *, name: str, output_mode: str = "append"):
    """Drive a streaming DF into an in-memory table and process everything
    available (test/backfill harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_documents_stream(spark, path: str, *, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source document stream (schema asserted, never inferred —
    streaming reads require it anyway)."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def quality_gate_stream(docs: DataFrame) -> DataFrame:
    """Curation-at-ingest: the Gopher rule gates (operators/text.py:
    gopher_metric_cols) applied to a document stream, keeping only passing
    docs WITH ALL their source columns — what survives the gate is what
    lands in bronze, body included (no downstream join needed to recover
    it). Stateless filter — no watermark, no state store — so low-quality
    documents are dropped at ingest cost, the cheapest place to drop
    them."""
    from data_ingestion_bra_spark.operators.text import gopher_metric_cols

    return docs.filter(gopher_metric_cols("text")["passes_quality"] == 1)


def model_gate_stream(docs: DataFrame) -> DataFrame:
    """Curation-at-ingest, TRAINED tier: the committed integer-logreg
    quality model (operators/quality_model.py) applied as a streaming
    filter — the score is a codegen dot product over scan-resident metric
    expressions, so the model gate rides every micro-batch with no state
    store, no watermark, and no model server; surviving docs keep ALL
    source columns. The streaming twin of ``text_quality_model``'s
    ``passes_model`` gate."""
    from data_ingestion_bra_spark.operators.quality_model import quality_score_expr

    return docs.filter(quality_score_expr(F.col("text")) >= 0)


def pii_scrub_stream(docs: DataFrame) -> DataFrame:
    """Governance-at-ingest: the PII scrub (operators/text.py) applied to a
    document stream. A pure stateless projection — no watermark, no state
    store, append mode — so it rides every micro-batch at ingest cost and
    the audit table (counts + redacted fingerprints) is what lands
    downstream, never raw PII spans."""
    from data_ingestion_bra_spark.operators.text import pii_scrub

    return pii_scrub(docs, "doc_id", "text")


def perplexity_gate_stream(docs: DataFrame) -> DataFrame:
    """Curation-at-ingest, LM tier (the CCNet gate as a stream filter): the
    committed bigram-LM score evaluated as one Column expression
    (map-literal lookups, ``operators/ngram_lm.avg_nll_milli_expr``) — no
    explode, no join, no state store, append mode; surviving docs keep ALL
    source columns. The streaming twin of ``text_perplexity_lm``'s keep
    gate; expression-tier == join-tier equality is pytest-asserted."""
    from data_ingestion_bra_spark.operators.ngram_lm import passes_lm_expr

    return docs.filter(passes_lm_expr(F.col("text")))


def web_extract_stream(docs: DataFrame) -> DataFrame:
    """Web-corpus extraction at ingest: WARC-wrapped HTML pages arrive on
    the stream; each micro-batch parses the target URI, strips boilerplate
    from the payload, and emits (doc_id, registered_domain, main_md5,
    main_len, link_density_e4) — the same scan-resident regex/column
    algebra as the batch ``curation_web_pipeline`` front half (zero UDFs,
    no watermark, no state store, append mode). Stream == batch equality
    is pytest-asserted; the blocklist/dedup back half stays batch (dedup
    needs corpus-wide state — that is the signature-store / foreachBatch
    tier's job)."""
    from data_ingestion_bra_spark.operators import web
    from data_ingestion_bra_spark.plans.web import _synth_html_col, _synth_warc_col

    pages = docs.select("doc_id", "source", "text", _synth_html_col().alias("html"))
    recs = pages.select(
        "doc_id", _synth_warc_col(F.col("html"), "text/html").alias("rec")
    )
    parsed = recs.select(
        "doc_id",
        web.warc_header("rec", "WARC-Target-URI").alias("uri"),
        web.warc_payload("rec").alias("payload"),
    )
    host = F.lower(
        F.regexp_replace(F.regexp_extract("uri", "^[^:]+://([^/]+)", 1), ":[0-9]+$", "")
    )
    m = parsed.select(
        "doc_id",
        web.registered_domain(host).alias("registered_domain"),
        web.html_main_text("payload").alias("main_text"),
        web.html_anchor_chars("payload").alias("anchor_chars"),
    )
    return m.select(
        "doc_id",
        "registered_domain",
        F.md5("main_text").alias("main_md5"),
        F.length("main_text").cast("bigint").alias("main_len"),
        F.floor(F.col("anchor_chars") / F.length("main_text") * 10000.0 + 0.5)
        .cast("bigint")
        .alias("link_density_e4"),
    )
