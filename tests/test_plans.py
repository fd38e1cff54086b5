"""Physical-plan assertions: the properties that matter at 100 TB must be
visible in the plan — predicate pushdown into the Parquet scan, column
pruning, broadcast joins for dims, top-k without a global sort, partial
aggregation, and NO row-at-a-time Python in any registered query."""

from __future__ import annotations

import pytest

from data_ingestion_bra_spark.plans.registry import get_queries

SF = "/root/testdata/sf0.001"


def plan_str(spark, df, mode="formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_flagship_broadcasts_filtered_dim(spark):
    df = get_queries()["flagship_customer_orders"](spark, SF)
    p = plan_str(spark, df)
    assert "BroadcastHashJoin" in p  # dim side broadcast, fact side unshuffled
    assert "PushedFilters: [IsNotNull(c_name), EqualTo(c_name," in p


def test_filter_project_pushdown_and_pruning(spark):
    df = get_queries()["filter_project_segment"](spark, SF)
    p = plan_str(spark, df)
    assert "EqualTo(c_mktsegment,BUILDING)" in p  # filter reaches the scan
    # column pruning: scan reads only the 3 needed columns
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "c_custkey" in read_schema and "c_acctbal" in read_schema
    assert "c_nationkey" not in read_schema


def test_topk_avoids_global_sort(spark):
    df = get_queries()["sort_limit_top_orders"](spark, SF)
    p = plan_str(spark, df)
    assert "TakeOrderedAndProject" in p  # per-partition heaps, no full sort


def test_agg_partial_final_and_date_pushdown(spark):
    df = get_queries()["agg_pricing_summary"](spark, SF)
    p = plan_str(spark, df)
    assert p.count("HashAggregate") >= 2  # map-side partial + final
    assert "PushedFilters" in p and "l_shipdate" in p


def test_snowflake_joins_all_broadcast(spark):
    df = get_queries()["join_customers_per_region"](spark, SF)
    p = plan_str(spark, df, mode="simple")
    assert p.count("BroadcastHashJoin") == 2  # nation AND region broadcast
    assert "SortMergeJoin" not in p


# The deliberate Python crossings: Arrow-batched mapInPandas (multimodal
# image decode + audio features) and grouped-map applyInPandas — the
# designated escape hatches (SURVEY §2.11). Everything else stays JVM-side.
PYTHON_ALLOWED = {
    "multimodal_decode_features",
    "multimodal_audio_features",
    # real-decode twins: genuine PNG / RIFF-WAVE containers synthesized and
    # parsed inside the same Arrow-batched mapInPandas contract
    "multimodal_image_png_decode",
    "multimodal_image_png_resize",
    "multimodal_audio_wav_decode",
    # real video: genuine animated GIF89a containers, metadata-parse and
    # sampled-frame LZW decode in the same contract
    "multimodal_video_gif_meta",
    "multimodal_video_gif_frames",
    "multimodal_video_gif_thumbs",
    # real lossy images: genuine baseline-JPEG streams (Huffman + DCT),
    # full roundtrip decode and header-only metadata in the same contract
    "multimodal_image_jpeg_roundtrip",
    "multimodal_image_jpeg_meta",
    # non-constant lossy audit: real Annex-K encode+decode with bounded-
    # error verdicts, same Arrow-batched contract (pixels never shuffle)
    "multimodal_image_jpeg_gradient",
    "multimodal_image_jpeg_gradient_420",
    # progressive (SOF2) decode audit: baseline + progressive encode/decode
    # per doc, bit-identity verdict — same contract, pixels never shuffle
    "multimodal_image_jpeg_progressive",
    "multimodal_audio_mulaw_roundtrip",
    # real video containers: ISO-BMFF (MP4) box walk, header-only — same
    # zero-decode contract as the JPEG metadata tier
    "multimodal_video_mp4_meta",
    "multimodal_image_dhash",
    "multimodal_video_dhash",
    "multimodal_audio_fingerprint",
    "grouped_map_rank_per_lang",
    # frequent-items: the Misra-Gries summary pass is per-partition state
    # over an unbounded key domain — the documented mapInPandas case; only
    # capacity-bounded summaries leave the executors (operators/freq.py)
    "text_heavy_hitters",
}


@pytest.mark.parametrize("name", sorted(get_queries()))
def test_no_python_udfs_in_any_query(spark, name):
    """Every registered query stays JVM-side (SURVEY §2.11: zero Python UDFs
    for reference parity; LLM tier uses expressions too) — except the
    explicitly-allowed Arrow-batched multimodal decode."""
    df = get_queries()[name](spark, SF)
    p = plan_str(spark, df, mode="simple")
    if name in PYTHON_ALLOWED:
        # Arrow-batched (MapInPandas / FlatMapGroupsInPandas), never
        # row-at-a-time BatchEvalPython
        assert "BatchEvalPython" not in p
        if name == "text_heavy_hitters" and "ExistingRDD" in p:
            # verify_exact=True materializes the bounded k-row result
            # eagerly (the runtime exactness guard); the MG mapInPandas ran
            # at build time — assert it on the UNguarded operator instead.
            from data_ingestion_bra_spark.operators.freq import (
                heavy_hitters_exact_topk,
            )
            from data_ingestion_bra_spark.operators import dedup
            from data_ingestion_bra_spark.sources.tables import load_table

            sh = dedup.doc_shingles(
                load_table(spark, SF, "documents"), "doc_id", "text", n=3,
                distinct=False,
            ).select("shingle")
            lazy = heavy_hitters_exact_topk(sh, "shingle", 25, capacity=16384)
            assert "MapInPandas" in plan_str(spark, lazy, mode="simple")
        else:
            assert "MapInPandas" in p or "FlatMapGroupsInPandas" in p
    else:
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name
        assert "MapInPandas" not in p, name


# Queries where a BroadcastNestedLoopJoin residual is genuinely the right
# plan: a deliberately-broadcast tiny side with a non-equi predicate.
#  - similarity_topk_bruteforce: by definition scores a broadcast query set
#    against every candidate (the exact baseline the ANN paths approximate).
#  - events_asof_purchase_click / events_range_join_clicks_before_purchase:
#    time-range predicates after an equi-join on the entity key can leave a
#    broadcast residual for the range condition at fixture scale.
#  - similarity_topk_ivf: nearest-centroid assignment is a broadcast cross
#    join of every vector against the (tiny, broadcast) centroid table — the
#    canonical IVF/k-means assignment shape; cost is n × k, never n².
#  - dedup_contamination_bloom: the 1-ROW bloom-bitmap DataFrame attaches to
#    the corpus via broadcast (1×N, O(N)) — the same shape Spark's own
#    runtime bloom-filter join materializes; the bitmap then feeds codegen
#    probe expressions, never a pair-axis join.
#  - text_bm25_topk: the 1-row corpus-stats frame (N, avgdl) broadcasts onto
#    the |query-terms|-row document-frequency table (1 × |terms| rows
#    TOTAL); the per-document tables join only by equi-keys.
#  - similarity_topk_ivfpq: same broadcast-centroid assignment shape as
#    similarity_topk_ivf for the query-side cell probe (|queries| × k).
#  - similarity_hybrid_rrf: its vector leg IS similarity_topk_bruteforce's
#    broadcast-queries exact baseline (4 query vectors × corpus); the
#    lexical leg and the fusion are pure equi-joins.
#  - similarity_bitext_mining: the exact bipartite margin baseline (side A
#    broadcast against side B, |A|×|B| scored, the brute-force-topk shape);
#    the operator docstring names the IVF-composed serve path for scale.
#  - customer_rfm_segments: the corpus max-date anchor is a 1-ROW broadcast
#    attach (the dedup_contamination_bloom shape) feeding exact recency
#    arithmetic; everything else is windows + equi-rollups.
#  - similarity_bitext_ivf: the broadcast-centroid cell assignment shape
#    (vectors × 8 broadcast centroids, n × k) on BOTH the query side and
#    (when the persisted lists are cold) the corpus side — identical to
#    similarity_topk_ivf; candidate pairs themselves come from the cell
#    EQUI-join, never a bipartite product.
#  - text_pmi_collocations / text_keyness_by_source: the 1-ROW corpus-total
#    frame broadcasts onto the count relations (1 × N, the text_bm25_topk
#    shape); all other joins are term/source equi-keys.
#  - approx_quantiles_histogram: the 3-ROW quantile frame broadcasts onto
#    the exact-audit rank relation (3 × N, the corpus-total shape); the
#    sketch path itself and the est↔exact join are pure equi-joins.
#  - sketch_users_intersection_kmv: the |groups|x|groups| PAIR frame is a
#    deliberately-broadcast tiny cross (pairs of sketches, never of keys);
#    all sketch-row joins are (type, h) equi-keys.
#  - events_survival_kaplan_meier: the corpus-end anchor is a 1-ROW broadcast
#    attach (the customer_rfm_segments shape) feeding exact censoring
#    comparisons; sessionization, rollups, and the step fold are windows +
#    equi-joins.
#  - join_bloom_runtime_filter: the 1-ROW bloom-bitmap DataFrame attaches to
#    the fact scan via broadcast (1×N, the dedup_contamination_bloom shape);
#    the confirm join and the word lookups are equi-joins / codegen probes.
BNLJ_ALLOWED = {
    "events_survival_kaplan_meier",
    "join_bloom_runtime_filter",
    "approx_quantiles_histogram",
    "sketch_users_intersection_kmv",
    "similarity_bitext_ivf",
    "text_pmi_collocations",
    "text_keyness_by_source",
    "customer_rfm_segments",
    "similarity_bitext_mining",
    "similarity_hybrid_rrf",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "similarity_topk_ivfpq",
    "events_asof_purchase_click",
    "events_range_join_clicks_before_purchase",
    "dedup_contamination_bloom",
    "text_bm25_topk",
}


@pytest.mark.parametrize("name", sorted(get_queries()))
def test_no_cartesian_products(spark, name):
    """No registered query may plan a true CartesianProduct, and none may
    plan a BroadcastNestedLoopJoin outside the explicit allow-list —
    pair-shaped work must come from equi-joins (LSH buckets, simhash bands,
    IVF cells) or an explicitly broadcast small side. This is the guard that
    keeps 'works on the fixture' honest about 100× scale-up."""
    df = get_queries()[name](spark, SF)
    p = plan_str(spark, df, mode="simple")
    assert "CartesianProduct" not in p, name
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in p, name


def test_whole_stage_codegen_active(spark):
    df = get_queries()["agg_pricing_summary"](spark, SF)
    df.collect()  # AQE only finalizes (and shows codegen stages) on execution
    p = plan_str(spark, df, mode="simple")
    assert "isFinalPlan=true" in p
    assert "*(" in p  # WholeStageCodegen stage markers present


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """Hive-partitioned writes must prune at read time: a filter on the
    partition key shows up as PartitionFilters and non-matching partitions
    never reach the scan."""
    from pyspark.sql import functions as F

    from data_ingestion_bra_spark.sinks.writer import write_partitioned
    from data_ingestion_bra_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders").limit(100)
    base = str(tmp_path)
    for day in ("20240101", "20240102", "20240103"):
        write_partitioned(
            orders, base, "t_orders", partition_value=day, mode="append"
        )

    df = spark.read.parquet(f"{base}/t_orders")
    pruned = df.filter(F.col("anomesdia") == "20240102")
    p = plan_str(spark, pruned)
    assert "PartitionFilters" in p and "anomesdia" in p
    assert pruned.count() == 100
    # partition column count: all three partitions present unpruned
    assert df.count() == 300


def test_q21_decorrelation_single_fact_reduction(spark):
    # sole_returning_suppliers: the EXISTS/NOT EXISTS pair must NOT appear
    # as fact-to-fact self-joins — the fact reduces once per (order,
    # supplier), existentials run on the reduced frame, supplier broadcasts.
    df = get_queries()["sole_returning_suppliers"](spark, SF)
    p = plan_str(spark, df, mode="simple")
    assert p.count("FileScan parquet") <= 3  # lineitem + orders + supplier: one scan each
    assert "BroadcastHashJoin" in p  # supplier dim
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p  # top-20 without a global sort


def test_contamination_benchmark_broadcasts(spark):
    """The benchmark shingle set must broadcast (corpus side streams from
    the scan into the hash join), and nothing pair-shaped plans — the
    property that lets the check ride a bloom filter at 100 TB."""
    df = get_queries()["dedup_contamination_check"](spark, SF)
    p = plan_str(spark, df, mode="simple")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_pack_sequences_windows_per_document(spark):
    """Packing partitions its running-offset window BY DOCUMENT — a global
    (empty-partition-spec) window would serialize the whole corpus through
    one task at scale."""
    df = get_queries()["text_pack_sequences"](spark, SF)
    p = plan_str(spark, df)
    assert "Window" in p
    assert "partitionBy=[]" not in p and "PartitionBy: []" not in p
    # the window spec carries doc_id as its partition key
    import re

    win_lines = [ln for ln in p.splitlines() if "windowspecdefinition(doc_id" in ln.lower()
                 or ("Window" in ln and "doc_id" in ln)]
    assert win_lines, p[:2000]


def test_pii_redaction_is_scan_resident(spark):
    """PII scrub is a pure projection: no shuffle (Exchange) anywhere in the
    plan — the scrub rides the scan at any scale."""
    df = get_queries()["text_pii_redaction"](spark, SF)
    p = plan_str(spark, df, mode="simple")
    assert "Exchange" not in p, p


def test_repeated_passages_single_gram_scan(spark):
    """ExactSubstr single-scan shape (round-6 verdict item 3): the ~40x
    gram stream has two consumers (dup-hash agg + hit join) but must be
    BUILT once — both consumers read the persisted relation
    (InMemoryTableScan), never re-running the explode+md5 corpus pass."""
    for name in ("dedup_repeated_passages", "text_cut_repeated_passages"):
        df = get_queries()[name](spark, SF)
        p = df._jdf.queryExecution().executedPlan().toString()
        # both consumers hit the cache
        assert p.count("InMemoryTableScan") >= 2, name
        # correct result too (fixture-scale smoke; oracle pins the values)
        assert df.count() >= 0
