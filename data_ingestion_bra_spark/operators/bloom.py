"""Bloom-filter pre-filtering as pure Column expressions — the 100 TB
contamination-check shape.

Why this exists: the exact contamination check broadcasts the benchmark's
DISTINCT shingle strings and hash-joins the corpus against them. That is
right while the benchmark side is small, but the broadcast grows with
shingle *strings* (tens of bytes each). The bloom variant broadcasts a
fixed-size BITMAP instead (m/8 bytes regardless of shingle length),
pre-filters the corpus scan-side with k hash probes, and only the tiny
bloom-surviving subset reaches the exact confirm join — the same
build-filter-confirm discipline Spark's own runtime bloom-join
(``InjectRuntimeFilter`` / ``BloomFilterAggregate``) applies; those
expressions aren't SQL-registered in this build, so the bitmap and probes
are composed from public expressions (``xxhash64``, ``pmod``,
``element_at``, ``shiftrightunsigned``) that all stay inside codegen.

Exactness: the bloom admits false positives only, and every survivor is
re-checked by the exact join — so the composed operator's output is
bit-identical to the exact variant (one shared SQL oracle covers both).

Scale anatomy:
- **build**: bit positions are computed IN SPARK over the benchmark scan;
  only the distinct positions (``<= k * |bench|`` longs) reach the driver
  — a control-plane collect, same class as IVF centroids.
- **ship**: the bitmap rides a 1-row DataFrame through a broadcast — the
  executor-side footprint is m/8 bytes however large the benchmark set's
  string form is.
- **probe**: k ``xxhash64`` + ``element_at`` + shift-AND expressions per
  corpus shingle, whole-stage-codegen'd, zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: default sizing: 2^20 bits (128 KiB bitmap) with 3 probes — fpp < 1% up
#: to ~100k distinct members; both knobs are per-call parameters.
DEFAULT_M_BITS = 1 << 20
DEFAULT_SEEDS = (0x51ED, 0xA3C9, 0x7F4B)


def bloom_bit_positions(c: Column, m_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    """The k probe positions of a value as Column expressions — ONE
    definition shared by build and probe sides, so the seeded
    ``xxhash64(value, seed)`` tuple types can never drift between them."""
    return [F.pmod(F.xxhash64(c, F.lit(s)), F.lit(m_bits)) for s in seeds]


def build_bloom_words(
    df: DataFrame,
    col: str,
    *,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> list[int]:
    """Build the bitmap as a list of m_bits/64 signed 64-bit words.

    Positions are computed distributively (explode of the k probe
    expressions + distinct); only the distinct position longs are
    collected — control-plane traffic bounded by k * |build side|, never
    the corpus."""
    import numpy as np

    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = (
        df.select(
            F.explode(F.array(*bloom_bit_positions(F.col(col), m_bits, seeds))).alias(
                "p"
            )
        )
        .distinct()
        .toPandas()["p"]  # Arrow columnar fetch — no per-row driver objects
        .to_numpy(dtype=np.int64)
    )
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    # two's-complement view into Spark's signed BIGINT domain
    return [int(w) for w in words.view(np.int64)]


def bloom_dataframe(spark: SparkSession, words: list[int]) -> DataFrame:
    """The bitmap as a 1-row broadcastable DataFrame (column ``bf``).

    DRIVER-LOCAL construction — only for bitmaps that are already on the
    driver and SMALL (the 128 KiB default). ``createDataFrame`` routes
    through ``sc.parallelize``, which embeds the pickled row in a task:
    round 7's crossover bench shipped a 2M-word bitmap this way and every
    build stage carried a 19,986 KiB task (the driver log's
    ``TaskSetManager`` large-task warnings). Big bitmaps use
    ``build_bloom_df`` instead, which never materializes the words on the
    driver at all."""
    return spark.createDataFrame([(words,)], "bf array<bigint>")


def build_bloom_df(
    df: DataFrame,
    col: str,
    *,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
    pos_fn=None,
) -> DataFrame:
    """The 1-row bitmap DataFrame built ENTIRELY Spark-side — the scale
    path (round-7 verdict item 4: kill the 20 MB task closures).

    ``build_bloom_words`` + ``bloom_dataframe`` round-trips the bitmap
    through the driver and back out via ``sc.parallelize``, embedding the
    pickled word array (~20 MB at the 8M-key sizing) into a task closure —
    per-task serialization overhead on a real cluster. Here the bitmap
    never exists driver-side: probe positions aggregate into words with
    one ``bit_or`` groupBy (map-side combinable), a ``spark.range`` left
    join densifies the zero words, and ``array_sort(collect_list(struct))``
    assembles the single m/64-element array executor-side. The only
    driver traffic is the broadcast collect that ``bloom_prefilter``'s
    join performs anyway — m/8 bytes, the operator's designed footprint.

    Output is bit-identical to ``bloom_dataframe(build_bloom_words(...))``
    (pytest-pinned): same positions, same two's-complement word values.
    Callers persist the returned 1-row frame when probing multiple times
    (the build-once / screen-many production regime)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    spark = df.sparkSession
    positions = (
        pos_fn(F.col(col)) if pos_fn else bloom_bit_positions(F.col(col), m_bits, seeds)
    )
    pos = df.select(F.explode(F.array(*positions)).alias("p")).distinct()
    set_words = pos.groupBy(F.shiftrightunsigned(F.col("p"), 6).alias("w")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT)))").alias(
            "word"
        )
    )
    dense = (
        spark.range(m_bits // 64)
        .withColumnRenamed("id", "w")
        .join(set_words, "w", "left")
        .select("w", F.coalesce("word", F.lit(0).cast("bigint")).alias("word"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "word"))), lambda s: s["word"]
        ).alias("bf")
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom_df: DataFrame,
    verdict_col: str,
    *,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
    pos_fn=None,
) -> DataFrame:
    """``df`` plus an integer ``verdict_col`` (1 = all k bloom bits hit).

    The 1-row bitmap joins in via broadcast (the BroadcastNestedLoopJoin
    this plans is a 1×N attach — O(N), the exact shape Spark's runtime
    bloom filter uses); probes are codegen expressions. Keeping the
    verdict as a column (instead of filtering immediately) lets audit
    entries count bloom survivors and false positives per group."""
    probed = df.join(F.broadcast(bloom_df))
    positions = (
        pos_fn(F.col(col)) if pos_fn else bloom_bit_positions(F.col(col), m_bits, seeds)
    )
    helpers = []
    for i, p in enumerate(positions):
        probed = probed.withColumn(f"__bfp{i}", p)
        helpers.append(f"__bfp{i}")
    cond = " AND ".join(
        f"(shiftrightunsigned(element_at(bf, CAST({h} DIV 64 AS INT) + 1), "
        f"CAST({h} % 64 AS INT)) & 1) = 1"
        for h in helpers
    )
    return probed.withColumn(
        verdict_col,
        F.when(F.expr(cond), F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
    ).drop("bf", *helpers)


def bloom_prefilter(
    df: DataFrame,
    col: str,
    bloom_df: DataFrame,
    *,
    m_bits: int = DEFAULT_M_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
    pos_fn=None,
) -> DataFrame:
    """Keep only rows whose ``col`` value hits ALL k bloom bits.

    The probe-then-filter composition of ``bloom_probe``; output drops the
    helper columns, so the relation is ``df`` minus bloom-negative rows
    (plus false positives for the exact tier to strike)."""
    out = bloom_probe(
        df, col, bloom_df, "__bf_pass", m_bits=m_bits, seeds=seeds, pos_fn=pos_fn
    )
    return out.filter(F.col("__bf_pass") == 1).drop("__bf_pass")
