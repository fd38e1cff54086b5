"""Deduplication operators for LLM-training-data pipelines.

Four tiers, all pure DataFrame/Column expressions (no Python UDFs), all
cross-engine deterministic (hashes are md5-based so a SQL oracle can
reproduce them bit-for-bit):

- exact:    md5(text) group-by — one shuffle on the fingerprint.
- n-gram Jaccard: shingle → explode → self-join on shingle → pair agg.
  Exact but O(pairs-sharing-a-shingle); use for verification tiers.
- MinHash + LSH: the 100 TB path. k md5-min signatures per doc, banded into
  b buckets; only docs sharing a band bucket become candidate pairs, then
  exact Jaccard verifies. Candidate generation is a self-join on
  (band, bucket) — shuffle scales with bucket sizes, not with pairs².
- SimHash: 32-bit signed-projection fingerprint from md5 nibbles; near-dups
  = pairs with small Hamming distance (bit_count(xor)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_expr(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc, shingle) pairs, distinct — the base relation for Jaccard/MinHash.

    Word n-gram shingles built in-row with a higher-order transform (no UDF);
    the explode happens once, after dedup-friendly distinct shingling.
    """
    concat_parts = ", ".join(f"__toks[i+{j}]" for j in range(n))
    shingled = df.select(
        F.col(id_col).alias("doc"), F.split(F.col(text_col), " ").alias("__toks")
    ).select(
        "doc",
        F.expr(
            f"CASE WHEN size(__toks) >= {n} THEN "
            f"transform(sequence(0, size(__toks) - {n}), i -> concat_ws(' ', {concat_parts})) "
            f"ELSE array() END"
        ).alias("shingles"),
    )
    return shingled.select("doc", F.explode("shingles").alias("shingle")).distinct()


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5 fingerprint → (fp, canonical_id = min id, dup count)."""
    return (
        df.select(F.col(id_col).alias("doc"), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc").alias("canonical_id"), F.count("*").alias("n_docs"))
    )


def jaccard_pairs(
    sh: DataFrame, *, min_jaccard: float, pair_filter: DataFrame | None = None
) -> DataFrame:
    """Exact pairwise Jaccard over a (doc, shingle) relation.

    ``pair_filter``: optional (doc_a, doc_b) candidates (from LSH) — joining
    it in first keeps the intersection join from exploding at scale.
    """
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    if pair_filter is not None:
        inter = inter.join(pair_filter, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 16) -> DataFrame:
    """(doc, seed, minhash): minhash_s = min over shingles of md5(s||'|'||shingle).

    md5-string min is engine-portable (lexicographic over lowercase hex) —
    the reason we don't use xxhash64 here (oracle can't reproduce it).
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        sh.select("doc", "shingle", seeds)
        .groupBy("doc", "seed")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("shingle")))).alias("mh"))
    )


def lsh_candidate_pairs(signatures: DataFrame, *, band_size: int = 4) -> DataFrame:
    """Band the signature; docs sharing any (band, bucket) become candidates.

    bucket = md5 of the band's minhashes joined in seed order (deterministic).
    """
    banded = signatures.withColumn("band", (F.col("seed") / band_size).cast("int"))
    buckets = banded.groupBy("doc", "band").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda s: s["mh"]
                ),
                "|",
            )
        ).alias("bucket")
    )
    a = buckets.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col("doc").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, *, nibbles: int = 8) -> DataFrame:
    """32-bit SimHash (8 md5 nibbles × 4 bits) per document.

    Per distinct token: h = md5(token); nibble i's bit b contributes
    (+1 | -1) to bit position 4*i+b; final bit = (sum > 0). All arithmetic is
    SQL-portable (strpos over a hex alphabet), so the DuckDB oracle matches
    bit-for-bit.
    """
    toks = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .distinct()
        .withColumn("h", F.md5("tok"))
    )
    contrib = (
        toks.select(
            "doc",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(nibbles * 4 - 1))).alias("bit"),
        )
        .withColumn("nib_pos", (F.col("bit") / 4).cast("int") + 1)
        .withColumn("nib", F.expr("instr('0123456789abcdef', substr(h, nib_pos, 1)) - 1"))
        .withColumn("w", F.expr("(shiftright(nib, CAST(bit % 4 AS INT)) & 1) * 2 - 1"))
    )
    return (
        contrib.groupBy("doc", "bit")
        .agg(F.sum("w").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("doc")
        .agg(
            F.sum(F.expr("CAST(bitval AS BIGINT) * shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).alias(
                "simhash"
            )
        )
    )


def simhash_near_pairs(fps: DataFrame, *, max_hamming: int) -> DataFrame:
    """All-pairs Hamming over fingerprints. At scale, pre-bucket by simhash
    bytes (pigeonhole) before pairing; the fixture sizes don't need it."""
    a = fps.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("h_a"))
    b = fps.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("h_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
