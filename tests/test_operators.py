from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from data_ingestion_bra_spark.operators import dedup, multimodal, similarity, text
from data_ingestion_bra_spark.operators.temporal import asof_join_backward, range_join_count


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), "p1"), (1, ts("2024-01-01T12:00:00"), "p2"),
         (2, ts("2024-01-01T10:00:00"), "p3")],
        "user_id bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:59:00")), (1, ts("2024-01-01T10:00:00")),
         (1, ts("2024-01-01T11:00:00")), (2, ts("2024-01-01T10:00:01"))],
        "user_id bigint, ts timestamp",
    )
    out = {r["tag"]: r["ts_click"] for r in asof_join_backward(
        left, right, on="user_id", left_ts="ts", right_ts="ts", suffix="_click"
    ).collect()}
    assert out["p1"] == ts("2024-01-01T10:00:00")  # inclusive at equal ts
    assert out["p2"] == ts("2024-01-01T11:00:00")  # latest ≤
    assert out["p3"] is None  # right row is strictly after → no match


def test_range_join_count(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T10:00:00"), "p")], "u bigint, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:56:00")), (1, ts("2024-01-01T09:54:00")), (1, ts("2024-01-01T10:00:00"))],
        "u bigint, ts timestamp",
    )
    out = range_join_count(
        left, right, on="u", left_ts="ts", right_ts="ts", lower=F.expr("INTERVAL 5 MINUTES")
    ).first()
    assert out["n_in_range"] == 2  # 09:54 outside the 5-minute window


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup
    (3, "completely different words entirely here now"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_exact_dedup_groups(spark):
    out = dedup.exact_dedup_groups(_docs(spark), "doc_id", "text")
    groups = {r["canonical_id"]: r["n_docs"] for r in out.collect()}
    assert groups[0] == 2  # docs 0,1 collapse; canonical = min id
    assert groups[2] == 1 and groups[3] == 1


def test_jaccard_pairs_finds_near_dup(spark):
    sh = dedup.doc_shingles(_docs(spark), "doc_id", "text", n=3)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_e4"] for r in
             dedup.jaccard_pairs(sh, min_jaccard=0.3).collect()}
    assert pairs[(0, 1)] == 10000  # identical
    assert 3000 <= pairs[(0, 2)] < 10000  # one-word edit
    assert (0, 3) not in pairs


def test_minhash_lsh_candidates_and_estimate(spark):
    sh = dedup.doc_shingles(_docs(spark), "doc_id", "text", n=3)
    sig = dedup.minhash_signatures(sh, num_hashes=16)
    cand = dedup.lsh_candidate_pairs(sig, band_size=4, num_hashes=16)
    cand_pairs = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (0, 1) in cand_pairs  # identical docs always collide in every band
    est = {(r["doc_a"], r["doc_b"]): r["jaccard_est_e4"] for r in
           dedup.minhash_jaccard_estimate(sig, cand, num_hashes=16).collect()}
    assert est[(0, 1)] == 10000


def test_lsh_pair_estimates_matches_classic_pipeline(spark):
    """The fused banded self-join (signature rides the band explode,
    estimate computed in-row — round-13 stage diet) must produce EXACTLY the
    classic candidate-join + estimate-rejoin composition, pair for pair and
    estimate for estimate."""
    sh = dedup.doc_shingles(_docs(spark), "doc_id", "text", n=3, distinct=False)
    sig = dedup.minhash_signatures(sh, num_hashes=16)
    cand = dedup.lsh_candidate_pairs(sig, band_size=4, num_hashes=16)
    classic = {
        (r["doc_a"], r["doc_b"]): r["jaccard_est_e4"]
        for r in dedup.minhash_jaccard_estimate(sig, cand, num_hashes=16).collect()
    }
    fused = {
        (r["doc_a"], r["doc_b"]): r["jaccard_est_e4"]
        for r in dedup.lsh_pair_estimates(sig, band_size=4, num_hashes=16).collect()
    }
    assert fused == classic


def test_simhash_identical_docs_zero_hamming(spark):
    fps = dedup.simhash_fingerprints(_docs(spark), "doc_id", "text")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             dedup.simhash_near_pairs(fps, max_hamming=7).collect()}
    assert pairs[(0, 1)] == 0  # identical docs
    assert pairs[(0, 2)] == 1  # one-word edit → tiny hamming
    assert (0, 3) not in pairs  # unrelated doc pruned by band bucketing


def test_simhash_broadcast_vocab_identical_fingerprints(spark):
    """broadcast_vocab only changes the JOIN STRATEGY (broadcast the packed
    weight table instead of shuffling (doc, tok) against it) — fingerprints
    must be bit-identical, and the broadcast plan must actually drop the
    sort-merge/shuffled-hash exchange on the token key."""
    d = _docs(spark)
    shuffled = {(r["doc"], r["simhash"]) for r in
                dedup.simhash_fingerprints(d, "doc_id", "text", nibbles=15).collect()}
    bcast_df = dedup.simhash_fingerprints(
        d, "doc_id", "text", nibbles=15, broadcast_vocab=True
    )
    assert {(r["doc"], r["simhash"]) for r in bcast_df.collect()} == shuffled
    plan = bcast_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_simhash_banding_matches_all_pairs(spark):
    """Pigeonhole guarantee: band-bucketed candidates find EVERY pair within
    the hamming budget (compare against a brute-force crossJoin)."""
    fps = dedup.simhash_fingerprints(_docs(spark), "doc_id", "text")
    banded = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in
              dedup.simhash_near_pairs(fps, max_hamming=7).collect()}
    a = fps.selectExpr("doc AS doc_a", "simhash AS h_a")
    b = fps.selectExpr("doc AS doc_b", "simhash AS h_b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.crossJoin(b)
        .filter("doc_a < doc_b")
        .selectExpr("doc_a", "doc_b", "CAST(bit_count(h_a ^ h_b) AS BIGINT) AS hamming")
        .filter("hamming <= 7")
        .collect()
    }
    assert banded == brute


def test_brute_force_topk_orders_by_cosine(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = similarity.brute_force_topk(
        vecs.filter(F.col("vec_id") == 0), vecs, k=3
    ).collect()
    ranked = [(r["cand_id"], r["rank"]) for r in out]
    assert ranked[0] == (3, 1)  # identical vector first
    assert ranked[1] == (1, 2)
    assert ranked[2] == (2, 3)  # orthogonal last


def test_ivf_trained_centroids_recall(spark):
    """Trained IVF (1 Lloyd iteration) with multi-probe must recover ≥ 0.9
    of the exact bruteforce top-5 at probe=4, and recall must not degrade as
    probes increase — the quality contract that 'first 8 vectors as
    centroids' never had."""
    from data_ingestion_bra_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    bf = similarity.brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)
    truth = {(r["query_id"], r["cand_id"]) for r in bf.collect()}
    recalls = []
    for probe in (1, 4):
        ivf = similarity.ivf_topk(
            emb, n_centroids=8, n_iter=1, n_probe=probe, query_ids=list(range(10)), k=5
        )
        got = {(r["query_id"], r["cand_id"]) for r in ivf.collect()}
        recalls.append(len(got & truth) / len(truth))
    assert recalls[-1] >= 0.9, recalls
    assert recalls[0] <= recalls[-1], recalls  # more probes never hurt


def test_ivf_sample_trained_recall(spark):
    """Centroids trained on a 50% deterministic content-hash sample (the
    100 TB training mode — Lloyd never assigns the full corpus) must keep
    the same ≥0.9 recall contract at probe=4."""
    from data_ingestion_bra_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    bf = similarity.brute_force_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)
    truth = {(r["query_id"], r["cand_id"]) for r in bf.collect()}
    cents = similarity.kmeans_train(
        emb, n_centroids=8, n_iter=1, train_sample_rate=0.5
    )
    ivf = similarity.ivf_topk(
        emb, n_probe=4, query_ids=list(range(10)), k=5, centroids=cents
    )
    got = {(r["query_id"], r["cand_id"]) for r in ivf.collect()}
    assert len(got & truth) / len(truth) >= 0.9


def test_dataset_fingerprint_detects_same_size_same_second(tmp_path):
    """Cache-key fingerprint must flip when a dataset is regenerated with
    identical size AND identical mtime (the race the stat-only key missed):
    content bytes participate via the head/tail md5."""
    import os

    f = tmp_path / "embeddings.parquet"
    f.write_bytes(b"A" * 4096)
    st = f.stat()
    fp1 = similarity._dataset_fingerprint(f)
    f.write_bytes(b"B" * 4096)  # same size
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))  # same mtime_ns
    fp2 = similarity._dataset_fingerprint(f)
    assert fp1 != fp2
    # directory-style datasets: a rewritten member flips the key too
    d = tmp_path / "dirstyle.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"A" * 1024)
    fpd1 = similarity._dataset_fingerprint(d)
    stp = (d / "part-0.parquet").stat()
    (d / "part-0.parquet").write_bytes(b"B" * 1024)
    os.utime(d / "part-0.parquet", ns=(stp.st_atime_ns, stp.st_mtime_ns))
    assert similarity._dataset_fingerprint(d) != fpd1


def test_ivf_cache_root_env_override(tmp_path, monkeypatch):
    """SPARK_GRAFT_IVF_CACHE relocates the index cache (object-store slot at
    scale); without it the default never lands under site-packages."""
    monkeypatch.setenv("SPARK_GRAFT_IVF_CACHE", str(tmp_path / "ivfc"))
    assert similarity._ivf_cache_root() == tmp_path / "ivfc"
    monkeypatch.delenv("SPARK_GRAFT_IVF_CACHE")
    assert "site-packages" not in similarity._ivf_cache_root().parts


def test_kmeans_train_deterministic(spark):
    """Two independent training runs produce identical centroids (fixed
    seeds, integer arithmetic — no RNG, no float summation-order drift)."""
    from data_ingestion_bra_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    c1 = {r["cell"]: r["cvec"] for r in similarity.kmeans_train(emb, n_centroids=4, n_iter=1).collect()}
    c2 = {r["cell"]: r["cvec"] for r in similarity.kmeans_train(emb, n_centroids=4, n_iter=1).collect()}
    assert c1 == c2


def test_langid_and_quality(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "el gato la casa una mesa"), (2, "zzz qqq")],
        "doc_id bigint, text string",
    )
    langs = {r["doc_id"]: r["lang"] for r in
             df.select("doc_id", text.langid_expr("text").alias("lang")).collect()}
    assert langs == {0: "en", 1: "es", 2: "und"}
    q = text.quality_metrics(df, "doc_id", "text").filter(F.col("doc_id") == 0).first()
    assert q["n_tokens"] == 5
    assert q["n_distinct_tokens"] == 4
    assert q["type_token_ratio_e4"] == 8000


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "other")],
        "doc_id bigint, text string",
    )
    fps = [r[0] for r in df.select(text.fingerprint_expr("text")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_multimodal_decode_batches(spark):
    docs = _docs(spark)
    payloads = multimodal.attach_binary_payload(docs, "doc_id", "text")
    decoded = multimodal.decode_images(payloads).orderBy("doc_id").collect()
    assert len(decoded) == 4
    r = decoded[0]
    n = len(DOCS[0][1].encode())
    assert r["n_bytes"] == n
    assert r["width"] == 16 + (n % 64)  # deterministic fake decoder
    assert r["channels"] == 3
    assert 0 <= r["mean_intensity_e6"] <= 1_000_000


def test_multimodal_empty_payload_raises(spark):
    df = spark.createDataFrame([(0, "")], "doc_id bigint, text string")
    payloads = multimodal.attach_binary_payload(df, "doc_id", "text")
    with pytest.raises(Exception, match="empty payload"):
        multimodal.decode_images(payloads).collect()


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_multimodal_decoder_selection():
    """decoder='auto' upgrades to PIL when importable, stub otherwise;
    'pil' fails fast with guidance when the library is absent."""
    assert multimodal.pick_decoder("stub") is multimodal._fake_decode
    if _pil_available():
        assert multimodal.pick_decoder("auto") is multimodal._pil_decode
        assert multimodal.pick_decoder("pil") is multimodal._pil_decode
    else:
        assert multimodal.pick_decoder("auto") is multimodal._fake_decode
        with pytest.raises(ImportError, match="Pillow"):
            multimodal.pick_decoder("pil")
    with pytest.raises(ValueError, match="unknown decoder"):
        multimodal.pick_decoder("imagemagick")


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_multimodal_pil_real_decode(spark):
    """Real path: a genuine PNG decodes to its true dimensions through the
    SAME mapInPandas batch contract as the stub."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7), color=(10, 20, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id bigint, payload binary")
    (r,) = multimodal.decode_images(df, decoder="pil").collect()
    assert (r["width"], r["height"], r["channels"]) == (12, 7, 3)
    assert r["n_bytes"] == len(png)
    want = ((10 + 20 + 30) * 12 * 7 * 1_000_000) // (12 * 7 * 3 * 255)
    assert r["mean_intensity_e6"] == want


@pytest.mark.skipif(_pil_available(), reason="covers the no-Pillow container")
def test_multimodal_auto_falls_back_to_stub(spark):
    docs = _docs(spark)
    payloads = multimodal.attach_binary_payload(docs, "doc_id", "text")
    via_auto = multimodal.decode_images(payloads, decoder="auto").orderBy("doc_id").collect()
    via_stub = multimodal.decode_images(payloads).orderBy("doc_id").collect()
    assert via_auto == via_stub
    with pytest.raises(ImportError, match="Pillow"):
        multimodal.decode_images(payloads, decoder="pil")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(0, 2560)], "doc_id bigint, n_bytes bigint")
    frames = [r["frame_idx"] for r in multimodal.frame_sample_plan(df, every_n=3).collect()]
    assert frames == [0, 3, 6, 9]  # 10 frames (2560//256), every 3rd


def test_resize_images_batch_contract(spark):
    from data_ingestion_bra_spark.operators import multimodal

    docs = _docs(spark)
    payloads = multimodal.attach_binary_payload(docs, "doc_id", "text")
    out = multimodal.resize_images(payloads, width=8, height=4).orderBy("doc_id").collect()
    assert len(out) == 4
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["payload"]) == 32  # exact target byte shape
        assert r["scale_e6"] > 0


def test_salted_join_matches_plain_join(spark):
    from data_ingestion_bra_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(i % 3, i, i * 10) for i in range(60)], "k bigint, row_id bigint, v bigint"
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k bigint, tag string")
    plain = {(r["row_id"], r["tag"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["row_id"], r["tag"])
        for r in salted_join(left, right, "k", salt_col="row_id", n_salts=4).collect()
    }
    assert salted == plain and len(plain) == 60


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (0, 'contato: ana.silva@example.com.br cpf 123.456.789-01 tel (11) 98765-4321'),
            (1, "sem dados pessoais aqui"),
            (2, "dois emails: a@b.io e c.d+x@e-f.org"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in text.pii_scrub(df, "doc_id", "text").collect()}
    assert (rows[0]["n_email"], rows[0]["n_cpf"], rows[0]["n_phone"]) == (1, 1, 1)
    assert (rows[1]["n_email"], rows[1]["n_cpf"], rows[1]["n_phone"]) == (0, 0, 0)
    assert rows[2]["n_email"] == 2
    # redaction rewrote doc 0 (fingerprint differs from the raw text's) and
    # left the PII-free doc 1 untouched (fingerprint of the original body)
    import hashlib

    raw0 = df.filter(F.col("doc_id") == 0).first()["text"]
    assert rows[0]["redacted_fp"] != hashlib.md5(raw0.encode()).hexdigest()
    assert rows[1]["redacted_fp"] == hashlib.md5(b"sem dados pessoais aqui").hexdigest()


def test_pack_sequences_budget_and_coverage(spark):
    """Every chunk lands in exactly one pack; packs (except possibly a doc's
    last) start strictly under budget; pack ids are dense from 0 per doc."""
    from data_ingestion_bra_spark.plans.llm_ops import (
        text_chunks_sliding,
        text_pack_sequences,
    )

    sf = "/root/testdata/sf0.001"
    chunks = text_chunks_sliding(spark, sf)
    packs = text_pack_sequences(spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in packs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_chunks_total = sum(r["n_chunks"] for r in packs)
    assert n_chunks_total == chunks.count()
    for doc, rows in by_doc.items():
        ids = sorted(r["pack_id"] for r in rows)
        assert ids == list(range(len(ids))), (doc, ids)
        # a new pack opens only once the previous crossed the 512 budget:
        # every pack except the last must have total chars >= 313 (budget -
        # max chunk 200 + 1... conservatively: >= 1) and cumulative offsets
        # reproduce floor(cum_before/512) — recompute directly:
        chs = sorted(
            ((r["chunk_idx"], r["n_chunk_chars"]) for r in
             chunks.filter(F.col("doc_id") == doc).collect()),
        )
        cum = 0
        want: dict[int, int] = {}
        for _, n in chs:
            want[cum // 512] = want.get(cum // 512, 0) + n
            cum += n
        got = {r["pack_id"]: r["n_chars"] for r in rows}
        assert got == want, (doc, got, want)


def test_audio_features_stub_contract(spark):
    """Audio mapInPandas path: integer-exact features over known bytes."""
    df = spark.createDataFrame([(0, "AZaz"), (1, "~~")], "doc_id bigint, text string")
    payloads = multimodal.attach_binary_payload(df, "doc_id", "text")
    rows = {r["doc_id"]: r for r in multimodal.audio_features(payloads).collect()}
    # "AZaz" = bytes 65,90,97,122 → all < 128 → zero crossings 0
    r0 = rows[0]
    assert r0["n_bytes"] == 4
    assert r0["duration_ms"] == 4 * 1000 // 8000
    assert r0["peak"] == 122
    assert r0["mean_abs_e6"] == (63 + 38 + 31 + 6) * 1_000_000 // (4 * 128)
    assert r0["zero_crossings"] == 0
    # "~~" = 126,126 (no crossing), peak 126
    assert rows[1]["peak"] == 126 and rows[1]["zero_crossings"] == 0


def test_repetition_metrics_known_values(spark):
    """Hand-computed duplicate n-gram fractions, incl. degenerate repeats
    and the short-doc guard (Spark's sequence(1,0) descends — must yield
    empty gram arrays, not [1,0]-indexed garbage)."""
    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),  # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
            (1, "one two three four"),  # all grams unique
            (2, "single"),  # < n tokens: zero grams, ratio 0
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in text.repetition_metrics(df, "doc_id", "text").collect()}
    r0 = rows[0]
    assert (r0["n_2grams"], r0["n_distinct_2grams"]) == (5, 2)
    assert r0["dup_2gram_ratio_e4"] == 6000  # 3/5
    assert (r0["n_3grams"], r0["n_distinct_3grams"]) == (4, 2)
    assert r0["dup_3gram_ratio_e4"] == 5000
    r1 = rows[1]
    assert r1["dup_2gram_ratio_e4"] == 0 and r1["dup_3gram_ratio_e4"] == 0
    r2 = rows[2]
    assert (r2["n_2grams"], r2["n_3grams"]) == (0, 0)
    assert r2["dup_2gram_ratio_e4"] == 0


def test_gopher_quality_gates(spark):
    """Each gate flips the flag: a good doc passes; too-short, low-alpha,
    and stopword-free docs fail for their specific reason."""
    good = (
        "the quick brown foxes and their lazy dogs jumped over a fence of stone "
        * 5
    )  # 70 tokens, mean word length ~4
    short = "the cat sat of and"
    numeric = " ".join(["123"] * 60) + " the of and a"
    rows = {
        r["doc_id"]: r
        for r in text.gopher_quality(
            spark.createDataFrame(
                [(0, good), (1, short), (2, numeric)], "doc_id bigint, text string"
            ),
            "doc_id",
            "text",
        ).collect()
    }
    assert rows[0]["passes_quality"] == 1
    assert rows[1]["passes_quality"] == 0 and rows[1]["n_tokens"] < 50
    assert rows[2]["passes_quality"] == 0
    assert rows[2]["alpha_token_ratio_e4"] < 8000


def test_wav_real_decode_roundtrip(spark):
    """REAL audio: genuine RIFF/WAVE bytes (stdlib wave writer) parsed back
    by the stdlib wave reader inside the mapInPandas contract; features are
    integer-exact over the decoded 16-bit samples."""
    df = spark.createDataFrame([(3,), (64,)], "doc_id bigint")
    wav = multimodal.synthesize_wav(df)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in wav.collect()}
    # payloads are real WAV containers: RIFF magic, 44-byte header + 2B/frame
    for doc_id, p in payloads.items():
        n = 64 + doc_id % 64
        assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
        assert len(p) == 44 + 2 * n
    rows = {r["doc_id"]: r for r in multimodal.wav_audio_features(wav).collect()}
    for doc_id in (3, 64):
        samples = multimodal._synth_samples(doc_id)
        n = len(samples)
        r = rows[doc_id]
        assert r["n_frames"] == n == 64 + doc_id % 64
        assert r["n_bytes"] == 44 + 2 * n
        assert r["duration_ms"] == n * 1000 // multimodal.WAV_RATE_HZ
        assert r["peak"] == max(abs(s) for s in samples)
        assert r["mean_abs_e6"] == sum(abs(s) for s in samples) * 1_000_000 // (n * 32768)
        assert r["zero_crossings"] == sum(
            1 for i in range(n - 1) if (samples[i] < 0) != (samples[i + 1] < 0)
        )


def test_wav_decode_rejects_corrupt_container(spark):
    """A real decoder fails on a corrupt container — truncated header bytes
    must raise through the batch path, not produce garbage features."""
    df = spark.createDataFrame(
        [(0, bytearray(b"RIFFnotawav"))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="(?i)wave|riff|empty|not a"):
        multimodal.wav_audio_features(df).collect()


def test_wav_decode_rejects_zero_frame_container():
    """A structurally valid zero-frame WAV must fail the documented decoder
    contract, not crash with max()-of-empty or ZeroDivisionError."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"")
    with pytest.raises(ValueError, match="empty WAV: zero frames"):
        multimodal._wav_decode_features(buf.getvalue())


def test_ivf_index_cache_invalidates_on_data_change(spark, tmp_path):
    """The persisted IVF index is keyed by the dataset's file identity: a
    regenerated embeddings table must retrain/reassign, never serve stale
    centroids or lists."""
    import os
    import shutil
    import time as _time

    from data_ingestion_bra_spark.sources.tables import load_table

    sf = str(tmp_path)
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet", f"{sf}/embeddings.parquet")
    emb = load_table(spark, sf, "embeddings")
    c1, l1 = similarity.load_or_build_ivf_index(spark, emb, sf, n_centroids=4, n_iter=1)
    n_full = l1.count()
    assert n_full == emb.count()

    # regenerate the dataset (half the vectors, different mtime)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    half.toPandas().to_parquet(f"{sf}/embeddings.tmp.parquet")
    os.replace(f"{sf}/embeddings.tmp.parquet", f"{sf}/embeddings.parquet")
    os.utime(f"{sf}/embeddings.parquet", (_time.time() + 10, _time.time() + 10))

    emb2 = load_table(spark, sf, "embeddings")
    c2, l2 = similarity.load_or_build_ivf_index(spark, emb2, sf, n_centroids=4, n_iter=1)
    assert l2.count() == emb2.count() < n_full  # rebuilt from the new data


def test_bloom_prefilter_no_false_negatives_and_filters(spark):
    """Every member value survives the bloom (zero false negatives — the
    exactness contract), and a disjoint probe set is mostly rejected (the
    bitmap actually filters; fpp << 1 at this density)."""
    from data_ingestion_bra_spark.operators import bloom

    members = spark.createDataFrame(
        [(f"member shingle {i}",) for i in range(200)], "shingle string"
    )
    words = bloom.build_bloom_words(members, "shingle")
    bf = bloom.bloom_dataframe(spark, words)
    kept = bloom.bloom_prefilter(members, "shingle", bf)
    assert kept.count() == 200  # no false negatives, all columns intact
    assert kept.columns == ["shingle"]
    others = spark.createDataFrame(
        [(f"absent shingle {i}",) for i in range(2000)], "shingle string"
    )
    n_fp = bloom.bloom_prefilter(others, "shingle", bf).count()
    assert n_fp < 20, n_fp  # fpp < 1% at 200 members in 2^20 bits


def test_bloom_spark_side_build_is_bit_identical_to_driver_build(spark):
    """build_bloom_df (groupBy bit_or + dense range join + executor-side
    array assembly — the no-driver-round-trip scale path that killed the
    round-7 20 MB task closures) must produce EXACTLY the word array the
    numpy driver build produces, including zero words and two's-complement
    sign, at a non-default m_bits."""
    from data_ingestion_bra_spark.operators import bloom

    members = spark.createDataFrame(
        [(f"member shingle {i}",) for i in range(500)], "shingle string"
    )
    m_bits = 1 << 17
    driver_words = bloom.build_bloom_words(members, "shingle", m_bits=m_bits)
    spark_words = bloom.build_bloom_df(members, "shingle", m_bits=m_bits).first()["bf"]
    assert list(spark_words) == driver_words
    assert len(spark_words) == m_bits // 64
    # and the prefilter contract holds through the Spark-side bitmap
    bf = bloom.build_bloom_df(members, "shingle", m_bits=m_bits)
    assert bloom.bloom_prefilter(members, "shingle", bf, m_bits=m_bits).count() == 500


def test_bloom_matches_exact_contamination(spark):
    """The bloom-prefiltered contamination check is bit-identical to the
    exact broadcast-join variant on the fixture corpus."""
    from data_ingestion_bra_spark.plans.registry import get_queries

    q = get_queries()
    sf = "/root/testdata/sf0.001"
    exact = {tuple(r) for r in q["dedup_contamination_check"](spark, sf).collect()}
    bloom_v = {tuple(r) for r in q["dedup_contamination_bloom"](spark, sf).collect()}
    assert exact == bloom_v and len(exact) > 0


def test_gopher_config_driven_thresholds(spark):
    """Gates are declarative: a custom curation config changes who passes
    with no operator-code change, and the default config reproduces the
    packaged-constant behavior exactly."""
    import copy

    good = "the quick brown foxes and their lazy dogs jumped over a stone " * 5
    docs = spark.createDataFrame(
        [(0, good), (1, "too short to pass")], "doc_id bigint, text string"
    )
    base = {r["doc_id"]: r["passes_quality"] for r in
            text.gopher_quality(docs, "doc_id", "text").collect()}
    assert base == {0: 1, 1: 0}
    # defaults match the module constants (back-compat contract)
    cfg_default = text.load_curation_config()
    explicit = {r["doc_id"]: r["passes_quality"] for r in
                text.gopher_quality(docs, "doc_id", "text", config=cfg_default).collect()}
    assert explicit == base
    # loosen min_tokens -> the short doc now... still fails stopword evidence?
    loose = copy.deepcopy(cfg_default)
    loose["gopher"]["min_tokens"] = 1
    loose["gopher"]["min_stopword_hits"] = 0
    loose["gopher"]["min_mean_token_len_e4"] = 0
    got = {r["doc_id"]: r["passes_quality"] for r in
           text.gopher_quality(docs, "doc_id", "text", config=loose).collect()}
    assert got == {0: 1, 1: 1}
    # tighten min_tokens past the good doc -> everyone fails
    tight = copy.deepcopy(cfg_default)
    tight["gopher"]["min_tokens"] = 10_000
    got = {r["doc_id"]: r["passes_quality"] for r in
           text.gopher_quality(docs, "doc_id", "text", config=tight).collect()}
    assert got == {0: 0, 1: 0}


def test_langid_markers_config_driven(spark):
    """Marker sets are declarative: a custom marker map changes the label
    surface with no operator change."""
    docs = spark.createDataFrame(
        [(0, "zork bleep the of and")], "doc_id bigint, text string"
    )
    default = docs.select(text.langid_expr("text").alias("lang")).first()["lang"]
    assert default == "en"
    custom = {"xx": ("zork", "bleep"), "en": ("the", "a", "of", "and")}
    got = docs.select(
        text.langid_expr("text", markers=custom).alias("lang")
    ).first()["lang"]
    assert got == "en"  # 3 en hits beat 2 xx hits
    custom2 = {"xx": ("zork", "bleep", "the", "of", "and")}
    got2 = docs.select(
        text.langid_expr("text", markers=custom2).alias("lang")
    ).first()["lang"]
    assert got2 == "xx"


def test_langid_nb_classifies_heldout_real_sentences(spark):
    """The trained NB model must correctly label held-out sentences (NOT in
    the training corpus) in each supported language — evidence the weight
    table encodes real language signal, not fixture coincidence."""
    from data_ingestion_bra_spark.operators.langid_nb import langid_nb

    docs = spark.createDataFrame(
        [
            (0, "The weather was cold this morning and the children walked to school together."),
            (1, "La ventana de la cocina estaba abierta y los vecinos hablaban en la calle."),
            (2, "O menino comprou um livro na feira e leu durante toda a viagem de trem."),
            (3, "xy"),  # too short for any trigram -> 'und'
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["nb_lang"] for r in langid_nb(docs, "doc_id", "text").collect()}
    assert got == {0: "en", 1: "es", 2: "pt", 3: "und"}


def test_langid_nb_agrees_with_heuristic_on_fixture(spark):
    """On the fixture corpus (synthetic English-ish vocab) the NB tier and
    the stopword heuristic must broadly agree where the heuristic is
    confident — the promised accuracy check between tiers."""
    from data_ingestion_bra_spark.operators.langid_nb import langid_nb
    from data_ingestion_bra_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    heur = d.select("doc_id", text.langid_expr("text").alias("h"))
    nb = langid_nb(d, "doc_id", "text").select("doc_id", "nb_lang")
    joined = heur.join(nb, "doc_id").filter("h = 'en'")
    n = joined.count()
    n_agree = joined.filter("nb_lang = 'en'").count()
    assert n > 0 and n_agree / n >= 0.95, (n_agree, n)


def test_quality_model_separates_prose_from_degenerate(spark):
    """The committed integer logistic regression must keep held-out real
    prose (NOT in the training set) and reject each degenerate class it
    was fit against — evidence the weights encode quality signal."""
    from data_ingestion_bra_spark.operators.quality_model import quality_model_score

    prose = (
        "The committee met on Thursday morning and the members discussed a "
        "plan for the next season of work. Each of the teams presented a "
        "short report and the chair thanked everyone for the careful "
        "preparation and the honest questions that followed the meeting."
    )
    docs = spark.createDataFrame(
        [
            (0, prose),
            (1, " ".join(["spark"] * 80)),          # token spam
            (2, " ".join(str(i * 7919 % 10**6) for i in range(50))),  # digit noise
            (3, " ".join(["#$%^&*"] * 40)),          # punctuation soup
            (4, "just a fragment"),                  # too short
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["passes_model"] for r in
           quality_model_score(docs, "doc_id", "text").collect()}
    assert got == {0: 1, 1: 0, 2: 0, 3: 0, 4: 0}


def test_quality_model_score_matches_python_mirror(spark):
    """Integer score must equal the trainer's Python feature mirror dotted
    with the committed weights — the bit-exactness contract."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from train_quality_model import features as py_features

    from data_ingestion_bra_spark.operators.quality_model import (
        load_quality_model,
        quality_model_score,
    )

    m = load_quality_model()
    texts = [
        "the quick brown fox jumps over the lazy dog and the cat watches",
        "one two three four five six seven eight nine ten",
        "a a a a a a a a a a a a",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {r["doc_id"]: r["score_e6"] for r in
           quality_model_score(docs, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        f = py_features(t)
        want = m["bias"] + sum(
            m["weights"][name] * f[j] for j, name in enumerate(m["features"])
        )
        assert got[i] == want, (i, got[i], want)


def test_semdedup_prune_keeps_low_centroid_sim(spark):
    """SemDeDup dominance: within a τ-neighborhood in one cell, only the
    member LEAST similar to its centroid survives; singletons and
    cross-cell near-pairs are untouched."""
    # Two well-separated directions => 2 seed cells (first 2 vecs).
    # Cell of e1: three near-identical vectors (0/2/3) + seed; vector 4 is
    # slightly off-axis so its centroid-sim is lowest among the dup group.
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),
            (3, [0.999, 0.01, 0.0]),
            (4, [0.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    cents = similarity.seed_centroids(vecs, n_centroids=2)
    lists = similarity.assign_cells(vecs, cents).select("vid", "cell", "v")
    out = {
        r["vec_id"]: (r["n_dups"], r["keep"])
        for r in similarity.semdedup_prune(cents, lists, threshold_e4=9900).collect()
    }
    # cell 0: {0, 2, 3} all pairwise >= 0.99 cosine. cent_sim: 0 and 2 are
    # exactly on the centroid (10000), 3 is lower -> 3 survives, 0/2 pruned.
    assert out[0] == (2, 0)
    assert out[2] == (2, 0)
    assert out[3][1] == 1
    # cell 1: {1, 4} identical -> tie on cent_sim, lower vec_id survives.
    assert out[1] == (1, 1)
    assert out[4] == (1, 0)


def test_perplexity_lm_separates_prose_from_noise(spark):
    """The committed bigram LM must score in-domain prose (sentences drawn
    from its own training distribution) far below OOV gibberish, and the
    keep gate must split them; sub-2-token docs are dropped as unjudgeable."""
    from data_ingestion_bra_spark.operators import ngram_lm

    docs = spark.createDataFrame(
        [
            (0, "all human beings are born free and equal in dignity and rights"),
            (1, "xqzv glorp wibble zonkt frubs plimt quage dribnax"),
            (2, "one"),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_lm.perplexity_scores(docs, "doc_id", "text", spark=spark).collect()
    }
    assert out[0]["avg_nll_milli"] < out[1]["avg_nll_milli"]
    assert out[0]["keep"] == 1  # training-domain prose passes
    assert out[1]["keep"] == 0  # pure-OOV noise is cut
    assert out[1]["avg_nll_milli"] == -__import__("json").load(
        open(ngram_lm.DEFAULT_WEIGHTS_PATH)
    )["oov_lp"]  # every bigram OOV -> avg is exactly the OOV weight
    assert out[2] == (2, 0, 0, 0, 0) or tuple(out[2]) == (2, 0, 0, 0, 0)
    assert tuple(out[3]) == (3, 0, 0, 0, 0)


def test_merge_upsert_semantics(spark):
    """Matched keys are replaced by the changeset, unmatched changeset rows
    insert, untouched base rows survive byte-identical."""
    from data_ingestion_bra_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k bigint, s string, v bigint"
    )
    changes = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "k bigint, s string, v bigint"
    )
    got = {r["k"]: (r["s"], r["v"]) for r in merge_upsert(base, changes, ["k"]).collect()}
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_merge_upsert_duplicate_key_modes(spark):
    """keep_all passes every changeset row through; last_wins keeps the
    max-_seq row per key; error raises (Delta-MERGE parity)."""
    import pytest

    from data_ingestion_bra_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a", 0)], "k bigint, s string, _seq bigint")
    changes = spark.createDataFrame(
        [(1, "v1", 1), (1, "v2", 2), (2, "w", 1)], "k bigint, s string, _seq bigint"
    )
    keep_all = merge_upsert(base, changes, ["k"]).collect()
    assert sorted((r["k"], r["s"]) for r in keep_all) == [(1, "v1"), (1, "v2"), (2, "w")]

    last = merge_upsert(base, changes, ["k"], on_duplicate_keys="last_wins").collect()
    assert sorted((r["k"], r["s"]) for r in last) == [(1, "v2"), (2, "w")]

    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(base, changes, ["k"], on_duplicate_keys="error")
    # unique changesets sail through the guard
    uniq = spark.createDataFrame([(2, "w", 1)], "k bigint, s string, _seq bigint")
    ok = merge_upsert(base, uniq, ["k"], on_duplicate_keys="error").collect()
    assert sorted((r["k"], r["s"]) for r in ok) == [(1, "a"), (2, "w")]


def test_scd2_intervals_runs_and_current_flag(spark):
    """Runs collapse per entity; valid_to chains to the next run's
    valid_from; only the last run per entity is current."""
    from datetime import datetime

    from data_ingestion_bra_spark.operators.merge import scd2_intervals

    t = lambda s: datetime.fromisoformat(s)
    log = spark.createDataFrame(
        [
            (1, 10, "x", t("2024-01-01T00:00:00")),
            (2, 10, "x", t("2024-01-02T00:00:00")),
            (3, 10, "y", t("2024-01-03T00:00:00")),
            (4, 10, "x", t("2024-01-04T00:00:00")),
            (5, 20, "z", t("2024-01-01T12:00:00")),
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )
    rows = {
        (r["entity"], r["version"]): r
        for r in scd2_intervals(log, "user_id", "event_type", "ts", tiebreak_col="event_id").collect()
    }
    assert len(rows) == 4  # x-run, y-run, x-run for user 10; z-run for 20
    assert rows[(10, 1)]["attr"] == "x" and rows[(10, 1)]["n_events"] == 2
    assert rows[(10, 1)]["valid_to"] == t("2024-01-03T00:00:00")
    assert rows[(10, 2)]["attr"] == "y" and rows[(10, 2)]["is_current"] == 0
    assert rows[(10, 3)]["attr"] == "x" and rows[(10, 3)]["is_current"] == 1
    assert rows[(10, 3)]["valid_to"] is None
    assert rows[(20, 1)]["is_current"] == 1


def test_lm_expression_tier_matches_join_tier(spark):
    """The stateless map-literal tier and the broadcast-join tier must
    compute identical integers for every document in the fixture corpus
    (plus short/empty edge docs)."""
    from data_ingestion_bra_spark.operators import ngram_lm
    from data_ingestion_bra_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [(100000, "one"), (100001, ""), (100002, "all human beings are born free")],
        "doc_id bigint, text string",
    )
    docs = docs.unionByName(extra)
    join_tier = {
        r["doc_id"]: (r["avg_nll_milli"], r["keep"])
        for r in ngram_lm.perplexity_scores(docs, "doc_id", "text", spark=spark).collect()
    }
    expr_tier = {
        r["doc_id"]: (r["avg"], int(r["keep"]))
        for r in docs.select(
            "doc_id",
            ngram_lm.avg_nll_milli_expr("text").alias("avg"),
            ngram_lm.passes_lm_expr("text").cast("int").alias("keep"),
        ).collect()
    }
    assert join_tier == expr_tier and len(join_tier) > 50


def test_ngram_lm_committed_weights_match_trainer():
    """The committed LM table must be exactly what tools/train_ngram_lm.py
    produces from the committed corpora — guards silent drift between the
    trainer, the weights file, and the generated oracle."""
    import json
    import math
    import sys
    from collections import Counter
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from train_langid_nb import CORPUS, normalize

    from data_ingestion_bra_spark.operators.ngram_lm import load_lm

    # Per-corpus bigram counting, matching the trainer: no spurious
    # cross-language bigrams from the corpus concatenation seams.
    uni: Counter = Counter()
    bi: Counter = Counter()
    for lang in sorted(CORPUS):
        toks = normalize(CORPUS[lang]).split(" ")
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    v, n_total = len(uni), sum(uni.values())

    def p_uni(w: str) -> float:
        return (uni[w] + 1) / (n_total + v + 1)

    m = load_lm()
    assert m["oov_lp"] == round(1000 * math.log(0.25 / (n_total + v + 1)))
    assert {r["w"]: r["blp"] for r in m["uni"]} == {
        w: round(1000 * math.log(0.25 * p_uni(w))) for w in uni
    }
    want_bi = {
        f"{w1} {w2}": round(1000 * math.log(0.75 * c / uni[w1] + 0.25 * p_uni(w2)))
        for (w1, w2), c in bi.items()
    }
    assert {r["g"]: r["lp"] for r in m["bi"]} == want_bi


def test_scd2_intervals_null_attribute_runs(spark):
    """NULL attribute values form runs like any other value (null-safe
    change detection), and an entity whose history OPENS with NULL still
    numbers versions from 1."""
    from datetime import datetime

    from data_ingestion_bra_spark.operators.merge import scd2_intervals

    t = lambda s: datetime.fromisoformat(s)
    log = spark.createDataFrame(
        [
            (1, 10, None, t("2024-01-01T00:00:00")),
            (2, 10, None, t("2024-01-02T00:00:00")),
            (3, 10, "x", t("2024-01-03T00:00:00")),
            (4, 10, None, t("2024-01-04T00:00:00")),
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )
    rows = {
        (r["entity"], r["version"]): r
        for r in scd2_intervals(
            log, "user_id", "event_type", "ts", tiebreak_col="event_id"
        ).collect()
    }
    assert set(rows) == {(10, 1), (10, 2), (10, 3)}
    assert rows[(10, 1)]["attr"] is None and rows[(10, 1)]["n_events"] == 2
    assert rows[(10, 2)]["attr"] == "x"
    assert rows[(10, 3)]["attr"] is None and rows[(10, 3)]["is_current"] == 1


# ---------------------------------------------------------------------------
# Trained BPE subword tier
# ---------------------------------------------------------------------------
def test_bpe_committed_merges_match_trainer():
    """The committed merges table must be exactly what tools/train_bpe.py
    produces from the committed corpora — guards drift between the trainer,
    the JSON artifact, and the generated Spark/DuckDB expressions."""
    import sys
    from collections import Counter
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from train_bpe import N_MERGES, train
    from train_langid_nb import CORPUS, normalize

    from data_ingestion_bra_spark.operators import bpe

    vocab: Counter = Counter()
    for lang in sorted(CORPUS):
        vocab.update(normalize(CORPUS[lang]).split(" "))
    assert train(vocab, N_MERGES) == bpe.load_merges()


def test_bpe_expressions_match_reference_encoder(spark):
    """The nested-replace Spark expression must reproduce the pure-Python
    reference encoder (greedy left-to-right merge application) token-for-
    token — including the adversarial shapes the separator trick exists
    for: repeated-symbol runs, merge-output adjacency, multi-byte chars,
    empties, and words containing the separator byte itself."""
    from data_ingestion_bra_spark.operators import bpe

    merges = bpe.load_merges()
    words = [
        "the", "that", "then", "these", "aaaa", "aaa", "thth", "ententen",
        "", "a", "particionado", "dignity.", "zqxjkv", "中文字符串",
        "w\x01ith",  # separator byte stripped before symbolization
        "antidisestablishmentarianism",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: (r["n"], list(r["toks"]))
        for r in df.select(
            "w",
            bpe.word_token_count_expr(F.col("w"), merges).alias("n"),
            bpe.word_tokens_expr(F.col("w"), merges).alias("toks"),
        ).collect()
    }
    for w in words:
        exp = bpe.encode_word(w, merges)
        assert got[w] == (len(exp), exp), (w, got[w], exp)


def test_bpe_doc_count_matches_fixture_vocabulary(spark, tmp_path):
    """Doc-level BPE counts over the REAL fixture corpus: Spark expression
    vs the Python reference summed per whitespace word, for every sf0.001
    document."""
    from data_ingestion_bra_spark.operators import bpe
    from data_ingestion_bra_spark.sources.tables import load_table

    merges = bpe.load_merges()
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = d.select(
        "doc_id", "text", bpe.doc_token_count_expr(F.col("text"), merges).alias("n")
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n"] == sum(len(bpe.encode_word(w, merges)) for w in r["text"].split())


def test_char_and_token_packing_disagree(spark):
    """The reason the BPE tier exists: two docs with IDENTICAL char lengths
    pack into the SAME number of 512-char packs but DIFFERENT numbers of
    128-token packs, because chars/token differs ('the'*k merges to one
    token per word; consonant noise stays ~1 token per char)."""
    from pyspark.sql.window import Window

    from data_ingestion_bra_spark.operators import bpe

    merges = bpe.load_merges()
    dense = ("the " * 200)[:799]  # high-merge prose: few tokens per char
    noise = ("zqx " * 200)[:799]  # no merges apply: many tokens per char
    assert len(dense) == len(noise)
    d = spark.createDataFrame([(0, dense), (1, noise)], "doc_id bigint, text string")

    n_last = F.when(F.length("text") <= 200, F.lit(0)).otherwise(
        F.ceil((F.length("text") - 200) / 150.0)
    )
    chunks = d.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), n_last.cast("bigint"))).alias("chunk_idx"),
    )
    piece = F.expr("substring(text, CAST(chunk_idx * 150 AS INT) + 1, 200)")
    chunks = chunks.select(
        "doc_id", "chunk_idx",
        F.length(piece).alias("n_chars"),
        bpe.doc_token_count_expr(piece, merges).alias("n_tokens"),
    )
    w = Window.partitionBy("doc_id").orderBy("chunk_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    packs = chunks.select(
        "doc_id",
        F.floor(F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / 512).alias("char_pack"),
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 128).alias("tok_pack"),
    ).groupBy("doc_id").agg(
        F.countDistinct("char_pack").alias("n_char_packs"),
        F.countDistinct("tok_pack").alias("n_tok_packs"),
    )
    got = {r["doc_id"]: (r["n_char_packs"], r["n_tok_packs"]) for r in packs.collect()}
    # identical char budgeting...
    assert got[0][0] == got[1][0]
    # ...but token budgeting tells them apart
    assert got[0][1] != got[1][1]


def test_domain_reweighting_threshold_semantics(spark):
    """sample_weighted_by_domain's integer cross-multiplication: the
    minimum-token domain keeps EVERYTHING (p = 1), a heavier domain keeps
    exactly the docs whose 24-bit md5 prefix clears min_tok/dom_tok — pinned
    against a Python replay of the same arithmetic on a constructed skewed
    corpus."""
    import hashlib

    from data_ingestion_bra_spark.operators import bpe

    merges = bpe.load_merges()
    rows = [(i, "small", "the cat") for i in range(5)] + [
        (100 + i, "big", "the quick brown fox jumps over the lazy dog " * 3)
        for i in range(40)
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    tok = d.select(
        "doc_id", "source", bpe.doc_token_count_expr(F.col("text"), merges).alias("n_tok")
    )
    tot = tok.groupBy("source").agg(F.sum("n_tok").cast("bigint").alias("dom_tok"))
    m = tot.agg(F.min("dom_tok").cast("bigint").alias("min_tok"))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast("bigint")
    kept = {
        r["doc_id"]
        for r in tok.join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(m))
        .filter(h * F.col("dom_tok") < F.col("min_tok") * F.lit(16777216))
        .collect()
    }
    # python replay
    ntok = {i: sum(len(bpe.encode_word(w, merges)) for w in t.split()) for i, _, t in rows}
    dom_tok = {"small": sum(ntok[i] for i in range(5)),
               "big": sum(ntok[100 + i] for i in range(40))}
    min_tok = min(dom_tok.values())
    exp = {
        i
        for i, s, _ in rows
        if int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) * dom_tok[s]
        < min_tok * 16777216
    }
    assert kept == exp
    assert set(range(5)) <= kept  # min domain keeps everything
    assert len([i for i in kept if i >= 100]) < 40  # heavy domain downsampled


def test_bpe_vocab_join_equals_scan_resident(spark):
    """The vocabulary-join token counter (chain per DISTINCT word) must
    equal the scan-resident expression (chain per document) on the fixture
    corpus — the same result from both shuffle shapes."""
    from data_ingestion_bra_spark.operators import bpe
    from data_ingestion_bra_spark.sources.tables import load_table

    merges = bpe.load_merges()
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    scan = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", bpe.doc_token_count_expr(F.col("text"), merges).alias("n")
        ).collect()
    }
    via_vocab = {
        r["doc_id"]: r["n_tokens_subword"]
        for r in bpe.doc_token_counts_vocab_join(d, "doc_id", "text", merges).collect()
    }
    # vocab join omits zero-word docs; every doc it reports must match, and
    # every doc it omits must be zero in the scan-resident count
    for k, v in scan.items():
        assert via_vocab.get(k, 0) == v, k

    # whitespace-class edge: \x0b (vertical tab) is in Java's \s but NOT in
    # the shared _WS_CLASS — both variants must treat it as an ordinary
    # character (round-6 advice: splitting on \s+ made the counts diverge)
    tricky = spark.createDataFrame(
        [(1, "the\x0bcat sat"), (2, "a\x0b\x0bb"), (3, " the  end ")],
        "doc_id bigint, text string",
    )
    scan2 = {
        r["doc_id"]: r["n"]
        for r in tricky.select(
            "doc_id", bpe.doc_token_count_expr(F.col("text"), merges).alias("n")
        ).collect()
    }
    vocab2 = {
        r["doc_id"]: r["n_tokens_subword"]
        for r in bpe.doc_token_counts_vocab_join(
            tricky, "doc_id", "text", merges
        ).collect()
    }
    assert scan2 == vocab2


def test_repeated_passages_semantics(spark, tmp_path):
    """ExactSubstr-tier span detection on constructed docs: a cross-doc
    shared passage is found with exact maximal boundaries, overlapping
    gram hits merge to ONE island, and a repeat that exists only WITHIN a
    single doc is not flagged."""
    from data_ingestion_bra_spark.plans.registry import get_queries

    shared = "S" * 25 + "hello world, this is the shared paragraph" + "E" * 25  # 91 chars
    docs = [
        (1, "A" * 30 + shared + "B" * 30),          # passage at [30, 121)
        (2, shared + "C" * 50),                     # passage at [0, 91)
        # doc 3: an internal repeat (twice the same 45-char run) that no
        # other doc contains -> must NOT be reported
        (3, ("x" * 45 + "-" * 20) * 2 + "zq9"),
    ]
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
        for r in get_queries()["dedup_repeated_passages"](spark, sf).collect()
    }
    # maximal span = every pos whose 40-gram lies inside the shared region:
    # doc 1: first aligned gram at 30, last at 30+91-40=81 -> span [30, 121)
    assert out[1] == (30, 121, 52)
    assert out[2] == (0, 91, 52)
    assert 3 not in out


def test_cut_repeated_passages_semantics(spark, tmp_path):
    """The ExactSubstr REMOVE policy: spans spliced out exactly, docs with
    no cross-doc repeats (including ones too short to hold a gram) pass
    through untouched."""
    import hashlib
    import os

    from data_ingestion_bra_spark.plans.registry import get_queries

    shared = "S" * 25 + "hello world, this is the shared paragraph" + "E" * 25
    docs = [
        (1, "A" * 30 + shared + "B" * 30),
        (2, shared + "C" * 50),
        (3, "tiny"),  # < 40 chars: no grams, must still appear unchanged
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in get_queries()["text_cut_repeated_passages"](spark, sf).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["n_cut_spans"] == 1 and out[1]["n_cut_chars"] == 91
    assert out[1]["cleaned_md5"] == md5("A" * 30 + "B" * 30)
    assert out[2]["cleaned_md5"] == md5("C" * 50)
    assert out[3]["n_cut_spans"] == 0 and out[3]["cleaned_md5"] == md5("tiny")


def test_contamination_auto_routing_decision():
    """The routing boundary is the MEASURED one (SCALE.md crossover):
    fixture-scale benchmark sets broadcast; the 289 MB / 8.2M-shingle
    regime routes to the bloom bitmap; the band between shuffles exact."""
    from data_ingestion_bra_spark.operators.contamination import decide_strategy

    assert decide_strategy(10_500_000) == "exact_broadcast"   # r5 fixture point
    assert decide_strategy(64 << 20) == "exact_broadcast"     # boundary inclusive
    assert decide_strategy((64 << 20) + 1) == "exact_shuffled"
    assert decide_strategy(150 << 20) == "exact_shuffled"
    assert decide_strategy(289_000_000) == "bloom"            # r6 crossover point


def test_contamination_all_strategies_agree(spark):
    """Every route ends in the same exact confirm: identical output rows
    from exact_broadcast, exact_shuffled, bloom, and auto on the fixture."""
    from data_ingestion_bra_spark.operators import dedup
    from data_ingestion_bra_spark.operators.contamination import contamination_check
    from data_ingestion_bra_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = dedup.doc_shingles(d.filter(F.col("doc_id") < 100), "doc_id", "text", n=8)
    cand = dedup.doc_shingles(
        d.filter(F.col("doc_id") >= 100), "doc_id", "text", n=8, distinct=False
    )
    results = {}
    for s in ("exact_broadcast", "exact_shuffled", "bloom", "auto"):
        out, used = contamination_check(cand, bench, strategy=s)
        results[s] = sorted(map(tuple, out.collect()))
        if s == "auto":
            assert used == "exact_broadcast"  # fixture set is ~KBs
        else:
            assert used == s
    assert len({tuple(v) for v in results.values()}) == 1
    assert results["auto"], "fixture must produce at least one overlap row"


def test_salted_count_distinct_equals_builtin(spark):
    """Value-hash salting partitions the distinct classes disjointly, so
    the salted exact distinct must equal countDistinct on every key —
    including values colliding across keys and null-free hot keys."""
    from data_ingestion_bra_spark.operators.skew import salted_count_distinct

    rows = [(i % 3, (i * 7) % 50) for i in range(2000)] + [(9, 1)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()}
    for n_salts in (1, 8, 32):
        salted = {
            r["k"]: r["n_distinct"]
            for r in salted_count_distinct(df, "k", F.col("v"), n_salts=n_salts).collect()
        }
        assert salted == plain, n_salts


def test_vocab_join_deep_merge_table_batched(spark):
    """Deep merge tables (the 30-50k production regime) must run through the
    batched apply — the single-expression chain StackOverflows the driver
    past ~200 merges (measured) — and produce exactly the pure-Python
    greedy-BPE counts."""
    import bench
    from data_ingestion_bra_spark.operators import bpe

    merges = bench._synthetic_merges(400, bpe.load_merges())
    assert len(merges) > bpe.MAX_EXPR_MERGES
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "zq zqa zqab words that actually hit the synthetic chain zqabc"),
        (2, "   "),
        (3, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["n_tokens_subword"]
        for r in bpe.doc_token_counts_vocab_join(df, "doc_id", "text", merges).collect()
    }
    import re

    for doc_id, text in rows:
        words = [w for w in re.split(r"[ \t\n\r\f]+", text) if w]
        expected = sum(len(bpe.encode_word(w, merges)) for w in words)
        assert got.get(doc_id, 0) == expected, doc_id


def test_bitext_mining_ivf_recall_and_margin_rule(spark):
    """The IVF-composed bitext serve path: measured recall of the exact
    mutual-top-1+margin pairs at the fixture (>= 0.7 at n_probe=4, and
    non-decreasing in probes — the synthetic embeddings are NOT clustered
    by side, so cell-straddling is the common case and multi-probe is
    doing real work here), and every served pair must itself satisfy
    the margin/mutual rule within its pruned candidate world (margin_e4 >=
    threshold by construction — asserted against the returned column)."""
    from data_ingestion_bra_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = emb.filter(F.col("label") % 2 == 0)
    b = emb.filter(F.col("label") % 2 == 1)
    exact = {
        (r["a_id"], r["b_id"])
        for r in similarity.bitext_mining_margin(a, b, k=4).collect()
    }
    assert exact  # the fixture mines a non-trivial exact pair set
    cents = similarity.kmeans_train(emb, n_centroids=8, n_iter=1)
    recalls = []
    for probe in (1, 2, 4):
        served = similarity.bitext_mining_margin_ivf(
            a, b, cents, k=4, n_probe=probe
        ).collect()
        got = {(r["a_id"], r["b_id"]) for r in served}
        recalls.append(len(got & exact) / len(exact))
        for r in served:
            assert r["margin_e4"] >= 10000
    assert recalls[2] >= 0.7, recalls
    assert recalls[0] <= recalls[1] <= recalls[2], recalls  # more probes never hurt


def test_bitext_mining_ivf_served_from_inverted_lists_is_bit_identical(spark):
    """The serve path (b_assignments = persisted inverted lists) returns
    exactly what re-assigning side B would: assignment is deterministic, so
    reading the index is a pure cost optimization, not a semantics change —
    including when the lists cover MORE than side B (the semi-join trims)."""
    from data_ingestion_bra_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = emb.filter(F.col("label") % 2 == 0)
    b = emb.filter(F.col("label") % 2 == 1)
    cents = similarity.kmeans_train(emb, n_centroids=8, n_iter=1)
    # full-corpus lists, as load_or_build_ivf_index persists them
    lists = similarity.assign_cells(emb, cents, n_probe=1).select("vid", "cell", "v")
    reassigned = similarity.bitext_mining_margin_ivf(a, b, cents, k=4, n_probe=2)
    served = similarity.bitext_mining_margin_ivf(
        a, b, cents, k=4, n_probe=2, b_assignments=lists
    )
    key = lambda r: (r["a_id"], r["b_id"], r["cos_e4"], r["margin_e4"])  # noqa: E731
    assert sorted(map(key, served.collect())) == sorted(map(key, reassigned.collect()))


def test_bitext_mining_exact_is_mutual_top1(spark):
    """Every exact mined pair is mutually nearest: re-derive both argmaxes
    from the raw cosine matrix on a small synthetic side pair."""
    a = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    b = spark.createDataFrame(
        [(10, [0.9, 0.1, 0.0]), (11, [0.1, 0.9, 0.0]), (12, [0.0, 0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        (r["a_id"], r["b_id"]): r["margin_e4"]
        for r in similarity.bitext_mining_margin(a, b, k=2).collect()
    }
    # 0<->10 and 1<->11 are mutual nearest; 12 is orthogonal to everything
    assert set(got) == {(0, 10), (1, 11)}
    for m in got.values():
        assert m >= 10000


def test_snm_multipass_catches_block_boundary_straddler(spark):
    """The reversed-key second pass closes the prefix-block blind spot:
    docs 1/2 differ ONLY in their first character, so they land in
    different 2-char prefix blocks and the prefix pass can never compare
    them — but their reversed keys share everything up to the final char,
    so pass 2 sorts them adjacently and the union catches the pair with
    the same (reversal-invariant) Levenshtein distance."""
    rows = [
        (1, "alpha identical tail of this record body"),
        (2, "blpha identical tail of this record body"),  # head edit only
        (3, "zzz unrelated content far away"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    single = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.sorted_neighborhood_pairs(
            df, "doc_id", "text", key_orderings=("prefix",)
        ).collect()
    }
    assert (1, 2) not in single  # pass 1 provably blind across the boundary
    multi = dedup.sorted_neighborhood_pairs(
        df, "doc_id", "text", key_orderings=("prefix", "reversed")
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["lev"] for r in multi}
    assert (1, 2) in got
    assert got[(1, 2)] == 1  # reversal-invariant edit distance
    # multi-pass output stays canonical + distinct
    assert len(got) == len(multi)


def test_snm_multipass_is_superset_of_single_pass(spark):
    """Union semantics: every single-pass pair survives the multi-pass run
    (the second ordering only ADDS coverage), on real fixture documents."""
    from data_ingestion_bra_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    single = {
        (r["doc_a"], r["doc_b"], r["lev"])
        for r in dedup.sorted_neighborhood_pairs(
            d, "doc_id", "text", key_orderings=("prefix",)
        ).collect()
    }
    multi = {
        (r["doc_a"], r["doc_b"], r["lev"])
        for r in dedup.sorted_neighborhood_pairs(
            d, "doc_id", "text", key_orderings=("prefix", "reversed")
        ).collect()
    }
    assert single <= multi


def test_snm_unknown_ordering_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="unknown key ordering"):
        dedup.sorted_neighborhood_pairs(df, "doc_id", "text", key_orderings=("bogus",))


def test_winnowing_guarantee_and_density(spark):
    """The SIGMOD-2003 guarantee: any shared substring of length >= k+w-1
    yields at least one SHARED selected fingerprint — here a 20-char quote
    embedded in otherwise-unrelated documents is caught, while disjoint
    docs share nothing. Selection density tracks the paper's 2/(w+1)
    expectation, and fingerprints are position-decoded correctly (every
    selected position must index a gram whose hash equals the fp)."""
    from data_ingestion_bra_spark.operators.text import (
        ROLLING_HASH_B,
        ROLLING_HASH_P,
        winnowing_fingerprints,
    )

    quote = "galaxies rotate anomalously fast"
    rows = [
        (1, f"intro text before the quote {quote} and trailing words"),
        (2, f"{quote} opens this other report with different content after"),
        (3, "completely unrelated body with no overlap at all qqq"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = winnowing_fingerprints(df, "doc_id", "text", k=8, window=4).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 32-char quote must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density ~ 2/(w+1) = 0.4 of positions (loose band)
    norm1 = "intro text before the quote galaxies rotate anomalously fast and trailing words"
    n_pos = len(norm1) - 8 + 1
    assert 0.2 * n_pos <= len(by_doc[1]) <= 0.6 * n_pos
    # position decode: re-hash the gram at each selected position
    for r in got:
        if r["doc"] != 1:
            continue
        gram = norm1[r["pos"] - 1 : r["pos"] - 1 + 8]
        h = 0
        for ch in gram:
            h = (h * ROLLING_HASH_B + ord(ch)) % ROLLING_HASH_P
        assert h == r["fp"], (r["pos"], gram)


def test_winnowing_short_doc_yields_nothing(spark):
    from data_ingestion_bra_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame([(1, "tiny")], "doc_id bigint, text string")
    assert winnowing_fingerprints(df, "doc_id", "text", k=8, window=4).count() == 0


def test_phrase_search_counts_and_overlaps(spark):
    """3-term chain with overlapping occurrences: 'a b a b a' contains
    'a b a' twice (overlap included); docs without the full phrase (prefix
    only) must not match; N=1 degenerates to term frequency."""
    from data_ingestion_bra_spark.operators.text import phrase_search

    rows = [
        (1, "a b a b a"),
        (2, "a b x a b"),
        (3, "c c c"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc"]: r["n_matches"] for r in phrase_search(df, "doc_id", "text", "a b a").collect()}
    assert got == {1: 2}
    got1 = {r["doc"]: r["n_matches"] for r in phrase_search(df, "doc_id", "text", "a b").collect()}
    assert got1 == {1: 2, 2: 2}
    gotc = {r["doc"]: r["n_matches"] for r in phrase_search(df, "doc_id", "text", "c").collect()}
    assert gotc == {3: 3}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search(df, "doc_id", "text", "")


def test_bucketed_range_join_equals_naive_and_plans_equi(spark):
    """The Δ-bucket decomposition is the SAME relation as the naive range
    join (boundary timestamps included), zero-match probes survive with
    count 0, and the physical plan contains no nested-loop join."""
    from datetime import datetime

    from data_ingestion_bra_spark.operators.temporal import range_join_count_bucketed

    def t(s):
        return datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:05:00")),
            (2, t("2024-01-01 10:10:00")),
            (3, t("2024-01-01 23:00:00")),  # zero matches
        ],
        "pid bigint, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (t("2024-01-01 10:00:00"),),  # exactly at probe1 - 5min (inclusive)
            (t("2024-01-01 10:05:00"),),  # exactly at probe1 (inclusive)
            (t("2024-01-01 10:09:59"),),
            (t("2024-01-01 10:10:01"),),  # after probe2 — excluded
        ],
        "ts timestamp_ntz",
    )
    got = {
        r["pid"]: r["n"]
        for r in range_join_count_bucketed(
            left, right, left_ts="ts", right_ts="ts", lower_seconds=300, count_alias="n"
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 0}
    plan = range_join_count_bucketed(
        left, right, left_ts="ts", right_ts="ts", lower_seconds=300, count_alias="n"
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        range_join_count_bucketed(
            left, right, left_ts="ts", right_ts="ts", lower_seconds=0
        )


def test_bloom_md5_positions_match_python_reference(spark):
    """The md5-prefix bloom variant (join_bloom_runtime_filter's
    oracle-replayable hash family) must place EXACTLY the bits a pure-
    Python md5 reference places, and the probe verdict must be 1 for every
    member (zero false negatives) while rejecting most non-members."""
    import hashlib

    from data_ingestion_bra_spark.operators import bloom
    from data_ingestion_bra_spark.plans.relational_ext import _bloom_md5_positions

    m_bits, k = 4096, 3
    keys = [7, 42, 99, 1234, 888888]
    members = spark.createDataFrame([(v,) for v in keys], "k bigint")
    pos_fn = _bloom_md5_positions(m_bits, k)
    bf = bloom.build_bloom_df(members, "k", m_bits=m_bits, pos_fn=pos_fn)
    spark_words = list(bf.first()["bf"])

    ref = [0] * (m_bits // 64)
    for v in keys:
        for j in range(k):
            h = int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:12], 16) % m_bits
            ref[h // 64] |= 1 << (h % 64)
    # two's-complement view into Spark's signed BIGINT domain
    ref = [w - (1 << 64) if w >= (1 << 63) else w for w in ref]
    assert spark_words == ref

    probed = bloom.bloom_probe(members, "k", bf, "pass", m_bits=m_bits, pos_fn=pos_fn)
    assert [r["pass"] for r in probed.collect()] == [1] * len(keys)
    others = spark.createDataFrame([(v,) for v in range(10000, 10400)], "k bigint")
    n_fp = (
        bloom.bloom_probe(others, "k", bf, "pass", m_bits=m_bits, pos_fn=pos_fn)
        .filter("pass = 1")
        .count()
    )
    assert n_fp < 8, n_fp  # fpp ~ (15/4096*3)^3 with 15 set bits — near zero


def test_jaccard_prefix_filter_is_recall_complete(spark):
    """The prefix-filter candidate generator must reproduce EXACTLY the
    all-pairs exact-Jaccard result at the same threshold (the theorem the
    operator exists for: zero false negatives, unlike LSH banding), on a
    corpus with decoy shared-common-shingle pairs below the threshold."""
    from data_ingestion_bra_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, base),
        (1, base + " tail"),  # near-dup of 0, J well above 0.5
        (2, base.replace("quick", "slow")),  # mid-similarity to 0/1
        (3, "completely different text about spark query engines here"),
        (4, "completely different text about duckdb oracle engines here"),
        (5, base),  # exact dup of 0 (J = 1)
    ]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    sh = dedup.doc_shingles(d, "doc_id", "text", n=3)
    got = {
        (r.doc_a, r.doc_b): r.jaccard_e4
        for r in dedup.jaccard_prefix_filter_pairs(sh, tau_e4=5000).collect()
    }
    want = {
        (r.doc_a, r.doc_b): r.jaccard_e4
        for r in dedup.jaccard_pairs(sh, min_jaccard=0.5).collect()
    }
    assert got == want
    assert (0, 5) in got and got[(0, 5)] == 10000  # the exact dup survives
    assert all(v >= 5000 for v in got.values())


def test_jaccard_prefix_length_bound(spark):
    """Prefix length must be sz - ceil(tau*sz) + 1 per doc: at tau=0.8 a
    10-shingle doc keeps 3 prefix shingles; candidates from disjoint
    prefixes must not appear even when suffixes share shingles."""
    from data_ingestion_bra_spark.operators import dedup

    # two docs sharing only their COMMONEST shingles (which land at the
    # prefix's far end under df-ascending order at high tau)
    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta common1 common2 common3 common4"),
        (1, "one two three four five six seven eight common1 common2 common3 common4"),
    ]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    sh = dedup.doc_shingles(d, "doc_id", "text", n=3)
    out = dedup.jaccard_prefix_filter_pairs(sh, tau_e4=8000).collect()
    # true J is far below 0.8, so the exact result is empty — and the
    # all-pairs baseline agrees
    assert out == []
    assert dedup.jaccard_pairs(sh, min_jaccard=0.8).collect() == []
