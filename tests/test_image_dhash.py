"""Perceptual image dedup (operators/multimodal.py:image_dhash)."""

from __future__ import annotations

from data_ingestion_bra_spark.operators import png as _png
from data_ingestion_bra_spark.operators.multimodal import _dhash_from_pixels


def _pixels(w, h, seed):
    return bytes((seed * 31 + j * 7) % 256 for j in range(w * h * 3))


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _dhash_of_png(payload: bytes) -> int:
    w, h, ch, data = _png.decode_png(payload)
    return _dhash_from_pixels(w, h, ch, data)


def test_reencode_with_different_filter_is_hash_identical():
    pix = _pixels(16, 12, seed=5)
    hashes = {
        _dhash_of_png(_png.encode_png(16, 12, pix, channels=3, filter_type=f))
        for f in range(5)
    }
    assert len(hashes) == 1  # same pixels, five containers, one fingerprint


def test_small_brightness_shift_is_near_duplicate():
    pix = _pixels(16, 12, seed=5)
    brighter = bytes(min(255, b + 2) for b in pix)
    h0 = _dhash_of_png(_png.encode_png(16, 12, pix, channels=3))
    h1 = _dhash_of_png(_png.encode_png(16, 12, brighter, channels=3))
    assert _hamming(h0, h1) <= 6  # uniform shift: only clamp-edge bits move


def test_unrelated_images_are_far_apart():
    h0 = _dhash_of_png(_png.encode_png(16, 12, _pixels(16, 12, seed=5), channels=3))
    h1 = _dhash_of_png(_png.encode_png(16, 12, _pixels(16, 12, seed=1009), channels=3))
    assert _hamming(h0, h1) >= 16  # random bits land near 32/64


def test_banded_pairing_finds_the_near_dup(spark):
    # the Hamming pairing shape: 4x16-bit bands, bucket equi-join —
    # pigeonhole guarantees a shared band for hamming < 4
    from pyspark.sql import functions as F

    pix = _pixels(16, 12, seed=5)
    brighter = bytes(min(255, b + 2) for b in pix)
    rows = [
        (1, _dhash_of_png(_png.encode_png(16, 12, pix, channels=3))),
        (2, _dhash_of_png(_png.encode_png(16, 12, brighter, channels=3))),
        (3, _dhash_of_png(_png.encode_png(16, 12, _pixels(16, 12, 1009), channels=3))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, dhash bigint")
    bands = df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("dhash", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    got = {(r["x"], r["y"]) for r in pairs}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_video_near_dup_shares_frame_hashes(spark):
    # doc 2 = doc 1's frames with one new frame prepended; doc 3 unrelated.
    # A dhash equi-join must pair (1, 2) on their shared frames only.
    from data_ingestion_bra_spark.operators import gif as _gif
    from data_ingestion_bra_spark.operators.multimodal import (
        GIF_PALETTE,
        gif_frame_dhash,
    )
    from pyspark.sql import functions as F
    import pandas as pd

    def frame(seed):
        return bytes((seed * 31 + j * 7) % 16 for j in range(8 * 8))

    # frame pixels depend on seed mod 16 (the palette size), so the three
    # docs' seed sets are chosen disjoint mod 16: {5,6,7,8}, {9}, {12,11,14}
    shared = [frame(s) for s in (5, 6, 7, 8)]
    payloads = {
        1: _gif.encode_gif(8, 8, shared, GIF_PALETTE, delays_cs=[4] * 4),
        2: _gif.encode_gif(8, 8, [frame(9)] + shared, GIF_PALETTE, delays_cs=[4] * 5),
        3: _gif.encode_gif(8, 8, [frame(s) for s in (60, 75, 30)], GIF_PALETTE, delays_cs=[4] * 3),
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(payloads), "payload": [payloads[k] for k in payloads]}
        )
    )
    h = gif_frame_dhash(df, every_n=1)
    pairs = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.dhash") == F.col("b.dhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .agg(F.countDistinct("a.dhash").alias("shared"))
        .collect()
    )
    got = {(r["x"], r["y"]): r["shared"] for r in pairs}
    assert got.get((1, 2)) == 4  # all four shared frames found
    assert (1, 3) not in got and (2, 3) not in got


def test_audio_fingerprint_robustness():
    # contour hashing keys on signal STRUCTURE (which windows are louder /
    # busier), so the fixtures need envelopes — a flat sawtooth has a flat
    # contour and every clip would look alike, correctly.
    from data_ingestion_bra_spark.operators.multimodal import _audio_fingerprint

    def clip(envelope, n=512):
        # deterministic oscillation under a per-window amplitude envelope
        return [
            (envelope[i * 16 // n]) * (1 if (i // 3) % 2 == 0 else -1)
            for i in range(n)
        ]

    rising = clip([50 * (w + 1) for w in range(16)])
    falling = clip([50 * (16 - w) for w in range(16)])
    a = _audio_fingerprint(rising)
    assert a == _audio_fingerprint(list(rising))
    # uniform gain change preserves the contour exactly
    assert _audio_fingerprint([s // 2 for s in rising]) == a
    # a small additive wobble moves at most a few near-tie bits
    wobble = [s + (1 if i % 7 == 0 else 0) for i, s in enumerate(rising)]
    assert bin(a ^ _audio_fingerprint(wobble)).count("1") <= 3
    # an opposite envelope flips the energy-contour bits wholesale
    far = a ^ _audio_fingerprint(falling)
    assert bin(far).count("1") >= 10


def test_gray_alpha_reencode_hashes_like_the_grayscale_original():
    # opaque gray+alpha must fingerprint identically to plain grayscale —
    # averaging the alpha byte into luminance would split true duplicates
    # (round-8 review finding)
    gray = bytes((5 * 31 + j * 7) % 256 for j in range(16 * 12))
    ga = bytes(b for v in gray for b in (v, 255))
    h_gray = _dhash_of_png(_png.encode_png(16, 12, gray, channels=1))
    h_ga = _dhash_of_png(_png.encode_png(16, 12, ga, channels=2))
    assert h_gray == h_ga
    # and RGBA with opaque alpha matches plain RGB
    rgb = _pixels(16, 12, seed=5)
    rgba = bytes(
        b
        for i in range(0, len(rgb), 3)
        for b in (rgb[i], rgb[i + 1], rgb[i + 2], 255)
    )
    assert _dhash_of_png(_png.encode_png(16, 12, rgb, channels=3)) == _dhash_of_png(
        _png.encode_png(16, 12, rgba, channels=4)
    )
