"""ISO-BMFF box-walk conformance: build/parse roundtrip across the full
parameter grid, 64-bit and to-EOF box sizes, v1 mvhd, and structural-error
rejection — plus the Spark mapInPandas plumbing end-to-end."""

from __future__ import annotations

import struct

import pytest

from data_ingestion_bra_spark.operators import mp4


def test_roundtrip_full_parameter_grid():
    """Every codec/rate/geometry combination the synthesizer can emit must
    parse back exactly (doc_id 0..119 covers all residues of %2/%3/%5/%8)."""
    for doc_id in range(120):
        p = mp4.mp4_params(doc_id)
        m = mp4.parse_mp4_meta(mp4.build_mp4(**p))
        assert m["major_brand"] == "isom"
        assert (m["timescale"], m["duration"]) == (1000, p["duration_ms"])
        assert m["n_tracks"] == 2
        assert m["video_codec"] == p["video_codec"].decode()
        assert (m["width"], m["height"]) == (p["width"], p["height"])
        assert m["audio_codec"] == p["audio_codec"].decode()
        assert m["n_channels"] == p["n_channels"]
        assert m["sample_rate"] == p["sample_rate"]


def test_largesize_and_to_eof_boxes_parse():
    """size==1 (64-bit largesize) and size==0 (extends to EOF) are spec
    shapes real muxers emit for big mdat boxes — the walk must step over
    both without touching their bytes."""
    base = mp4.build_mp4(**mp4.mp4_params(5))
    payload = bytes(32)
    large_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    eof_mdat = struct.pack(">I", 0) + b"mdat" + payload
    for extra in (large_mdat, eof_mdat):
        m = mp4.parse_mp4_meta(base + extra)
        assert m["n_tracks"] == 2 and m["duration"] == mp4.mp4_params(5)["duration_ms"]


def test_v1_mvhd_parses():
    """Version-1 mvhd (64-bit times) has its timescale/duration at shifted
    offsets — built by hand since the synthesizer emits v0."""
    payload = (
        struct.pack(">B", 1)
        + b"\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)  # creation/modification
        + struct.pack(">I", 90_000)
        + struct.pack(">Q", 180_000)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + bytes(10)
        + mp4._UNITY_MATRIX
        + bytes(24)
        + struct.pack(">I", 1)
    )
    buf = mp4._box(b"moov", mp4._box(b"mvhd", payload))
    m = mp4.parse_mp4_meta(buf)
    assert (m["timescale"], m["duration"]) == (90_000, 180_000)


def test_structurally_broken_inputs_rejected():
    with pytest.raises(ValueError):
        mp4.parse_mp4_meta(b"")  # no boxes at all
    with pytest.raises(ValueError):
        mp4.parse_mp4_meta(mp4._box(b"ftyp", b"isom" + bytes(4)))  # no moov
    # truncated mid-box: the walk stops cleanly, then fails the moov check
    good = mp4.build_mp4(**mp4.mp4_params(1))
    with pytest.raises(ValueError):
        mp4.parse_mp4_meta(good[:20])


def test_spark_meta_pipeline_matches_params(spark):
    from data_ingestion_bra_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    out = {r["doc_id"]: r.asDict() for r in mp4.mp4_header_meta(mp4.synthesize_mp4(d)).collect()}
    assert len(out) == d.count()
    for doc_id, row in list(out.items())[:25]:
        p = mp4.mp4_params(doc_id)
        assert row["duration_ms"] == p["duration_ms"]
        assert row["video_codec"] == p["video_codec"].decode()
        assert row["sample_rate"] == p["sample_rate"]
        assert row["n_tracks"] == 2 and row["major_brand"] == "isom"
