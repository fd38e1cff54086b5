"""ITU-T G.711 mu-law companding (operators/multimodal.py) and the
Theil-Sen robust trend plan — round-11 operator-level properties."""

from __future__ import annotations

import numpy as np

from data_ingestion_bra_spark.operators.multimodal import (
    mulaw_decode,
    mulaw_encode,
)


def test_mulaw_roundtrip_halfstep_bound_exhaustive():
    """Every 14-bit PCM value: the decoded midpoint errs by at most half
    the segment step (2^(e+2)) — the derived bound the entry's verdict
    column checks."""
    x = np.arange(-8192, 8192, dtype=np.int64)
    enc = mulaw_encode(x)
    dec = mulaw_decode(enc)
    e = (enc.astype(np.int64) >> 4) & 7
    assert (np.abs(dec - x) <= (1 << (e + 2))).all()
    assert enc.dtype == np.uint8


def test_mulaw_sign_symmetry_and_monotone_segments():
    x = np.array([1, 100, 1000, 8000], dtype=np.int64)
    assert (mulaw_decode(mulaw_encode(-x)) == -mulaw_decode(mulaw_encode(x))).all()
    # segment index is monotone in magnitude
    e = (mulaw_encode(np.array([0, 200, 500, 2000, 8000])).astype(int) >> 4) & 7
    assert list(e) == sorted(e)


def test_mulaw_clip():
    big = np.array([40000, -40000], dtype=np.int64)
    d = mulaw_decode(mulaw_encode(big))
    assert abs(int(d[0])) <= 32767 and int(d[1]) == -int(d[0])


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    """A single burst day must not move the robust slope: counts follow
    n = 10 + 2*day except one 100x outlier — Theil-Sen reports 2.0/day."""
    import pandas as pd

    rows = []
    for day in range(12):
        n = 10 + 2 * day if day != 5 else 1000
        for i in range(n):
            rows.append(
                (f"e{day}_{i}", "u1", "click", 1.0,
                 pd.Timestamp("2024-03-01") + pd.Timedelta(days=day, seconds=i))
            )
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "value", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet", index=False)
    from data_ingestion_bra_spark.plans.registry import get_queries

    got = get_queries()["events_trend_theil_sen"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["trend_slope_e4"] == 20000  # 2 events/day exactly
