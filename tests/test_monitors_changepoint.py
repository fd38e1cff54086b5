"""CUSUM changepoint + Mann-Kendall trend-test monitors — synthetic-series
verification against pure-Python references.

Both entries ride the densified daily rollup (``_dense_daily_counts``); the
references below re-implement the textbook definitions (Page 1954 recursion;
Mann-Kendall S / tie-corrected variance) with the SAME integer fixed-point
conventions, so any drift in the closed-form window formulation (CUSUM's
prefix-sum-minus-running-min identity) or the 128-bit significance
cross-multiplication fails here before it can flap the oracle hash.
"""
from __future__ import annotations

import pytest

from data_ingestion_bra_spark.plans.temporal import (
    events_changepoint_cusum,
    events_trend_mann_kendall,
)
from tests.test_forecast import _write_events


def _cusum_ref(series: list[int]):
    """Textbook one-sided CUSUM recursions with the pipeline's parameters.
    Returns (mu_e4, k_e4, h_e4, max_pos, max_neg, first_up, first_down)."""
    n_days = len(series)
    mu_e4 = sum(series) * 10000 // n_days
    k_e4 = mu_e4 // 20
    h_e4 = mu_e4 * 4
    sp = sn = 0
    max_p = max_n = 0
    first_up = first_down = None
    for i, x in enumerate(series):
        sp = max(0, sp + (x * 10000 - mu_e4 - k_e4))
        sn = max(0, sn + (mu_e4 - k_e4 - x * 10000))
        max_p = max(max_p, sp)
        max_n = max(max_n, sn)
        if sp > h_e4 and first_up is None:
            first_up = i
        if sn > h_e4 and first_down is None:
            first_down = i
    return mu_e4, k_e4, h_e4, max_p, max_n, first_up, first_down


def _mk_ref(series: list[int]):
    """Mann-Kendall S and 18*Var(S) with the tie-correction term."""
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (series[j] > series[i]) - (series[j] < series[i])
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(series).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    sig = 1 if s * s * 180000 > 38416 * var18 else 0
    return s, tie, var18, sig


def _one_row(spark, sf, builder, etype):
    rows = [r.asDict() for r in builder(spark, sf).collect()]
    return next(r for r in rows if r["event_type"] == etype)


def test_cusum_level_shift_matches_reference(spark, tmp_path):
    # symmetric two-level series: the retrospective mean (15) sits between
    # the regimes, so BOTH one-sided statistics alarm — the below-mean
    # first regime accumulates on the negative side first, then the
    # post-shift regime clears the positive threshold. Every statistic and
    # both alarm days must match the textbook recursion exactly.
    series = [10] * 20 + [20] * 20
    sf = _write_events(tmp_path, [("click", d, n) for d, n in enumerate(series)])
    row = _one_row(spark, sf, events_changepoint_cusum, "click")
    mu, k, h, mp, mn, fu, fd = _cusum_ref(series)
    assert row["mu_e4"] == mu and row["k_e4"] == k and row["h_e4"] == h
    assert row["max_s_pos_e4"] == mp
    assert row["max_s_neg_e4"] == mn
    assert fu is not None and fd is not None
    d0 = row["first_alarm_day_up"] - fu  # absolute epoch day of index 0
    assert row["first_alarm_day_up"] == d0 + fu
    assert row["first_alarm_day_down"] == d0 + fd
    # the up alarm is inside the shifted half; down fired first (fd < fu),
    # so the headline direction is -1 by the earliest-alarm rule
    assert fu >= 20
    assert row["alarm_dir"] == (1 if fu <= fd else -1)
    assert row["alarm_dir"] == -1


def test_cusum_flat_series_never_alarms(spark, tmp_path):
    series = [12] * 30
    sf = _write_events(tmp_path, [("view", d, n) for d, n in enumerate(series)])
    row = _one_row(spark, sf, events_changepoint_cusum, "view")
    assert row["alarm_dir"] == 0
    assert row["n_alarm_days"] == 0
    assert row["first_alarm_day_up"] is None
    assert row["first_alarm_day_down"] is None
    # flat series: every deviation is exactly -k (the allowance), so both
    # statistics stay clamped at 0
    assert row["max_s_pos_e4"] == 0


def test_cusum_detects_downward_shift_with_zero_days(spark, tmp_path):
    # the source "goes dark" mid-series: zero-volume days are exactly the
    # densification-dependent case (a sparse rollup would simply omit them,
    # and the outage would be invisible to the negative-side statistic)
    series2 = [10] * 20 + [0] * 10 + [10] * 5
    fixture2 = [("buy", d, n) for d, n in enumerate(series2) if n > 0]
    sf2 = _write_events(tmp_path, fixture2)
    row2 = _one_row(spark, sf2, events_changepoint_cusum, "buy")
    mu2, k2, h2, mp2, mn2, fu2, fd2 = _cusum_ref(series2)
    assert row2["max_s_neg_e4"] == mn2
    assert fd2 is not None
    d0 = row2["first_alarm_day_down"] - fd2
    assert row2["first_alarm_day_down"] == d0 + fd2
    # the pre-outage regime sits above the retrospective mean (the outage
    # drags it down), so the positive side alarms first; the outage itself
    # still fires the down alarm, at the reference's exact day
    expected_dir = (
        0
        if fu2 is None and fd2 is None
        else 1
        if fd2 is None or (fu2 is not None and fu2 <= fd2)
        else -1
    )
    assert row2["alarm_dir"] == expected_dir
    assert row2["first_alarm_day_up"] == (None if fu2 is None else d0 + fu2)


def test_mann_kendall_monotone_trend_significant(spark, tmp_path):
    series = list(range(5, 35))  # strictly increasing, 30 days
    sf = _write_events(tmp_path, [("click", d, n) for d, n in enumerate(series)])
    row = _one_row(spark, sf, events_trend_mann_kendall, "click")
    s, tie, var18, sig = _mk_ref(series)
    assert row["s_stat"] == s == 30 * 29 // 2  # every pair concordant
    assert row["tie_term"] == tie == 0
    assert row["var18"] == var18
    assert row["trend_dir"] == 1
    assert row["significant"] == sig == 1
    assert row["tau_a_e4"] == 10000  # tau-a = 1 exactly


def test_mann_kendall_flat_series_not_significant(spark, tmp_path):
    series = [7] * 25
    sf = _write_events(tmp_path, [("view", d, n) for d, n in enumerate(series)])
    row = _one_row(spark, sf, events_trend_mann_kendall, "view")
    s, tie, var18, sig = _mk_ref(series)
    assert row["s_stat"] == 0
    assert row["var18"] == var18 == 0  # one giant tie group cancels n(n-1)(2n+5)
    assert row["significant"] == 0
    assert row["trend_dir"] == 0


def test_mann_kendall_tie_correction_and_noise(spark, tmp_path):
    # alternating plateau series: heavy ties, no real trend
    series = ([4, 4, 5, 5] * 8)[:30]
    sf = _write_events(tmp_path, [("buy", d, n) for d, n in enumerate(series)])
    row = _one_row(spark, sf, events_trend_mann_kendall, "buy")
    s, tie, var18, sig = _mk_ref(series)
    assert row["s_stat"] == s
    assert row["tie_term"] == tie
    assert row["var18"] == var18
    assert row["significant"] == sig == 0


def _km_ref(spans: list[tuple[int, int]]):
    """Pure-Python Kaplan-Meier on (duration, censored) pairs with the
    pipeline's e6 truncating fold. Returns {t: (n_risk, n_churn, s_e6)}."""
    steps = {}
    for dur, cens in spans:
        if not cens:
            steps.setdefault(dur, 0)
            steps[dur] += 1
    out = {}
    s = 1_000_000
    for t in sorted(steps):
        n_risk = sum(1 for d, _ in spans if d >= t)
        d = steps[t]
        s = s * (n_risk - d) // n_risk
        out[t] = (n_risk, d, s)
    return out


def test_kaplan_meier_matches_hand_reference(spark, tmp_path):
    """Synthetic single-user-per-session corpus: each user produces one
    session of a KNOWN minute duration (events at minute offsets within
    one day, then silence), and the corpus-end anchor censors the last
    sessions. The per-step risk set, churn count, and truncated-product
    survival must equal the textbook computation exactly."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_ingestion_bra_spark.plans.temporal import events_survival_kaplan_meier

    base = dt.datetime(2024, 1, 1)
    # (user, start_hour, duration_minutes) — one session each, all 'click';
    # user 9's session ends at the global max ts, so it is censored
    sessions = [(1, 0, 5), (2, 1, 5), (3, 2, 12), (4, 3, 12), (5, 4, 30), (9, 5, 40)]
    recs, eid = [], 0
    for user, hour, dur in sessions:
        t0 = base + dt.timedelta(hours=hour)
        # events every 4 minutes up to the duration endpoint: intra-session
        # gaps stay below the 10-minute sessionization threshold
        for m in sorted({*range(0, dur, 4), dur}):
            recs.append(
                {
                    "event_id": eid,
                    "ts": t0 + dt.timedelta(minutes=m),
                    "user_id": user,
                    "event_type": "click",
                    "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1
    df = pd.DataFrame.from_records(recs)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    rows = events_survival_kaplan_meier(spark, str(tmp_path)).collect()
    got = {r["t_min"]: (r["n_risk"], r["n_churn"], r["survival_e6"]) for r in rows}
    # corpus end = user 9's last event; only that session is within 10 min
    # of it -> censored. Everything else churns at its duration.
    spans = [(5, 0), (5, 0), (12, 0), (12, 0), (30, 0), (40, 1)]
    assert got == _km_ref(spans)
    # spot-check the arithmetic: S(5) = 4/6, S(12) = S(5)*2/4, S(30) = *1/2
    assert got[5] == (6, 2, 666666)
    assert got[12] == (4, 2, 333333)
    assert got[30] == (2, 1, 166666)
