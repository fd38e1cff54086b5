"""FLAC fixed-predictor residual audit — coherence with the real PCM tier.

The entry regenerates the waveform as an array EXPRESSION; these tests pin
that expression to the actual ``_synth_samples`` integers the WAV/mu-law
codecs encode into real RIFF containers, and the residual arithmetic to a
pure-Python implementation of RFC 9639's fixed predictors.
"""
from __future__ import annotations

from data_ingestion_bra_spark.operators.multimodal import _synth_samples
from data_ingestion_bra_spark.plans.llm_ops import multimodal_audio_lpc_residual


def _lpc_ref(doc_id: int):
    s = list(_synth_samples(doc_id))
    n = len(s)
    r0 = sum(abs(s[i]) for i in range(2, n))
    r1 = sum(abs(s[i] - s[i - 1]) for i in range(2, n))
    r2 = sum(abs(s[i] - 2 * s[i - 1] + s[i - 2]) for i in range(2, n))
    best = 0 if r0 <= r1 and r0 <= r2 else (1 if r1 <= r2 else 2)
    gain = None if min(r0, r1, r2) == 0 else r0 * 10000 // min(r0, r1, r2)
    return n, r0, r1, r2, best, gain


def test_lpc_residuals_match_python_reference_on_real_pcm(spark, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = [0, 1, 7, 63, 64, 100, 4095]
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                          "text": ["x"] * len(ids)}),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["doc_id"]: r for r in
            multimodal_audio_lpc_residual(spark, str(tmp_path)).collect()}
    assert set(rows) == set(ids)
    for d in ids:
        n, r0, r1, r2, best, gain = _lpc_ref(d)
        r = rows[d]
        assert r["n_samples"] == n
        assert (r["sum_abs_r0"], r["sum_abs_r1"], r["sum_abs_r2"]) == (r0, r1, r2)
        assert r["best_order"] == best
        assert r["gain_e4"] == gain
    # the synthetic ramp-ish waveform is locally linear most of the time,
    # so a predictor order should win on at least some docs
    assert any(rows[d]["best_order"] > 0 for d in ids)
