"""Single-pass governed writes: collect manifest statistics DURING the
write action via Spark's ``Observation`` API instead of a second scan.

The reference computes its manifest stats (row count + per-column null
counts, app/utils/metadata.py:85-151) from the in-memory frame — free for
pandas, but the naive distributed translation is write-then-re-aggregate:
TWO full passes over the data. ``df.observe(Observation(), ...)`` attaches
accumulator-backed aggregates to the write job itself, so the stats arrive
with the write for zero extra I/O — at 100 TB that halves the cost of
every governed bronze landing.

Constraints inherited from Observation: aggregates must not reference
nondeterministic expressions, and the numbers reflect the rows the write
actually processed (exactly what a manifest should record).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def write_parquet_with_stats(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    include_nulls: bool = True,
) -> dict[str, Any]:
    """Write parquet and return manifest-shaped stats (linhas + nulos)
    collected in the same pass. Column names mirror
    ``manifest.schema_stats_job`` so callers can feed the result straight
    into a manifest record."""
    cols = list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    if include_nulls:
        aggs += [F.sum(F.col(c).isNull().cast("bigint")).alias(c) for c in cols]
    obs = Observation("write_stats")
    observed = df.observe(obs, *aggs)
    observed.write.mode(mode).parquet(path)
    got = obs.get  # blocks until the action's listener delivers the metrics
    stats: dict[str, Any] = {
        "colunas": cols,
        "dtypes": {f.name: f.dataType.simpleString() for f in df.schema.fields},
        "linhas": int(got["__rows"]),
    }
    if include_nulls:
        stats["nulos"] = {c: int(got[c] or 0) for c in cols}
    return stats
