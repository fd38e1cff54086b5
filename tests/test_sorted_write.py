"""Range-sorted writes: per-file key ranges are disjoint (the property that
makes footer-stat data skipping effective) and key predicates push down."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_ingestion_bra_spark.sinks.sorted_write import read_with_skipping, write_range_sorted
from data_ingestion_bra_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _file_key_ranges(path: str, key: str) -> list[tuple[int, int]]:
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(key)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    return sorted(ranges)


def test_range_sorted_write_produces_disjoint_file_ranges(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_sorted")
    write_range_sorted(orders, out, "o_custkey", 8)

    ranges = _file_key_ranges(out, "o_custkey")
    assert len(ranges) >= 4  # range partitioner actually split the data
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # disjoint (ties may touch at bounds)

    back = read_with_skipping(spark, out)
    assert back.count() == orders.count()

    filtered = back.filter(F.col("o_custkey") == 7)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_custkey" in plan
    want = orders.filter(F.col("o_custkey") == 7).count()
    assert filtered.count() == want


def test_zorder_write_bounds_both_keys(spark, tmp_path):
    from data_ingestion_bra_spark.sinks.sorted_write import write_zordered

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    zdir = str(tmp_path / "li_z")
    sdir = str(tmp_path / "li_s")
    write_zordered(li, zdir, "l_orderkey", "l_partkey", 16)
    write_range_sorted(li, sdir, "l_orderkey", 16)  # single-key control

    def avg_span(path, key):
        ranges = _file_key_ranges(path, key)
        glo = min(lo for lo, _ in ranges)
        ghi = max(hi for _, hi in ranges)
        return sum(hi - lo for lo, hi in ranges) / len(ranges) / max(ghi - glo, 1)

    # z-order: BOTH keys' per-file ranges are a fraction of the domain
    assert avg_span(zdir, "l_orderkey") < 0.6
    assert avg_span(zdir, "l_partkey") < 0.6
    # single-key sort: the second key spans ~the whole domain per file
    assert avg_span(sdir, "l_orderkey") < 0.2
    assert avg_span(sdir, "l_partkey") > 0.8
    # same rows either way
    back = spark.read.parquet(zdir)
    assert back.count() == li.count()
