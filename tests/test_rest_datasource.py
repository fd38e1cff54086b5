from __future__ import annotations

import json

import pytest

from data_ingestion_bra_spark.sources.rest_datasource import RestJsonDataSource


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    for p in range(4):
        records = [{"id": p * 10 + i, "name": f"u{p}_{i}"} for i in range(3)]
        (d / f"page-{p}.json").write_text(json.dumps(records))
    return d


def test_paged_rest_source_parallel_partitions(spark, pages_dir):
    spark.dataSource.register(RestJsonDataSource)
    df = (
        spark.read.format("rest_json")
        .schema("id string, name string")
        .option("url", f"file://{pages_dir}/page-{{page}}.json")
        .option("pages", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # one partition per page
    rows = df.collect()
    assert len(rows) == 12
    assert {r["name"] for r in rows} == {f"u{p}_{i}" for p in range(4) for i in range(3)}


def test_fields_option_schema(spark, pages_dir):
    spark.dataSource.register(RestJsonDataSource)
    df = (
        spark.read.format("rest_json")
        .option("fields", "id,name")
        .option("url", f"file://{pages_dir}/page-0.json")
        .load()
    )
    assert df.columns == ["id", "name"]
    assert df.count() == 3


def test_missing_schema_raises(spark, pages_dir):
    spark.dataSource.register(RestJsonDataSource)
    with pytest.raises(Exception, match="fields"):
        (
            spark.read.format("rest_json")
            .option("url", f"file://{pages_dir}/page-0.json")
            .load()
            .collect()
        )
