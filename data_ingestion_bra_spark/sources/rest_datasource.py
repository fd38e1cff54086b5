"""Custom PySpark DataSource (Spark 4.x ``pyspark.sql.datasource``) for
paged JSON-over-HTTP APIs — the at-scale evolution of the driver-side REST
fetch (SURVEY §2.1 S1/S2: "at scale a custom PySpark DataSource").

Each page is an input partition, so a 10k-page API is fetched by the
CLUSTER in parallel instead of looping on the driver. The ``params`` option
is forwarded as query parameters — the same server-side predicate pushdown
the reference does manually with ``?userId=N`` (app/ingestao_api.py:88).

Usage:

    spark.dataSource.register(RestJsonDataSource)
    df = (spark.read.format("rest_json")
          .schema("id string, name string")
          .option("url", "https://api.example.com/items?page={page}")
          .option("pages", "100")
          .load())

``file://`` URLs work too (tests run against local JSON fixtures — no
network in CI).
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType


class RestJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_json"

    def schema(self):
        # Default schema from the `fields` option (all-string, asserted —
        # same discipline as the CSV source); .schema(...) overrides.
        fields = self.options.get("fields")
        if not fields:
            raise ValueError("rest_json: pass .schema(...) or option('fields', 'a,b,c')")
        return StructType([StructField(f.strip(), StringType()) for f in fields.split(",")])

    def reader(self, schema: StructType) -> "RestJsonReader":
        return RestJsonReader(schema, self.options)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class RestJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url_template = options["url"]
        self.n_pages = int(options.get("pages", "1"))
        self.params = json.loads(options.get("params", "{}"))
        self.timeout = float(options.get("timeout", "30"))

    def partitions(self):
        return [_PagePartition(p) for p in range(self.n_pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        url = self.url_template.format(page=partition.page)
        if self.params:
            sep = "&" if "?" in url else "?"
            url += sep + "&".join(f"{k}={v}" for k, v in self.params.items())
        with urllib.request.urlopen(url, timeout=self.timeout) as resp:  # noqa: S310
            records = json.loads(resp.read().decode("utf-8"))
        if not isinstance(records, list):
            raise ValueError(f"rest_json: expected JSON array at {url}")
        names = [f.name for f in self.schema.fields]
        for rec in records:
            yield tuple(None if rec.get(n) is None else str(rec.get(n)) for n in names)
