"""Streaming SOURCE over the transaction log — "the table IS a stream"
(the published Delta streaming-source semantics): a Structured Streaming
query reads an ACID txlog table (``sinks/txlog.py``) and receives every
APPENDED row exactly once, micro-batch boundaries aligned to commit
versions.

Built on the Spark 4 Python DataSource streaming API
(``pyspark.sql.datasource.DataSourceStreamReader`` — the same public API
as ``sources/rest_datasource.py``):

- **Offsets are versions.** ``initialOffset`` = version -1 (the first
  batch replays the table from v0 — the published default), checkpoint
  recovery restarts from the committed offset, and ``latestOffset`` is
  one log stat away. The driver-side work per trigger is O(new commits)
  of JSON — never a file listing.
- **Reads are distributed.** ``partitions(start, end)`` yields one input
  partition per (version, added file); executors open their parquet file
  directly (Arrow), so data never flows through the driver.
- **Rewrite commits** (DELETE/MERGE/RESTORE) are refused by default —
  a row already emitted downstream cannot be un-emitted; that is
  exactly Delta's behavior (fail the stream, tell the user). With
  ``ignore_changes=true`` the adds of rewrite commits are emitted and
  removes skipped (Delta's ``ignoreChanges``, duplicates downstream by
  design and documented there too). Compaction / OPTIMIZE records
  (``data_change: false``) are always skipped: same rows, new layout.

Usage::

    spark.dataSource.register(TxlogStreamDataSource)
    stream = (spark.readStream.format("txlog_stream")
              .option("path", table_dir).load())

Schema comes from the table itself (first live file's Arrow schema at
stream start) unless ``.schema(...)`` overrides.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from data_ingestion_bra_spark.sinks import txlog


class TxlogStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txlog_stream"

    def schema(self) -> StructType:
        """Stream schema for a schema-EVOLVED table (round-8 ADVICE fix):
        prefer the log-recorded post-evolution schema (authoritative column
        set, the ``read_snapshot_merged`` source of truth); tables without
        schema-carrying commits fall back to the UNION of the live files'
        Arrow schemas — never just the first file, whose age would either
        drop newer columns or crash older files mid-batch. Footer reads are
        live-file-count bounded, one stream start only."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        table_dir = self.options["path"]
        snap = txlog.snapshot(table_dir)
        if not snap.entries:
            raise ValueError(f"txlog_stream: {table_dir} has no data yet")
        unified = pa.unify_schemas(
            [
                pq.ParquetFile(os.path.join(table_dir, f)).schema_arrow
                for f in snap.files
            ]
        )
        # the log-recorded column set is authoritative where present
        # (dropped/extra physical columns never leak); types come from the
        # Arrow union. Pure-pyarrow on purpose: schema() runs inside the
        # data-source worker where no SparkSession exists.
        recorded = txlog.table_schema(table_dir)
        if recorded:
            unified = pa.schema(
                [unified.field(c) for c in recorded if c in unified.names]
            )
        return from_arrow_schema(unified)

    def streamReader(self, schema: StructType) -> "TxlogStreamReader":
        return TxlogStreamReader(schema, self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class TxlogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._table_dir = options["path"]
        self._ignore_changes = str(
            options.get("ignore_changes", "false")
        ).lower() in ("true", "1")

    def initialOffset(self) -> dict:
        # exclusive lower bound: the first batch replays the table from v0
        return {"version": -1}

    def latestOffset(self) -> dict:
        return {"version": txlog.snapshot(self._table_dir).version}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        records = txlog._read_log(self._table_dir)
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            rec = records[v]
            meta = rec.get("meta", {})
            if meta.get("data_change") is False:
                continue  # OPTIMIZE/compaction: same rows, new layout
            if rec.get("remove") and not self._ignore_changes:
                raise ValueError(
                    f"txlog_stream: version {v} ({meta.get('op')}) rewrites"
                    " existing rows; an append-only stream cannot un-emit"
                    " them. Pass option('ignore_changes', 'true') to emit"
                    " the rewritten adds anyway (downstream duplicates, the"
                    " published ignoreChanges trade)."
                )
            for e in rec.get("add", []):
                parts.append(
                    _FilePartition(
                        os.path.join(self._table_dir, txlog._entry_path(e)), v
                    )
                )
        # Spark requires >= 1 partition per batch; an empty window (all
        # commits skipped) reads as one empty partition.
        return parts or [_FilePartition("", start["version"])]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        # Per-file null-fill for schema evolution (round-8 ADVICE fix):
        # a pre-evolution file is missing the newer columns — read only the
        # columns it HAS, null-fill the rest at the target type, and emit
        # every batch in the stream schema's column order. yield Arrow
        # RecordBatches directly (the Python DataSource API accepts them):
        # the data stays Arrow end to end instead of round-tripping every
        # value through Python objects + pickle.
        target = to_arrow_schema(self._schema)
        have = set(pq.ParquetFile(partition.path).schema_arrow.names)
        tbl = pq.read_table(
            partition.path, columns=[n for n in target.names if n in have]
        )
        cols = {
            f.name: (
                tbl[f.name].cast(f.type)
                if f.name in have
                else pa.nulls(len(tbl), type=f.type)
            )
            for f in target
        }
        return iter(pa.table(cols, schema=target).to_batches())

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the checkpoint; the log is immutable
