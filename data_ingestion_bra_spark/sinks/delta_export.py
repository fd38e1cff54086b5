"""Export a txlog table's commit history as a ``_delta_log``-shaped JSON
sequence (round-6 verdict item 8, optional).

The layout follows the PUBLIC Delta Lake transaction-protocol spec
(github.com/delta-io/delta PROTOCOL.md): one ``_delta_log/%020d.json`` per
commit, newline-delimited action objects — ``protocol`` + ``metaData`` in
commit 0, ``add``/``remove`` actions mirroring each txlog record. Data
files are NOT copied or rewritten: the delta actions reference the same
relative ``data/<uuid>/*.parquet`` paths the txlog references, so an
external Delta reader pointed at the table directory resolves exactly the
snapshots the txlog resolves, version for version.

Scope: an EXPORT for interoperability, not a second commit path — the
txlog stays the source of truth, and the export is regenerated (never
incrementally appended) so it can't drift from the log. Structural
fidelity is tested by replaying the written actions and comparing every
version's live file set against ``txlog.snapshot``; no Delta reader ships
in this environment, so reader-level verification is documented as out of
scope.
"""

from __future__ import annotations

import json
import os
import uuid

from data_ingestion_bra_spark.sinks import txlog

_DELTA_LOG_DIR = "_delta_log"

#: arrow -> Spark schemaString primitive names (the subset our tables use);
#: exotic types raise so the export never writes a schema it can't stand by.
_ARROW_TO_SPARK = {
    "int8": "byte",
    "int16": "short",
    "int32": "integer",
    "int64": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _spark_schema_string(parquet_path: str) -> str:
    """Spark-JSON schemaString from a parquet footer (pyarrow, no Spark)."""
    import pyarrow.parquet as pq

    fields = []
    for f in pq.read_schema(parquet_path):
        t = str(f.type)
        if t.startswith("timestamp"):
            spark_t = "timestamp"
        elif t in _ARROW_TO_SPARK:
            spark_t = _ARROW_TO_SPARK[t]
        else:
            raise ValueError(f"unsupported type for delta export: {t} ({f.name})")
        fields.append(
            {"name": f.name, "type": spark_t, "nullable": bool(f.nullable), "metadata": {}}
        )
    return json.dumps({"type": "struct", "fields": fields})


def export_delta_log(table_dir: str) -> list[str]:
    """(Re)write ``_delta_log`` beside the txlog's own log; returns the
    commit file paths. Each txlog record becomes one delta commit with the
    same version number, same adds, same removes."""
    records = txlog._read_log(table_dir)
    if not records:
        raise FileNotFoundError(f"txlog table {table_dir} has no commits")
    log_dir = os.path.join(table_dir, _DELTA_LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    # regenerate wholesale: stale commits past the txlog's head would make
    # the export lie about history
    for name in os.listdir(log_dir):
        if name.endswith(".json"):
            os.unlink(os.path.join(log_dir, name))

    first_file = txlog._entry_path(records[0]["add"][0])
    meta_action = {
        "metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, os.path.abspath(table_dir))),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _spark_schema_string(os.path.join(table_dir, first_file)),
            "partitionColumns": [],
            "configuration": {},
        }
    }
    written = []
    for version, rec in enumerate(records):
        actions = []
        if version == 0:
            actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
            actions.append(meta_action)
        for path in rec.get("remove", []):
            actions.append(
                {"remove": {"path": path, "dataChange": True, "deletionTimestamp": 0}}
            )
        for entry in rec.get("add", []):
            path = txlog._entry_path(entry)
            full = os.path.join(table_dir, path)
            actions.append(
                {
                    "add": {
                        "path": path,
                        "partitionValues": {},
                        "size": os.path.getsize(full),
                        "modificationTime": int(os.path.getmtime(full) * 1000),
                        "dataChange": True,
                    }
                }
            )
        out = os.path.join(log_dir, f"{version:020d}.json")
        with open(out, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        written.append(out)
    return written


def replay_delta_log(table_dir: str, version: int | None = None) -> list[str]:
    """Resolve the live file set at ``version`` from the EXPORTED delta
    commits alone (protocol replay: adds minus later removes) — the test
    harness's stand-in for an external Delta reader."""
    log_dir = os.path.join(table_dir, _DELTA_LOG_DIR)
    names = sorted(n for n in os.listdir(log_dir) if n.endswith(".json"))
    if version is not None:
        names = names[: version + 1]
    live: list[str] = []
    for name in names:
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                a = json.loads(line)
                if "remove" in a:
                    live = [p for p in live if p != a["remove"]["path"]]
                elif "add" in a:
                    live.append(a["add"]["path"])
    return live
