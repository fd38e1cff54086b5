"""Process-level optimistic-concurrency stress for the transaction log.

The unit tests cover mid-flight races with threads and monkeypatched
publish; what a user actually depends on is two OS PROCESSES (separate
JVMs, separate Python runtimes, no shared state but the filesystem)
committing interleaved appends and upserts through ``sinks/txlog.py`` with
the put-if-absent ``os.link`` publish as the only arbiter (round-7 verdict
item 8). Asserts:

- a linearizable version history: log records are contiguous 0..N-1 and
  every writer's successful commits hold DISJOINT versions whose union is
  the whole history (no lost, duplicated, or torn commits);
- append atomicity: the final snapshot contains every appended row exactly
  once;
- upsert convergence: each worker upserts its own key sequentially, so the
  final value per key is that worker's last write (cross-key interleaving
  exercises the conflict-retry path: concurrent upserts rewrite the same
  base files and genuinely conflict).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[5])
from pyspark.sql import SparkSession
from data_ingestion_bra_spark.sinks import txlog

table, worker, n_appends, n_upserts = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"txlog-stress-{worker}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)

def df(rows):
    return spark.createDataFrame(rows, "k BIGINT, v BIGINT, w BIGINT")

versions = []
for i in range(n_appends):
    v = txlog.commit_append(df([(worker * 100 + i, i, worker)]).coalesce(1), table)
    versions.append(v)
for j in range(n_upserts):
    # app-level retry around the documented optimistic-conflict raise:
    # concurrent upserts rewriting the same base file genuinely conflict
    for attempt in range(25):
        try:
            v = txlog.commit_upsert(
                spark, table, df([(1000 + worker, j, worker)]).coalesce(1), key="k"
            )
            versions.append(v)
            break
        except txlog.CommitConflict:
            time.sleep(0.05 * (attempt + 1))
    else:
        raise SystemExit(f"worker {worker}: upsert {j} never committed")
print(json.dumps({"worker": worker, "versions": versions}))
"""


def test_two_process_interleaved_appends_and_upserts(tmp_path):
    table = str(tmp_path / "tbl")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    n_appends, n_upserts = 4, 3
    env = {**os.environ, "SPARK_DRIVER_MEMORY": "2g"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), table, str(w), str(n_appends), str(n_upserts), str(REPO)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        for w in (1, 2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    results = [json.loads(o.strip().splitlines()[-1]) for o in outs]

    # linearizable history: contiguous versions, disjoint per-writer, no loss
    log_dir = Path(table) / "_txlog"
    committed = sorted(int(f.stem) for f in log_dir.glob("*.json"))
    n_total = 2 * (n_appends + n_upserts)
    assert committed == list(range(n_total))
    v1, v2 = (set(r["versions"]) for r in results)
    assert v1.isdisjoint(v2)
    assert v1 | v2 == set(committed)
    # per-worker versions are monotone (each worker observed its own order)
    for r in results:
        assert r["versions"] == sorted(r["versions"])

    # final state: every append exactly once, upserts last-writer-wins
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from data_ingestion_bra_spark.sinks import txlog

    rows = {(r["k"], r["v"], r["w"]) for r in txlog.read_snapshot(spark, table).collect()}
    expected = {
        (w * 100 + i, i, w) for w in (1, 2) for i in range(n_appends)
    } | {(1000 + w, n_upserts - 1, w) for w in (1, 2)}
    assert rows == expected
