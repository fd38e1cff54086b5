"""Partition retention — age out old ``anomesdia=YYYYMMDD`` partitions.

The reference's bronze layout accumulates one daily snapshot partition per
table forever (SURVEY §1.1: single daily snapshot under
``anomesdia=YYYYMMDD``); a production lake needs the matching retention op.
This is pure directory arithmetic on the partition VALUES — no data scan,
no Spark job: at 100 TB the cost is a file listing, not a read. Dry-run
by default; deletion is per-partition-directory (atomic at the dir level,
mirroring how the writes land).
"""

from __future__ import annotations

import os
import shutil
from datetime import date, datetime, timedelta


def list_partitions(table_dir: str, partition_key: str = "anomesdia") -> list[str]:
    """Partition values present under ``table_dir``, sorted ascending."""
    prefix = f"{partition_key}="
    try:
        entries = os.listdir(table_dir)
    except FileNotFoundError:
        return []
    return sorted(
        e[len(prefix):]
        for e in entries
        if e.startswith(prefix) and os.path.isdir(os.path.join(table_dir, e))
    )


def expire_partitions(
    table_dir: str,
    *,
    keep_days: int,
    partition_key: str = "anomesdia",
    today: date | None = None,
    dry_run: bool = True,
) -> list[str]:
    """Delete (or, with ``dry_run``, just report) partitions older than
    ``keep_days`` relative to ``today``. Returns the expired partition
    values. Partition values that don't parse as YYYYMMDD are left alone
    (never delete what we don't understand)."""
    today = today or date.today()
    cutoff = today - timedelta(days=keep_days)
    expired = []
    for value in list_partitions(table_dir, partition_key):
        try:
            day = datetime.strptime(value, "%Y%m%d").date()
        except ValueError:
            continue
        if day < cutoff:
            expired.append(value)
            if not dry_run:
                shutil.rmtree(os.path.join(table_dir, f"{partition_key}={value}"))
    return expired
