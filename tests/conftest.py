from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_ingestion_bra_spark.session import get_spark, tune_session


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-")
    s = get_spark(
        "tests",
        cpus="8",
        shuffle_partitions="8",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    tune_session(s)
    yield s


SF_SMOKE = "/root/testdata/sf0.001"
