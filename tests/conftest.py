from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from iceberg_meta_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("iceberg-meta-spark-tests", cpus="8")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
    s.stop()
