from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dnsflow_clickhouse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dnsflow-tests", master="local[4]", shuffle_partitions=4)
    yield s
