from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from kissmetrics_to_database_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
