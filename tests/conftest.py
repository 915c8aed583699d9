from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from whatdropsnow_etl_spark.session import get_spark  # noqa: E402
from whatdropsnow_etl_spark.sources import load_tables  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wdn-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_SMALL)
