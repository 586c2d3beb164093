from __future__ import annotations

import tempfile

import pytest

from event_stream_aggr_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="event_stream_aggr_spark_tests",
        shuffle_partitions=8,
        extra_conf={
            # static conf: must be set at session build (bucketing tests)
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-warehouse-")
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
