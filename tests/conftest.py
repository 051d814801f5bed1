from __future__ import annotations

import pytest

from example_kafkastreams_spark.session import get_spark

SMOKE = "/root/testdata/sf0.001"
ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
