import os

import pytest

from flink_realtime_data_warehouse_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="frdw-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    # FRDW_TEST_SF_DIR=/root/testdata/sf0.01 replays the parity suite at
    # the driver's correctness scale
    return os.environ.get("FRDW_TEST_SF_DIR", SF_SMOKE)
