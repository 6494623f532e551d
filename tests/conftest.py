from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fast local loop: sf0.001 by default; CI/driver-parity runs use sf0.01
# via TEST_SF_DIR=/root/testdata/sf0.01.
TEST_SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from linux_logs_spark.session import get_spark

    s = get_spark("linux-logs-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
