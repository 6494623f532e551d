"""The driver hands queries ITS OWN SparkSession, which may carry any
session timezone; the DuckDB oracle compares against UTC-naive
timestamps. catalog.load() re-asserts spark.sql.session.timeZone=UTC
on every call for exactly that reason — these tests pin the behavior
by running date-sensitive queries on a session deliberately poisoned
with a non-UTC zone and comparing against the oracle. A regression
that drops the reset shifts every date_trunc bucket by the zone
offset and fails the hash compare here.
"""

from __future__ import annotations

import pytest

from linux_logs_spark.registry import all_queries
from linux_logs_spark.verify import compare_frames, run_oracle

_Q = all_queries()

# Date-arithmetic-heavy queries across families: hourly buckets,
# windows over time order, streaming event-time, gap-filled spines.
_NAMES = [
    "log_error_rate_hourly",
    "log_slo_burn",
    "win_latest_per_key",
    "stream_tumbling",
    "log_gap_fill",
]


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_match_under_hostile_timezone(name, spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        spec = _Q[name]
        pdf = spec.fn(spark, sf_dir).toPandas()
        issues = compare_frames(pdf, run_oracle(spec.oracle, sf_dir))
        assert not issues, issues[:2]
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
