"""RocksDB state-store provider parity (round-6 verdict item 4).

The 100 TB streaming story says: when stateful-query state (per-user
totals, dedup keys, join buffers) outgrows executor heap, flip to the
RocksDB provider (SPARK_GRAFT_ROCKSDB_STATE=1 → session.py) and the
same queries run with disk-spilling state and changelog
checkpointing. Round 6 verified that by hand; these tests keep it
verified in CI: each stateful query must return byte-identical rows
under both providers. The provider conf is a runtime SQL conf,
captured per streaming-query start, so the flip needs no new session.
"""

from __future__ import annotations

import pytest

from linux_logs_spark.registry import all_queries

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.mark.parametrize("name", ["stream_tumbling", "stream_custom_state"])
def test_rocksdb_state_store_matches_default_provider(spark, sf_dir, name):
    specs = all_queries()
    base = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    try:
        got = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )

    assert got == base
