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


_HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


@pytest.mark.parametrize("name", ["stream_tumbling", "stream_custom_state"])
def test_rocksdb_state_store_matches_default_provider(spark, sf_dir, name):
    # Pin BOTH providers explicitly (round-7 review): under
    # SPARK_GRAFT_ROCKSDB_STATE=1 the session default is already
    # RocksDB, which would make an implicit-default baseline compare
    # RocksDB against itself; and restore the caller's conf afterwards
    # instead of unsetting it out from under an env-configured session.
    def prior(key):
        try:
            return spark.conf.get(key)
        except Exception:
            return None

    prior_provider, prior_changelog = prior(_PROVIDER_KEY), prior(_CHANGELOG_KEY)
    specs = all_queries()
    try:
        spark.conf.set(_PROVIDER_KEY, _HDFS)
        base = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))

        spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
        spark.conf.set(_CHANGELOG_KEY, "true")
        got = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()))
    finally:
        for key, val in ((_PROVIDER_KEY, prior_provider), (_CHANGELOG_KEY, prior_changelog)):
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)

    assert got == base
