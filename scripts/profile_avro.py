#!/usr/bin/env python
"""Solo profile of scan_avro_roundtrip: reproduce bench.py's warm
sequence, then split the query's cost into write / read / rerun legs so
the residual (round-13 verdict item 4) is attributable. Read-only
diagnostic — writes nothing into the repo."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.functions import col, pandas_udf

from linux_logs_spark.registry import all_queries
from linux_logs_spark.session import get_spark
from linux_logs_spark.sources.avro_py import register_pyavro
from linux_logs_spark.sources.synthetic import register_synthlog

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("profile-avro")
    t0 = time.perf_counter()
    noop(spark.range(1000).selectExpr("sum(id)"))
    _warm = pandas_udf(lambda s: s + 1, "long")
    noop(spark.range(1000).select(_warm(col("id"))))
    print(f"jvm+pandas warm: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    register_synthlog(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    noop(spark.read.format("synthlog").option("n", "64").option("parts", "2").load())
    register_pyavro(spark)
    with tempfile.TemporaryDirectory() as td:
        wp = os.path.join(td, "warm_avro")
        spark.range(64).selectExpr("id AS event_id").write.format("pyavro").mode(
            "overwrite"
        ).option("path", wp).save()
        noop(spark.read.format("pyavro").option("path", wp).load())
    print(f"datasource warm: {time.perf_counter() - t0:.2f}s")

    specs = all_queries()
    fn = specs["scan_avro_roundtrip"].fn

    # pass 1: as the bench times it
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    noop(df)
    print(f"scan_avro_roundtrip pass1: {time.perf_counter() - t0:.2f}s")

    # pass 2: warm rerun
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    noop(df)
    print(f"scan_avro_roundtrip pass2: {time.perf_counter() - t0:.2f}s")

    # split: write leg vs read leg (mirrors the operator body)
    from linux_logs_spark.catalog import load
    from linux_logs_spark.operators.scans import _scratch

    e = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _scratch(SF_DIR, "events_avro")
    t0 = time.perf_counter()
    e.write.format("pyavro").mode("overwrite").option("path", path).save()
    t1 = time.perf_counter()
    noop(spark.read.format("pyavro").option("path", path).load())
    t2 = time.perf_counter()
    print(f"write leg: {t1 - t0:.2f}s  read leg: {t2 - t1:.2f}s")
    # read again (file cache warm, planner warm)
    t0 = time.perf_counter()
    noop(spark.read.format("pyavro").option("path", path).load())
    print(f"read leg warm rerun: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
