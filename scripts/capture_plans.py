#!/usr/bin/env python
"""Capture .explain('formatted') to plans/<tag>/<query>_<suffix>.txt and
(optionally) min-of-N noop-sink solo timings for the named queries.

Usage: capture_plans.py --tag r14 --suffix before [--time N] q1 q2 ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.functions import col, pandas_udf

from linux_logs_spark.registry import all_queries
from linux_logs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    tag, suffix, n_time = "r14", "before", 0
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        elif args[i] == "--time":
            n_time = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    _warm = pandas_udf(lambda s: s + 1, "long")
    spark.range(1000).select(_warm(col("id"))).write.mode("overwrite").format(
        "noop"
    ).save()
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        line = f"{name}: plan captured ({plan.count('Exchange')} Exchange refs)"
        if n_time:
            times = []
            for _ in range(n_time):
                t0 = time.perf_counter()
                d2 = specs[name].fn(spark, SF_DIR)
                d2.write.mode("overwrite").format("noop").save()
                times.append(round(time.perf_counter() - t0, 3))
            line += f" times={times} min={min(times)}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
