#!/usr/bin/env python
"""Plan audit over every registered query: count parquet scans,
Exchanges, Python-eval nodes and nested-loop joins in the formatted
physical plan; flag plans whose scan count exceeds the distinct tables
referenced (duplicated-subtree smell, guide §7.2). Plans go to a
scratch dir for inspection; a TSV summary to stdout."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.functions import col, pandas_udf

from linux_logs_spark.registry import all_queries
from linux_logs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("PLAN_AUDIT_DIR", "/tmp/plans_audit")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan-audit")
    spark.range(1000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    _warm = pandas_udf(lambda s: s + 1, "long")
    spark.range(1000).select(_warm(col("id"))).write.mode("overwrite").format(
        "noop"
    ).save()
    specs = all_queries()
    names = sys.argv[1:] or sorted(specs)
    print("query\tscans\ttables\texchanges\tpyeval\tbnlj\tcartesian")
    for name in names:
        try:
            df = specs[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}"[:200])
            continue
        with open(os.path.join(OUT, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        # tree section only (before the blank-line-separated details)
        tree = plan.split("\n\n")[0]
        scans = len(re.findall(r"Scan parquet", tree))
        files = set(re.findall(r"file:[^\s\]]+?([a-z_]+)\.parquet", plan))
        exch = len(re.findall(r"\bExchange\b", tree))
        pyeval = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", tree)
        )
        bnlj = len(re.findall(r"BroadcastNestedLoopJoin", tree))
        cart = len(re.findall(r"CartesianProduct", tree))
        print(f"{name}\t{scans}\t{len(files)}\t{exch}\t{pyeval}\t{bnlj}\t{cart}",
              flush=True)


if __name__ == "__main__":
    main()
