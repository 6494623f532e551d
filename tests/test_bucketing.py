"""Bucketed co-located join (SURVEY.md §4 / pyspark guide partitioning
notes): writing both join sides bucketed by the join key lets the join
run with ZERO exchanges — the 100 TB strategy for repeated fact⋈fact
joins. Verified by plan shape, not just results.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from linux_logs_spark.catalog import load
from linux_logs_spark.plans.explain import plan_string


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    # warehouse.dir is a static conf; explicit per-table paths under a
    # tmp dir sidestep it entirely
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .option("path", os.path.join(wh, "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .option("path", os.path.join(wh, "b_lineitem"))
        .saveAsTable("b_lineitem")
    )

    # at tiny SF the planner would broadcast (and skip bucketing);
    # the MERGE hint forces the sort-merge path a 100 TB fact⋈fact
    # join would take, which is where bucketing pays off
    joined = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = plan_string(joined)
    # bucket-aligned sort-merge join: no shuffle on either side
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan

    # and it returns the same count as the unbucketed join
    expected = lineitem.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert joined.count() == expected

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_tables_reregister_without_rewrite(spark, sf_dir):
    """A fresh catalog (new process) with fingerprint-current bucketed
    files on disk must re-REGISTER the external tables — metadata
    only, no data rewrite (round 9: every new bench/driver session
    was re-running the full bucketed write, the exact cost the
    operator demonstrates amortizing)."""
    import glob
    import os

    from linux_logs_spark.operators.scans import _scratch, _scratch_tag
    from linux_logs_spark.registry import all_queries

    q = all_queries()["join_bucketed_colocated"].fn
    q(spark, sf_dir).count()  # ensure built
    wh, tag = _scratch(sf_dir, "bucketed"), _scratch_tag(sf_dir)
    files = sorted(glob.glob(os.path.join(wh, f"bq_orders_{tag}", "*.parquet")))
    assert files
    before = [os.stat(f).st_mtime_ns for f in files]
    spark.sql(f"DROP TABLE IF EXISTS bq_orders_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS bq_lineitem_{tag}")
    out = q(spark, sf_dir)
    assert out.count() > 0
    after = [os.stat(f).st_mtime_ns for f in sorted(
        glob.glob(os.path.join(wh, f"bq_orders_{tag}", "*.parquet")))]
    assert before == after  # metadata-only: no file rewritten
    # and the re-registered tables still join exchange-free
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_part = plan[: plan.index("HashAggregate")] if "HashAggregate" in plan else plan
    assert "SortMergeJoin" in plan
