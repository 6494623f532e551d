"""Physical evidence for table_zorder_cluster's claim: after a
Z-order rewrite, parquet ROW-GROUP footer stats bound BOTH dimensions,
so min/max skipping prunes predicates on EITHER column. A
single-column sort bounds only its own column — a predicate on the
other dimension must read every row group.

The metric matches how skipping actually works: for a point/range
predicate on dimension d, the expected fraction of row groups read is
the average normalized [min,max] span of d across row groups. Z-order
trades the sorted column's perfect span (p = 1/n_groups) for ~sqrt(p)
on BOTH columns; the sorted layout leaves the other column at ~1.0
(no pruning at all). Measured footer-to-footer via pyarrow on the
same data, same file count.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from linux_logs_spark.operators.scans import _scratch, orders_zframe
from linux_logs_spark.registry import all_queries

N_GROUPS = 64


def _rowgroup_spans(path_glob: str, ck_range: float, day_range: float):
    """Per-row-group normalized (custkey span, day span) pairs."""
    spans = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            ck = g.column(names["o_custkey"]).statistics
            dy = g.column(names["day_no"]).statistics
            spans.append(
                ((ck.max - ck.min) / ck_range, (dy.max - dy.min) / day_range)
            )
    return spans


def test_zorder_rowgroups_bound_both_dims(spark, sf_dir):
    from pyspark.sql import functions as F

    o = orders_zframe(spark, sf_dir).select("o_custkey", "day_no", "_z")
    stats = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("day_no"), F.max("day_no")
    ).collect()[0]
    ck_range = float(stats[1] - stats[0]) or 1.0
    day_range = float(stats[3] - stats[2]) or 1.0

    zdir = _scratch(sf_dir, "orders_zorder_test")
    (
        o.repartitionByRange(N_GROUPS, "_z")
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    # the single-column-sorted strawman: same data, same group count
    sdir = _scratch(sf_dir, "orders_keysorted_test")
    (
        o.repartitionByRange(N_GROUPS, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    z = _rowgroup_spans(os.path.join(zdir, "*.parquet"), ck_range, day_range)
    s = _rowgroup_spans(os.path.join(sdir, "*.parquet"), ck_range, day_range)
    assert len(z) >= N_GROUPS // 2 and len(s) >= N_GROUPS // 2, (len(z), len(s))

    z_ck = sum(a for a, _ in z) / len(z)
    z_day = sum(b for _, b in z) / len(z)
    s_ck = sum(a for a, _ in s) / len(s)
    s_day = sum(b for _, b in s) / len(s)

    # custkey-sorted layout: day predicates read ~every row group
    assert s_day > 0.8, s_day
    # z-ordered layout: the WORST dimension still prunes — a predicate
    # on either column skips most row groups (sqrt(1/64) ≈ 0.125;
    # margin for unaligned Morton runs and range-partition skew)
    assert max(z_ck, z_day) < 0.5, (z_ck, z_day)
    # and the worst-dim comparison: z-order beats the sorted layout's
    # unsorted dimension by at least 2x
    assert max(z_ck, z_day) < 0.5 * max(s_ck, s_day), (z_ck, z_day, s_ck, s_day)


def test_zorder_rewrite_preserves_rows(spark, sf_dir):
    """The read-back aggregate equals the source aggregate — nothing
    lost or duplicated by the clustering rewrite."""
    out = all_queries()["table_zorder_cluster"].fn(spark, sf_dir)
    total = out.groupBy().sum("n_orders").collect()[0][0]
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    assert total == src


def test_footer_minmax_matches_aggregate_and_zframe_is_scan_only(spark, sf_dir):
    """table_column_minmax (the footer-stats bounds source) returns
    EXACTLY the engine-aggregated min/max for the two z-order
    dimensions — so the literal-bounds fast path produces the same
    Morton codes as the fallback aggregate — and the resulting zframe
    plan is pure scan+project: zero joins, zero aggregates (the
    'one fewer pass over orders' claim, pinned physically)."""
    from datetime import date

    from pyspark.sql import functions as F

    from linux_logs_spark.catalog import load, table_column_minmax
    from linux_logs_spark.operators.scans import Z_DAY_ANCHOR

    ck = table_column_minmax(sf_dir, "orders", "o_custkey")
    od = table_column_minmax(sf_dir, "orders", "o_orderdate")
    assert ck is not None and od is not None

    o = load(spark, sf_dir, "orders")
    row = o.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min(F.col("o_orderdate").cast("date")),
        F.max(F.col("o_orderdate").cast("date")),
    ).collect()[0]
    assert (ck[0], ck[1]) == (row[0], row[1])
    anchor = date.fromisoformat(Z_DAY_ANCHOR)
    assert (od[0].date() - anchor).days == (row[2] - anchor).days
    assert (od[1].date() - anchor).days == (row[3] - anchor).days

    zf = orders_zframe(spark, sf_dir)
    plan = zf._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan, plan


def test_footer_minmax_unknown_column_falls_back(sf_dir):
    """A column absent from the footer returns None (→ callers take
    the aggregate fallback), never raises."""
    from linux_logs_spark.catalog import table_column_minmax

    assert table_column_minmax(sf_dir, "orders", "no_such_col") is None
