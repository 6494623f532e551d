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
