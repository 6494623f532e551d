"""CLI for the engine — the user-facing surface the reference's log
analyzer offers (run a query against the store, see rows), Spark-first:

    python -m linux_logs_spark list
    python -m linux_logs_spark run agg_groupby --sf-dir /root/testdata/sf0.01 -n 10
    python -m linux_logs_spark explain join_broadcast
    python -m linux_logs_spark search error --sf-dir /root/testdata/sf0.01

`search` is the reference's headline interaction (keyword over the
consolidated store) exposed directly; everything else runs any
registered query by name.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="linux_logs_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run a registered query")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("-n", "--rows", type=int, default=20)

    exp = sub.add_parser("explain", help="show a query's physical plan")
    exp.add_argument("name")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    srch = sub.add_parser("search", help="keyword search over documents")
    srch.add_argument("keyword")
    srch.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    srch.add_argument("-n", "--rows", type=int, default=20)

    args = ap.parse_args(argv)

    from linux_logs_spark.registry import all_queries

    specs = all_queries()

    if args.cmd == "list":
        width = max(map(len, specs))
        for name, spec in sorted(specs.items()):
            oracle = "sql-oracle" if spec.oracle else "rows-only"
            print(f"{name:<{width}}  [{spec.category}] {oracle}")
        return 0

    from linux_logs_spark.session import get_spark

    spark = get_spark(
        "linux-logs-spark-cli",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    if args.cmd == "search":
        from pyspark.sql import functions as F

        from linux_logs_spark.catalog import load

        d = load(spark, args.sf_dir, "documents")
        hits = d.filter(F.col("text").contains(args.keyword)).select(
            "doc_id", "lang", "source", F.substring("text", 1, 80).alias("snippet")
        )
        hits.show(args.rows, truncate=False)
        print(f"{hits.count()} documents match {args.keyword!r}")
        return 0

    if args.name not in specs:
        print(f"unknown query {args.name!r}; try: python -m linux_logs_spark list",
              file=sys.stderr)
        return 2

    df = specs[args.name].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain(mode="formatted")
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
