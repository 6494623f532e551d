"""CLI surface + error-path regression tests."""

from __future__ import annotations

import pytest

from linux_logs_spark.__main__ import main
from linux_logs_spark.catalog import load
from linux_logs_spark.registry import all_queries, register


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "agg_groupby" in out and "sql-oracle" in out
    assert len(out.strip().splitlines()) == len(all_queries())


def test_cli_run_and_search(spark, sf_dir, capsys):
    assert main(["run", "scan_parquet", "--sf-dir", sf_dir, "-n", "3"]) == 0
    assert "n_name" in capsys.readouterr().out
    assert main(["search", "scan", "--sf-dir", sf_dir, "-n", "2"]) == 0
    assert "documents match" in capsys.readouterr().out


def test_cli_unknown_query_is_clean_error(capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_catalog_rejects_unknown_table(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown table"):
        load(spark, sf_dir, "not_a_table")


def test_registry_rejects_duplicate_names():
    with pytest.raises(ValueError, match="duplicate query name"):
        register("agg_groupby", "aggregate")(lambda s, d: None)


def test_bench_full_artifact_guard():
    """bench.py must refuse to overwrite bench_full.json with a run
    whose median is >10% above the committed artifact unless forced —
    mechanizing the quiet-window snapshot rule (round-7 verdict: the
    183.9 s close artifact was silently replaced by a loaded 215.5 s
    driver run; that incident's median inflation was 12.5%, so the
    gate must catch a 12.5% bump)."""
    from bench import guard_full_artifact

    assert guard_full_artifact(0.40, 0.40, force=False)        # flat
    assert guard_full_artifact(0.44, 0.40, force=False)        # ==1.10x
    assert not guard_full_artifact(0.46, 0.409, force=False)   # the incident
    assert not guard_full_artifact(0.45, 0.40, force=False)    # loaded
    assert guard_full_artifact(0.45, 0.40, force=True)         # forced
    assert guard_full_artifact(0.45, None, force=False)        # no prior
    assert guard_full_artifact(None, 0.40, force=False)        # no median
