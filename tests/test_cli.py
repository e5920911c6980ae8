"""CLI surface smoke tests (list / run / explain) — in-process via
main(argv); the session is shared with the fixture through getOrCreate."""

from __future__ import annotations

import pytest

from cdc_dedupe_spark.cli import main
from cdc_dedupe_spark.queries import REGISTRY


def test_list_prints_every_query(spark, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in REGISTRY:
        assert name in out


def test_run_counts_rows(spark, sf_dir, capsys):
    assert main(["run", "agg_groupby", "--sf-dir", sf_dir, "--limit", "0"]) == 0
    assert "rows: " in capsys.readouterr().out


def test_explain_prints_physical_plan(spark, sf_dir, capsys):
    assert main(["explain", "agg_groupby", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "HashAggregate" in out


def test_unknown_query_errors(spark):
    with pytest.raises(SystemExit):
        main(["explain", "no_such_query"])
