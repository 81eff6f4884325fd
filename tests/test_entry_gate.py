"""Mirror of the driver's correctness gate: every registered query's Spark
result must match its DuckDB oracle at sf0.001 (fast smoke; sf0.01 in CI
round). Non-SQL queries get a rows-only sanity check."""

from __future__ import annotations

import pytest

from fugue_spark.benchmarks import QUERIES
from fugue_spark.testing import assert_dataframes_match, run_oracle


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.schema.fields) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_bench_load_guard(monkeypatch):
    """bench.load_guard records the load average in the artifact and flags
    a weather-dominated window (r09: a bench at external load ~17 shipped
    unadjudicable rows) — pure function, no Spark."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    import bench

    point: dict = {}
    monkeypatch.setattr(_os, "getloadavg", lambda: (0.4, 0.6, 0.5))
    bench.load_guard(point, cpus=32)
    assert point["load_avg_start"] == [0.4, 0.6, 0.5]
    assert "load_warning" not in point

    bad: dict = {}
    monkeypatch.setattr(_os, "getloadavg", lambda: (17.2, 12.0, 8.0))
    bench.load_guard(bad, cpus=32)
    assert "17.2" in bad["load_warning"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.spark_fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0
        return
    odf = run_oracle(spec.oracle, sf_dir)
    assert_dataframes_match(sdf, odf, name)
