"""Differential-test helpers: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate: columns sorted by name, rows sorted,
values compared exactly after the queries' own explicit rounding (so a
passing run here predicts a passing value-hash in CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import math
import os
from typing import Any

import pandas as pd

from fugue_spark.benchmarks import TABLES

__all__ = [
    "duckdb_connect",
    "run_oracle",
    "normalize",
    "assert_dataframes_match",
    "df_eq",
    # conformance suites + pytest plugin surface (ft.* in the reference)
    "DataFrameSuite",
    "ExecutionEngineSuite",
    "BuiltinSuite",
    "FugueTestBackend",
    "FugueTestContext",
    "FugueTestSuite",
    "fugue_test_backend",
    "fugue_test_suite",
]


def __getattr__(name: str):
    """Lazy re-exports: the suites import pyspark/pandas-heavy modules and
    the plugin imports pytest; defer both so ``fugue_spark.testing`` stays
    cheap for the oracle helpers above."""
    if name in ("DataFrameSuite", "ExecutionEngineSuite", "BuiltinSuite"):
        from fugue_spark.testing import suites

        return getattr(suites, name)
    if name in (
        "FugueTestBackend",
        "FugueTestContext",
        "FugueTestSuite",
        "fugue_test_backend",
        "fugue_test_suite",
    ):
        from fugue_spark.testing import plugins

        return getattr(plugins, name)
    raise AttributeError(name)


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connect(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, rows normalized + sorted — order-insensitive."""
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def assert_dataframes_match(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    name: str = "",
    strict_types: bool = True,
) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    if strict_types:
        # A value-hash over rendered cells distinguishes 3 from 3.0: DuckDB
        # SUM(BIGINT) silently widens to HUGEINT and lands in pandas as
        # float64, so dtype families must agree or the driver's hash won't.
        fams = []
        for c in sorted(spark_pdf.columns):
            fa_, fb = _dtype_family(spark_pdf[c]), _dtype_family(oracle_pdf[c])
            if fa_ != fb:
                fams.append((c, str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)))
        assert not fams, f"{name}: dtype family mismatch (col, spark, oracle): {fams}"
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mismatches = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"


def _dtype_family(s: pd.Series) -> str:
    """Coarse dtype family: int-like / float-like / bool / datetime / other.

    int32 vs int64 is byte-identical after ``.item()`` rendering, but
    int vs float is not (``3`` vs ``3.0``) — that is the distinction a
    value-hash gate sees."""
    import numpy as np

    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    if dt == object and len(s):
        v = s.dropna()
        if len(v):
            x = v.iloc[0]
            if isinstance(x, bool) or isinstance(x, np.bool_):
                return "bool"
            if isinstance(x, (int, np.integer)):
                return "int"
            if isinstance(x, (float, np.floating)):
                return "float"
    return "other"


def df_eq(
    df: Any,
    data: Any,
    schema: Any = None,
    digits: int = 8,
    check_order: bool = False,
    check_schema: bool = True,
    check_content: bool = True,
    throw: bool = False,
) -> bool:
    """Reference-parity test comparator (``fugue.dataframe.utils._df_eq``,
    exposed to suites via ``fugue/test/plugins.py:187``): compare two
    df-like operands after coercing both onto the engine. Unit-test only —
    collects both sides to pandas.

    Floats compare after rounding to ``digits``; row order is ignored
    unless ``check_order``; ``check_schema`` compares the engine schema
    strings. Returns bool, or raises the failing assertion when ``throw``.
    """
    from pyspark.sql import DataFrame as SparkDataFrame

    from fugue_spark.api import as_fugue_df

    d1 = df if isinstance(df, SparkDataFrame) else as_fugue_df(df)
    d2 = data if isinstance(data, SparkDataFrame) else as_fugue_df(data, schema=schema)
    try:
        p1, p2 = d1.toPandas(), d2.toPandas()
        assert len(p1) == len(p2), f"count mismatch {len(p1)}, {len(p2)}"
        if check_schema:
            s1 = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in d1.schema)
            s2 = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in d2.schema)
            assert s1 == s2, f"schema mismatch {s1} vs {s2}"
        if not check_content:
            return True
        assert list(p1.columns) == list(p2.columns), (
            f"column mismatch {list(p1.columns)} vs {list(p2.columns)}"
        )

        def norm(p: pd.DataFrame) -> list[tuple]:
            rows = []
            for row in p.itertuples(index=False):
                cells = []
                for v in row:
                    if isinstance(v, float):
                        cells.append(
                            "NaN" if v != v else format(round(v, digits), f".{digits}f")
                        )
                    else:
                        cells.append(_norm_cell(v))
                rows.append(tuple(cells))
            return rows if check_order else sorted(rows, key=lambda t: tuple(map(str, t)))

        a, b = norm(p1), norm(p2)
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        assert not bad, f"{len(bad)} mismatched rows; first: {bad[0]}"
        return True
    except AssertionError:
        if throw:
            raise
        return False
