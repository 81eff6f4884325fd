from __future__ import annotations

import pandas as pd
import pytest

import fugue_spark.api as fa
from fugue_spark.context import current_spark, engine_context, raw_sql
from fugue_spark.schema import parse_schema


def test_engine_context_and_raw_sql(spark):
    with engine_context(spark) as s:
        assert s is spark
        assert current_spark() is spark
        df = spark.createDataFrame([[1], [2], [3]], parse_schema("a:long"))
        res = raw_sql("SELECT a * 2 AS b FROM", df, "WHERE a > 1")
        assert sorted(r.b for r in res.collect()) == [4, 6]


def test_validations(spark):
    df = spark.createDataFrame([[1, 2]], parse_schema("k:int,v:int"))

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    # satisfied rules pass
    fa.transform(
        df, f, schema="*", partition={"by": ["k"], "presort": "v DESC"},
        validations={"partitionby_has": ["k"], "presort_has": ["v desc"], "input_has": ["k", "v"]},
    ).collect()
    with pytest.raises(ValueError, match="partition keys"):
        fa.transform(df, f, schema="*", validations={"partitionby_has": ["k"]})
    with pytest.raises(ValueError, match="presort"):
        fa.transform(
            df, f, schema="*", partition={"by": ["k"]}, validations={"presort_is": ["v"]}
        )
    with pytest.raises(ValueError, match="input must contain"):
        fa.transform(df, f, schema="*", validations={"input_has": ["zz"]})
    # rules attached to the function itself
    def g(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    g.validations = {"partitionby_is": ["k"]}
    with pytest.raises(ValueError, match="partition keys"):
        fa.transform(df, g, schema="*")
    fa.transform(df, g, schema="*", partition={"by": ["k"]}).collect()
