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


def test_to_df_ingest(spark):
    import pandas as pd
    import pyarrow as pa

    from fugue_spark.ingest import to_df

    # list of lists + schema
    df = to_df(spark, [[1, "x"], [2, "y"]], "a:long,b:str")
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    # list of dicts
    df = to_df(spark, [{"a": 1, "b": "x"}], "a:long,b:str")
    assert df.collect()[0].b == "x"
    # pandas with nulls in int column (the reference's arrow special path)
    pdf = pd.DataFrame({"a": [1, None], "b": ["x", "y"]})
    df = to_df(spark, pdf, "a:long,b:str")
    got = sorted([tuple(r) for r in df.collect()], key=str)
    assert (1, "x") in got and (None, "y") in got
    # arrow table
    df = to_df(spark, pa.table({"a": [1, 2]}), "a:long")
    assert df.count() == 2
    # spark df cast
    df2 = to_df(spark, df, "a:int")
    assert df2.schema["a"].dataType.simpleString() == "int"
    with pytest.raises(ValueError):
        to_df(spark, [[1]])
    with pytest.raises(ValueError):
        to_df(spark, object())


def test_sql_transform_callback(spark, tmp_path):
    import glob
    import os

    import pandas as pd

    from fugue_spark.sql import fsql

    out_dir = str(tmp_path)

    def handler(x):
        open(os.path.join(out_dir, f"cb_{x}.marker"), "w").close()

    def fn(pdf: pd.DataFrame, callback) -> pd.DataFrame:
        callback(int(pdf.a.iloc[0]))
        return pdf

    res = fsql(
        """
        CREATE [[1], [2]] SCHEMA a:long
        TRANSFORM PREPARTITION BY a USING fn SCHEMA * CALLBACK h
        YIELD DATAFRAME AS out
        """,
        spark=spark,
        functions={"fn": fn, "h": handler},
    )
    assert len(res["out"].collect()) == 2
    assert len(glob.glob(os.path.join(out_dir, "cb_*.marker"))) == 2
