"""Type-conformance through the map engine — the reference's risky paths
(SURVEY §7: map/struct/list/binary round-trips through pandas UDFs;
dataframe_suite fixtures f_datetime_nat, f_array_col, f_map_col, f_binary,
f_weird_names)."""

from __future__ import annotations

import datetime
import pickle

import pandas as pd
import pytest

import fugue_spark.api as fa
from fugue_spark.schema import parse_schema


def rows(df):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t)))


def test_datetime_and_nat_through_transform(spark):
    dt = datetime.datetime(2020, 1, 1, 12, 30)
    df = spark.createDataFrame(
        [[dt, 1, 1.5], [None, 2, None]], parse_schema("a:datetime,b:int,c:double")
    )

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        assert pd.isna(pdf.a).sum() == (1 if len(pdf) == 2 else pd.isna(pdf.a).sum())
        return pdf.assign(nat=pd.NaT)

    res = fa.transform(df, f, schema="*,nat:datetime")
    got = {tuple(r) for r in res.collect()}
    assert (dt, 1, 1.5, None) in got
    assert (None, 2, None, None) in got


def test_array_column_through_transform(spark):
    df = spark.createDataFrame(
        [[datetime.datetime(2020, 1, 1), [1, 2]]], parse_schema("a:datetime,b:[int]")
    )
    res = fa.transform(df, lambda pdf: pdf, schema="*")
    row = res.collect()[0]
    assert list(row.b) == [1, 2]


def test_struct_column_through_transform(spark):
    df = spark.createDataFrame(
        [[datetime.datetime(2020, 1, 1), {"a": 1}]], parse_schema("a:datetime,b:{a:long}")
    )
    # struct survives the round trip (arrives as dict in pandas)
    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        assert pdf.b.iloc[0] == {"a": 1} or tuple(pdf.b.iloc[0]) == (1,)
        return pdf

    res = fa.transform(df, f, schema="*")
    assert res.collect()[0].b.a == 1
    # struct-dropping output (reference execution_suite:316-349)
    res2 = fa.transform(df, lambda pdf: pdf[["a"]], schema="*-b")
    assert res2.columns == ["a"]


def test_map_column_roundtrip(spark):
    df = spark.createDataFrame(
        [["x", {"k": 1}]], parse_schema("a:str,b:<str,int>")
    )
    assert df.collect()[0].b == {"k": 1}
    res = fa.transform(df, lambda pdf: pdf, schema="*")
    assert res.collect()[0].b == {"k": 1}


def test_binary_column_through_transform(spark):
    payload = pickle.dumps({"obj": 42})
    df = spark.createDataFrame([["k", bytearray(payload)]], parse_schema("a:str,b:bytes"))

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        loaded = pickle.loads(pdf.b.iloc[0])
        assert loaded == {"obj": 42}
        return pdf.assign(b=[pickle.dumps(loaded["obj"])])

    res = fa.transform(df, f, schema="*")
    assert pickle.loads(bytes(res.collect()[0].b)) == 42


def test_weird_column_names(spark):
    df = spark.createDataFrame([[1, 2, 3]], parse_schema("`a b`:int,测试:int,`a.c`:int"))
    assert set(df.columns) == {"a b", "测试", "a.c"}
    res = fa.rename(df, {"a b": "ab"})
    assert "ab" in res.columns
    res2 = fa.transform(df, lambda pdf: pdf, schema="*")
    assert rows(res2) == [(1, 2, 3)]
    res3 = fa.select_columns(df, ["测试"])
    assert rows(res3) == [(2,)]


def test_nested_deep_through_transform(spark):
    df = spark.createDataFrame(
        [["x", [{"a": 1, "b": ["u", "v"]}]]],
        parse_schema("a:str,b:[{a:int,b:[str]}]"),
    )
    res = fa.transform(df, lambda pdf: pdf, schema="*")
    row = res.collect()[0]
    assert row.b[0].a == 1 and list(row.b[0].b) == ["u", "v"]


def test_alter_columns_cast_matrix(spark):
    df = spark.createDataFrame(
        [[1, "2", 3.5, True, "2020-01-02 03:04:05"]],
        parse_schema("i:int,s:str,d:double,b:bool,t:str"),
    )
    out = fa.alter_columns(df, "i:double,s:int,d:str,b:str,t:datetime")
    row = out.collect()[0]
    assert row.i == 1.0 and row.s == 2 and row.d == "3.5"
    assert row.b in ("true", "True")
    assert row.t == datetime.datetime(2020, 1, 2, 3, 4, 5)


def test_workflow_helpers(spark, tmp_path):
    from fugue_spark.workflow import (
        assert_eq,
        assert_not_eq,
        deterministic_checkpoint,
        save_and_use,
        set_checkpoint_dir,
    )

    a = spark.createDataFrame([[1, 1.00000001]], parse_schema("x:long,y:double"))
    b = spark.createDataFrame([[1, 1.00000002]], parse_schema("x:long,y:double"))
    assert_eq(a, b, digits=5)
    assert_not_eq(a, spark.createDataFrame([[2, 1.0]], parse_schema("x:long,y:double")))

    set_checkpoint_dir(str(tmp_path / "ckpt"))
    c1 = deterministic_checkpoint(a)
    c2 = deterministic_checkpoint(a)  # same plan → loads, no rewrite
    assert rows(c1) == rows(c2)
    import os

    assert len(os.listdir(str(tmp_path / "ckpt"))) == 1

    p = str(tmp_path / "su.parquet")
    reloaded = save_and_use(a, p)
    assert rows(reloaded) == rows(a)


def test_decimal_through_transform_and_casts(spark):
    """SURVEY §1.2 decimal conformance: decimal(p,s) columns survive the
    schema parser, the transform round-trip (Arrow carries Decimal), and
    the alter_columns cast matrix (double↔decimal, rescale, to-string)."""
    import decimal

    df = spark.createDataFrame(
        [[1, decimal.Decimal("1234.56")], [2, decimal.Decimal("-0.05")]],
        parse_schema("i:int,p:decimal(12,2)"),
    )
    # transform round-trip keeps the decimal type and values
    res = fa.transform(df, lambda pdf: pdf, schema="*")
    assert dict(res.dtypes)["p"] == "decimal(12,2)"
    vals = {r.i: r.p for r in res.collect()}
    assert vals == {1: decimal.Decimal("1234.56"), 2: decimal.Decimal("-0.05")}

    # cast matrix: decimal→double, decimal→string, rescale, double→decimal
    out = fa.alter_columns(df, "p:double")
    assert {r.p for r in out.collect()} == {1234.56, -0.05}
    out = fa.alter_columns(df, "p:str")
    assert {r.p for r in out.collect()} == {"1234.56", "-0.05"}
    out = fa.alter_columns(df, "p:decimal(14,4)")
    assert dict(out.dtypes)["p"] == "decimal(14,4)"
    assert {str(r.p) for r in out.collect()} == {"1234.5600", "-0.0500"}
    back = fa.alter_columns(fa.alter_columns(df, "p:double"), "p:decimal(12,2)")
    assert {str(r.p) for r in back.collect()} == {"1234.56", "-0.05"}
