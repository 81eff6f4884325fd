from __future__ import annotations

import os

import pytest

import fugue_spark.api as fa
from fugue_spark.schema import parse_schema


def rows(df):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t)))


def test_load_glob_and_folder(spark, tmp_path):
    a = spark.createDataFrame([[1, "x"]], parse_schema("a:long,b:str"))
    b = spark.createDataFrame([[2, "y"]], parse_schema("a:long,b:str"))
    d1 = os.path.join(str(tmp_path), "part1.parquet")
    d2 = os.path.join(str(tmp_path), "part2.parquet")
    fa.save(a, d1)
    fa.save(b, d2)
    # glob over both datasets
    got = fa.load(spark, os.path.join(str(tmp_path), "part*.parquet"), format_hint="parquet")
    assert rows(got) == [(1, "x"), (2, "y")]
    # list of paths
    got = fa.load(spark, [d1, d2], format_hint="parquet")
    assert rows(got) == [(1, "x"), (2, "y")]


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([[1, "x"], [2, "y"]], parse_schema("a:long,b:str"))
    p = os.path.join(str(tmp_path), "t.orc")
    fa.save(df, p)
    assert rows(fa.load(spark, p)) == [(1, "x"), (2, "y")]


def test_csv_no_header_with_schema(spark, tmp_path):
    df = spark.createDataFrame([[1, "x"]], parse_schema("a:long,b:str"))
    p = os.path.join(str(tmp_path), "t.csv")
    fa.save(df, p, header=False)
    back = fa.load(spark, p, header=False, schema="a:long,b:str")
    assert rows(back) == [(1, "x")]
    with pytest.raises(ValueError):
        fa.load(spark, p, schema="a:long,b:str", infer_schema=True)


def test_json_single_file(spark, tmp_path):
    df = spark.createDataFrame([[1, "x"], [2, "y"]], parse_schema("a:long,b:str"))
    p = os.path.join(str(tmp_path), "single.json")
    fa.save(df, p, force_single=True)
    assert os.path.isfile(p)
    back = fa.load(spark, p, columns="a:long,b:str")
    assert rows(back) == [(1, "x"), (2, "y")]
