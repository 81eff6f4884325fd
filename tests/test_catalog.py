from __future__ import annotations

import contextlib
import io

import pandas as pd
import pytest

from fugue_spark.catalog import load_table, save_table, table_exists
from fugue_spark.schema import parse_schema
from fugue_spark.sql import fsql, register_extension


def rows(df):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t)))


def test_save_load_table(spark):
    df = spark.createDataFrame([[1, "x"], [2, "y"]], parse_schema("a:long,b:str"))
    save_table(df, "t_cat_basic")
    assert table_exists(spark, "t_cat_basic")
    assert rows(load_table(spark, "t_cat_basic")) == [(1, "x"), (2, "y")]
    with pytest.raises(ValueError):
        load_table(spark, "t_missing_nope")


def test_bucketed_join_has_no_exchange(spark):
    a = spark.createDataFrame([[i, i * 10] for i in range(100)], parse_schema("k:long,x:long"))
    b = spark.createDataFrame([[i, f"s{i}"] for i in range(100)], parse_schema("k:long,y:str"))
    save_table(a, "t_bucket_a", bucket_by=["k"], num_buckets=4)
    save_table(b, "t_bucket_b", bucket_by=["k"], num_buckets=4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = load_table(spark, "t_bucket_a").join(load_table(spark, "t_bucket_b"), "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # both sides pre-bucketed on the join key → no shuffle exchange
        assert "Exchange" not in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_fsql_catalog_fallthrough(spark):
    # an unresolved FugueSQL name falls through to the backend catalog
    # (reference: FugueSQLHooks.on_select_source_not_found,
    # fugue/sql/_visitors.py:46-50)
    df = spark.createDataFrame([[1, "x"], [2, "y"]], parse_schema("a:long,b:str"))
    save_table(df, "t_cat_fall")

    @register_extension("cat_tag_ext")
    def cat_tag(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.assign(tagged=True)

    # TRANSFORM resolves its source through _get_df — the statement path
    # that used to raise 'unknown dataframe' for catalog tables
    res = fsql(
        """
        TRANSFORM t_cat_fall USING cat_tag_ext SCHEMA *,tagged:bool
        YIELD DATAFRAME AS out
        """,
        spark=spark,
    )
    assert rows(res["out"]) == [(1, "x", True), (2, "y", True)]
    # a truly unknown name still raises
    from fugue_spark.sql import FugueSQLError

    with pytest.raises(FugueSQLError):
        fsql("TRANSFORM t_nope_really_missing USING cat_tag_ext SCHEMA *", spark=spark)


def test_register_extension_and_outtransform(spark, tmp_path):
    out_dir = str(tmp_path)

    @register_extension("touch_ext")
    def touch(pdf: pd.DataFrame) -> None:
        # side effects run in worker processes — observe via the filesystem
        import os

        open(os.path.join(out_dir, f"g{int(pdf.a.iloc[0])}.marker"), "w").close()

    @register_extension("tag_ext")
    def tag(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.assign(tagged=True)

    res = fsql(
        """
        src = CREATE [[1], [2], [3]] SCHEMA a:long
        OUTTRANSFORM src PREPARTITION BY a USING touch_ext
        TRANSFORM src USING tag_ext SCHEMA *,tagged:bool
        YIELD DATAFRAME AS out
        """,
        spark=spark,
    )
    import glob

    assert len(glob.glob(out_dir + "/g*.marker")) == 3
    assert rows(res["out"]) == [(1, True), (2, True), (3, True)]
