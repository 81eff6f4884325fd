"""Importable conformance suites (reference surface: ``fugue_test``).

The reference ships its backend test corpora as importable suite classes —
``fugue_test/dataframe_suite.py``, ``execution_suite.py``,
``builtin_suite.py`` exposed through a pytest plugin
(``/root/reference/fugue/test/plugins.py:139-211``) — so any backend can
subclass and inherit the whole corpus. This module packages this engine's
ports of the hardest reference corpora the same way (class-per-suite,
``/root/reference/fugue_test/execution_suite.py:51``):

* :class:`DataFrameSuite` — DataFrame-level contracts: the alter_columns
  cast matrix (ref dataframe_suite.py:303-450) and the ``fugue.api``
  dataset/dataframe inspection utilities.
* :class:`ExecutionEngineSuite` — engine primitives: grouped take +
  na_position corpus (ref execution_suite.py:763-865), map-engine
  special-value corners (ref execution_suite.py:258-365), df-like operand
  coercion, and engine-resolution order.
* :class:`BuiltinSuite` — workflow-level contracts: exotic column names
  end-to-end (ref builtin_suite.py:1743-1800), transformer forms, the
  deferred FugueWorkflow DAG, and ``fugue_sql_flow``.

Usage (pytest): subclass in a test module and provide a ``spark`` fixture::

    from fugue_spark.testing.suites import DataFrameSuite

    class TestDataFrames(DataFrameSuite):
        pass  # inherits the whole corpus; runs on your spark fixture

The methods only require ``spark`` (a SparkSession fixture) and pytest's
``tmp_path``; there is no base-class state, so plain subclassing is enough.
"""

from __future__ import annotations

from datetime import date, datetime

import pandas as pd
import pytest

import fugue_spark.api as fa
from fugue_spark.schema import parse_schema

__all__ = ["DataFrameSuite", "ExecutionEngineSuite", "BuiltinSuite"]


def make_df(spark, data, schema):
    return spark.createDataFrame(data, parse_schema(schema))


def arr(df):
    """type-safe as_array: python values via collect, column order kept."""
    return [list(r) for r in df.collect()]


def schema_str(df):
    return ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


# reference execution_suite take corpus input
_TAKE_DATA = [
    ["a", 2, 3],
    ["a", 3, 4],
    ["b", 1, 2],
    ["b", 2, 2],
    [None, 4, 2],
    [None, 2, 1],
]


class DataFrameSuite:
    """DataFrame-level conformance corpus (ref fugue_test/dataframe_suite.py)."""

    def test_alter_columns_empty_and_noop(self, spark):
        df = make_df(spark, [], "a:str,b:int")
        ndf = fa.alter_columns(df, "a:str,b:str")
        assert arr(ndf) == []
        assert schema_str(ndf) == "a:string,b:string"

        df = make_df(spark, [["a", 1], ["c", None]], "a:str,b:int")
        ndf = fa.alter_columns(df, "b:int,a:str")
        assert arr(ndf) == [["a", 1], ["c", None]]
        assert schema_str(ndf) == "a:string,b:int"

    def test_alter_columns_bool_to_str(self, spark):
        df = make_df(spark, [["a", True], ["b", False], ["c", None]], "a:str,b:bool")
        ndf = fa.alter_columns(df, "b:str")
        actual = arr(ndf)
        assert actual in (
            [["a", "True"], ["b", "False"], ["c", None]],
            [["a", "true"], ["b", "false"], ["c", None]],
        )
        assert schema_str(ndf) == "a:string,b:string"

    def test_alter_columns_int_to_str_and_double(self, spark):
        df = make_df(spark, [["a", 1], ["c", None]], "a:str,b:int")
        ndf = fa.alter_columns(df, "b:str")
        assert arr(ndf) in ([["a", "1"], ["c", None]], [["a", "1.0"], ["c", None]])
        assert schema_str(ndf) == "a:string,b:string"

        ndf = fa.alter_columns(df, "b:double")
        assert arr(ndf) == [["a", 1.0], ["c", None]]
        assert schema_str(ndf) == "a:string,b:double"

    def test_alter_columns_double_to_str_and_int(self, spark):
        df = make_df(spark, [["a", 1.1], ["b", None]], "a:str,b:double")
        assert arr(fa.alter_columns(df, "b:str")) == [["a", "1.1"], ["b", None]]

        df = make_df(spark, [["a", 1.0], ["b", None]], "a:str,b:double")
        assert arr(fa.alter_columns(df, "b:int")) == [["a", 1], ["b", None]]

    def test_alter_columns_date_datetime_to_str(self, spark):
        df = make_df(
            spark,
            [["a", date(2020, 1, 1)], ["b", date(2020, 1, 2)], ["c", None]],
            "a:str,b:date",
        )
        assert arr(fa.alter_columns(df, "b:str")) == [
            ["a", "2020-01-01"],
            ["b", "2020-01-02"],
            ["c", None],
        ]

        df = make_df(
            spark,
            [
                ["a", datetime(2020, 1, 1, 3, 4, 5)],
                ["b", datetime(2020, 1, 2, 16, 7, 8)],
                ["c", None],
            ],
            "a:str,b:datetime",
        )
        assert arr(fa.alter_columns(df, "b:str")) == [
            ["a", "2020-01-01 03:04:05"],
            ["b", "2020-01-02 16:07:08"],
            ["c", None],
        ]

    def test_alter_columns_str_to_bool_int_double(self, spark):
        df = make_df(spark, [["a", "trUe"], ["b", "False"], ["c", None]], "a:str,b:str")
        ndf = fa.alter_columns(df, "b:bool,a:str")
        assert arr(ndf) == [["a", True], ["b", False], ["c", None]]
        assert schema_str(ndf) == "a:string,b:boolean"

        df = make_df(spark, [["a", "1"]], "a:str,b:str")
        ndf = fa.alter_columns(df, "b:int,a:str")
        assert arr(ndf) == [["a", 1]]
        assert schema_str(ndf) == "a:string,b:int"

        df = make_df(spark, [["a", "1.1"], ["b", "2"], ["c", None]], "a:str,b:str")
        ndf = fa.alter_columns(df, "b:double")
        assert arr(ndf) == [["a", 1.1], ["b", 2.0], ["c", None]]
        assert schema_str(ndf) == "a:string,b:double"

    def test_alter_columns_str_to_date_datetime(self, spark):
        df = make_df(
            spark,
            [["1", "2020-01-01"], ["2", "2020-01-02"], ["3", None]],
            "a:str,b:str",
        )
        ndf = fa.alter_columns(df, "b:date,a:int")
        assert arr(ndf) == [
            [1, date(2020, 1, 1)],
            [2, date(2020, 1, 2)],
            [3, None],
        ]
        assert schema_str(ndf) == "a:int,b:date"

        df = make_df(
            spark,
            [["1", "2020-01-01 01:02:03"], ["2", "2020-01-02 01:02:03"], ["3", None]],
            "a:str,b:str",
        )
        ndf = fa.alter_columns(df, "b:datetime,a:int")
        assert arr(ndf) == [
            [1, datetime(2020, 1, 1, 1, 2, 3)],
            [2, datetime(2020, 1, 2, 1, 2, 3)],
            [3, None],
        ]

    def test_alter_columns_invalid_conversion(self, spark):
        df = make_df(spark, [["1", "x"], ["2", "y"], ["3", None]], "a:str,b:str")
        with pytest.raises(Exception):
            ndf = fa.alter_columns(df, "b:int")
            ndf.collect()  # lazy: force materialization

    def test_api_inspection_utilities(self, spark):
        """Reference fugue.api dataset/dataframe utilities (fugue/dataset/
        api.py + fugue/dataframe/api.py): the engine dataframe IS the Spark
        DataFrame, so these are honest adapters."""
        import pandas as pd

        import fugue_spark.api as fa

        df = spark.createDataFrame([[1, "a"], [2, "b"]], "x long, s string")
        assert fa.is_df(df) and not fa.is_df([1, 2])
        assert fa.is_bounded(df)
        assert not fa.is_local(df) and fa.is_local(pd.DataFrame())
        assert not fa.is_empty(df)
        assert fa.is_empty(df.filter("x > 10"))
        assert fa.count(df) == 2
        assert fa.get_column_names(df) == ["x", "s"]
        assert fa.get_schema(df) == "x:long,s:str"
        assert fa.get_num_partitions(df) >= 1
        assert fa.get_current_parallelism(spark) >= 1
        assert isinstance(fa.get_current_conf(spark), dict)
        assert fa.peek_array(df.orderBy("x")) == [1, "a"]
        assert isinstance(fa.as_local(df), pd.DataFrame)
        rows = sorted(fa.as_array_iterable(df, columns=["x"]))
        assert rows == [[1], [2]]
        dicts = sorted(fa.as_dict_iterable(df), key=lambda d: d["x"])
        assert dicts == [{"x": 1, "s": "a"}, {"x": 2, "s": "b"}]
        assert fa.get_native_as_df(df) is df
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not an engine dataframe"):
            fa.get_native_as_df(pd.DataFrame())

        out = fa.fugue_sql(
            """
            a = CREATE [[5]] SCHEMA v:long
            YIELD DATAFRAME AS a
            """,
            spark=spark,
        )
        assert fa.is_df(out) and out.collect()[0].v == 5


class ExecutionEngineSuite:
    """Engine-primitive conformance corpus (ref fugue_test/execution_suite.py)."""

    def test_take_reference_corpus(self, spark):
        a = make_df(spark, _TAKE_DATA, "a:str,b:int,c:long")

        b = fa.take(a, n=1, presort="b desc")
        assert _rows_set(b) == {(None, 4, 2)}

        c = fa.take(a, n=2, presort="a desc", na_position="first")
        assert _rows_set(c) == {(None, 4, 2), (None, 2, 1)}

        d = fa.take(
            a, n=1, presort="a asc, b desc",
            partition={"by": ["a"], "presort": "b DESC,c DESC"},
        )
        assert _rows_set(d) == {("a", 3, 4), ("b", 2, 2), (None, 4, 2)}

        f = fa.take(a, n=1, presort=None, partition={"by": ["c"], "presort": "b ASC"})
        assert _rows_set(f) == {("a", 2, 3), ("a", 3, 4), ("b", 1, 2), (None, 2, 1)}

        g = fa.take(a, n=2, presort="a desc", na_position="last")
        assert _rows_set(g) == {("b", 1, 2), ("b", 2, 2)}

        h = fa.take(a, n=2, presort="a", na_position="first")
        assert _rows_set(h) == {(None, 4, 2), (None, 2, 1)}

    def test_take_grouped_no_presort(self, spark):
        a = make_df(
            spark,
            [["a", 2, 3], [None, 4, 2], [None, 2, 1]],
            "a:str,b:int,c:long",
        )
        i = _rows_set(fa.take(a, n=1, presort=None, partition={"by": ["a"]}))
        assert i in (
            {("a", 2, 3), (None, 4, 2)},
            {("a", 2, 3), (None, 2, 1)},
        )
        j = _rows_set(fa.take(a, n=2, presort=None, partition={"by": ["a"]}))
        assert j == {("a", 2, 3), (None, 4, 2), (None, 2, 1)}

        with pytest.raises(ValueError):
            fa.take(a, n=0.5, presort=None)

    def test_transform_special_values_reference(self, spark):
        """Mirrors the reference execution suite's map-engine special-value
        corners (ref fugue_test/execution_suite.py:258-365): NULL composite
        group keys, datetime keys with NaT output, list / struct(dict) /
        binary columns through the transform engine."""
        import pickle
        from datetime import datetime

        import pandas as pd

        import fugue_spark.api as fa
        from fugue_spark.ingest import to_df

        def top1(df: pd.DataFrame) -> pd.DataFrame:
            return df.head(1)

        # NULL values inside composite group keys group together (NaN-safe)
        o = to_df(spark, [[1.0, None, 1], [1.0, None, 0], [None, None, 2]],
                  "a:double,b:double,c:int")
        got = fa.transform(
            o, top1, schema="a:double,b:double,c:int",
            partition={"by": ["a", "b"], "presort": "c"},
        ).toPandas()
        rows = sorted(
            [(None if pd.isna(r.a) else r.a, None if pd.isna(r.b) else r.b,
              None if pd.isna(r.c) else int(r.c)) for r in got.itertuples()]
            , key=lambda t: (t[0] is None, t))
        assert rows == [(1.0, None, 0), (None, None, 2)]

        # datetime group keys, presort DESC, then an ungrouped transform that
        # ADDS a NaT column
        dt = datetime(2024, 3, 1, 12, 30)
        o = to_df(spark, [[dt, 2, 1.0], [None, 2, None], [None, 1, None],
                          [dt, 5, 1.0], [None, 4, None]], "a:datetime,b:int,c:double")
        top = fa.transform(
            o, top1, schema="a:datetime,b:int,c:double",
            partition={"by": ["a", "c"], "presort": "b DESC"},
        )
        got = {(None if pd.isna(r.a) else r.a, int(r.b)) for r in top.toPandas().itertuples()}
        assert got == {(None, 4), (dt, 5)}

        def with_nat(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["nat"] = pd.NaT
            return df

        d = fa.transform(top, with_nat, schema="a:datetime,b:int,c:double,nat:datetime")
        assert all(r.nat is None for r in d.collect())

        # list column rides through a grouped transform untouched
        o = to_df(spark, [[dt, [1, 2]]], "a:datetime,b:[int]")
        got = fa.transform(o, top1, schema="a:datetime,b:[int]",
                           partition={"by": ["a"]}).collect()
        assert len(got) == 1 and list(got[0].b) == [1, 2]

        # struct (dict) column: in, projected away, then re-created by the fn
        o = to_df(spark, [[dt, {"a": 1}]], "a:datetime,b:{a:long}")
        same = fa.transform(o, top1, schema="a:datetime,b:{a:long}",
                            partition={"by": ["a"]}).collect()
        assert same[0].b.a == 1

        def drop_b(df: pd.DataFrame) -> pd.DataFrame:
            return df[["a"]]

        only_a = fa.transform(o, drop_b, schema="a:datetime",
                              partition={"by": ["a"]})
        assert [r.a for r in only_a.collect()] == [dt]

        def add_dict(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["b"] = [{"a": 1}] * len(df)
            return df

        back = fa.transform(only_a, add_dict, schema="a:datetime,b:{a:long}",
                            partition={"by": ["a"]}).collect()
        assert back[0].b.a == 1

        # binary column round-trips arbitrary pickled objects through the fn
        def binary_map(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["a"] = [pickle.dumps(pickle.loads(bytes(x)) + "x") for x in df["a"]]
            return df

        o = to_df(spark, [[pickle.dumps("a")], [pickle.dumps("b")]], "a:bytes")
        got = {pickle.loads(bytes(r.a)) for r in
               fa.transform(o, binary_map, schema="a:bytes").collect()}
        assert got == {"ax", "bx"}

    def test_api_coerces_pandas_and_arrow_operands(self, spark):
        """Reference fa.* accepts any df-like operand (execution_suite
        test_engine_api: fa.union(engine_df, pandas_df)); the api boundary
        ingests pandas/arrow onto the resolved session."""
        import pandas as pd
        import pyarrow as pa

        df1 = fa.as_fugue_df([[0, 1], [2, 3]], schema="a:long,b:long", spark=spark)
        pdf = pd.DataFrame([[4, 5]], columns=["a", "b"])
        got = sorted(tuple(r) for r in fa.union(df1, pdf, distinct=False).collect())
        assert got == [(0, 1), (2, 3), (4, 5)]
        j = fa.inner_join(df1, pd.DataFrame([[0, 9]], columns=["a", "c"]))
        assert sorted(tuple(r) for r in j.collect()) == [(0, 1, 9)]
        assert fa.take(pdf, 1, presort="b desc").collect()[0].a == 4
        out = fa.transform(
            pdf, lambda df: df.assign(s=df["a"] + df["b"]), schema="a:long,b:long,s:long"
        )
        assert [tuple(r) for r in out.collect()] == [(4, 5, 9)]
        assert fa.union(df1, pa.table({"a": [9], "b": [9]}), distinct=False).count() == 3

    def test_as_fugue_dataset_and_engine_df(self, spark):
        import pandas as pd

        import fugue_spark.api as fa

        pdf = pd.DataFrame({"a": [1, 2]})
        d1 = fa.as_fugue_dataset(pdf, spark=spark)
        d2 = fa.as_fugue_engine_df(spark, [[1], [2]], schema="a:long")
        assert sorted(r.a for r in d1.collect()) == [1, 2]
        assert sorted(r.a for r in d2.collect()) == [1, 2]
        assert d2.schema.simpleString() == "struct<a:bigint>"

    def test_global_engine_resolution_order(self, spark):
        """set_global_engine/get_context_engine/run_engine_function follow the
        reference resolution order: context > global > active session."""
        import fugue_spark.api as fa
        from fugue_spark.context import clear_global_engine, set_global_engine

        try:
            # make THIS session the thread's active one (a prior test may have
            # left a newSession() active) before checking the fallback order
            spark.sql("SELECT 1").collect()
            assert fa.get_context_engine() is spark  # active session
            g = set_global_engine(spark)
            assert g is spark and fa.get_context_engine() is spark
            with fa.engine_context(spark) as ctx:
                assert fa.get_context_engine() is ctx  # context beats global
            out = fa.run_engine_function(
                lambda s: s.createDataFrame([[1]], "a long").collect()
            )
            assert [r.a for r in out] == [1]
        finally:
            clear_global_engine()
        # full reference fugue.api surface is now present
        ref_names = [
            "alter_columns", "as_array", "as_array_iterable", "as_arrow",
            "as_dict_iterable", "as_dicts", "as_fugue_df", "as_pandas",
            "drop_columns", "get_column_names", "get_native_as_df", "get_schema",
            "head", "is_df", "normalize_column_names", "peek_array", "peek_dict",
            "rename", "select_columns", "as_fugue_dataset", "as_local",
            "as_local_bounded", "count", "get_num_partitions", "is_bounded",
            "is_empty", "is_local", "show", "aggregate", "anti_join",
            "as_fugue_engine_df", "assign", "broadcast", "clear_global_engine",
            "cross_join", "distinct", "dropna", "engine_context", "fillna",
            "filter", "full_outer_join", "get_context_engine", "get_current_conf",
            "get_current_parallelism", "inner_join", "intersect", "join",
            "left_outer_join", "load", "persist", "repartition",
            "right_outer_join", "run_engine_function", "sample", "save", "select",
            "semi_join", "set_global_engine", "subtract", "take", "union",
            "fugue_sql", "fugue_sql_flow", "out_transform", "raw_sql", "transform",
        ]
        missing = [n for n in ref_names if not hasattr(fa, n)]
        assert missing == []

    def test_global_engine_reaches_engineless_calls(self, spark):
        """set_global_engine must be honored by ALL engine-less entry points
        (fugue_sql, as_fugue_df, get_current_conf), not only raw_sql."""
        import fugue_spark.api as fa
        from fugue_spark.context import clear_global_engine, set_global_engine

        s2 = spark.newSession()
        s2.conf.set("spark.fugue.test.marker", "s2")
        try:
            set_global_engine(s2)
            assert fa.get_current_conf().get("spark.fugue.test.marker") == "s2"
            df = fa.as_fugue_df([[1]], schema="a:long")
            assert df.sparkSession is s2
            out = fa.fugue_sql(
                "a = CREATE [[7]] SCHEMA x:long\nYIELD DATAFRAME AS out"
            )
            assert out.sparkSession is s2
            assert [r.x for r in out.collect()] == [7]
        finally:
            clear_global_engine()


class BuiltinSuite:
    """Workflow-level conformance corpus (ref fugue_test/builtin_suite.py)."""

    def test_any_column_name_end_to_end(self, spark, tmp_path):
        """Joins, transform with `# schema` computed col, alter_columns, select
        with aliases, rename, parquet save/load with column pruning — all over
        names with spaces and '*' (reference builtin_suite test_any_column_name)."""
        f_parquet = str(tmp_path / "a.parquet")

        df1 = make_df(spark, [[0, 1], [2, 3]], "`a b`:long,` `:long")
        df2 = make_df(spark, [[0, 10], [20, 3]], "`a b`:long,d:long")
        r = fa.inner_join(df1, df2)
        assert arr(r) == [[0, 1, 10]]

        def tr(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(**{"c *": 2})

        r = fa.transform(r, tr, schema="*,`c *`:long")
        assert arr(r) == [[0, 1, 10, 2]]

        r = fa.alter_columns(r, "`c *`:str")
        assert schema_str(r).endswith("c *:string")

        from fugue_spark.functions import col

        r = fa.select(
            r,
            col("a b").alias("a b "),
            col(" ").alias("x y"),
            col("d"),
            col("c *").cast(int),
        )
        assert arr(r) == [[0, 1, 10, 2]]
        assert [f.name for f in r.schema.fields] == ["a b ", "x y", "d", "c *"]

        r = fa.rename(r, {"a b ": "a b"})
        fa.save(r, f_parquet)
        back = fa.load(spark, f_parquet, columns=["x y", "d", "c *"])
        assert arr(back) == [[1, 10, 2]]
        assert [f.name for f in back.schema.fields] == ["x y", "d", "c *"]

    def test_fugue_sql_flow_deferred(self, spark):
        """fugue_sql_flow builds without executing; .run() yields like fsql;
        variables merge at run time (reference fugue/sql/api.py build/run
        split)."""
        import fugue_spark.api as fa

        flow = fa.fugue_sql_flow(
            """
            a = CREATE [[1],[2],[3]] SCHEMA x:long
            b = SELECT x FROM a WHERE x > {{lo}}
            YIELD DATAFRAME AS out
            """,
            lo=1,
        )
        # nothing ran yet — the flow holds only the script
        assert isinstance(flow, fa.FugueSQLFlow)
        res = flow.run(spark)
        assert sorted(r.x for r in res["out"].collect()) == [2, 3]
        # run-time variables override build-time ones
        res2 = flow.run(spark, lo=2)
        assert sorted(r.x for r in res2["out"].collect()) == [3]

    def test_bound_method_transformer_with_schema_hint(self, spark):
        """Reference builtin_suite test_local_instance_as_extension: a BOUND
        METHOD with a `# schema:` comment hint is a valid transformer."""

        class _Mock:
            # schema: *
            def t1(self, df: pd.DataFrame) -> pd.DataFrame:
                return df

            # schema: *,c:int
            def t2(self, df: pd.DataFrame) -> pd.DataFrame:
                return df.assign(c=2)

        m = _Mock()
        a = fa.as_fugue_df([[0], [1]], schema="a:int", spark=spark)
        b = fa.transform(a, m.t1)
        assert sorted(r.a for r in b.collect()) == [0, 1]
        c = fa.transform(b, m.t2)
        assert sorted((r.a, r.c) for r in c.collect()) == [(0, 2), (1, 2)]

    def test_iterable_transformer_column_reorder_and_empty(self, spark):
        """Reference builtin_suite test_transform_iterable_dfs: an iterable
        transformer may yield frames with REORDERED columns (aligned by name,
        not position) or yield nothing at all (empty result, schema kept)."""
        from typing import Iterable, Iterator

        # schema: *,c:int
        def mt_pandas(
            dfs: "Iterable[pd.DataFrame]", empty: bool = False
        ) -> "Iterator[pd.DataFrame]":
            for df in dfs:
                if not empty:
                    df = df.assign(c=2)
                    df = df[list(reversed(list(df.columns)))]
                    yield df

        a = fa.as_fugue_df([[1, 2], [3, 4]], schema="a:int,b:int", spark=spark)
        b = fa.transform(a, mt_pandas)
        assert sorted(tuple(r) for r in b.collect()) == [(1, 2, 2), (3, 4, 2)]
        assert [f.name for f in b.schema.fields] == ["a", "b", "c"]

        empty = fa.transform(a, mt_pandas, params={"empty": True})
        assert empty.count() == 0
        assert [f.name for f in empty.schema.fields] == ["a", "b", "c"]
        empty2 = fa.transform(
            a, mt_pandas, params={"empty": True}, partition={"by": ["a"]}
        )
        assert empty2.count() == 0

    def test_fugue_workflow_build_run_split(self, spark):
        """Reference builtin_suite test_workflows/test_create_show shapes: the
        dag records, nothing executes until run(); yields/outputs/assert_eq
        fire in order."""
        from fugue_spark.dag import FugueWorkflow

        ran = []

        def spy_out(df):
            ran.append(df.count())

        with FugueWorkflow() as dag:
            a = dag.df([[0], [1]], "a:int")
            b = a.transform(lambda df: df.assign(c=2), schema="a:int,c:int")
            b.assert_eq(dag.df([[0, 2], [1, 2]], "a:int,c:int"))
            b.yield_dataframe_as("out")
            dag.output(a, using=spy_out)
        assert ran == []  # build/run split: nothing happened yet
        res = dag.run(spark)
        assert ran == [2]
        assert sorted(tuple(r) for r in res["out"].collect()) == [(0, 2), (1, 2)]
        # compute(): run just enough for one frame (ref WorkflowDataFrame.compute)
        assert FugueWorkflow().df([[5]], "a:int").compute(spark).collect()[0].a == 5

    def test_fugue_workflow_create_process_zip(self, spark):
        """Reference test_create_process_output / test_zip shapes."""
        from fugue_spark.dag import FugueWorkflow

        def mk(spark_, p=1):
            return spark_.createDataFrame([[p]], "a int")

        def proc(d1, d2):
            return d1.unionByName(d2)

        def co(d1, d2):
            d1 = d1.copy()
            d1["c"] = int(d2["c"].iloc[0]) if len(d2) else -1
            return d1[["a", "b", "c"]]

        with FugueWorkflow() as dag:
            x = dag.create(mk, params=dict(p=2))
            y = dag.process(x, x, using=proc)
            y.yield_dataframe_as("y")
            a = dag.df([[1, 2], [2, 3]], "a:int,b:int")
            b = dag.df([[1, 30]], "a:int,c:int")
            a.zip(b).transform(co, schema="a:int,b:int,c:int").yield_dataframe_as("z")
            dag.zip(a, b)[["a"]].distinct().yield_dataframe_as("j")
        r = dag.run(spark)
        assert sorted(t.a for t in r["y"].collect()) == [2, 2]
        assert sorted(tuple(t) for t in r["z"].collect()) == [(1, 2, 30)]
        assert [tuple(t) for t in r["j"].collect()] == [(1,)]

    def test_fugue_workflow_checkpoint_and_partition(self, spark, tmp_path):
        from fugue_spark import workflow as w
        from fugue_spark.dag import FugueWorkflow, FugueWorkflowError

        saved = w._CHECKPOINT_DIR
        w._CHECKPOINT_DIR = None
        try:
            with FugueWorkflow() as dag:
                dag.df([[0]], "a:int").checkpoint().yield_dataframe_as("c")
            with pytest.raises(FugueWorkflowError):
                dag.run(spark)  # ref: checkpoint without conf path is an error
            w.set_checkpoint_dir(str(tmp_path / "ck"))
            assert [r.a for r in dag.run(spark)["c"].collect()] == [0]
        finally:
            w._CHECKPOINT_DIR = saved

        with FugueWorkflow() as dag:
            a = dag.df([[1, 5], [1, 7], [2, 9]], "g:int,v:int")
            a.partition_by("g", presort="v desc").transform(
                lambda df: df.head(1), schema="g:int,v:int"
            ).yield_dataframe_as("t")
            a.partition(num=2).show(1)
        got = sorted(tuple(r) for r in dag.run(spark)["t"].collect())
        assert got == [(1, 7), (2, 9)]

    def test_fugue_workflow_frame_ops(self, spark):
        """dag-level joins / set ops / filter / take / fillna compose lazily
        (reference builtin_suite test_join/test_union/test_take shapes)."""
        from fugue_spark import functions as ff
        from fugue_spark.dag import FugueWorkflow

        with FugueWorkflow() as dag:
            a = dag.df([[1, "x"], [2, "y"]], "a:int,b:str")
            b = dag.df([[1, 10], [3, 30]], "a:int,c:int")
            a.inner_join(b).yield_dataframe_as("j")
            a[["a"]].union(b[["a"]], distinct=True).yield_dataframe_as("u")
            a.filter(ff.col("a") > 1).yield_dataframe_as("f")
            b.take(1, presort="c desc").yield_dataframe_as("t")
            dag.df([[None, 1]], "a:int,c:int").fillna({"a": 0}).yield_dataframe_as("n")
        r = dag.run(spark)
        assert [tuple(x) for x in r["j"].collect()] == [(1, "x", 10)]
        assert sorted(x.a for x in r["u"].collect()) == [1, 2, 3]
        assert [tuple(x) for x in r["f"].collect()] == [(2, "y")]
        assert [x.c for x in r["t"].collect()] == [30]
        assert [tuple(x) for x in r["n"].collect()] == [(0, 1)]

    def test_fugue_workflow_select_assign_aggregate(self, spark):
        from fugue_spark import functions as ff
        from fugue_spark.dag import FugueWorkflow

        with FugueWorkflow() as dag:
            a = dag.df([[1, 2], [1, 4], [2, 6]], "g:int,v:int")
            a.assign(w=ff.col("v") * 2).select(
                ff.col("g"), ff.col("w")
            ).yield_dataframe_as("s")
            a.aggregate("g", total=ff.sum(ff.col("v"))).yield_dataframe_as("agg")
        r = dag.run(spark)
        assert sorted(tuple(x) for x in r["s"].collect()) == [(1, 4), (1, 8), (2, 12)]
        assert sorted(tuple(x) for x in r["agg"].collect()) == [(1, 6), (2, 6)]
