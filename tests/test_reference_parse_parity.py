"""Differential battery: the reference's FugueSQL statement corpus.

Every statement form exercised by the reference's parser test
(/root/reference/tests/fugue/sql/test_workflow_parse.py:31-711) is run
through this engine's tokenizer/parser/executor with the SAME statement
text (the reference's assert_eq parses with ignore_case=True; so do we).
Where the reference only asserts the parsed DAG spec, we assert the
executed semantics — a strictly stronger check. Mock extensions are
re-expressed in this engine's idiom (creators take ``spark``; processors
take DataFrames; transformers are pandas functions), since extension
*signatures* are engine-native by design (SURVEY §2.5); the statement
GRAMMAR is what this battery holds to parity.

Deliberate divergences (each asserted below so drift is caught):
  * ``sample … seed`` accepts the reference grammar but draws from
    Spark's RNG — cross-engine sample identity is impossible (q19 note).
  * ``connect <engine>`` validates and ignores the engine: single-engine
    build (SURVEY §2.6); the inner statement runs on Spark.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from fugue_spark.schema import parse_schema
from fugue_spark.sql import FugueSQLError, fsql


def rows(df):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t)))


# ---------------------------------------------------------------------------
# mock extensions (reference: test_workflow_parse.py:779-845, re-expressed
# in this engine's idiom)
# ---------------------------------------------------------------------------


def mock_create1(spark, n=2):
    return spark.createDataFrame([[n, n]], parse_schema("a:int,b:int"))


def mock_create2(spark, n=2):
    return spark.createDataFrame([[n]], parse_schema("a:long"))


def _max_a(df):
    return df.agg({"a": "max"}).collect()[0][0]


def mock_processor1(df1, df2, n=1):
    v = max(_max_a(df1), _max_a(df2)) + n
    return df1.sparkSession.createDataFrame([[v]], parse_schema("b:int"))


mock_processor2 = mock_processor1


def mock_processor3(df):
    return df


def mock_processor4(df):
    return df


def mock_transformer(pdf: pd.DataFrame, n=0) -> pd.DataFrame:
    return pdf.assign(a=pdf.a + n)


_OUTPUT_SEEN: list = []


def mock_output(*dfs, n=1) -> None:
    _OUTPUT_SEEN.append((len(dfs), n))


FUNCS = {
    "mock_create1": mock_create1,
    "mock_create2": mock_create2,
    "mock_processor1": mock_processor1,
    "mock_processor2": mock_processor2,
    "mock_processor3": mock_processor3,
    "mock_processor4": mock_processor4,
    "mock_transformer": mock_transformer,
    "mock_output": mock_output,
}


def run(spark, script, **kw):
    funcs = dict(FUNCS)
    funcs.update(kw.pop("functions", {}))
    return fsql(script, spark=spark, functions=funcs, fsql_ignore_case=True, **kw)


# --- test_create_data (ref :31) --------------------------------------------


def test_create_data(spark):
    res = run(
        spark,
        """
    a=create [[0],[1]] schema a:int
    yield dataframe as a
    """,
    )
    assert rows(res["a"]) == [(0,), (1,)]


# --- test_create (ref :41): bare PARAMS + paren params + SCHEMA clause -----


def test_create_using_params_and_schema(spark):
    res = run(
        spark,
        """
    a=create using mock_create1 params n:1
    yield dataframe as a
    b=create using mock_create2(n=1) schema a:int
    yield dataframe as b
    """,
    )
    assert rows(res["a"]) == [(1, 1)]
    assert rows(res["b"]) == [(1,)]
    # SCHEMA coerced the creator's long to int
    assert res["b"].schema["a"].dataType.simpleString() == "int"


# --- test_process (ref :54) -------------------------------------------------


def test_process_basic_and_schema(spark):
    res = run(
        spark,
        """
    a=create using mock_create1 params n:1
    b=create using mock_create1 params n:2
    p1=process a,b using mock_processor1(n=3)
    yield dataframe as p1
    p2=process b,a using mock_processor2(n=4) schema b:int
    yield dataframe as p2
    """,
    )
    assert rows(res["p1"]) == [(5,)]  # max(1,2)+3
    assert rows(res["p2"]) == [(6,)]  # max(2,1)+4


def test_process_nested_and_anonymous(spark):
    res = run(
        spark,
        """
    process  -- nested
        (create using mock_create1(n=5)),
        (create using mock_create1(n=6))
        using mock_processor1(n=7)
    yield dataframe as out
    """,
    )
    assert rows(res["out"]) == [(13,)]  # max(5,6)+7

    res = run(
        spark,
        """
    create using mock_create1 params n:1
    process using mock_processor3
    process using mock_processor4  -- AnyDataFrame
    yield dataframe as out
    """,
    )
    assert rows(res["out"]) == [(1, 1)]


def test_process_prepartition_nested(spark):
    # ref :93 "process (process prepartition by a using mock_processor3), …"
    res = run(
        spark,
        """
    create using mock_create1 params n:1
    process using mock_processor3
    process
        (process prepartition by a using mock_processor3),
        (process using mock_processor3)
        using mock_processor1
    yield dataframe as out
    """,
    )
    assert rows(res["out"]) == [(2,)]  # max(1,1)+1


def test_process_no_last_dataframe_error(spark):
    # ref :101-108: the first statement has nothing to consume
    with pytest.raises(FugueSQLError):
        run(spark, "process using mock_processor3")


def test_process_dict_like_dataframes(spark):
    # ref :110-124: labeled refs bind to the extension's parameter names
    def named(df1, df2, n=1):
        v = max(_max_a(df1), _max_a(df2)) + n
        return df1.sparkSession.createDataFrame([[v]], parse_schema("b:int"))

    res = run(
        spark,
        """
    a=create using mock_create1 params n:1
    b=create using mock_create1 params n:2
    process
        df1=(create using mock_create1(n=1)),
        df2:(create using mock_create1(n=2))
        using named
    yield dataframe as out
    """,
        functions={"named": named},
    )
    assert rows(res["out"]) == [(3,)]  # max(1,2)+1


# --- test_zip (ref :126) -----------------------------------------------------


def test_zip_basic_and_left_outer(spark):
    res = run(
        spark,
        """
    a=create [[1, 10], [2, 20]] schema a:int,x:int
    z=zip a,(create [[1, 30]] schema a:int,y:int)
    transform z using zmerge schema a:int,n:int
    yield dataframe as out
    """,
        functions={
            "zmerge": lambda cursor, d1, d2: pd.DataFrame(
                {"a": [cursor["a"]], "n": [len(d1) + len(d2)]}
            )
        },
    )
    assert rows(res["out"]) == [(1, 2)]  # inner zip drops a=2

    res = run(
        spark,
        """
    a=create [[1, 10], [2, 20]] schema a:int,b:int
    z=zip a,(create [[1, 30]] schema a:int,y:int) left
        outer by a presort b desc
    transform z using zmerge schema a:int,n:int
    yield dataframe as out
    """,
        functions={
            "zmerge": lambda cursor, d1, d2: pd.DataFrame(
                {"a": [cursor["a"]], "n": [len(d1) + len(d2)]}
            )
        },
    )
    assert rows(res["out"]) == [(1, 2), (2, 1)]  # left outer keeps a=2


# --- test_cotransform (ref :153): zip + transform prepartition <num> --------


def test_cotransform_prepartition_num(spark):
    # the `# schema:` comment hint resolves the output schema, as in the
    # reference's mock_cotransformer1 (test_workflow_parse.py:826)
    # schema: b:int
    def mock_cotransformer1(df1: pd.DataFrame, df2: pd.DataFrame, n=1) -> pd.DataFrame:
        v = int(max(df1.a.max(), df2.a.max())) + n
        return pd.DataFrame({"b": [v]})

    res = run(
        spark,
        """
    zip
        (create using mock_create1 params n:1),
        (create using mock_create1 params n:2)
    transform prepartition 3 using mock_cotransformer1(n=3)
    yield dataframe as out
    """,
        functions={"mock_cotransformer1": mock_cotransformer1},
    )
    # inner zip on inferred keys (a,b): (1,1) vs (2,2) share no key — no
    # groups, so the cotransformer is never called (the reference test only
    # asserts the parse; execution semantics follow its zip contract)
    assert rows(res["out"]) == []

    res = run(
        spark,
        """
    zip
        (create [[1, 10]] schema a:int,x:int),
        (create [[1, 20]] schema a:int,y:int)
    transform prepartition 3 using mock_cotransformer1(n=3)
    yield dataframe as out
    """,
        functions={"mock_cotransformer1": mock_cotransformer1},
    )
    assert rows(res["out"]) == [(4,)]  # max over the a columns (1) + 3


# --- test_transform (ref :170) ----------------------------------------------


def test_transform_schema_and_params(spark):
    res = run(
        spark,
        """
    create [[0],[1]] schema a:int
    transform using mock_transformer(n=2) schema a:int
    yield dataframe as out
    """,
    )
    assert rows(res["out"]) == [(2,), (3,)]


def test_transform_prepartition_rowcount_wild_schema(spark):
    # ref :190-199: num-expr ROWCOUNT / 2, presort, schema * ~ k + AA:str,bb:int
    def tf(pdf: pd.DataFrame, n=0) -> pd.DataFrame:
        return pdf.assign(AA="x", bb=pdf.a + n).drop(columns=["k"])

    res = run(
        spark,
        """
    create [[0, 1],[1, 2]] schema a:int,k:int

    transform
        prepartition ROWCOUNT / 2 by a presort k desc
        using tf(n=2) schema * ~ k + AA : str,bb:int
    """,
        functions={"tf": tf},
    )
    out = res.last
    assert out.columns == ["a", "AA", "bb"]
    assert rows(out) == [(0, "x", 2), (1, "x", 3)]


def test_transform_callback(spark):
    # ref :201-220: CALLBACK clause
    seen = []

    def cb(x):
        seen.append(x)

    def tf(pdf: pd.DataFrame, n=0, callback=None) -> pd.DataFrame:
        if callback is not None:
            callback(float(n))
        return pdf

    res = run(
        spark,
        """
    create [[0],[1]] schema a:int
    transform prepartition by a using tf(n=2) schema *
        callback _func
    yield dataframe as out
    """,
        functions={"tf": tf, "_func": cb},
    )
    assert rows(res["out"]) == [(0,), (1,)]
    assert seen and all(v == 2.0 for v in seen)


# --- test_out_transform (ref :223) ------------------------------------------


def test_outtransform(spark, tmp_path):
    # side effects run on executor workers; use file markers to observe
    marker_dir = str(tmp_path)

    def ot(pdf: pd.DataFrame, n=0) -> None:
        import uuid

        with open(os.path.join(marker_dir, f"m_{uuid.uuid4().hex}"), "w") as f:
            f.write(str(len(pdf) + n))

    run(
        spark,
        """
    create [[0],[1]] schema a:int
    outtransform using ot(n=2)
    """,
        functions={"ot": ot},
    )
    assert len(os.listdir(marker_dir)) >= 1

    for f in os.listdir(marker_dir):
        os.unlink(os.path.join(marker_dir, f))
    run(
        spark,
        """
    create [[0],[1]] schema a:int

    outtransform
        prepartition by a
        using ot(n=2)
    """,
        functions={"ot": ot},
    )
    assert len(os.listdir(marker_dir)) == 2  # one call per a-group


# --- test_output (ref :257) --------------------------------------------------


def test_output_statements(spark):
    _OUTPUT_SEEN.clear()
    run(
        spark,
        """
    a=create using mock_create1(n=1)
    output prepartition 4 using mock_output
    output a, (create using mock_create1(n=2)) using mock_output(n=3)
    """,
    )
    assert _OUTPUT_SEEN == [(1, 1), (2, 3)]


# --- test_persist_checkpoint_broadcast (ref :273) ---------------------------


def test_persist_checkpoint_broadcast_postfix(spark):
    res = run(
        spark,
        """
    create using mock_create1 persist
    a=create using mock_create1 lazy persist (level="a.b")

    create using mock_create1 broadcast
    a=create using mock_create1 persist(level="a.b") broadcast

    create using mock_create1 checkpoint
    a= create using mock_create1 lazy strong checkpoint
    a=create using mock_create1 lazy checkpoint(x="xy z")
    a=create using mock_create1 checkpoint prepartition 5 single (x="xy z") broadcast

    create using mock_create1 deterministic checkpoint
    create using mock_create1 deterministic checkpoint "n"
        prepartition 4 single params x=2
    yield dataframe as out
    """,
    )
    assert rows(res["out"]) == [(2, 2)]
    assert rows(res.last) == [(2, 2)]


# --- test_yield (ref :313) ---------------------------------------------------


def test_yield_forms(spark, tmp_path):
    res = run(
        spark,
        """
    a=create using mock_create1 yield dataframe
    create using mock_create1(n=3) yield local dataframe as aaa
    create using mock_create1(n=4) yield file as aa
    c=create using mock_create1(n=5) deterministic checkpoint yield dataframe
    d=create using mock_create1(n=6) deterministic checkpoint yield file as bb
    """,
        yield_dir=str(tmp_path),
    )
    assert rows(res["a"]) == [(2, 2)]  # unnamed yield uses the assignment target
    assert rows(res["aaa"]) == [(3, 3)]
    assert os.path.exists(res["aa"])
    assert rows(res["c"]) == [(5, 5)]
    assert os.path.exists(res["bb"])


def test_yield_table(spark):
    res = run(
        spark,
        """
    create using mock_create1(n=7) yield table as ref_parity_t1
    """,
    )
    assert res["ref_parity_t1"] == "ref_parity_t1"
    assert rows(spark.table("ref_parity_t1")) == [(7, 7)]
    spark.sql("DROP TABLE IF EXISTS ref_parity_t1")


# --- test_select / test_select_nested (ref :337,:360) ------------------------


def test_select_nested(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS refp")
    spark.createDataFrame([[1], [2]], parse_schema("x:long")).write.mode(
        "overwrite"
    ).saveAsTable("refp.tbl")
    try:
        res = run(
            spark,
            """
    -- nested query over a dotted catalog table (source-not-found
    -- fallthrough, ref FugueSQLHooks.on_select_source_not_found)
    select * from (select * from refp.tbl)
    yield dataframe as q1
    select * from (create using mock_create1) AS bb
    yield dataframe as q2
    select * from (create using mock_create1) TABLESAMPLE(100 PERCENT)
    yield dataframe as q3
    select * from (select * from (create using mock_create1))
    yield dataframe as q4
    """,
        )
        assert rows(res["q1"]) == [(1,), (2,)]
        assert rows(res["q2"]) == [(2, 2)]
        assert rows(res["q3"]) == [(2, 2)]
        assert rows(res["q4"]) == [(2, 2)]
    finally:
        spark.sql("DROP TABLE IF EXISTS refp.tbl")
        spark.sql("DROP DATABASE IF EXISTS refp")


def test_select_forms(spark):
    res = run(
        spark,
        """
    a=create using mock_create1(n=1)
    b=create using mock_create1(n=2)

    -- when table is found
    select * from a
    yield dataframe as s1
    select * from a TABLESAMPLE(100 PERCENT)
    yield dataframe as s2

    -- no from
    select *
    yield dataframe as s3
    select * where a=1
    yield dataframe as s4

    -- multiple dependencies
    select a.* from a join b on a.a==b.b
    yield dataframe as s5

    -- persist & checkpoint & broadcast postfix on select
    select * from a persist broadcast print
    yield dataframe as s6
    select * from a persist (level="a.b.c") broadcast print
    yield dataframe as s7
    """,
    )
    assert rows(res["s1"]) == [(1, 1)]
    assert rows(res["s2"]) == [(1, 1)]
    assert rows(res["s3"]) == [(1, 1)]
    assert rows(res["s4"]) == [(1, 1)]
    assert rows(res["s5"]) == []  # a.a=1 vs b.b=2
    assert rows(res["s6"]) == [(1, 1)]
    assert rows(res["s7"]) == [(1, 1)]


def test_select_with(spark):
    res = run(
        spark,
        """
    a=create [[1]] schema x:long
    b=create [[2]] schema x:long
    with
        xx as (select * from a),
        y as (select * from b)
    select *   from xx union select * from y
    yield dataframe as out
    """,
    )
    assert rows(res["out"]) == [(1,), (2,)]


# --- test_select_plus_engine (ref :428): CONNECT -----------------------------


def test_connect_engine(spark):
    # single-engine build: the engine spec is accepted and ignored
    res = run(
        spark,
        """
    xyz=create [[3], [1]] schema t:long
    connect MockEngine select * from xyz persist
    yield dataframe as c1
    connect _mock(p=2) select * from xyz
    yield dataframe as c2
    connect MockEngine select * from xyz order by t limit 10
    yield dataframe as c3

    connect MockEngine with a as (select * from xyz) select * from a order by t limit 10
    yield dataframe as c4
    """,
    )
    for k in ("c1", "c2", "c3", "c4"):
        assert rows(res[k]) == [(1,), (3,)]


# --- test_general_set_op (ref :468) ------------------------------------------


def test_general_set_op(spark):
    res = run(
        spark,
        """
    a=create using mock_create1(n=1)
    b=create using mock_create1(n=2)

    select * from a union all select * from b
    yield dataframe as u1
    create using mock_create1 union select * from b
    yield dataframe as u2
    create using mock_create1 intersect distinct process b using mock_processor3
    yield dataframe as u3
    select * from (create using mock_create1) union process b using mock_processor3
    yield dataframe as u4

    -- operation on omitted dependencies
    c=create using mock_create1(n=2)
    process using mock_processor3 union process using mock_processor4
    yield dataframe as u5
    """,
    )
    assert rows(res["u1"]) == [(1, 1), (2, 2)]
    assert rows(res["u2"]) == [(2, 2)]  # mock_create1 default n=2 == b, distinct
    assert rows(res["u3"]) == [(2, 2)]  # intersect
    assert rows(res["u4"]) == [(2, 2)]
    assert rows(res["u5"]) == [(2, 2)]


# --- test_print (ref :513) ---------------------------------------------------


def test_print_forms(spark, capsys):
    run(
        spark,
        """
    a=create using mock_create1(n=1)
    print
    print 5 rows from a, (create using mock_create1(n=2)) rowcount title "\\"b   B"
    """,
    )
    out = capsys.readouterr().out
    assert '"b   B' in out
    assert "rowcount: 1" in out


# --- test_save / test_save_and_use / test_load (ref :529,:552,:577) ----------


def test_save_forms(spark, tmp_path):
    xx = str(tmp_path / "xx.parquet")
    xcsv = str(tmp_path / "xx.csv")
    run(
        spark,
        f"""
    a=create using mock_create1(n=1)
    save overwrite parquet "{xx}"
    save a append "{xx}"
    save to single csv "{xcsv}"(header=True)
    save prepartition by a overwrite "{xx}"
    save (create using mock_create1(n=2)) overwrite "{xx}"
    """,
    )
    assert rows(spark.read.parquet(xx)) == [(2, 2)]
    assert rows(spark.read.option("header", True).csv(xcsv)) == [("1", "1")]
    # mode=error refuses an existing path
    with pytest.raises(Exception):
        run(spark, f'a=create using mock_create1\nsave a to "{xx}"')


def test_save_and_use(spark, tmp_path):
    xx = str(tmp_path / "su.parquet")
    res = run(
        spark,
        f"""
    a=create using mock_create1(n=1)
    b=save and use a overwrite parquet "{xx}"
    yield dataframe as b
    save and use (create using mock_create1(n=2)) overwrite "{xx}"
    yield dataframe as c
    """,
    )
    assert rows(res["b"]) == [(1, 1)]
    assert rows(res["c"]) == [(2, 2)]


def test_load_forms(spark, tmp_path):
    xx = str(tmp_path / "l.parquet")
    xcsv = str(tmp_path / "l.csv")
    df = spark.createDataFrame([[1, "s"]], parse_schema("a:long,b:str"))
    df.write.parquet(xx)
    df.write.option("header", True).csv(xcsv)
    res = run(
        spark,
        f"""
    load "{xx}"
    yield dataframe as l1
    load csv "{xcsv}"(header=True)
    yield dataframe as l2
    load "{xx}" columns a
    yield dataframe as l3
    """,
    )
    assert rows(res["l1"]) == [(1, "s")]
    assert rows(res["l2"]) == [("1", "s")]
    assert res["l3"].columns == ["a"]


# --- test_rename / test_alter_columns / test_drop (ref :594,:610,:626) -------


def test_rename(spark):
    # ref :594 — anonymous consumes the create; FROM names it
    res = run(
        spark,
        """
    a=create using mock_create1
    rename columns a:aa,b:bb
    yield dataframe as r1
    rename columns a:aaa,b:bbb from a
    yield dataframe as r2
    """,
    )
    assert res["r1"].columns == ["aa", "bb"]
    assert res["r2"].columns == ["aaa", "bbb"]


def test_alter_columns(spark):
    # ref :610
    res = run(
        spark,
        """
    a=create using mock_create1
    alter columns a:str, b:str
    yield dataframe as al1
    alter columns a:float, b:double from a
    yield dataframe as al2
    """,
    )
    assert [f.dataType.simpleString() for f in res["al1"].schema.fields] == [
        "string",
        "string",
    ]
    assert [f.dataType.simpleString() for f in res["al2"].schema.fields] == [
        "float",
        "double",
    ]


def test_drop_columns(spark):
    # ref :626
    res = run(
        spark,
        """
    a=create using mock_create1
    drop columns a
    yield dataframe as d1
    drop columns a,zz if exists from a
    yield dataframe as d2
    """,
    )
    assert res["d1"].columns == ["b"]
    assert res["d2"].columns == ["b"]


def test_drop_rows(spark):
    res = run(
        spark,
        """
    d=create [[NULL, 1],[1, NULL],[NULL, NULL],[1, 1]] schema a:int, c:int
    drop rows if any null
    yield dataframe as n1
    drop rows if all null from d
    yield dataframe as n2
    drop rows if any nulls on a,c from d
    yield dataframe as n3
    """,
    )
    assert rows(res["n1"]) == [(1, 1)]
    assert len(rows(res["n2"])) == 3
    assert rows(res["n3"]) == [(1, 1)]


# --- test_sample (ref :651) --------------------------------------------------


def test_sample_forms(spark):
    res = run(
        spark,
        """
    a=create [[0],[1],[2],[3],[4],[5],[6],[7],[8],[9]] schema a:int
    sample 100 percent
    yield dataframe as s1
    sample replace 5 rows seed 7 from a
    yield dataframe as s2
    """,
    )
    assert len(rows(res["s1"])) == 10
    assert len(rows(res["s2"])) == 5  # n+seed+replace accepted (superset)


# --- test_fill (ref :667) ----------------------------------------------------


def test_fill_forms(spark):
    res = run(
        spark,
        """
    a=create [[NULL, 1],[1, NULL]] schema a:int, b:int
    fill nulls params a:99, b:-99 from a
    yield dataframe as f1
    create [[NULL, 1],[1, NULL]] schema a:int, b:int
    fill nulls (a:99, b:-99)
    yield dataframe as f2
    """,
    )
    assert rows(res["f1"]) == [(1, -99), (99, 1)]
    assert rows(res["f2"]) == [(1, -99), (99, 1)]


# --- test_head / take (ref :685) ---------------------------------------------


def test_take_forms(spark):
    res = run(
        spark,
        """
    a=create [[NULL, 1], [NULL, 2], [1, NULL], [1, 2]] schema a:double, b:double
    b=take 1 row from a prepartition by a presort b desc nulls first
    yield dataframe as t1
    c=take 1 row from b presort b desc nulls first
    yield dataframe as t2
    take 1 row presort b desc nulls first
    yield dataframe as t3
    """,
    )
    # per a-group, highest b with nulls first: (NULL,2) group NULL→ b NULL
    # absent; groups: a=NULL -> nulls-first presort on b desc puts NULL first
    got = rows(res["t1"])
    assert len(got) == 2
    assert len(rows(res["t2"])) == 1
    assert len(rows(res["t3"])) == 1


# --- test_module (ref :711) --------------------------------------------------


def test_module_forms(spark):
    def create(spark_, n=1):
        return spark_.createDataFrame([[n]], parse_schema("a:int"))

    def merge(df1, df2, k="aa"):
        return {k: df1, "bb": df2}

    def merge2(spark_, df1, df2, k=0):
        return [df1, df2][k]

    def merge3(df1, df2):
        return [df1, df2]

    def out1(spark_, df):
        df.show()

    res = run(
        spark,
        """
    a=sub using create
    b=sub using create(n=2)
    dfs=sub a,b using merge(k="a1")
    print dfs[a1]
    print dfs[bb]
    x=sub a,b using merge2(k=1)
    yield dataframe as x
    sub x using out1
    dfs=sub df2:a,df1:b using merge3
    print dfs[0]
    print dfs[1]
    y=select * from dfs[0]
    yield dataframe as y
    """,
        functions={
            "create": create,
            "merge": merge,
            "merge2": merge2,
            "merge3": merge3,
            "out1": out1,
        },
    )
    assert rows(res["x"]) == [(2,)]
    # labeled module refs bind by parameter name: merge3(df1=b, df2=a) →
    # dfs[0] is b
    assert rows(res["y"]) == [(2,)]


# --- postfix-scanner robustness: chain keywords as identifiers ---------------


def test_chain_keyword_as_column_stays_sql(spark):
    # a column literally named `persist` mid-SQL must NOT be eaten by the
    # postfix scanner (the tail `persist from t` is not a valid chain)
    df = spark.createDataFrame([[1]], "persist long")
    res = run(
        spark,
        """
    out = select persist from t
    yield dataframe as out
    """,
        t=df,
    )
    assert rows(res["out"]) == [(1,)]


def test_trailing_chain_keyword_is_modifier(spark):
    # ... while a TRAILING bare `broadcast` IS the postfix modifier — same
    # reservation the reference's ANTLR grammar makes
    res = run(
        spark,
        """
    a = create [[1]] schema x:long
    out = select * from a broadcast
    yield dataframe as out
    """,
    )
    assert rows(res["out"]) == [(1,)]


# --- strictness: clause typos are rejected, not silently dropped -------------


def test_trailing_garbage_rejected(spark):
    from fugue_spark.schema import SchemaParseError

    # the garbage lands in the SCHEMA clause and is rejected there
    with pytest.raises((FugueSQLError, SchemaParseError)):
        run(spark, "a=create [[1]] schema a:int bogus trailing words")
    with pytest.raises(FugueSQLError, match="unexpected tokens"):
        run(
            spark,
            "a=create [[1]] schema a:int\nsample 50 percent from a bogus words",
        )
    with pytest.raises(FugueSQLError):
        run(
            spark,
            "a=create [[1]] schema a:int\ntake 1 row from a nulls sideways",
        )
