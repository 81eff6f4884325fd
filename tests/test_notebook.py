"""%%fsql notebook magic tests (reference surface: fugue_notebook/env.py).

Drives the real IPython machinery (InteractiveShell + register_magics) so
the registration path, local-namespace binding, yield injection, and HTML
display all execute as they would in a notebook.
"""

from __future__ import annotations

import pandas as pd
import pytest

IPython = pytest.importorskip("IPython")

from fugue_spark.notebook import (  # noqa: E402
    FugueSQLMagics,
    _parse_line,
    highlight_js,
    load_ipython_extension,
)


@pytest.fixture(scope="module")
def ip(spark):
    """A real InteractiveShell with the extension loaded and an active
    Spark session (the magic resolves it via the engine context)."""
    from IPython.testing.globalipapp import start_ipython

    shell = start_ipython()
    load_ipython_extension(shell)
    return shell


def test_fsql_magic_runs_and_injects_yields(ip, spark):
    src = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    )
    ip.push({"src": src})
    ip.run_cell_magic(
        "fsql",
        "",
        "SELECT a , b FROM src WHERE a > 1\n"
        "TAKE 1 ROW PRESORT a DESC\n"
        "YIELD DATAFRAME AS picked\n",
    )
    picked = ip.user_ns["picked"]
    assert [tuple(r) for r in picked.collect()] == [(3, "z")]


def test_fsql_magic_binds_pandas_and_functions(ip):
    ip.push({"pdf_in": pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 5]})})

    def double(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(v=df.v * 2)

    ip.push({"double": double})
    ip.run_cell_magic(
        "fsql",
        "",
        "TRANSFORM pdf_in USING double SCHEMA k:str,v:long\n"
        "YIELD DATAFRAME AS doubled\n",
    )
    got = sorted(tuple(r) for r in ip.user_ns["doubled"].collect())
    assert got == [("a", 2), ("a", 4), ("b", 10)]


def test_fsql_magic_line_conf_applies_and_restores(ip, spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    ip.push({"src2": spark.createDataFrame(pd.DataFrame({"a": [1, 2]}))})
    ip.run_cell_magic(
        "fsql",
        'spark {"spark.sql.shuffle.partitions": "3"}',
        "x = SELECT a FROM src2 GROUP BY a\nYIELD DATAFRAME AS grouped\n",
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert ip.user_ns["grouped"].count() == 2


def test_fsql_magic_unknown_engine_errors(ip):
    with pytest.raises(ValueError, match="Spark only"):
        _parse_line("dask")
    assert _parse_line("") == {}
    assert _parse_line('{"a": 1}') == {"a": "1"}


def test_highlight_js_covers_tokenizer_keywords():
    js = highlight_js()
    for kw in ("transform", "outtransform", "prepartition", "yield"):
        assert kw in js
    assert "text/x-fsql" in js


def test_df_eq_reference_comparator(spark):
    """fugue_spark.testing.df_eq mirrors the reference's _df_eq test
    comparator (fugue/dataframe/utils.py:24, exposed via
    fugue/test/plugins.py:187): df-like coercion, digit-rounded float
    compare, order-insensitive by default, bool-or-throw."""
    import pandas as pd

    from fugue_spark.testing import df_eq

    d = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "b": [1.00000001, 2.0]}))
    assert df_eq(d, [[2, 2.0], [1, 1.0]], schema="a:long,b:double", digits=6)
    assert not df_eq(d, [[2, 2.0], [1, 1.0]], schema="a:long,b:double")  # 8 digits
    assert not df_eq(d, [[2, 2.5], [1, 1.0]], schema="a:long,b:double", digits=6)
    assert not df_eq(d, [[2, 2.0], [1, 1.0]], schema="a:int,b:double", digits=6)
    assert df_eq(
        d, [[2, 2.0], [1, 1.0]], schema="a:int,b:double", digits=6, check_schema=False
    )
    assert df_eq(d, d, check_order=True)
    assert df_eq(d, pd.DataFrame({"a": [2, 1], "b": [2.0, 1.0]}), digits=6)
    with pytest.raises(AssertionError, match="count mismatch"):
        df_eq(d, [[9, 9.0]], schema="a:long,b:double", throw=True)


def test_nbextension_machinery():
    """Classic-notebook extension parity (reference fugue_notebook/
    nbextension): the discovery hook points at a real main.js whose
    keyword set stays in sync with the tokenizer."""
    import os

    import fugue_spark
    from fugue_spark.sql.tokenizer import STATEMENT_KEYWORDS

    paths = fugue_spark._jupyter_nbextension_paths()
    assert paths[0]["require"] == "fugue_spark/main"
    base = os.path.join(os.path.dirname(fugue_spark.__file__), paths[0]["src"])
    main_js = os.path.join(base, "main.js")
    assert os.path.exists(main_js)
    js = open(main_js).read()
    assert "text/x-fsql" in js and "%%fsql" in js
    for kw in STATEMENT_KEYWORDS:
        assert kw.lower() in js, f"main.js keyword set misses {kw!r}"


def test_install_nbextension_gated():
    """Without the classic 'notebook' package the installer raises a clear
    ImportError instead of failing obscurely."""
    import pytest

    from fugue_spark.notebook import install_nbextension

    try:
        import notebook  # noqa: F401

        pytest.skip("classic notebook package present; install path live")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="notebook"):
        install_nbextension()
