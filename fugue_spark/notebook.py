"""Jupyter/IPython integration: the ``%%fsql`` cell magic.

Reference surface: ``fugue_notebook/env.py:1`` (``_FugueSQLMagics`` with a
``%%fsql`` cell magic, yield injection into the user namespace) and
``fugue_notebook/__init__.py:1`` (``load_ipython_extension`` /  ``setup``
entry points plus CodeMirror highlighting for classic notebooks). This
engine is Spark-only, so the reference's magic-line engine selection maps
to Spark conf: the line may carry a JSON object of spark confs applied for
the cell (``%%fsql {"spark.sql.shuffle.partitions": "8"}``), optionally
preceded by the word ``spark``.

Usage::

    %load_ext fugue_spark.notebook

    %%fsql
    SELECT * FROM df WHERE a > 1
    TAKE 2 ROWS PRESORT a DESC
    YIELD DATAFRAME AS result

Every Spark/pandas DataFrame in the notebook namespace is visible to the
script by its variable name; callables are usable in ``TRANSFORM ...
USING fn``; yields are injected back into the namespace.
"""

from __future__ import annotations

import html as _html
import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = ["FugueSQLMagics", "load_ipython_extension", "setup", "highlight_js"]


def _resolve_spark() -> SparkSession:
    from fugue_spark.context import current_spark

    return current_spark()


def _df_html(df: DataFrame, n: int = 10) -> str:
    """Render the head of a result frame plus its schema line (the
    reference's JupyterDataFrameDisplay shape: table + small schema
    footer)."""
    pdf = df.limit(n).toPandas()
    schema = "SparkDataFrame: " + ", ".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields
    )
    return pdf._repr_html_() + '<font size="-1">' + _html.escape(schema) + "</font>"


def _parse_line(line: str) -> dict[str, str]:
    """Parse the magic line: ``[spark] [{json conf}]`` → conf dict. Any
    other engine name is an explicit error (this engine IS the Spark
    backend; there is no engine registry to dispatch through)."""
    line = (line or "").strip()
    conf: dict[str, str] = {}
    p = line.find("{")
    if p >= 0:
        conf = {str(k): str(v) for k, v in json.loads(line[p:]).items()}
        line = line[:p].strip()
    if line and line.lower() not in ("spark", "native"):
        raise ValueError(
            f"unknown engine {line!r}: this engine runs FugueSQL on Spark only"
        )
    return conf


def _run_cell(
    cell: str,
    ns: "dict[str, Any] | None",
    conf: "dict[str, str] | None" = None,
    fsql_ignore_case: "bool | None" = None,
) -> "DataFrame | None":
    """Execute one %%fsql cell body against the active SparkSession: bind
    namespace DataFrames (pandas ones are converted) and callables, run,
    inject yields back, and return the last frame for display."""
    import pandas as pd

    from fugue_spark.sql import fsql

    spark = _resolve_spark()
    ns = ns if ns is not None else {}
    prior: dict[str, str] = {}
    for k, v in (conf or {}).items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None  # type: ignore[assignment]
        spark.conf.set(k, v)
    try:
        dfs: dict[str, Any] = {}
        fns: dict[str, Any] = {}
        for k, v in ns.items():
            if not isinstance(k, str) or k.startswith("_"):
                continue
            if isinstance(v, DataFrame):
                dfs[k] = v
            elif isinstance(v, pd.DataFrame):
                dfs[k] = spark.createDataFrame(v)
            elif callable(v) and getattr(v, "__module__", "") not in (
                "builtins",
                "importlib",
            ):
                fns[k] = v
        res = fsql(
            cell, spark=spark, functions=fns, fsql_ignore_case=fsql_ignore_case, **dfs
        )
        for name, frame in res.items():
            ns[name] = frame
        return res.last
    finally:
        for k, v in prior.items():
            try:
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            except Exception:
                pass


try:  # IPython is optional: the engine must import without it
    from IPython.core.magic import Magics, cell_magic, magics_class, needs_local_scope

    @magics_class
    class FugueSQLMagics(Magics):
        """``%%fsql`` — run the cell body as a FugueSQL script on Spark."""

        def __init__(self, shell: Any, fsql_ignore_case: "bool | None" = None):
            super().__init__(shell)
            self._fsql_ignore_case = fsql_ignore_case

        @needs_local_scope
        @cell_magic("fsql")
        def fsql(self, line: str, cell: str, local_ns: Any = None) -> None:
            from IPython.display import HTML, display

            last = _run_cell(
                cell, local_ns, _parse_line(line), self._fsql_ignore_case
            )
            if last is not None:
                display(HTML(_df_html(last)))

except ImportError:  # pragma: no cover - container without IPython
    FugueSQLMagics = None  # type: ignore[assignment,misc]


def highlight_js() -> str:
    """CodeMirror highlighting for classic notebooks: register a
    ``text/x-fsql`` MIME type whose keyword set is generated from THIS
    engine's tokenizer (single source of truth), and attach it to cells
    starting with ``%%fsql``."""
    from fugue_spark.sql.tokenizer import STATEMENT_KEYWORDS

    clause_words = (
        "using schema params prepartition by presort persist broadcast "
        "single checkpoint weak strong lazy rows row overwrite append "
        "to if exists parquet csv json like from where and or callback "
        "compiled yield dataframe file as hash rand even coarse seed "
        "replace stratify outer inner left right full semi anti cross"
    )
    kw = " ".join(sorted(k.lower() for k in STATEMENT_KEYWORDS)) + " " + clause_words
    return f"""
require(["codemirror/lib/codemirror"]);
(function() {{
  function toSet(s) {{
    var o = {{}};
    s.split(" ").forEach(function(w) {{ if (w) o[w] = true; }});
    return o;
  }}
  CodeMirror.defineMIME("text/x-fsql", {{
    name: "sql",
    keywords: toSet({json.dumps(kw)}),
    builtin: toSet("str int long float double bool date datetime bytes"),
    atoms: toSet("true false null"),
  }});
  CodeMirror.modeInfo.push({{name: "Fugue SQL", mime: "text/x-fsql", mode: "sql"}});
  require(["notebook/js/codecell"], function(codecell) {{
    codecell.CodeCell.options_default.highlight_modes["magic_text/x-fsql"] =
      {{reg: [/%%fsql/]}};
  }});
}})();
"""


def install_nbextension(user: bool = True, enable: bool = True) -> None:
    """Install the classic-notebook extension (reference: the
    ``jupyter nbextension`` setup shipped under fugue_notebook/nbextension
    — see /root/reference/fugue_notebook/env.py:1). Equivalent to::

        jupyter nbextension install --py fugue_spark [--user]
        jupyter nbextension enable fugue_spark/main [--user]

    Requires the classic ``notebook`` package; JupyterLab/IPython users
    don't need it — ``setup()`` or ``%load_ext fugue_spark.notebook``
    covers those in-session."""
    try:
        from notebook import nbextensions
    except ImportError as ex:  # pragma: no cover - container without notebook
        raise ImportError(
            "classic-notebook extension install requires the 'notebook' "
            "package; in IPython/JupyterLab use setup() instead"
        ) from ex
    nbextensions.install_nbextension_python("fugue_spark", user=user)
    if enable:
        nbextensions.enable_nbextension_python("fugue_spark", user=user)


def load_ipython_extension(ip: Any) -> None:
    """Entry point for ``%load_ext fugue_spark.notebook`` (reference:
    fugue_notebook/__init__.py load_ipython_extension)."""
    if FugueSQLMagics is None:  # pragma: no cover
        raise ImportError("IPython is required for the %%fsql magic")
    ip.register_magics(FugueSQLMagics(ip))


def setup(fsql_ignore_case: "bool | None" = None, is_lab: bool = False) -> None:
    """In-notebook setup without installing an extension (reference:
    fugue_notebook/__init__.py setup): registers the magic on the current
    IPython shell and, for classic notebooks, emits the highlighter."""
    from IPython import get_ipython
    from IPython.display import Javascript, display

    ip = get_ipython()
    if ip is None:  # pragma: no cover
        raise RuntimeError("setup() must run inside an IPython session")
    ip.register_magics(FugueSQLMagics(ip, fsql_ignore_case=fsql_ignore_case))
    if not is_lab:
        display(Javascript(highlight_js()))
