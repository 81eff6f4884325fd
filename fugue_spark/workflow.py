"""Workflow conveniences (reference: SURVEY §2.4 — the only three DAG
features that need real code: deterministic checkpoints, yields, and the
assert_eq test helper; everything else collapses into Spark's own lazy
plan).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame

import fugue_spark.api as fa

__all__ = [
    "set_checkpoint_dir",
    "deterministic_checkpoint",
    "weak_checkpoint",
    "strong_checkpoint",
    "save_and_use",
    "assert_eq",
    "assert_not_eq",
]

_CHECKPOINT_DIR: "str | None" = None


def set_checkpoint_dir(path: str) -> None:
    """Where deterministic checkpoints live (survives across runs —
    reference conf FUGUE_CONF_WORKFLOW_CHECKPOINT_PATH)."""
    global _CHECKPOINT_DIR
    _CHECKPOINT_DIR = path
    os.makedirs(path, exist_ok=True)


def _checkpoint_dir() -> str:
    global _CHECKPOINT_DIR
    if _CHECKPOINT_DIR is None:
        _CHECKPOINT_DIR = os.path.join(tempfile.gettempdir(), "fugue_spark_checkpoints")
        os.makedirs(_CHECKPOINT_DIR, exist_ok=True)
    return _CHECKPOINT_DIR


def plan_signature(df: DataFrame, namespace: str = "") -> "str | None":
    """Determinism key for a dataframe: hash of the CANONICALIZED analyzed
    plan + output schema + per-leaf source paths (+ namespace), mirroring
    the reference's task uuid (fugue/workflow/_tasks.py:85-98) but derived
    from Spark's plan.

    Canonicalization (Catalyst ``QueryPlan.canonicalized``) renumbers
    expression ids deterministically by position — identical file-backed
    plans hash identically across sessions — while leaving literal text
    untouched, so ``filter(s == '#1')`` and ``filter(s == '#2')`` stay
    distinct (a naive ``#\\d+`` strip conflates them, and conflates which
    side of a self-join a column came from). Canonicalization also erases
    alias/column NAMES and relation LOCATIONS, so both are hashed back in:
    the dataframe's schema string, and each leaf relation's root paths in
    plan order (two different parquet files with the same schema must not
    share a checkpoint).

    Returns ``None`` for plans rooted in raw driver data (LogicalRDD /
    LocalRelation): their plan text carries NO data content, so two
    different datasets could share a key across runs. The reference has
    the same rule — ``df(...)`` creations are non-deterministic unless an
    explicit ``data_determiner`` hashes the data
    (fugue/workflow/workflow.py df() / _tasks.py CreateData determinism).
    """
    analyzed = df._jdf.queryExecution().analyzed()
    raw = analyzed.toString()
    if "LogicalRDD" in raw or "LocalRelation" in raw:
        return None
    text = analyzed.canonicalized().toString()
    leaves = analyzed.collectLeaves()
    sources = []
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        try:
            paths = leaf.relation().location().rootPaths()
            sources.append(
                ";".join(paths.apply(k).toString() for k in range(paths.size()))
            )
            continue
        except Exception:
            pass
        try:  # DataSourceV2 / catalog tables identify by table name
            sources.append("table:" + leaf.table().name())
            continue
        except Exception:
            pass
        sources.append("leaf:" + leaf.getClass().getName())
    payload = "\n".join([namespace, text, df.schema.simpleString(), *sources])
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def deterministic_checkpoint(df: DataFrame, namespace: str = "") -> DataFrame:
    """Materialize once per unique plan: the parquet file is keyed by the
    plan hash; a re-run with the same plan reloads instead of recomputing
    (cross-run caching — reference _checkpoint.py:65-96 semantics).

    Plans rooted in raw driver data have no plan-derivable determinism key
    (see ``plan_signature``); they degrade to a per-run strong checkpoint,
    exactly as the reference treats determinerless ``df(...)`` creations.
    """
    key = plan_signature(df, namespace)
    if key is None:
        return strong_checkpoint(df)
    path = os.path.join(_checkpoint_dir(), f"ckpt_{key}.parquet")
    spark = df.sparkSession
    if not os.path.exists(path):
        tmp = path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, path)
    return spark.read.parquet(path)


_RUN_TAG = None
_STRONG_SEQ = 0


def weak_checkpoint(df: DataFrame, lazy: bool = False) -> DataFrame:
    """Per-run WEAK checkpoint (reference workflow.py:889 ``weak_checkpoint``
    = engine persist): caches the computed result in executor memory/disk
    for reuse within this run. Lineage is NOT broken — a lost executor
    recomputes from the original plan — and nothing survives the session.
    """
    return fa.persist(df, lazy=lazy)


def strong_checkpoint(df: DataFrame, lazy: bool = False) -> DataFrame:
    """Per-run STRONG checkpoint (reference workflow.py:908
    ``strong_checkpoint`` = non-deterministic file checkpoint): materialize
    to a RUN-SCOPED parquet file and continue from the file, breaking
    lineage. Unlike :func:`deterministic_checkpoint` the file is keyed by
    a per-run tag + sequence — never reused across runs (right for
    nondeterministic or run-specific intermediates in iterative jobs whose
    lineage would otherwise grow without bound). ``lazy`` skips the eager
    materialization count (the write itself still runs now — Spark has no
    deferred write)."""
    global _RUN_TAG, _STRONG_SEQ
    if _RUN_TAG is None:
        import uuid

        _RUN_TAG = uuid.uuid4().hex[:12]
    _STRONG_SEQ += 1
    path = os.path.join(
        _checkpoint_dir(), f"run_{_RUN_TAG}", f"strong_{_STRONG_SEQ}.parquet"
    )
    df.write.mode("overwrite").parquet(path)
    out = df.sparkSession.read.parquet(path)
    if not lazy:
        out.count()
    return out


def save_and_use(df: DataFrame, path: str, format_hint: "str | None" = None, **kwargs) -> DataFrame:
    """Save then continue from the saved copy (cuts lineage; downstream
    reads scan the materialized file — reference workflow.py:1296)."""
    fa.save(df, path, format_hint=format_hint, **kwargs)
    return fa.load(df.sparkSession, path, format_hint=format_hint)


def _as_sorted_pandas(df: DataFrame) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(cols, na_position="last", key=lambda s: s.astype(str))
        .reset_index(drop=True)
    )


def assert_eq(actual: DataFrame, expected: DataFrame, check_schema: bool = True, digits: int = 8) -> None:
    """Order-insensitive dataframe equality (reference _df_eq,
    fugue/dataframe/utils.py:24-94: schema check + float tolerance)."""
    if check_schema:
        a = [(f.name, f.dataType.simpleString()) for f in actual.schema.fields]
        b = [(f.name, f.dataType.simpleString()) for f in expected.schema.fields]
        assert sorted(a) == sorted(b), f"schema mismatch: {a} vs {b}"
    pa_, pb_ = _as_sorted_pandas(actual), _as_sorted_pandas(expected)
    assert len(pa_) == len(pb_), f"row count {len(pa_)} vs {len(pb_)}"
    pd.testing.assert_frame_equal(
        pa_, pb_, check_dtype=False, check_exact=False, rtol=10**-digits
    )


def assert_not_eq(actual: DataFrame, expected: DataFrame, **kwargs) -> None:
    try:
        assert_eq(actual, expected, **kwargs)
    except AssertionError:
        return
    raise AssertionError("dataframes are unexpectedly equal")
