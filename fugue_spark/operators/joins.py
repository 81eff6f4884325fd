"""Join with Fugue's key-inference semantics, executed by Catalyst.

Contract (reference: fugue/dataframe/utils.py:152-226 get_join_schemas,
fugue/execution/execution_engine.py:539):

* join keys = the intersection of column names; an explicit ``on`` must
  equal that set (order-insensitive) — it is a validation, not an override.
* cross join requires zero common columns.
* output column order: all left columns, then right non-key columns.
* semi/anti output = left schema only.

Physical strategy is left to Catalyst + AQE (broadcast / shuffled-hash /
sort-merge chosen at runtime); callers mark small dimensions with
``broadcast`` to skip the shuffle outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["join", "broadcast", "JOIN_TYPES"]

JOIN_TYPES = {
    "inner": "inner",
    "cross": "cross",
    "left_outer": "left",
    "left outer": "left",
    "left": "left",
    "right_outer": "right",
    "right outer": "right",
    "right": "right",
    "full_outer": "full",
    "full outer": "full",
    "outer": "full",
    "full": "full",
    "semi": "left_semi",
    "left_semi": "left_semi",
    "anti": "left_anti",
    "left_anti": "left_anti",
}


def _normalize_how(how: str) -> str:
    key = how.strip().lower().replace("_", " ").replace("  ", " ")
    key2 = key.replace(" ", "_")
    if key2 in JOIN_TYPES:
        return JOIN_TYPES[key2]
    if key in JOIN_TYPES:
        return JOIN_TYPES[key]
    raise ValueError(f"unknown join type {how!r}")


def infer_join_keys(df1: DataFrame, df2: DataFrame, how: str, on=None) -> list[str]:
    common = [c for c in df1.columns if c in set(df2.columns)]
    spark_how = _normalize_how(how)
    if spark_how == "cross":
        if common:
            raise ValueError(f"cross join requires disjoint columns, common: {common}")
        return []
    if on is not None:
        on_list = [on] if isinstance(on, str) else list(on)
        if set(on_list) != set(common):
            raise ValueError(
                f"join keys {on_list} must equal the common columns {common}"
            )
        return on_list
    if not common:
        raise ValueError(
            f"no common columns to join on between {df1.columns} and {df2.columns}"
        )
    return common


def join(df1: DataFrame, df2: DataFrame, how: str, on=None) -> DataFrame:
    spark_how = _normalize_how(how)
    if spark_how == "cross":
        infer_join_keys(df1, df2, how)  # validates disjointness
        return df1.crossJoin(df2)
    keys = infer_join_keys(df1, df2, how, on)
    res = df1.join(df2, on=keys, how=spark_how)
    if spark_how in ("left_semi", "left_anti"):
        return res  # already left schema
    # canonical order: left columns then right extras (USING join already
    # de-dups the key columns)
    right_extra = [c for c in df2.columns if c not in set(keys)]
    return res.select(*df1.columns, *right_extra)


def broadcast(df: DataFrame) -> DataFrame:
    """Mark a (small) frame for broadcast join (engine primitive
    execution_engine.py:505)."""
    return F.broadcast(df)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: "list[str] | str",
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: spread each hot LEFT key over ``salt``
    sub-partitions (random salt column) and replicate the RIGHT side
    ``salt`` times, so one giant key no longer lands on one task.

    Use when a handful of keys dominate (AQE skew-join handles moderate
    skew automatically; this is the explicit heavy-hammer for extreme
    skew). Cost: right side inflates ×salt — keep it the smaller input.
    """
    keys = [on] if isinstance(on, str) else list(on)
    spark_how = _normalize_how(how)
    if spark_how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left_outer joins")
    # same collision rule as join(): any shared non-key column would make
    # the post-join select ambiguous
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"salted_join: non-key columns {sorted(overlap)} exist on both "
            "sides; rename or drop them before joining"
        )
    l2 = left.withColumn("__fugue_salt__", (F.rand(0) * salt).cast("int"))
    r2 = right.withColumn(
        "__fugue_salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    res = l2.join(r2, on=keys + ["__fugue_salt__"], how=spark_how).drop("__fugue_salt__")
    right_extra = [c for c in right.columns if c not in set(keys)]
    return res.select(*left.columns, *right_extra)
