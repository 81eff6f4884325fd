"""Column-expression facade — the reference's expression IR re-based on
``pyspark.sql.Column``.

The reference builds its own expression tree (fugue/column/expressions.py)
and compiles it to backend SQL; here every expression *is* a live
``pyspark.sql.Column``, wrapped in :class:`ColumnExpr` only to carry the two
bits of metadata Spark's Column doesn't expose:

* ``has_agg`` — whether an aggregate function appears anywhere in the tree
  (drives GROUP BY key inference in ``select``: non-aggregated items become
  the grouping keys, fugue/column/sql.py:50-92), and
* ``output_name`` — the user-visible alias, so engine ops can canonicalize
  result column order.

The aggregate vocabulary matches the reference exactly (functions.py:13-314):
coalesce, min, max, count, count_distinct, avg, sum, first, last. Everything
else (string/date/math/array/map functions) flows through :func:`function`
or raw SQL passthrough — same posture as the reference, but backed by the
full Spark catalog.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ColumnExpr",
    "col",
    "lit",
    "null",
    "all_cols",
    "function",
    "coalesce",
    "min",
    "max",
    "count",
    "count_distinct",
    "avg",
    "sum",
    "first",
    "last",
    "is_agg",
    "ensure_column",
]

class ColumnExpr:
    """A pyspark Column plus (has_agg, output_name, is_star) metadata."""

    def __init__(
        self,
        native: Column,
        has_agg: bool = False,
        output_name: str | None = None,
        is_star: bool = False,
        is_literal: bool = False,
    ):
        self.native = native
        self.has_agg = has_agg
        self.output_name = output_name
        self.is_star = is_star
        self.is_literal = is_literal

    # -- naming / casting ------------------------------------------------
    def alias(self, name: str) -> "ColumnExpr":
        return ColumnExpr(self.native.alias(name), self.has_agg, name, self.is_star, self.is_literal)

    def cast(self, dtype: Any) -> "ColumnExpr":
        from fugue_spark.schema import parse_type

        if isinstance(dtype, str):
            try:
                dtype = parse_type(dtype)
            except Exception:
                pass  # fall through: let Spark interpret (e.g. "bigint")
        if dtype is int:
            dtype = "long"
        elif dtype is float:
            dtype = "double"
        elif dtype is str:
            dtype = "string"
        elif dtype is bool:
            dtype = "boolean"
        return ColumnExpr(self.native.cast(dtype), self.has_agg, self.output_name)

    # -- predicates ------------------------------------------------------
    def is_null(self) -> "ColumnExpr":
        return ColumnExpr(self.native.isNull(), self.has_agg)

    def not_null(self) -> "ColumnExpr":
        return ColumnExpr(self.native.isNotNull(), self.has_agg)

    # -- operator plumbing ----------------------------------------------
    def _bin(self, other: Any, op: str, reverse: bool = False) -> "ColumnExpr":
        o_native = other.native if isinstance(other, ColumnExpr) else other
        o_agg = other.has_agg if isinstance(other, ColumnExpr) else False
        left, right = (o_native, self.native) if reverse else (self.native, o_native)
        return ColumnExpr(getattr(left, op)(right), self.has_agg or o_agg)

    def __add__(self, o): return self._bin(o, "__add__")
    def __radd__(self, o): return self._bin(o, "__radd__")
    def __sub__(self, o): return self._bin(o, "__sub__")
    def __rsub__(self, o): return self._bin(o, "__rsub__")
    def __mul__(self, o): return self._bin(o, "__mul__")
    def __rmul__(self, o): return self._bin(o, "__rmul__")
    def __truediv__(self, o): return self._bin(o, "__truediv__")
    def __rtruediv__(self, o): return self._bin(o, "__rtruediv__")
    def __and__(self, o): return self._bin(o, "__and__")
    def __rand__(self, o): return self._bin(o, "__rand__")
    def __or__(self, o): return self._bin(o, "__or__")
    def __ror__(self, o): return self._bin(o, "__ror__")
    def __lt__(self, o): return self._bin(o, "__lt__")
    def __le__(self, o): return self._bin(o, "__le__")
    def __gt__(self, o): return self._bin(o, "__gt__")
    def __ge__(self, o): return self._bin(o, "__ge__")
    def __eq__(self, o): return self._bin(o, "__eq__")  # noqa: E721
    def __ne__(self, o): return self._bin(o, "__ne__")  # noqa: E721
    def __neg__(self): return ColumnExpr(-self.native, self.has_agg)
    def __invert__(self): return ColumnExpr(~self.native, self.has_agg)

    def __repr__(self) -> str:
        return f"ColumnExpr({self.native!r}, agg={self.has_agg})"


def ensure_column(e: Any) -> Column:
    """ColumnExpr | Column | literal → pyspark Column."""
    if isinstance(e, ColumnExpr):
        return e.native
    if isinstance(e, Column):
        return e
    return F.lit(e)


def is_agg(e: Any) -> bool:
    return isinstance(e, ColumnExpr) and e.has_agg


def col(name: str) -> ColumnExpr:
    return ColumnExpr(F.col(name), output_name=name)


def lit(value: Any, alias: str | None = None) -> ColumnExpr:
    c = F.lit(value)
    return ColumnExpr(c.alias(alias) if alias else c, output_name=alias, is_literal=True)


def null() -> ColumnExpr:
    return ColumnExpr(F.lit(None), is_literal=True)


def all_cols() -> ColumnExpr:
    return ColumnExpr(F.col("*"), is_star=True)


def function(name: str, *args: Any, is_aggregate: bool = False, **kwargs: Any) -> ColumnExpr:
    """Call any Spark SQL function by name; agg-ness propagates from args
    (set ``is_aggregate=True`` for aggregates outside the built-in nine)."""
    has_agg = is_aggregate or any(is_agg(a) for a in args)
    cols = [ensure_column(a) for a in args]
    native = getattr(F, name)(*cols, **kwargs) if hasattr(F, name) else F.call_function(name, *cols)
    return ColumnExpr(native, has_agg)


# -- the nine reference aggregates / helpers ----------------------------

def coalesce(*args: Any) -> ColumnExpr:
    return ColumnExpr(F.coalesce(*[ensure_column(a) for a in args]), any(is_agg(a) for a in args))


def min(c: ColumnExpr) -> ColumnExpr:  # noqa: A001
    return ColumnExpr(F.min(ensure_column(c)), True, _name_of(c))


def max(c: ColumnExpr) -> ColumnExpr:  # noqa: A001
    return ColumnExpr(F.max(ensure_column(c)), True, _name_of(c))


def count(c: ColumnExpr) -> ColumnExpr:
    n = ensure_column(c) if not (isinstance(c, ColumnExpr) and c.is_star) else F.lit(1)
    return ColumnExpr(F.count(n), True, _name_of(c))


def count_distinct(c: ColumnExpr) -> ColumnExpr:
    if isinstance(c, ColumnExpr) and c.is_star:
        # COUNT(DISTINCT *) — whole-row distinct count (reference
        # fugue/column/functions.py:146-175 allows the star form);
        # struct("*") expands at analysis time
        return ColumnExpr(F.countDistinct(F.struct("*")), True, _name_of(c))
    return ColumnExpr(F.countDistinct(ensure_column(c)), True, _name_of(c))


def avg(c: ColumnExpr) -> ColumnExpr:
    return ColumnExpr(F.avg(ensure_column(c)), True, _name_of(c))


def sum(c: ColumnExpr) -> ColumnExpr:  # noqa: A001
    return ColumnExpr(F.sum(ensure_column(c)), True, _name_of(c))


def first(c: ColumnExpr, ignore_nulls: bool = False) -> ColumnExpr:
    return ColumnExpr(F.first(ensure_column(c), ignorenulls=ignore_nulls), True, _name_of(c))


def last(c: ColumnExpr, ignore_nulls: bool = False) -> ColumnExpr:
    return ColumnExpr(F.last(ensure_column(c), ignorenulls=ignore_nulls), True, _name_of(c))


def _name_of(c: Any) -> str | None:
    return c.output_name if isinstance(c, ColumnExpr) else None
