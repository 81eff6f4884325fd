"""Aggregation trace-compiler: run a per-group transformer function ONCE
against symbolic proxies; if it reduces to a dict of aggregation
expressions, execute the whole transform as a native ``groupBy().agg`` —
whole-stage-codegen, map-side partial aggregation, no Python workers.

Why: the pandas-path floor for tiny groups is ~70µs/group of pure Python
(frame slice + Series boxing + numpy-on-4-rows), which keeps q11-shaped
workloads >2× DuckDB however well tuned. A reduction expressed as Catalyst
aggregates shuffles only partial agg states — at 100 TB that is the
difference between a python-bounded stage and a codegen'd one.

Opt-in (``transform(..., compile=True)``): tracing assumes the function is
side-effect-free and runs it with proxy inputs, so functions that branch on
data values, call ``int()``/``float()`` on results, or mutate state raise
``TraceError`` and (non-strict) fall back to the pandas path unchanged.

Traceable surface (kept deliberately small and exact):
  * column access: ``pdf.col`` / ``pdf['col']``; ``.values`` / ``.to_numpy()``
  * elementwise arithmetic ``+ - * / // % **``, unary ``-``/``abs``,
    comparisons, ``& | ~``; ``np.round``/``.round(n)``, ``np.sqrt``,
    ``np.log``, ``np.log1p``, ``np.exp``, ``np.abs``, ``np.floor``,
    ``np.ceil`` (ufunc protocol); ``.astype(dtype)``; ``.fillna(const)``
  * reductions: ``.sum() .min() .max() .mean() .count() .nunique()``,
    ``len(pdf)`` (returned directly), ``pdf.shape[0]``, ``series.size``
  * first-row access ``col.iloc[0]`` / ``col.values[0]`` — compiled to the
    group key (constant), or to ``min_by``/``max_by`` over the declared
    presort; without a presort a non-key first-row access fails the trace
    (it would be nondeterministic on the pandas path too)
  * scalar arithmetic on reduced values; output must be a dict

Rounding caveat: ``np.round`` is round-half-even, Spark/DuckDB ``round``
is half-away-from-zero for positives; they differ only on exact .5
boundaries, which arbitrary doubles essentially never hit. Documented
rather than emulated.

No reference counterpart: Fugue always executes transformers as Python
(fugue/execution/execution_engine.py:283-315); this rewrite exists because
a Spark-native engine can see through the function to the plan.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TraceError", "try_compile_aggregation"]


class TraceError(ValueError):
    """The function is not expressible as a Catalyst aggregation."""


_DTYPES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "float32": "float",
    "float64": "double",
    "double": "double",
    "float": "double",  # numpy-style name
    "int": "long",
    "bool": "boolean",
    "boolean": "boolean",
    "str": "string",
    "string": "string",
}


def _cast_name(dtype: Any) -> str:
    name = dtype if isinstance(dtype, str) else getattr(dtype, "name", str(dtype))
    try:
        return _DTYPES[str(name)]
    except KeyError:
        raise TraceError(f"astype({dtype!r}) has no Catalyst mapping")


def _lift(other: Any) -> "Column | Any":
    if isinstance(other, (_Vec, _Scalar)):
        return other.col
    if isinstance(other, (int, float, bool, str)):
        return other
    raise TraceError(f"cannot mix {type(other).__name__} into a traced expression")


class _Base:
    """Shared operator surface for vector (per-row) and scalar (reduced)
    proxies; every operation returns a new proxy over a pyspark Column."""

    __slots__ = ("col",)

    def __init__(self, col: Column):
        self.col = col

    def _make(self, col: Column):
        return type(self)(col)

    # arithmetic -----------------------------------------------------------
    def __add__(self, o):
        return self._make(self.col + _lift(o))

    def __radd__(self, o):
        return self._make(_lift(o) + self.col)

    def __sub__(self, o):
        return self._make(self.col - _lift(o))

    def __rsub__(self, o):
        return self._make(_lift(o) - self.col)

    def __mul__(self, o):
        return self._make(self.col * _lift(o))

    def __rmul__(self, o):
        return self._make(_lift(o) * self.col)

    def __truediv__(self, o):
        return self._make(self.col / _lift(o))

    def __rtruediv__(self, o):
        return self._make(_lift(o) / self.col)

    def __floordiv__(self, o):
        return self._make(F.floor(self.col / _lift(o)).cast("long"))

    def __mod__(self, o):
        return self._make(self.col % _lift(o))

    def __pow__(self, o):
        return self._make(F.pow(self.col, _lift(o)))

    def __neg__(self):
        return self._make(-self.col)

    def __abs__(self):
        return self._make(F.abs(self.col))

    # comparisons / boolean ------------------------------------------------
    def __eq__(self, o):  # type: ignore[override]
        return self._make(self.col == _lift(o))

    def __ne__(self, o):  # type: ignore[override]
        return self._make(self.col != _lift(o))

    def __lt__(self, o):
        return self._make(self.col < _lift(o))

    def __le__(self, o):
        return self._make(self.col <= _lift(o))

    def __gt__(self, o):
        return self._make(self.col > _lift(o))

    def __ge__(self, o):
        return self._make(self.col >= _lift(o))

    def __and__(self, o):
        return self._make(self.col & _lift(o))

    def __or__(self, o):
        return self._make(self.col | _lift(o))

    def __invert__(self):
        return self._make(~self.col)

    # numpy ufunc protocol -------------------------------------------------
    _UFUNCS = {
        "sqrt": F.sqrt,
        "log": F.log,
        "log1p": F.log1p,
        "exp": F.exp,
        "absolute": F.abs,
        "fabs": F.abs,
        "floor": F.floor,
        "ceil": F.ceil,
        "rint": lambda c: F.round(c, 0),
        "negative": lambda c: -c,
        "add": None,
        "subtract": None,
        "multiply": None,
        "true_divide": None,
        "divide": None,
        "power": None,
        "minimum": F.least,
        "maximum": F.greatest,
    }
    _UFUNC_BINOPS = {
        "add": "__add__",
        "subtract": "__sub__",
        "multiply": "__mul__",
        "true_divide": "__truediv__",
        "divide": "__truediv__",
        "power": "__pow__",
    }

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            raise TraceError(f"unsupported ufunc call {ufunc.__name__}.{method}")
        name = ufunc.__name__
        if name in self._UFUNC_BINOPS:
            a, b = inputs
            if isinstance(a, _Base):
                return getattr(a, self._UFUNC_BINOPS[name])(b)
            return getattr(b, "__r" + self._UFUNC_BINOPS[name][2:])(a)
        fn = self._UFUNCS.get(name)
        if fn is None:
            raise TraceError(f"ufunc {name} is not traceable")
        if name in ("minimum", "maximum"):
            return self._make(fn(_lift(inputs[0]), _lift(inputs[1])))
        (x,) = inputs
        return self._make(fn(_lift(x)))

    # common methods -------------------------------------------------------
    def round(self, decimals: int = 0):
        return self._make(F.round(self.col, int(decimals)))

    def astype(self, dtype: Any):
        return self._make(self.col.cast(_cast_name(dtype)))

    def fillna(self, value: Any):
        if not isinstance(value, (int, float, bool, str)):
            raise TraceError("fillna with a non-constant is not traceable")
        return self._make(F.coalesce(self.col, F.lit(value)))

    # refuse silent coercion ----------------------------------------------
    def __bool__(self):
        raise TraceError(
            "branching on data values is not traceable (bool() on a traced expression)"
        )

    def __int__(self):
        raise TraceError("int() forces evaluation — use .astype('int64') instead")

    def __float__(self):
        raise TraceError("float() forces evaluation — use .astype('float64') instead")

    def __iter__(self):
        raise TraceError("iterating a traced expression is not supported")


class _Scalar(_Base):
    """A reduced (per-group scalar) expression."""

    def as_py(self):
        # pyarrow scalar surface: tracing arrow-annotated functions
        return self


class _Iloc:
    __slots__ = ("vec",)

    def __init__(self, vec: "_Vec"):
        self.vec = vec

    def __getitem__(self, i):
        return self.vec._first(i)


class _Vec(_Base):
    """A per-row (vector) expression over the group's rows."""

    __slots__ = ("frame", "name")

    def __init__(self, col: Column, frame: "_TraceFrame | None" = None, name: "str | None" = None):
        super().__init__(col)
        self.frame = frame
        self.name = name

    def _make(self, col: Column):
        # derived vectors lose key identity but keep the frame (for presort)
        return _Vec(col, frame=self.frame)

    # array-like surface ---------------------------------------------------
    @property
    def values(self):
        return self

    def to_numpy(self):
        return self

    @property
    def iloc(self):
        return _Iloc(self)

    def __getitem__(self, i):
        return self._first(i)

    @property
    def size(self):
        return _Scalar(F.count(F.lit(1)))

    # reductions -----------------------------------------------------------
    def sum(self, *a, **k):
        return _Scalar(F.sum(self.col))

    def min(self, *a, **k):
        return _Scalar(F.min(self.col))

    def max(self, *a, **k):
        return _Scalar(F.max(self.col))

    def mean(self, *a, **k):
        return _Scalar(F.avg(self.col))

    def count(self, *a, **k):
        return _Scalar(F.count(self.col))

    def nunique(self, *a, **k):
        return _Scalar(F.count_distinct(self.col))

    def _first(self, i: Any) -> _Scalar:
        if not isinstance(i, int) or i != 0:
            raise TraceError("only first-row access ([0] / .iloc[0]) is traceable")
        f = self.frame
        if f is None:
            raise TraceError("first-row access on a derived expression is not traceable")
        if self.name is not None and self.name in f.keys:
            # group key: constant within the group
            return _Scalar(F.first(self.col))
        if not f.presort:
            raise TraceError(
                "first-row access without a presort is nondeterministic; "
                "declare partition presort or use min()/max()"
            )
        # first row under presort == arg-min of the presort tuple: min_by
        # when every direction is ASC, max_by when every direction is DESC;
        # mixed directions negate the minority keys (numeric only).
        n_desc = sum(1 for _, asc in f.presort if not asc)
        use_max = n_desc * 2 >= len(f.presort)
        orderings = []
        for name, asc in f.presort:
            kcol = F.col(f.safe(name))
            flip = (asc and use_max) or (not asc and not use_max)
            if flip:
                dt = f.dtype(name)
                if not isinstance(dt, T.NumericType):
                    raise TraceError(
                        f"mixed-direction presort on non-numeric column {name!r} "
                        "cannot compile to min_by/max_by"
                    )
                kcol = -kcol
            orderings.append(kcol)
        order = F.struct(*orderings) if len(orderings) > 1 else orderings[0]
        agg = F.max_by(self.col, order) if use_max else F.min_by(self.col, order)
        return _Scalar(agg)


# ``len(pdf)`` must hand the user a real int (CPython coerces __len__'s
# result to an exact int, discarding any subclass), so len is traced with a
# sentinel VALUE. The function is traced twice with two different sentinels
# and the outputs must be invariant: a value equal to the sentinel in both
# traces compiles to count(*); anything else that CHANGED between traces
# was contaminated by arithmetic on len() and fails the trace loudly.
_LEN_TOKENS = (0x5EAC0DE1, 0x5EAC0DE2)


class _TraceFrame:
    """The ``pdf`` stand-in handed to the user function during tracing."""

    def __init__(self, schema: T.StructType, keys: list[str], presort, name_to_safe, len_token: int):
        self._schema = schema
        self.keys = list(keys)
        self.presort = list(presort)
        self._name_to_safe = dict(name_to_safe)
        self._fields = {f.name: f for f in schema.fields}
        self._len_token = len_token

    def safe(self, name: str) -> str:
        return self._name_to_safe.get(name, name)

    def dtype(self, name: str) -> T.DataType:
        return self._fields[name].dataType

    def _col(self, name: str) -> _Vec:
        if name not in self._fields:
            raise TraceError(f"column {name!r} not in input schema")
        return _Vec(F.col(self.safe(name)), frame=self, name=name)

    def __getitem__(self, name):
        if isinstance(name, str):
            return self._col(name)
        raise TraceError("only single-column [name] access is traceable")

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._col(name)
        except TraceError as ex:
            raise AttributeError(str(ex)) from None

    @property
    def columns(self):
        return list(self._fields)

    @property
    def shape(self):
        return (_Scalar(F.count(F.lit(1))), len(self._fields))

    # pyarrow.Table surface, so arrow-annotated reducers trace too
    def column(self, name: str) -> _Vec:
        return self._col(name)

    @property
    def num_rows(self):
        return self._len_token

    def __len__(self):
        return self._len_token

    def __bool__(self):
        raise TraceError("branching on the group frame is not traceable")


class _TraceCursor:
    """cursor stand-in: key access returns the (constant) key column."""

    def __init__(self, frame: _TraceFrame):
        self._frame = frame
        self.keys = list(frame.keys)
        self.partition_no = 0

    def __getitem__(self, name: str):
        if name not in self._frame.keys:
            raise TraceError(f"cursor[{name!r}] is not a partition key")
        return self._frame._col(name)

    @property
    def key_value_dict(self):
        return {k: self._frame._col(k) for k in self._frame.keys}


def try_compile_aggregation(
    df: DataFrame,
    fn: Callable,
    keys: list[str],
    presort,
    out_schema: T.StructType,
    kwargs: dict,
    wants_cursor: bool,
    name_to_safe: "dict | None" = None,
    in_schema: "T.StructType | None" = None,
) -> DataFrame:
    """Trace ``fn`` and return the compiled ``groupBy().agg`` plan.

    ``df`` may carry engine-internal safe column names; ``in_schema`` is the
    user-visible schema and ``name_to_safe`` maps between them.

    Raises TraceError when the function is not a pure dict-of-aggregations
    reduction; the caller decides whether to fall back or surface it.
    """
    def run_trace(len_token: int) -> tuple[dict, _TraceFrame]:
        frame = _TraceFrame(
            in_schema or df.schema, keys, presort, name_to_safe or {}, len_token
        )
        try:
            if wants_cursor:
                res = fn(_TraceCursor(frame), frame, **kwargs)
            else:
                res = fn(frame, **kwargs)
        except TraceError:
            raise
        except Exception as ex:
            raise TraceError(f"tracing raised {type(ex).__name__}: {ex}") from ex
        if not isinstance(res, dict):
            raise TraceError(
                f"compiled transforms must return a dict of scalars, got {type(res).__name__}"
            )
        return res, frame

    # trace twice with different len() sentinels: outputs must be invariant,
    # which catches any arithmetic on len(pdf) (a plain int by CPython rule)
    # leaking into results as a bogus constant — including inside exprs
    res, frame = run_trace(_LEN_TOKENS[0])
    res2, _ = run_trace(_LEN_TOKENS[1])
    out_cols = [f.name for f in out_schema.fields]
    if set(res) != set(out_cols) or set(res2) != set(out_cols):
        raise TraceError(f"traced output keys {sorted(res)} != schema {sorted(out_cols)}")

    keyset = set(keys)
    aggs: list[Column] = []
    for f in out_schema.fields:
        v, w = res[f.name], res2[f.name]
        if isinstance(v, (_Scalar, _Vec)):
            if type(w) is not type(v) or str(w.col) != str(v.col):
                raise TraceError(
                    f"output {f.name!r} depends on len(pdf) arithmetic — use pdf.shape[0]"
                )
        if isinstance(v, _Scalar):
            aggs.append(v.col.cast(f.dataType).alias(f.name))
        elif isinstance(v, _Vec):
            if v.name is None or v.name not in keyset:
                raise TraceError(
                    f"output {f.name!r} is a per-row expression — reduce it "
                    "(sum/min/max/mean/first) before returning"
                )
            aggs.append(F.first(v.col).cast(f.dataType).alias(f.name))
        elif isinstance(v, bool) or v is None or isinstance(v, str):
            if w != v:
                raise TraceError(f"output {f.name!r} is not len()-invariant")
            aggs.append(F.lit(v).cast(f.dataType).alias(f.name))
        elif isinstance(v, (int, float)):
            if v == _LEN_TOKENS[0] and w == _LEN_TOKENS[1]:
                aggs.append(F.count(F.lit(1)).cast(f.dataType).alias(f.name))
            elif v == w or (v != v and w != w):  # equal constants (or both NaN)
                aggs.append(F.lit(v).cast(f.dataType).alias(f.name))
            else:
                raise TraceError(
                    f"output {f.name!r} depends on len(pdf) arithmetic — use pdf.shape[0]"
                )
        else:
            raise TraceError(f"output {f.name!r} has untraceable type {type(v).__name__}")

    safe = frame.safe
    if keys:
        # alias grouping columns to internal names so output aliases that
        # reuse a key's name (the common case) never become ambiguous
        grouped = df.groupBy(
            *[F.col(safe(k)).alias(f"__gk_{i}__") for i, k in enumerate(keys)]
        )
        out = grouped.agg(*aggs)
    else:
        out = df.agg(*aggs)
    out = out.select(*out_cols)
    # widen non-nullable agg outputs (count(*)) to the engine's all-nullable
    # schema contract: when(isNotNull, x) resets the nullability flag at
    # analysis time (when(lit(True), x) is constant-folded and does not)
    if any(not f.nullable for f in out.schema.fields):
        out = out.select(
            *[
                F.when(F.col(f.name).isNotNull(), F.col(f.name)).alias(f.name)
                if not f.nullable
                else F.col(f.name)
                for f in out.schema.fields
            ]
        )
    return out
