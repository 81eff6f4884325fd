"""PartitionSpec — the engine's unit of physical-layout control.

Semantics follow the reference (fugue/collections/partition.py:79-214):
``by`` partition keys, ``presort`` within-partition ordering, ``num`` a count
or a lazy expression over ROWCOUNT / CONCURRENCY, ``algo`` one of
default|hash|rand|even|coarse. The executor maps each algo to the Spark
physical strategy that survives scale:

* hash/default → ``df.repartition(num, *keys)`` — Catalyst hash exchange,
  AQE may coalesce; the normal path for grouped work.
* rand → ``df.repartition(num, F.rand(seed))`` — break skew when no key.
* even → exact round-robin over an RDD zipWithIndex (driver-free, two
  passes); used only on explicit request (``per_row``) since it defeats
  AQE and costs a persist+count. Keyed even puts each distinct key group
  in its own partition (skew-proof "one group per task").
* coarse → no data movement: treat each existing physical partition as one
  logical partition.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PartitionSpec", "parse_presort", "apply_partition_spec"]


def _nan_safe_key_exprs(df: DataFrame, keys: "list[str]") -> list:
    """Partition/sort expressions that treat float NaN and NULL as ONE key.

    pandas cannot distinguish them (both are NaN in a float64 column) so the
    map engines group them together — but the JVM sorts NULL first and NaN
    last, which would leave two non-adjacent runs that normalize to the SAME
    key tuple: the user function would run twice for that key and one run's
    rows could be dropped. Normalizing NaN→NULL in the exchange/sort keys
    (never in the data columns) makes the runs adjacent and co-partitioned.
    """
    from pyspark.sql import types as T

    exprs = []
    for k in keys:
        dt = df.schema[k].dataType
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            exprs.append(F.nanvl(F.col(k), F.lit(None).cast(dt)))
        else:
            exprs.append(F.col(k))
    return exprs

ROWCOUNT = "ROWCOUNT"
CONCURRENCY = "CONCURRENCY"


def _split_presort_items(s: str) -> list[str]:
    """Split on commas OUTSIDE backtick quotes."""
    items: list[str] = []
    cur: list[str] = []
    in_bt = False
    for ch in s:
        if ch == "`":
            in_bt = not in_bt
            cur.append(ch)
        elif ch == "," and not in_bt:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    return items


def _parse_presort_item(item: str) -> "tuple[str, bool] | None":
    item = item.strip()
    if not item:
        return None
    if item.startswith("`"):
        # backtick-quoted name, doubled backticks escape a literal one
        # (reference parse_presort_exp: `` empty, ```` a literal backtick,
        # `a b` names with spaces — tests/fugue/collections/
        # test_partition.py:36-40)
        i = 1
        name_chars: list[str] = []
        while i < len(item):
            if item[i] == "`":
                if i + 1 < len(item) and item[i + 1] == "`":
                    name_chars.append("`")
                    i += 2
                    continue
                i += 1
                break
            name_chars.append(item[i])
            i += 1
        rest = item[i:].strip()
        name = "".join(name_chars)
    else:
        parts = item.split(None, 1)
        name = parts[0]
        rest = parts[1].strip() if len(parts) > 1 else ""
    if not rest:
        return (name, True)
    if rest.upper() in ("ASC", "DESC"):
        return (name, rest.upper() == "ASC")
    raise ValueError(f"invalid presort item {item!r} (expected ASC/DESC)")


def parse_presort(
    presort: "str | list | None",
) -> list[tuple[str, bool]]:
    """``"b DESC, c ASC"`` → ``[("b", False), ("c", True)]`` (True=asc).

    Accepts the reference's full input surface (fugue/collections/
    partition.py parse_presort_exp): backtick-quoted names (spaces,
    unicode, escaped backticks), list entries as ``(name, bool)`` pairs
    or bare name strings; non-bool directions in pairs and duplicate
    names are errors."""
    if presort is None:
        return []
    out: list[tuple[str, bool]] = []
    if isinstance(presort, (list, tuple)):
        for entry in presort:
            if isinstance(entry, str):
                out.append((entry, True))
            elif (
                isinstance(entry, tuple)
                and len(entry) == 2
                and isinstance(entry[0], str)
                and isinstance(entry[1], bool)
            ):
                out.append(entry)
            else:
                raise ValueError(
                    f"presort list entries must be 'name' or (name, bool): {entry!r}"
                )
    else:
        for raw in _split_presort_items(presort):
            parsed = _parse_presort_item(raw)
            if parsed is not None:
                out.append(parsed)
    names = [n for n, _ in out]
    if len(names) != len(set(names)):
        raise ValueError(f"duplicate presort columns in {presort!r}")
    return out


@dataclass
class PartitionSpec:
    by: list[str] = field(default_factory=list)
    presort: list[tuple[str, bool]] = field(default_factory=list)
    num: "int | str" = 0  # 0 = engine default; str may use ROWCOUNT/CONCURRENCY
    algo: str = "default"

    def __init__(
        self,
        spec: Any = None,
        *,
        by: "list[str] | str | None" = None,
        presort: "str | list[tuple[str, bool]] | None" = None,
        num: "int | str" = 0,
        algo: str = "",
    ):
        if isinstance(spec, PartitionSpec):
            by = by or spec.by
            presort = presort if presort is not None else spec.presort
            num = num or spec.num
            algo = algo or spec.algo
        elif isinstance(spec, int):
            num = num or spec
        elif isinstance(spec, str) and spec:
            if spec.lower() == "per_row":
                num, algo = ROWCOUNT, "even"
            elif spec.lower() == "per_partition":
                algo = algo or "coarse"
            elif spec.lstrip().startswith("{"):
                # JSON spec string (reference: PartitionSpec(json.dumps(...)),
                # tests/fugue/collections/test_partition.py:77)
                import json as _json

                return self.__init__(
                    _json.loads(spec), by=by, presort=presort, num=num, algo=algo
                )
            else:
                # a bare name is a partition-by column, as in the reference
                # (PartitionSpec("abc") == PartitionSpec(by=["abc"]))
                by = by or [spec]
        elif isinstance(spec, (list, tuple)) and all(
            isinstance(x, str) for x in spec
        ):
            # PartitionSpec(["a","b"]) == PartitionSpec(by=["a","b"])
            by = by or list(spec)
        elif isinstance(spec, dict):
            # accept the reference's long-form key aliases too
            by = by or spec.get("by", spec.get("partition_by", []))
            presort = presort if presort is not None else spec.get("presort")
            num = num or spec.get("num", spec.get("num_partitions", 0))
            algo = algo or spec.get("algo", "")
        elif spec is not None:
            raise ValueError(f"invalid partition spec {spec!r}")
        self.by = [by] if isinstance(by, str) else list(by or [])
        self.presort = parse_presort(presort)
        self.num = num
        algo = (algo or "default").lower()
        if algo not in ("default", "hash", "rand", "even", "coarse"):
            raise ValueError(f"unknown partition algo {algo!r}")
        self.algo = algo
        overlap = set(self.by) & {n for n, _ in self.presort}
        if overlap:
            raise ValueError(f"presort columns overlap partition keys: {overlap}")

    @property
    def empty(self) -> bool:
        return not self.by and not self.presort and self.num == 0 and self.algo == "default"

    def resolve_num(self, df: DataFrame) -> int:
        """Evaluate ``num``, lazily pulling ROWCOUNT/CONCURRENCY only if used."""
        if isinstance(self.num, int):
            return self.num
        expr = str(self.num).strip()
        if not expr:
            return 0
        up = expr.upper()
        if ROWCOUNT in up:
            up = up.replace(ROWCOUNT, str(df.count()))
        if CONCURRENCY in up:
            up = up.replace(CONCURRENCY, str(df.sparkSession.sparkContext.defaultParallelism))
        if not re.fullmatch(r"[0-9+\-*/(). ]+", up):
            raise ValueError(f"invalid partition num expression {self.num!r}")
        val = eval(up, {"__builtins__": {}}, {})  # arithmetic-only, validated above
        return max(int(val), 1)

    def sort_columns(self):
        return [
            (F.col(n).asc_nulls_first() if asc else F.col(n).desc_nulls_last())
            for n, asc in self.presort
        ]


def _even_repartition(df: DataFrame, num: int, by: list[str]) -> DataFrame:
    """Exact round-robin (unkeyed) or one-partition-per-key-group (keyed).

    RDD-based: not available on Spark Connect; only used for algo=even /
    per_row, mirroring the reference's restriction
    (fugue_spark/_utils/partition.py:38-78 — behavior, not code).
    """
    schema = df.schema
    spark = df.sparkSession
    if not by:
        if num <= 0:
            num = df.rdd.getNumPartitions()
        rdd = (
            df.rdd.zipWithIndex()
            .map(lambda pair: (pair[1], pair[0]))
            .partitionBy(num, lambda k: k % num)
            .map(lambda pair: pair[1])
        )
        return spark.createDataFrame(rdd, schema)
    # keyed: assign each distinct key tuple an index, then round-robin
    # groups. Keys are NaN-normalized (NaN→NULL) for BOTH the distinct and
    # the join below: the JVM treats NaN and NULL as different keys but the
    # pandas map engines cannot, so they must share one gid/partition.
    norm_keys = [
        e.alias(k) for e, k in zip(_nan_safe_key_exprs(df, by), by)
    ]
    keys = df.select(*norm_keys).distinct()
    key_schema = keys.schema
    indexed = keys.rdd.zipWithIndex().map(
        lambda pair: tuple(pair[0]) + (pair[1],)
    )
    from pyspark.sql import types as T

    idx_schema = T.StructType(list(key_schema.fields) + [T.StructField("__fugue_gid__", T.LongType(), False)])
    key_df = spark.createDataFrame(
        indexed, T.StructType(
            [T.StructField(f"__fugue_k{i}__", f.dataType, f.nullable) for i, f in enumerate(key_schema.fields)]
            + [idx_schema.fields[-1]]
        )
    )
    n = num if num > 0 else keys.count()
    # null-safe equality: rows whose key contains NULL still get a gid
    # (a plain `on=by` inner join silently drops them)
    cond = None
    left_norm = _nan_safe_key_exprs(df, by)
    for i, e in enumerate(left_norm):
        c = e.eqNullSafe(key_df[f"__fugue_k{i}__"])
        cond = c if cond is None else (cond & c)
    joined = df.join(key_df, on=cond, how="inner").drop(
        *[f"__fugue_k{i}__" for i in range(len(by))]
    )
    rdd = (
        joined.rdd.map(lambda row: (row["__fugue_gid__"], row))
        .partitionBy(n, lambda k: k % n)
        .map(lambda pair: pair[1])
    )
    out = spark.createDataFrame(rdd, joined.schema)
    return out.drop("__fugue_gid__").select(*[f.name for f in schema.fields])


def apply_partition_spec(df: DataFrame, spec: "PartitionSpec | None") -> DataFrame:
    """Physically realize a PartitionSpec on a DataFrame."""
    if spec is None or spec.empty:
        return df
    num = spec.resolve_num(df)
    algo = spec.algo
    if algo in ("default", "hash"):
        if spec.by:
            df = df.repartition(num, *spec.by) if num > 0 else df.repartition(*spec.by)
        elif num > 0:
            df = df.repartition(num)
    elif algo == "rand":
        n = num if num > 0 else df.rdd.getNumPartitions()
        if spec.by:
            # randomized placement of whole KEY GROUPS: hashing the
            # (NaN-normalized) keys with a per-plan salt keeps each group in
            # one partition — plain repartition(rand()) would scatter rows
            # of the same group across partitions and break grouped maps
            import random

            salt = random.randint(0, 2**31 - 1)
            df = df.repartition(
                n, F.hash(*_nan_safe_key_exprs(df, spec.by), F.lit(salt))
            )
        else:
            df = df.repartition(n, F.rand(0))
    elif algo == "even":
        df = _even_repartition(df, num, spec.by)
    # coarse: leave physical layout untouched
    if spec.presort:
        df = df.sortWithinPartitions(*spec.sort_columns())
    return df
