"""Profile the worker-side per-group path in isolation (no Spark).

Simulates one q11 partition: N rows, G groups, 5 columns; times each
pipeline component for the current engine vs alternatives.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fugue_spark.transform import (
    _ArrowResultBatcher,
    _ResultBatcher,
    _group_bounds,
    _group_frame_maker,
    _table_to_pandas,
)

N = 190_000
G = 47_500  # ~4 rows per group

rng = np.random.default_rng(0)
keys = np.repeat(np.arange(G, dtype=np.int64), N // G)
pdf0 = pd.DataFrame(
    {
        "l_orderkey": keys,
        "l_extendedprice": rng.uniform(1, 1000, N),
        "l_discount": rng.uniform(0, 0.1, N),
        "l_linenumber": rng.integers(1, 8, N).astype(np.int32),
        "l_quantity": rng.uniform(1, 50, N),
    }
)
tbl = pa.Table.from_pandas(pdf0, preserve_index=False)
# simulate 64k-row arrow batches arriving from the JVM
batches = tbl.to_batches(max_chunksize=65536)


def per_order(pdf):
    ep = pdf.l_extendedprice.values
    rev_e4 = int(np.round(ep * (1 - pdf.l_discount.values) * 10000).astype("int64").sum())
    return {
        "l_orderkey": int(pdf.l_orderkey.values[0]),
        "revenue": rev_e4 / 10000.0,
        "n_lines": len(pdf),
        "top_line": int(pdf.l_linenumber.values[0]),
    }


def per_order_arrow(t):
    ep = t.column("l_extendedprice").to_numpy()
    di = t.column("l_discount").to_numpy()
    rev_e4 = int(np.round(ep * (1 - di) * 10000).astype("int64").sum())
    return {
        "l_orderkey": t.column("l_orderkey")[0].as_py(),
        "revenue": rev_e4 / 10000.0,
        "n_lines": t.num_rows,
    }


out_cols = ["l_orderkey", "revenue", "n_lines", "top_line"]
arrow_schema = pa.schema(
    [
        ("l_orderkey", pa.int64()),
        ("revenue", pa.float64()),
        ("n_lines", pa.int64()),
        ("top_line", pa.int32()),
    ]
)


def t(label, fn, reps=3):
    best = min(timeit(fn) for _ in range(reps))
    print(f"{label:55s} {best*1000:9.1f} ms")
    return best


def timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


fields = [type("F", (), {"name": c, "dataType": None})() for c in pdf0.columns]

# --- conversion costs
import pyspark.sql.types as T

spark_fields = [
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
]

t("from_batches(whole partition)", lambda: pa.Table.from_batches(batches))
t("_table_to_pandas whole partition", lambda: _table_to_pandas(tbl, spark_fields, "UTC"))
t("per-batch to_pandas + concat (r3 style)", lambda: pd.concat([b.to_pandas() for b in batches], ignore_index=True))

pdf = _table_to_pandas(tbl, spark_fields, "UTC")

# --- group bounds
t("_group_bounds", lambda: _group_bounds(pdf, ["l_orderkey"], contiguous=True))
_, bounds = _group_bounds(pdf, ["l_orderkey"], contiguous=True)


def run_groups_pandas(batcher_cls):
    make = _group_frame_maker(pdf)
    if batcher_cls is _ArrowResultBatcher:
        batcher = _ArrowResultBatcher(out_cols, arrow_schema, "t")
    else:
        batcher = _ResultBatcher(out_cols, "t")
    karr = pdf["l_orderkey"].values
    for a, b in zip(bounds[:-1], bounds[1:]):
        batcher.add(per_order(make(a, b)))
    batcher.flush()


def run_groups_arrow():
    batcher = _ArrowResultBatcher(out_cols[:3], arrow_schema.remove(3), "t")
    kpdf = tbl.select(["l_orderkey"]).to_pandas()
    _, bnds = _group_bounds(kpdf, ["l_orderkey"], contiguous=True)
    for a, b in zip(bnds[:-1], bnds[1:]):
        batcher.add(per_order_arrow(tbl.slice(a, b - a)))
    batcher.flush()


t("per-group pandas + ArrowResultBatcher (r4 path)", lambda: run_groups_pandas(_ArrowResultBatcher))
t("per-group pandas + ResultBatcher (r3 path)", lambda: run_groups_pandas(_ResultBatcher))
t("per-group arrow slices (q20 path)", run_groups_arrow)

# user fn cost alone
make = _group_frame_maker(pdf)
groups = [make(a, b) for a, b in zip(bounds[:-1], bounds[1:])]
t("user fn alone over premade pandas groups", lambda: [per_order(g) for g in groups])
t("make_group alone", lambda: [make(a, b) for a, b in zip(bounds[:-1], bounds[1:])])

# batcher costs alone
dicts = [per_order(g) for g in groups]


def batcher_only(cls):
    if cls is _ArrowResultBatcher:
        b = _ArrowResultBatcher(out_cols, arrow_schema, "t")
    else:
        b = _ResultBatcher(out_cols, "t")
    for d in dicts:
        b.add(d)
    b.flush()


t("ArrowResultBatcher.add x47k dicts", lambda: batcher_only(_ArrowResultBatcher))
t("ResultBatcher.add x47k dicts", lambda: batcher_only(_ResultBatcher))
