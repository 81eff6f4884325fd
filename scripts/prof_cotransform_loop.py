"""Driver-side microbenchmark of the zip engine's per-group loop (q12
shape): two sides, cursor, dict output. Mirrors _union_cotransform.udf on
one partition-sized Arrow table. Run: python scripts/prof_cotransform_loop.py [rows]
"""

import cProfile
import pstats
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from fugue_spark.transform import (
    PartitionCursor,
    _ArrowResultBatcher,
    _group_bounds,
    _group_frame_maker,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
rng = np.random.default_rng(0)
n_orders = N // 5  # 1 order row + 4 line rows per key
ok = np.arange(n_orders, dtype=np.int64)
# the union layout after the JVM key sort: per key, rows of both tags
keys = np.repeat(ok, 5)
tags = np.tile(np.array([0, 1, 1, 1, 1], dtype=np.int64), n_orders)
tbl = pa.table(
    {
        "orderkey": keys,
        "__tag__": tags,
        "__in0__o_totalprice": np.where(tags == 0, rng.uniform(1, 1e5, len(keys)), np.nan),
        "__in1__l_extendedprice": np.where(tags == 1, rng.uniform(1, 1000, len(keys)), np.nan),
        "__in1__l_discount": np.where(tags == 1, rng.uniform(0, 0.1, len(keys)), np.nan),
    }
)


def gap(cursor, o, l):
    rev_e4 = int(
        np.round(l.l_extendedprice.values * (1 - l.l_discount.values) * 10000)
        .astype("int64")
        .sum()
    )
    total_e4 = int(np.round(o.o_totalprice.values.max() * 10000))
    return {
        "orderkey": int(cursor["orderkey"]),
        "n_lines": len(l),
        "price_gap_e4": total_e4 - rev_e4,
    }


out_cols = ["orderkey", "n_lines", "price_gap_e4"]
arrow_schema = pa.schema(
    [("orderkey", pa.int64()), ("n_lines", pa.int64()), ("price_gap_e4", pa.int64())]
)
side_src = [["orderkey", "__in0__o_totalprice"], ["orderkey", "__in1__l_extendedprice", "__in1__l_discount"]]
in_columns = [["orderkey", "o_totalprice"], ["orderkey", "l_extendedprice", "l_discount"]]
keys_l = ["orderkey"]


def run_loop():
    npart = tbl.num_rows
    tags_np = tbl.column("__tag__").to_numpy()
    makers, empties, prefix = [], [], []
    for i in range(2):
        mask = tags_np == i
        stbl = tbl.filter(pa.array(mask)).select(side_src[i])
        stbl = stbl.rename_columns(in_columns[i])
        ex = np.zeros(npart + 1, dtype=np.int64)
        np.cumsum(mask, out=ex[1:])
        prefix.append(ex)
        f = stbl.to_pandas()
        makers.append(_group_frame_maker(f))
        empties.append(f.iloc[0:0])
    batcher = _ArrowResultBatcher(out_cols, arrow_schema, "prof")
    kpdf = tbl.select(keys_l).to_pandas()
    _, bounds = _group_bounds(kpdf, keys_l, contiguous=True)
    karrs = [kpdf[k].to_numpy() for k in keys_l]
    n_out = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        frames = []
        for i in range(2):
            ex = prefix[i]
            sa, sb = ex[a], ex[b]
            frames.append(makers[i](sa, sb) if sb > sa else empties[i])
        if len(frames[0]) == 0 or len(frames[1]) == 0:
            continue
        kv = [None if isinstance(v, float) and pd.isna(v) else v for v in (arr[a] for arr in karrs)]
        out = batcher.add(gap(PartitionCursor(keys_l, kv, 0), *frames))
        if out is not None:
            n_out += sum(x.num_rows for x in out)
    out = batcher.flush()
    if out is not None:
        n_out += sum(x.num_rows for x in out)
    return n_out


run_loop()
t0 = time.perf_counter()
n = run_loop()
el = time.perf_counter() - t0
print(f"rows={N} groups={n_orders} out={n} wall={el:.3f}s -> {el / n_orders * 1e6:.1f} us/group")

pr = cProfile.Profile()
pr.enable()
run_loop()
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(22)
