"""Driver-side microbenchmark of the grouped map-engine inner loop.

Replicates exactly what grouped_arrow_udf does per partition for the q11
workload (dict-output reducer over ~4-row groups) on one partition-sized
pandas frame, so cProfile sees the real hotspots without Spark workers in
the way. Run: python scripts/prof_group_loop.py [rows]
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
    _ArrowResultBatcher,
    _group_bounds,
    _group_frame_maker,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
rng = np.random.default_rng(0)
n_orders = N // 4
keys = np.repeat(np.arange(n_orders, dtype=np.int64), 4)[:N]
pdf = pd.DataFrame(
    {
        "l_orderkey": keys,
        "l_extendedprice": rng.uniform(1, 1000, N),
        "l_discount": rng.uniform(0, 0.1, N),
        "l_linenumber": rng.integers(1, 7, N).astype(np.int32),
        "l_quantity": rng.uniform(1, 50, N),
    }
)
# engine contract: partition arrives key-sorted
pdf = pdf.sort_values(["l_orderkey"], kind="mergesort").reset_index(drop=True)


def per_order(pdf):
    ep = pdf.l_extendedprice.values
    rev_e4 = int(np.round(ep * (1 - pdf.l_discount.values) * 10000).astype("int64").sum())
    return {
        "l_orderkey": int(pdf.l_orderkey.values[0]),
        "revenue": rev_e4 / 10000.0,
        "n_lines": len(pdf),
        "top_line": int(pdf.l_linenumber.values[0]),
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


def run_loop():
    batcher = _ArrowResultBatcher(out_cols, arrow_schema, "prof")
    kdf, bounds = _group_bounds(pdf, ["l_orderkey"], contiguous=True)
    make = _group_frame_maker(pdf)
    n_out = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        out = batcher.add(per_order(make(a, b)))
        if out is not None:
            n_out += sum(x.num_rows for x in out)
    out = batcher.flush()
    if out is not None:
        n_out += sum(x.num_rows for x in out)
    return n_out


# warm
run_loop()
t0 = time.perf_counter()
n = run_loop()
el = time.perf_counter() - t0
print(f"rows={N} groups={n_orders} out={n} wall={el:.3f}s -> {el / n_orders * 1e6:.1f} us/group")

pr = cProfile.Profile()
pr.enable()
run_loop()
pr.disable()
stats = pstats.Stats(pr)
stats.sort_stats("cumulative").print_stats(25)
