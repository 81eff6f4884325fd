"""Micro-bench for bisecting map-engine perf: run selected bench queries at a
given sf dir, with optional conf overrides, print per-query medians.

Usage: python scripts/microbench.py q11_transform_per_order q12_cotransform_order_lines \
         [--sf /root/repo/.data/sf1] [--passes 3] [--conf k=v ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/repo/.data/sf1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    from fugue_spark.benchmarks import QUERIES, warm_cache
    from fugue_spark.session import get_spark

    conf = {}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        conf[k.replace(".", "__")] = v
    spark = get_spark(
        app_name="microbench",
        master="local[32]",
        shuffle_partitions=32,
        spark__ui__enabled="false",
        spark__driver__memory="48g",
        **conf,
    )
    warm_cache(spark, args.sf)
    out = {}
    for name in args.queries:
        spec = QUERIES[name]
        spec.spark_fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            spec.spark_fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(median(samples), 3)
        print(f"{name}: median {out[name]}s of {[round(s,3) for s in samples]}", flush=True)
    print(out)


if __name__ == "__main__":
    main()
