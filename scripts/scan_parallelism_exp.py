"""Measure the effect of a scan-parallelism floor (spark.sql.files.minPartitionNum)
on the scan-bound bench queries at a given scale point.

Usage: python scripts/scan_parallelism_exp.py [sf_dir] [q1,q3,...] [minPartitionNum]

Runs each query N times with the session default (no floor) and with
minPartitionNum=<cores>, printing medians side by side. Fresh-process so
session wear cannot contaminate the comparison.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fugue_spark.benchmarks import QUERIES, warm_cache
from fugue_spark.session import get_spark, tune_for_input


def time_query(spark, spec, sf_dir, passes=3):
    spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), ts


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"
    names = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["q1_pricing_summary", "q3_join_revenue_by_nation", "q9_io_roundtrip"]
    )
    floor = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(
        app_name="scan_parallelism_exp",
        master="local[32]",
        shuffle_partitions=32,
        spark__ui__enabled="false",
        spark__driver__memory="48g",
    )
    tune_for_input(spark, sf_dir)
    warm_cache(spark, sf_dir)
    for qname in names:
        spec = QUERIES[qname]
        spark.conf.unset("spark.sql.files.minPartitionNum")
        med0, ts0 = time_query(spark, spec, sf_dir)
        spark.conf.set("spark.sql.files.minPartitionNum", str(floor))
        med1, ts1 = time_query(spark, spec, sf_dir)
        print(
            f"{qname}: default={med0:.3f}s {[round(t,3) for t in ts0]}"
            f" | floor{floor}={med1:.3f}s {[round(t,3) for t in ts1]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
