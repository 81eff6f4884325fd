"""Time a set of queries: median of N timed passes each (after one warm pass).

Usage: python scripts/time_queries.py [sf_dir] [q1,q2,...] [passes]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fugue_spark.session import get_spark, tune_for_input
from fugue_spark.benchmarks import QUERIES, warm_cache


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
    names = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["q11_transform_per_order", "q12_cotransform_order_lines"]
    )
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(
        app_name="time_queries",
        master="local[32]",
        shuffle_partitions=32,
        spark__ui__enabled="false",
        spark__driver__memory="48g",
    )
    tune_for_input(spark, sf_dir)  # same conf posture as bench.py
    warm_cache(spark, sf_dir)
    for qname in names:
        spec = QUERIES[qname]
        spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            f"## {qname}: median {statistics.median(ts):.2f}s  passes {[f'{t:.2f}' for t in ts]}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
