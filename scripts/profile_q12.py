"""Profile q12 (cotransform) at sf1 with the PySpark UDF profiler.

Usage: python scripts/profile_q12.py [sf_dir] [q]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fugue_spark.session import get_spark
from fugue_spark.benchmarks import QUERIES, warm_cache


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"
    qname = sys.argv[2] if len(sys.argv) > 2 else "q12_cotransform_order_lines"
    profile = os.environ.get("PROFILE", "1") == "1"
    spark = get_spark(
        app_name="profile_q12",
        master="local[32]",
        shuffle_partitions=32,
        spark__ui__enabled="false",
        spark__driver__memory="48g",
    )
    if profile:
        spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")
    warm_cache(spark, sf_dir)
    spec = QUERIES[qname]
    # warm
    spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"## {qname} @ {sf_dir}: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    if profile:
        spark.profile.show(type="perf")


if __name__ == "__main__":
    main()
