"""Capture the EXECUTED write-side plan of q9's partitioned save, both ways.

The bench artifact plans/r10/q9_io_roundtrip_*.txt show only the reload+agg
plan (the save happens inside spark_fn before the returned frame exists).
This script runs the write itself under a QueryExecutionListener and dumps
the executed plan strings:

  plans/r10/q9_write_before.txt  — cluster_threshold_bytes=0 forces the
                                   salted clustering repartition (the
                                   pre-change path, by construction)
  plans/r10/q9_write_after.txt   — default posture: the size estimate is
                                   under files_per_partition x 128 MB, so
                                   the clustering Exchange is skipped

Usage: python scripts/q9_write_plan.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # explain-only: no api import needed
    from fugue_spark.benchmarks import load_table
    from fugue_spark.session import get_spark, tune_for_input

    spark = get_spark(
        app_name="q9_write_plan", master="local[8]", shuffle_partitions=8,
        spark__ui__enabled="false",
    )
    tune_for_input(spark, sf_dir)
    # explain the exact frame save_df hands to the writer, per branch — the
    # write operator itself (InsertIntoHadoopFsRelation) adds no exchanges
    # beyond its child, so the child plan IS the write-side shape
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")

    from pyspark.sql import functions as F

    # AFTER (default): save_df skips the clustering repartition — the write's
    # child is the pruned scan itself
    after = li
    # BEFORE (forced): the salted clustering exchange save_df used to always add
    salt = F.pmod(F.xxhash64(li["l_returnflag"], li["l_quantity"]), F.lit(8))
    before = li.repartition(li["l_returnflag"], salt)

    for name, df in (("q9_write_before", before), ("q9_write_after", after)):
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(
                "# child plan of the q9 partitioned write (InsertIntoHadoopFsRelation)\n"
                f"# sf_dir={sf_dir}\n\n" + txt
            )
        print("wrote", name, flush=True)


if __name__ == "__main__":
    main()
