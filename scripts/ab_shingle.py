"""Interleaved A/B: old (inline explode) vs new (array-ckpt) _shingle_index.

The box swings 2-16x on identical work, so sequential before/after runs are
unadjudicable; this alternates OLD and NEW builds of the SAME query in one
session (A B A B A B ...) so both see the same weather, and reports
min/median per arm.

Usage: python scripts/ab_shingle.py {p5,p6} [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["p5", "p6"])
    ap.add_argument("--sf", default="/root/repo/.data/sf10")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from fugue_spark.benchmarks import load_table, warm_cache
    from fugue_spark.pipeline import dedup
    from fugue_spark.session import get_spark, tune_for_input

    spark = get_spark(
        app_name="ab_shingle", master="local[32]", shuffle_partitions=32,
        spark__ui__enabled="false", spark__driver__memory="48g",
    )
    tune_for_input(spark, args.sf)
    warm_cache(spark, args.sf)
    print(f"# load_avg {os.getloadavg()}", flush=True)

    new_index = dedup._shingle_index

    def old_index(df, n, text_col, id_col, with_size=False):
        base = df.select(
            F.col(id_col).alias("id"), dedup._shingles(text_col, n).alias("__gr__")
        )
        if with_size:
            return base.select(
                "id", F.size("__gr__").alias("n_sh"), F.explode("__gr__").alias("g")
            )
        return base.select("id", F.explode("__gr__").alias("g"))

    docs = load_table(spark, args.sf, "documents")

    def run(arm):
        dedup._shingle_index = old_index if arm == "old" else new_index
        t0 = time.perf_counter()
        if args.which == "p5":
            out = dedup.ngram_jaccard_pairs(docs, threshold=0.5, n=3)
        else:
            out = dedup.minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64,
                                          bands=16, n=3)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
        return dt

    # warm both arms once (JIT/codegen)
    run("old"); run("new")
    res = {"old": [], "new": []}
    for i in range(args.rounds):
        for arm in ("old", "new"):
            dt = run(arm)
            res[arm].append(dt)
            print(f"round {i} {arm:3s} {dt:7.2f}s  load {os.getloadavg()[0]:.1f}",
                  flush=True)
    for arm in ("old", "new"):
        s = res[arm]
        print(f"{arm}: min {min(s):.2f} med {median(s):.2f} all {[round(x,2) for x in s]}",
              flush=True)


if __name__ == "__main__":
    main()
