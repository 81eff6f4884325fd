"""Interleaved A/B: verify-side candidate-id prefilter (r10 resumed session)
vs the prior full-index verify joins, on p6 (minhash_lsh_pairs) and p38
(minhash_lsh_pairs_against). Alternates OLD and NEW in one session so both
arms see the same box weather; min/median per arm.

Usage: python scripts/ab_verify_prefilter.py {p6,p38} [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def old_verified_pair_counts(cands, ex_a, ex_b, left="id_a", right="id_b",
                             prefilter_max_pairs=None):
    """The pre-change verify: joins against the full index(es)."""
    return (
        cands.join(ex_a.select(F.col("id").alias(left), "g"), on=left)
        .join(ex_b.select(F.col("id").alias(right), "g"), on=[right, "g"])
        .groupBy(left, right)
        .agg(F.count(F.lit(1)).alias("shared_c"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["p6", "p38"])
    ap.add_argument("--sf", default="/root/repo/.data/sf10")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from fugue_spark.benchmarks import QUERIES, warm_cache
    from fugue_spark.pipeline import dedup
    from fugue_spark.session import get_spark, tune_for_input

    spark = get_spark(
        app_name="ab_verify_prefilter", master="local[32]", shuffle_partitions=32,
        spark__ui__enabled="false", spark__driver__memory="48g",
        spark__ui__showConsoleProgress="false",
    )
    tune_for_input(spark, args.sf)
    warm_cache(spark, args.sf)
    print(f"# load_avg {os.getloadavg()}", flush=True)

    new_fn = dedup._verified_pair_counts
    qname = {"p6": "p6_minhash_lsh_pairs", "p38": "p38_cross_corpus_neardup"}[args.which]
    spec = QUERIES[qname]

    def run(arm: str) -> float:
        dedup._verified_pair_counts = old_verified_pair_counts if arm == "old" else new_fn
        t0 = time.perf_counter()
        spec.spark_fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("old"), run("new")  # warm both arms
    olds, news = [], []
    for rnd in range(args.rounds):
        olds.append(run("old"))
        news.append(run("new"))
        print(f"# r{rnd}: old {olds[-1]:.2f}s new {news[-1]:.2f}s", flush=True)
    dedup._verified_pair_counts = new_fn
    print(f"OLD  min {min(olds):7.3f} med {median(olds):7.3f}  all {[round(s,2) for s in olds]}")
    print(f"NEW  min {min(news):7.3f} med {median(news):7.3f}  all {[round(s,2) for s in news]}")


if __name__ == "__main__":
    main()
