"""Ablate the shingling expression (the dominant phase of p5/p6 at sf10).

Variants of _shingle_index's per-row work, timed through the noop sink at a
given sf dir with the bench's warm-cache posture. min-of-N reported.

Usage: python scripts/shingle_variants.py [--sf DIR] [--passes N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _time(df, label, passes):
    df.write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(passes):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    print(f"{label:52s} min {min(samples):7.3f}  all {[round(s, 2) for s in samples]}",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.data/sf10")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from fugue_spark.benchmarks import load_table, warm_cache
    from fugue_spark.session import get_spark, tune_for_input

    spark = get_spark(
        app_name="shingle_variants", master="local[32]", shuffle_partitions=32,
        spark__ui__enabled="false", spark__driver__memory="48g",
    )
    tune_for_input(spark, args.sf)
    warm_cache(spark, args.sf)
    print(f"# load_avg {os.getloadavg()}", flush=True)

    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    n = 3

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    words = F.split(norm, " ")
    words_direct = F.split(F.lower(F.trim(F.col("text"))), r"\s+")

    # v1: normalize only
    _time(docs.select("doc_id", F.length(norm).alias("x")),
          "v1 normalize (regexp_replace) only", args.passes)
    # v2: + split on single space
    _time(docs.select("doc_id", F.size(words).alias("x")),
          "v2 normalize + split(' ')", args.passes)
    # v2b: split on regex directly (one regex pass)
    _time(docs.select("doc_id", F.size(words_direct).alias("x")),
          "v2b split(lower(trim), '\\\\s+') direct", args.passes)

    def rest(w):
        hw = F.transform(w, lambda t: F.xxhash64(t))
        k = F.size(w) - (n - 1)
        zipped = F.arrays_zip(*[F.slice(hw, j + 1, k) for j in range(n)])
        grams = F.when(
            k >= 1,
            F.array_distinct(
                F.transform(zipped, lambda s: F.xxhash64(*[s[str(j)] for j in range(n)]))
            ),
        ).otherwise(F.array().cast("array<long>"))
        return grams

    def rest_nodistinct(w):
        hw = F.transform(w, lambda t: F.xxhash64(t))
        k = F.size(w) - (n - 1)
        zipped = F.arrays_zip(*[F.slice(hw, j + 1, k) for j in range(n)])
        grams = F.when(
            k >= 1,
            F.transform(zipped, lambda s: F.xxhash64(*[s[str(j)] for j in range(n)])),
        ).otherwise(F.array().cast("array<long>"))
        return grams

    # v3: + word hashes only
    _time(docs.select("doc_id",
                      F.transform(words, lambda t: F.xxhash64(t)).alias("hw")),
          "v3 + xxhash64 per word", args.passes)
    # v4: full pipeline, no distinct, no explode
    _time(docs.select("doc_id", rest_nodistinct(words).alias("g")),
          "v4 full grams (no distinct, no explode)", args.passes)
    # v5: full grams with distinct, no explode
    _time(docs.select("doc_id", rest(words).alias("g")),
          "v5 full grams + array_distinct (no explode)", args.passes)
    # v6: current production: distinct + explode (with n_sh)
    base = docs.select(F.col("doc_id").alias("id"), rest(words).alias("__gr__"))
    _time(base.select("id", F.size("__gr__").alias("n_sh"),
                      F.explode("__gr__").alias("g")),
          "v6 current: distinct + explode + n_sh", args.passes)
    # v7: same but words from direct regex split
    base7 = docs.select(F.col("doc_id").alias("id"), rest(words_direct).alias("__gr__"))
    _time(base7.select("id", F.size("__gr__").alias("n_sh"),
                       F.explode("__gr__").alias("g")),
          "v7 v6 with direct regex split", args.passes)
    # v8: explode structs first, hash per row (codegen), no in-doc distinct
    hw = F.transform(words_direct, lambda t: F.xxhash64(t))
    k = F.size(words_direct) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(hw, j + 1, k) for j in range(n)])
    ex8 = (docs.select(F.col("doc_id").alias("id"), F.explode(zipped).alias("s"))
               .select("id", F.xxhash64(F.col("s.0"), F.col("s.1"), F.col("s.2")).alias("g")))
    _time(ex8, "v8 explode structs, row-level gram hash", args.passes)

    # v6b: p6's actual index shape — explode(distinct grams), NO n_sh column
    _time(base.select("id", F.explode("__gr__").alias("g")),
          "v6b explode distinct grams (no n_sh)", args.passes)

    # v9: struct-carrying explode — one generator expression yields (g, n_sh)
    gr9 = rest(words_direct)
    st9 = F.transform(gr9, lambda x: F.struct(x.alias("g"), F.size(gr9).alias("n_sh")))
    ex9 = (docs.select(F.col("doc_id").alias("id"), F.explode(st9).alias("s"))
               .select("id", F.col("s.n_sh").alias("n_sh"), F.col("s.g").alias("g")))
    _time(ex9, "v9 struct-carrying explode (g, n_sh)", args.passes)

    # v10: materialize the gram array through an exchange barrier, THEN
    # size+explode — the array is computed once, written as UnsafeRow, and
    # the explode reads the stored value
    b10 = (docs.select(F.col("doc_id").alias("id"), rest(words_direct).alias("__gr__"))
               .repartition(32, "id"))
    _time(b10.select("id", F.size("__gr__").alias("n_sh"),
                     F.explode("__gr__").alias("g")),
          "v10 exchange barrier then size+explode", args.passes)

    # v10b: same barrier via localCheckpoint instead of an exchange
    b10b = (docs.select(F.col("doc_id").alias("id"), rest(words_direct).alias("__gr__"))
                .localCheckpoint(eager=False))
    _time(b10b.select("id", F.size("__gr__").alias("n_sh"),
                      F.explode("__gr__").alias("g")),
          "v10b ckpt barrier then size+explode", args.passes)

    # v8d: v8 + local dedup agg riding an id exchange (p6 candidate shape)
    _time(ex8.repartition(32, "id").groupBy("id", "g").agg(F.count(F.lit(1)).alias("c")),
          "v8d v8 + repartition(id) + local (id,g) dedup", args.passes)


if __name__ == "__main__":
    main()
