"""Expression-level decomposition experiments (r10 measurement phase).

Times equivalent-or-ablated variants of the hot per-row expressions so the
optimization targets the measured term, not a guess:

  q1   — round(x*scale, 0) money sums: as-is vs floor(x*scale+0.5) vs no-round
  q22  — compiled agg: as-is (SortAggregate via max_by-struct) vs the same
         sums without top_line (pure HashAggregate) vs single-key max_by
  p1   — size(regexp_extract_all) vs regexp_count vs split-based counting
  p2   — regex char-class counts vs translate()-based counts

Each variant runs through the noop sink, min-of-N reported (this box swings
2-5x on identical work; min is the robust statistic for plan comparison).

Usage: python scripts/expr_variants.py <experiment> [--sf DIR] [--passes N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _time(df, label, passes):
    df.write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(passes):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    print(f"{label:45s} min {min(samples):7.3f}  all {[round(s,2) for s in samples]}",
          flush=True)


def q1_variants(spark, sf_dir, passes):
    from fugue_spark.benchmarks import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    gb = ["l_returnflag", "l_linestatus"]

    def agg_round(c, s):
        return F.sum(F.round(c * s, 0).cast("long"))

    def agg_floor(c, s):
        return F.sum(F.floor(c * s + F.lit(0.5)).cast("long"))

    def agg_none(c, s):
        return F.sum((c * s).cast("long"))

    def agg_guarded(c, s):
        # the compile.py astype lowering: exact-frac HALF_UP with a
        # round() fallback outside the exactness envelope
        chd = c * s
        fl = F.floor(chd)
        half_up = fl + ((chd - fl) >= F.lit(0.5)).cast("long")
        return F.sum(
            F.when(F.isnan(chd) | (F.abs(chd) > F.lit(2.0**51)),
                   F.round(chd, 0).cast("long")).otherwise(half_up)
        )

    for name, fn in (("round(x*s,0)", agg_round), ("floor(x*s+0.5)", agg_floor),
                     ("guarded exact-frac (compile form)", agg_guarded),
                     ("cast-only (ablation)", agg_none)):
        df = li.groupBy(*gb).agg(
            fn(F.col("l_extendedprice"), 100).alias("a"),
            fn(disc, 10000).alias("b"),
            fn(charge, 1000000).alias("c"),
            fn(F.col("l_discount"), 100).alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        _time(df, f"q1 {name}", passes)
    # scan+filter floor (no aggregation exprs at all)
    _time(li.groupBy(*gb).agg(F.count(F.lit(1)).alias("n")), "q1 count-only floor", passes)


def q22_variants(spark, sf_dir, passes):
    from fugue_spark.benchmarks import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_linenumber", "l_quantity"
    )
    rev = F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long"))
    full = li.groupBy("l_orderkey").agg(
        (rev.cast("double") / 10000).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        F.max_by("l_linenumber", F.struct(F.col("l_quantity"), -F.col("l_linenumber"))).alias("top_line"),
    )
    _time(full, "q22 max_by(struct) [SortAggregate]", passes)
    nohash = li.groupBy("l_orderkey").agg(
        (rev.cast("double") / 10000).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    _time(nohash, "q22 sans top_line [HashAggregate]", passes)
    single = li.groupBy("l_orderkey").agg(
        (rev.cast("double") / 10000).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        F.max_by("l_linenumber", F.col("l_quantity")).alias("top_line_approx"),
    )
    _time(single, "q22 max_by(single) [timing only]", passes)
    print("# plans:", file=sys.stderr)
    for nm, d in (("struct", full), ("single", single)):
        line = [l for l in d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "simple").split("\n") if "Aggregate" in l][:2]
        print(f"#  {nm}: {line}", file=sys.stderr)


def p1_variants(spark, sf_dir, passes):
    from fugue_spark.benchmarks import load_table
    from fugue_spark.pipeline.text import _BPE_TOKEN_RE

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    ws_split = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    _time(docs.select("doc_id", ws_split.alias("ws"),
                      F.size(F.regexp_extract_all(t, F.lit(_BPE_TOKEN_RE), 0)).alias("bpe")),
          "p1 size(regexp_extract_all)", passes)
    _time(docs.select("doc_id", ws_split.alias("ws"),
                      F.regexp_count(t, F.lit(_BPE_TOKEN_RE)).alias("bpe")),
          "p1 regexp_count", passes)
    _time(docs.select("doc_id", ws_split.alias("ws")), "p1 ws-only (ablation)", passes)
    # split form: #alpha-runs + #digit-runs (two simple regexes) + #other
    # non-space chars (translate length arithmetic) — equals the 3-way
    # alternation count exactly (alternation matches maximal runs of each
    # class; every other non-space char matches alone)
    t2 = F.col("text")
    n = F.length(t2)
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    c_alpha = n - F.length(F.translate(t2, letters, ""))
    c_digit = n - F.length(F.translate(t2, "0123456789", ""))
    c_ws = n - F.length(F.translate(t2, " \t\n\x0b\f\r", ""))
    bpe_split = (
        F.regexp_count(t2, F.lit(r"[A-Za-z]+"))
        + F.regexp_count(t2, F.lit(r"[0-9]+"))
        + (n - c_alpha - c_digit - c_ws)
    )
    _time(docs.select("doc_id", ws_split.alias("ws"), bpe_split.alias("bpe")),
          "p1 split-class runs + translate", passes)


def p2_variants(spark, sf_dir, passes):
    from fugue_spark.benchmarks import load_table
    from fugue_spark.pipeline.text import _WORD_RE, _STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    stop_pat = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    base = {
        "n_words": F.size(F.regexp_extract_all(t, F.lit(_WORD_RE), 0)),
        "word_chars": F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]"), 0)),
        "n_punct": F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0)),
        "n_stop": F.size(F.regexp_extract_all(F.lower(t), F.lit(stop_pat), 0)),
    }
    _time(docs.select("doc_id", *[v.alias(k) for k, v in base.items()]),
          "p2 size(regexp_extract_all) x4", passes)
    cnt = {
        "n_words": F.regexp_count(t, F.lit(_WORD_RE)),
        "word_chars": F.regexp_count(t, F.lit(r"[A-Za-z]")),
        "n_punct": F.regexp_count(t, F.lit(r"[.,;:!?]")),
        "n_stop": F.regexp_count(F.lower(t), F.lit(stop_pat)),
    }
    _time(docs.select("doc_id", *[v.alias(k) for k, v in cnt.items()]),
          "p2 regexp_count x4", passes)
    tr = {
        "n_words": F.regexp_count(t, F.lit(_WORD_RE)),
        "word_chars": F.length(t) - F.length(F.translate(t, letters, "")),
        "n_punct": F.length(t) - F.length(F.translate(t, ".,;:!?", "")),
        "n_stop": F.regexp_count(F.lower(t), F.lit(stop_pat)),
    }
    _time(docs.select("doc_id", *[v.alias(k) for k, v in tr.items()]),
          "p2 translate for char classes", passes)


EXPERIMENTS = {"q1": q1_variants, "q22": q22_variants, "p1": p1_variants, "p2": p2_variants}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("experiments", nargs="+", choices=sorted(EXPERIMENTS))
    ap.add_argument("--sf", default="/root/repo/.data/sf10")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from fugue_spark.benchmarks import warm_cache
    from fugue_spark.session import get_spark, tune_for_input

    spark = get_spark(
        app_name="expr_variants", master="local[32]", shuffle_partitions=32,
        spark__ui__enabled="false", spark__driver__memory="48g",
    )
    tune_for_input(spark, args.sf)
    warm_cache(spark, args.sf)
    for ex in args.experiments:
        EXPERIMENTS[ex](spark, args.sf, args.passes)


if __name__ == "__main__":
    main()
