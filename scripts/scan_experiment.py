"""q1/q3 cache-vs-native-scan experiment (r09 verdict task #2).

Question to close: is the q1/q3 ratio at sf1/sf10 an engine-plan problem
or an irreducible scan/format constant? The bench's warm_cache() serves
every scan from InMemoryColumnar; the sf1/sf10 inputs (DuckDB COPY) carry
~13-489 row groups, so a NATIVE parquet scan parallelizes across cores
too. This measures, in ONE fresh process per scale point:

  * q1/q3 wall with the native multi-row-group parquet scan (no cache)
  * q1/q3 wall with warm_cache (the bench posture)
  * DuckDB: the same oracle over read_parquet directly AND over a
    pre-materialized temp table (its "cache")
  * effective scan throughput GB/s for each posture

Usage: python scripts/scan_experiment.py /root/repo/.data/sf10
Prints one JSON line. Run in a quiet window (check load first).
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

QUERIES_UNDER_TEST = ("q1_pricing_summary", "q3_join_revenue_by_nation")


def _time(fn, passes: int = 3) -> dict:
    samples = []
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return {
        "min": round(min(samples), 3),
        "med": round(median(samples), 3),
        "max": round(max(samples), 3),
    }


def main(sf_dir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from fugue_spark.benchmarks import QUERIES, warm_cache
    from fugue_spark.session import get_spark, tune_for_input

    out: dict = {"sf_dir": sf_dir, "cpus": cpus}
    try:
        out["load_avg_start"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass

    li = os.path.join(sf_dir, "lineitem.parquet")
    li_gb = os.path.getsize(li) / 1e9
    import pyarrow.parquet as pq

    out["lineitem"] = {
        "gb": round(li_gb, 3),
        "row_groups": pq.ParquetFile(li).num_row_groups,
    }

    spark = get_spark(
        app_name="scan_experiment",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        spark__ui__enabled="false",
        spark__driver__memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )
    tune_for_input(spark, sf_dir)
    specs = [(n, QUERIES[n]) for n in QUERIES_UNDER_TEST]

    def run(spec):
        spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # ---- native parquet scan (no cache) ----
    for name, spec in specs:  # warm JIT/codegen + OS page cache (DuckDB
        run(spec)  # gets the same page-cache warmth)
    native = {n: _time(lambda s=s: run(s)) for n, s in specs}
    out["spark_native_scan"] = native

    # ---- warm_cache posture (the bench default) ----
    warm_cache(spark, sf_dir)
    for name, spec in specs:
        run(spec)
    cached = {n: _time(lambda s=s: run(s)) for n, s in specs}
    out["spark_cached"] = cached

    # ---- DuckDB, both postures ----
    import duckdb

    from fugue_spark.benchmarks import TABLES

    def duck_point(cached: bool) -> dict:
        con = duckdb.connect()
        con.execute(f"SET threads TO {cpus}")
        kind = "TEMP TABLE" if cached else "VIEW"
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE OR REPLACE {kind} {t} AS SELECT * FROM read_parquet('{p}')"
                )
        res = {}
        for name, spec in specs:
            con.execute(spec.oracle).fetchall()  # warm
            res[name] = _time(lambda q=spec.oracle: con.execute(q).fetchall())
        con.close()
        return res

    duck_native = duck_point(cached=False)
    out["duckdb_native_scan"] = duck_native
    duck_cached = duck_point(cached=True)
    out["duckdb_cached"] = duck_cached

    # ---- effective throughput on the scan-bound query (q1 = one pass
    # over lineitem) ----
    q1 = "q1_pricing_summary"
    out["q1_gbps"] = {
        "spark_native": round(li_gb / native[q1]["med"], 3),
        "spark_cached": round(li_gb / cached[q1]["med"], 3),
        "duckdb_native": round(li_gb / duck_native[q1]["med"], 3),
        "duckdb_cached": round(li_gb / duck_cached[q1]["med"], 3),
    }
    out["ratios_med"] = {
        n: {
            "native_vs_duck_native": round(
                native[n]["med"] / max(duck_native[n]["med"], 1e-9), 2
            ),
            "cached_vs_duck_cached": round(
                cached[n]["med"] / max(duck_cached[n]["med"], 1e-9), 2
            ),
            "best_vs_duck_best": round(
                min(native[n]["med"], cached[n]["med"])
                / max(min(duck_native[n]["med"], duck_cached[n]["med"]), 1e-9),
                2,
            ),
        }
        for n, _ in specs
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10")
