"""Benchmark harness: runs the bench-tagged headline queries and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32 → master local[N] + shuffle partitions).

Each query is forced with the noop sink (full computation, no result
materialization on the driver) — the honest wall-clock of the plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from fugue_spark.benchmarks import QUERIES, load_table
    from fugue_spark.session import get_spark

    spark = get_spark(
        app_name="fugue_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        spark__ui__enabled="false",
    )

    # warmup: JVM/codegen/arrow paths + input cache (the test parquet files
    # are single-row-group, which would serialize every scan onto one task)
    from fugue_spark.benchmarks import warm_cache

    warm_cache(spark, sf_dir)

    bench_specs = [(n, s) for n, s in QUERIES.items() if s.bench]
    # untimed warm pass: JIT/codegen/python-worker startup out of the timings
    for name, spec in bench_specs:
        try:
            spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001
            print(f"# warmup {name} failed: {ex}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, spec in bench_specs:
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    out = {
        "metric": "fugue_spark bench: wall-clock of headline queries (noop sink)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
