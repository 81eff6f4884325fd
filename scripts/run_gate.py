"""Local mirror of the driver's correctness gate over the FULL registry.

The driver's per-round checker walks ``queries()`` under a budget and has
truncated before the end of the registry in past rounds (r04: 39/48,
r05: 50/57). This script runs every registered query against its DuckDB
oracle at sf0.01 and writes ``GATE_FULL_r{N}.json`` in the same row format
(rows/schema/hash matches), so the registry tail always has a current,
committed correctness record even when the driver's run stops early.

Usage: python scripts/run_gate.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "X"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as e
    from fugue_spark.session import get_spark
    from fugue_spark.testing import normalize, run_oracle

    spark = get_spark(
        app_name="run_gate", master="local[8]", shuffle_partitions=8,
        spark__ui__enabled="false",
    )
    from fugue_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)  # sf0.01 is tiny: AQE off, byte-sized parts
    qs, osql = e.queries(), e.oracle_sql()
    out: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in qs.items():
        row: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(sdf)
            if name not in osql:
                row["err"] = "no_oracle"
            else:
                odf = run_oracle(osql[name], sf_dir)
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(sdf) == len(odf)
                row["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                row["hash_match"] = normalize(sdf) == normalize(odf)
        except Exception as ex:  # noqa: BLE001
            row["err"] = f"{type(ex).__name__}: {ex}"[:300]
        out[name] = row
        state = "GREEN" if row["hash_match"] else (row["err"] or "FAIL")
        print(f"{name:45s} {state}", file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"GATE_FULL_r{rnd}.json",
    )
    with open(path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "total_sec": round(time.time() - t_all, 1), "results": out},
            f, indent=1,
        )
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
