"""Partitioning-invariance battery: the same gate query must produce the
SAME rows (values, not just counts) no matter how many shuffle partitions
the session uses or how the input arrives partitioned.

This is the local, testable form of the 100-TB claim: a 1000-executor
cluster differs from local[4] exactly in partition counts and input
splits. Operators whose results drift with partitioning (float summation
order, per-partition RNG, head-without-order) are the class of bug this
catches — the engine's posture (integer-scaled money sums, content-hash
sampling, explicit presort everywhere order matters) exists to make this
battery pass by construction.

Deliberately NOT here: q19_sample_seeded — Spark's Bernoulli sample is
seeded per partition, so its row SET is partition-dependent by design
(documented in SURVEY/SCALE; the deterministic alternative p18 IS here).
"""

from __future__ import annotations

import pytest

GATES = [
    # relational: agg / join / window / setops / cube
    "q1_pricing_summary",
    "q3_join_revenue_by_nation",
    "q6_topk_per_customer",
    "q7_setops_brands",
    "q15_cube_rollup",
    # map engine: pandas path, compiled path, cotransform
    "q11_transform_per_order",
    "q22_transform_compiled",
    "q12_cotransform_order_lines",
    # pipeline: dedup family, packing, sampling, tfidf, asof, rollup
    "p4_dedup_exact",
    "p5_ngram_jaccard_pairs",
    "p6_minhash_lsh_pairs",
    "p16_sequence_packing",
    "p19_sequence_packing_global",
    "p18_hash_sample",
    "p42_temperature_mix",
    "p43_mixture_budgets",
    "p24_tfidf_scores",
    "p30_asof_join",
    "p32_time_rollup",
    "p41_budget_selection",
    # embedding dedup: centroid assignment + prefix filter must not
    # depend on how rows arrive partitioned
    "p45_semantic_dedup",
]


def _run(spark, name: str, sf_dir: str, num_partitions: int):
    from fugue_spark.testing import normalize

    import __spark_entry__ as entry

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    try:
        return normalize(entry.queries()[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", GATES)
def test_shuffle_partition_count_invariance(spark, sf_dir, name):
    # 1 partition = the degenerate serial plan; 7 = odd/co-prime with the
    # 4-core session so group-to-task placement is maximally different
    assert _run(spark, name, sf_dir, 1) == _run(spark, name, sf_dir, 7)


def test_input_layout_invariance(spark, sf_dir):
    """Same rows arriving as 1 partition vs 13 random slices must not
    change a hierarchical global-order result (the operator whose serial
    state — per-shard offsets — most depends on layout)."""
    from pyspark.sql import functions as F

    from fugue_spark.benchmarks import load_table
    from fugue_spark.pipeline import select_until_budget
    from fugue_spark.testing import normalize

    # order key is total (contract: ties at range-shard boundaries have
    # engine-arbitrary relative order) but deliberately NOT the storage
    # order — doc_id rides along as the unique low digits
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        ((F.col("doc_id") % 97) * 1000000 + F.col("doc_id")).alias("ord"),
    )
    outs = []
    for layout in (docs.coalesce(1), docs.repartition(13)):
        out = select_until_budget(
            layout, budget=20_000, size_col="n_chars", order_by="ord"
        )
        outs.append(normalize(out.toPandas()))
    assert outs[0] == outs[1]
