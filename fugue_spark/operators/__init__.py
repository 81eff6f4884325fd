"""Engine primitives (SURVEY.md §2.1) — each a thin, well-specified wrapper
whose physical execution is Catalyst's problem."""

from fugue_spark.operators.asof import asof_join
from fugue_spark.operators.rangejoin import range_join
from fugue_spark.operators.joins import broadcast, join, salted_join
from fugue_spark.operators.na import dropna, fillna
from fugue_spark.operators.sampling import (
    hash_sample,
    hash_sample_stratified,
    sample_per_key,
    sample,
    take,
    temperature_mix,
    weighted_hash_sample,
)
from fugue_spark.operators.select import aggregate, assign, filter, select
from fugue_spark.operators.setops import distinct, intersect, subtract, union

__all__ = [
    "asof_join",
    "range_join",
    "join",
    "broadcast",
    "salted_join",
    "union",
    "subtract",
    "intersect",
    "distinct",
    "dropna",
    "fillna",
    "sample",
    "take",
    "select",
    "filter",
    "assign",
    "aggregate",
]
