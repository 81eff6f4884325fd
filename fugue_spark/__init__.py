"""fugue_spark — a PySpark-native analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
Fugue abstraction layer (reference: fugue-project/fugue), re-expressed
directly on ``pyspark.sql``: DataFrame/SQL plans that Catalyst optimizes,
pandas-UDF execution for user map functions, plus large-scale data-pipeline
operators (dedup, similarity search, text analysis) the reference lacks.
"""

from fugue_spark.schema import (
    apply_schema_hint,
    parse_schema,
    parse_type,
    schema_to_string,
    type_to_string,
)
from fugue_spark.session import get_spark

__version__ = "0.1.0"
