"""``to_df`` — ingest anything into a Spark DataFrame with an optional
schema cast (reference: execution_engine.py:94 to_df; the Spark impl's
special paths — arrow for nulls-in-int, dict conversion for map types —
collapse into Spark's own Arrow ingestion here).

Accepted: Spark DataFrame (cast if schema given), pandas DataFrame,
pyarrow Table, list-of-lists / list-of-dicts / list of Rows (+ schema
required for lists), another engine's object exposing ``to_pandas``/
``toPandas``.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from fugue_spark.schema import parse_schema

__all__ = ["to_df"]


def _cast_to(df: DataFrame, schema) -> DataFrame:
    target = parse_schema(schema)
    cur = {f.name: f.dataType for f in df.schema.fields}
    if [f.name for f in target.fields] != df.columns or any(
        cur[f.name] != f.dataType for f in target.fields if f.name in cur
    ):
        from pyspark.sql import functions as F

        cols = []
        for f in target.fields:
            if f.name not in cur:
                raise ValueError(f"column {f.name!r} not in input {df.columns}")
            c = F.col("`" + f.name.replace("`", "``") + "`")
            cols.append(c.cast(f.dataType).alias(f.name) if cur[f.name] != f.dataType else c)
        df = df.select(*cols)
    return df


def to_df(spark: SparkSession, data: Any, schema: Any = None) -> DataFrame:
    if isinstance(data, DataFrame):
        return _cast_to(data, schema) if schema is not None else data
    if isinstance(data, pa.Table):
        data = data.to_pandas()
    if isinstance(data, pd.DataFrame):
        if schema is not None:
            return spark.createDataFrame(data, schema=parse_schema(schema))
        return spark.createDataFrame(data)
    if hasattr(data, "toPandas"):
        return to_df(spark, data.toPandas(), schema)
    if hasattr(data, "to_pandas"):
        return to_df(spark, data.to_pandas(), schema)
    if isinstance(data, (list, tuple)):
        if schema is None:
            raise ValueError("list input requires a schema")
        st = parse_schema(schema)
        if len(data) > 0 and isinstance(data[0], dict):
            data = [[row.get(f.name) for f in st.fields] for row in data]
        return spark.createDataFrame(list(data), st)
    raise ValueError(f"cannot ingest {type(data)} as a dataframe")
