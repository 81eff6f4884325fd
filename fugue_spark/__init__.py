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


def __getattr__(name):  # lazy heavy imports (keep `import fugue_spark` light)
    if name in ("transform", "out_transform", "Transformer", "PartitionCursor"):
        import fugue_spark.transform as _t

        return getattr(_t, name)
    if name == "cotransform":
        from fugue_spark.cotransform import cotransform

        return cotransform
    if name in ("fsql", "register_extension"):
        import fugue_spark.sql as _s

        return getattr(_s, name)
    if name == "to_df":
        from fugue_spark.ingest import to_df

        return to_df
    if name in (
        # extension decorators + class forms + DataFrames container
        # (reference top-level surface: fugue/__init__.py)
        "DataFrames",
        "CoTransformer",
        "OutputTransformer",
        "OutputCoTransformer",
        "Creator",
        "Processor",
        "Outputter",
        "transformer",
        "cotransformer",
        "output_transformer",
        "output_cotransformer",
        "creator",
        "processor",
        "outputter",
        "module",
        "register_transformer",
        "register_output_transformer",
        "register_creator",
        "register_processor",
        "register_outputter",
    ):
        import fugue_spark.extensions as _e

        return getattr(_e, name)
    if name in (
        "RPCServer",
        "RPCClient",
        "RPCHandler",
        "EmptyRPCHandler",
        "to_rpc_handler",
        "make_rpc_server",
    ):
        import fugue_spark.rpc as _r

        return getattr(_r, name)
    if name == "as_fugue_dataset":
        from fugue_spark.api import as_fugue_dataset

        return as_fugue_dataset
    if name == "DataFrame":
        # this engine's DataFrame IS Spark's (reference: the abstract
        # fugue.DataFrame — single-engine build re-exports the native one)
        from pyspark.sql import DataFrame

        return DataFrame
    if name in ("AnyDataFrame", "AnyDataset"):
        import pandas as _pd
        import pyarrow as _pa
        from pyspark.sql import DataFrame as _SDF

        from typing import Union

        return Union[_SDF, _pd.DataFrame, _pa.Table]
    if name == "Schema":
        # reference fugue.Schema (triad) — the constructor use
        # ``Schema("a:int,b:str")`` maps to parse_schema → StructType
        from fugue_spark.schema import parse_schema

        return parse_schema
    if name == "make_execution_engine":
        # reference make_execution_engine → this engine's session
        # resolution order (session factory / engine_context / global)
        from fugue_spark.context import current_spark

        return current_spark
    if name in ("engine_context", "current_spark", "raw_sql"):
        import fugue_spark.context as _c

        return getattr(_c, name)
    if name == "PartitionSpec":
        from fugue_spark.partition import PartitionSpec

        return PartitionSpec
    if name in (
        "FugueWorkflow",
        "WorkflowDataFrame",
        "WorkflowDataFrames",
        "FugueSQLWorkflow",
        "FugueWorkflowError",
    ):
        import fugue_spark.dag as _d

        return getattr(_d, name)
    raise AttributeError(name)


__version__ = "0.1.0"


def _jupyter_nbextension_paths():
    """Classic-notebook extension discovery hook (reference:
    fugue_notebook/__init__.py + nbextension/ — installed via
    ``jupyter nbextension install --py fugue_spark [--user]`` then
    ``jupyter nbextension enable fugue_spark/main``)."""
    return [
        {
            "section": "notebook",
            "src": "nbextension",
            "dest": "fugue_spark",
            "require": "fugue_spark/main",
        }
    ]
