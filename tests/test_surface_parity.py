"""API-surface parity guards.

Snapshots of the reference's public export lists (so the check runs
without the reference checkout): ``fugue/api.py`` (all 66 names must
exist on ``fugue_spark.api``) and ``fugue/__init__.py`` (every name must
either exist on ``fugue_spark`` or be in the DOCUMENTED out-of-scope set
— SURVEY §7 / COVERAGE.md: the multi-backend dataframe zoo, engine
registry, and Bag are deliberately replaced by Spark itself)."""

from __future__ import annotations

# reference fugue/api.py exports (fugue-project/fugue @ the studied rev)
FUGUE_API_EXPORTS = [
    "aggregate", "alter_columns", "anti_join", "as_array",
    "as_array_iterable", "as_arrow", "as_dict_iterable", "as_dicts",
    "as_fugue_dataset", "as_fugue_df", "as_fugue_engine_df", "as_local",
    "as_local_bounded", "as_pandas", "as_spark", "assign", "broadcast",
    "count", "cross_join", "distinct", "drop_columns", "dropna",
    "engine_context", "fillna", "filter", "full_outer_join",
    "fugue_sql", "fugue_sql_flow", "get_column_names",
    "get_current_conf", "get_current_parallelism", "get_native_as_df",
    "get_num_partitions", "get_schema", "head", "inner_join",
    "intersect", "is_bounded", "is_df", "is_empty", "is_local",
    "join", "left_outer_join", "load", "normalize_column_names",
    "out_transform", "peek_array", "peek_row", "persist",
    "raw_sql", "rename", "repartition", "right_outer_join", "sample",
    "save", "select", "semi_join", "set_global_engine", "show",
    "subtract", "take", "transform", "union",
]

# reference fugue/__init__.py top-level exports
FUGUE_TOP_LEVEL = [
    "AnyDataFrame", "AnyDataset", "AnyExecutionEngine", "ArrayBag",
    "ArrayDataFrame", "ArrowDataFrame", "Bag", "BagDisplay",
    "CoTransformer", "Creator", "DataFrame", "DataFrameDisplay",
    "DataFrames", "Dataset", "DatasetDisplay", "EmptyRPCHandler",
    "EngineFacet", "ExecutionEngine", "FugueSQLWorkflow", "FugueWorkflow",
    "FugueWorkflowContext", "IterableArrowDataFrame", "IterableDataFrame",
    "IterablePandasDataFrame", "LocalBoundedDataFrame", "LocalDataFrame",
    "LocalDataFrameIterableDataFrame", "MapEngine",
    "NativeExecutionEngine", "OutputCoTransformer", "OutputTransformer",
    "Outputter", "PandasDataFrame", "PandasMapEngine", "PartitionCursor",
    "PartitionSpec", "PhysicalYielded", "Processor", "QPDPandasEngine",
    "RPCClient", "RPCFunc", "RPCHandler", "RPCServer", "SQLEngine",
    "Schema", "StructuredRawSQL", "TempTableName", "Transformer",
    "WorkflowDataFrame", "WorkflowDataFrames", "Yielded",
    "as_fugue_dataset", "cotransformer", "creator", "fsql",
    "make_execution_engine", "make_rpc_server", "make_sql_engine",
    "module", "out_transform", "output_cotransformer",
    "output_transformer", "outputter", "processor", "register_creator",
    "register_default_execution_engine", "register_default_sql_engine",
    "register_execution_engine", "register_global_conf",
    "register_output_transformer", "register_outputter",
    "register_processor", "register_sql_engine", "register_transformer",
    "to_rpc_handler", "transform", "transformer",
]

# deliberately NOT provided: multi-backend internals replaced by Spark
# itself (SURVEY §7; COVERAGE.md "Out of scope"). Names here must stay
# out of fugue_spark — shrinking this list is progress, growing it is a
# regression this test catches.
OUT_OF_SCOPE = {
    # local dataframe zoo / display registry
    "ArrayBag", "ArrayDataFrame", "ArrowDataFrame", "Bag", "BagDisplay",
    "DataFrameDisplay", "Dataset", "DatasetDisplay",
    "IterableArrowDataFrame", "IterableDataFrame",
    "IterablePandasDataFrame", "LocalBoundedDataFrame", "LocalDataFrame",
    "LocalDataFrameIterableDataFrame", "PandasDataFrame",
    "get_dataset_display",
    # multi-backend engine registry (single-engine build: the
    # SparkSession IS the engine; session factory + engine_context are
    # the api-shape equivalents)
    "AnyExecutionEngine", "EngineFacet", "ExecutionEngine", "MapEngine",
    "NativeExecutionEngine", "PandasMapEngine", "QPDPandasEngine",
    "SQLEngine", "make_sql_engine", "register_default_execution_engine",
    "register_default_sql_engine", "register_execution_engine",
    "register_global_conf", "register_sql_engine",
    # workflow-internal value types with no engine-facing behavior here
    "FugueWorkflowContext", "PhysicalYielded", "StructuredRawSQL",
    "TempTableName", "Yielded", "RPCFunc",
    # triad util re-exported by the reference, not an engine API
    "is_pandas_or",
}


def test_fugue_api_surface():
    import fugue_spark.api as fa

    missing = [n for n in FUGUE_API_EXPORTS if not hasattr(fa, n)]
    assert missing == [], f"fugue.api names missing from fugue_spark.api: {missing}"


def test_top_level_surface():
    import fugue_spark as fs

    missing = [
        n
        for n in FUGUE_TOP_LEVEL
        if n not in OUT_OF_SCOPE and not hasattr(fs, n)
    ]
    assert missing == [], f"top-level names missing from fugue_spark: {missing}"
    # the out-of-scope set must stay out (a half-implemented shim would be
    # worse than the documented absence)
    present = [n for n in sorted(OUT_OF_SCOPE) if hasattr(fs, n)]
    assert present == [], f"out-of-scope names unexpectedly present: {present}"
