"""Runs the packaged conformance suites (VERDICT r7 item 7).

The corpora themselves live in :mod:`fugue_spark.testing.suites` as
importable class-per-suite collections (matching the reference's
``fugue_test`` package shape) so third-party code can subclass them with
its own ``spark`` fixture. These subclasses run the full inherited corpus
against this repo's conftest session.
"""

from __future__ import annotations

from fugue_spark.testing.suites import (
    BuiltinSuite,
    DataFrameSuite,
    ExecutionEngineSuite,
)


class TestDataFrameSuite(DataFrameSuite):
    pass


class TestExecutionEngineSuite(ExecutionEngineSuite):
    pass


class TestBuiltinSuite(BuiltinSuite):
    pass
