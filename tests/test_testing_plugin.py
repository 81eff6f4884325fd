"""The conformance-suite pytest plugin (reference surface:
``/root/reference/fugue/test/plugins.py:139-211`` — ``fugue_test_suite``
decorator + per-backend session fixtures).

The end-to-end proof runs a pytest SUBPROCESS on a generated external-style
project: no conftest, no spark fixture — only the plugin (-p) and the
decorator, exactly what a downstream project would write.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_backend_registry_and_parse():
    from fugue_spark.testing import FugueTestBackend, fugue_test_backend
    from fugue_spark.testing.plugins import _FUGUE_TEST_BACKENDS, _parse_backend

    assert "spark" in _FUGUE_TEST_BACKENDS
    assert _parse_backend("spark") == ("spark", {})
    assert _parse_backend(("spark", {"a": 1})) == ("spark", {"a": 1})
    assert _parse_backend("spark(master=local[2])") == (
        "spark",
        {"master": "local[2]"},
    )
    with pytest.raises(ValueError, match="cannot be empty"):

        @fugue_test_backend
        class Bad(FugueTestBackend):
            name = ""

    with pytest.raises(ValueError, match="Duplicate"):

        @fugue_test_backend
        class Dup(FugueTestBackend):
            name = "spark"


def test_decorator_rejects_unknown_backend():
    from fugue_spark.testing import fugue_test_suite

    with pytest.raises(ValueError, match="unknown test backend"):

        @fugue_test_suite("nosuch")
        class T:
            pass


def test_decorated_suite_in_tree(spark):
    # in-tree: the decorator composes with the project's own spark fixture
    # (conftest precedence); the class context is still injected
    from fugue_spark.testing import FugueTestSuite, fugue_test_suite

    @fugue_test_suite("spark")
    class TProbe(FugueTestSuite):
        pass

    assert TProbe.backend == "spark"
    assert TProbe.__test__ is True


def test_external_project_one_liner(tmp_path):
    """A generated downstream project: only the plugin + decorator, no
    conftest/fixture. The subprocess run must collect and pass the
    inherited corpus subset green."""
    test_mod = tmp_path / "test_downstream_conformance.py"
    test_mod.write_text(
        textwrap.dedent(
            """
            import fugue_spark.testing as ft

            @ft.fugue_test_suite(("spark", {"master": "local[2]",
                                            "shuffle_partitions": 2}))
            class TestInheritedDataFrames(ft.DataFrameSuite):
                pass

            @ft.fugue_test_suite("spark")
            class TestContextHandle(ft.FugueTestSuite):
                def test_context_session(self):
                    assert self.context.backend == "spark"
                    df = self.engine.createDataFrame([[1]], "a long")
                    assert df.count() == 1
                    assert self.df_eq(df, [[1]], schema="a:long")
            """
        )
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_GRAFT_CPUS", "2")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "-p",
            "fugue_spark.testing.plugins",
            "-q",
            "-x",
            str(test_mod),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert " passed" in proc.stdout and "failed" not in proc.stdout
