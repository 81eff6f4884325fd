"""Pytest plugin: one-line access to the conformance corpora.

The reference exposes its backend test suites through a pytest plugin —
``@fugue_test_suite("spark")`` decorates a suite class and per-backend
fixtures inject the live session (``/root/reference/fugue/test/
plugins.py:139-211``: ``fugue_test_backend`` registry, ``FugueTestSuite``
base, ``fugue_test_suite`` decorator, ``FugueTestContext``). This module
is the single-engine equivalent: the registry holds Spark-flavored
backends (a downstream project may register one with extra conf — e.g. a
Spark Connect URL), the decorator injects a class-scoped session, and a
``spark`` function fixture resolves to it, so a third-party project gets
the full corpus with::

    # conftest.py (or pyproject: -p fugue_spark.testing.plugins)
    pytest_plugins = ["fugue_spark.testing.plugins"]

    # test_conformance.py
    import fugue_spark.testing as ft

    @ft.fugue_test_suite("spark")
    class TestDataFrames(ft.DataFrameSuite):
        pass  # inherits the whole corpus; no spark fixture needed

Registered as a ``pytest11`` entry point in pyproject.toml, so an
installed package auto-loads it — ``pytest_plugins`` is only needed for
in-tree use.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass
from typing import Any, Dict, Iterator, Type

try:
    import pytest

    _HAS_PYTEST = True
except ImportError:  # pragma: no cover
    _HAS_PYTEST = False

__all__ = [
    "FugueTestBackend",
    "FugueTestContext",
    "FugueTestSuite",
    "fugue_test_backend",
    "fugue_test_suite",
]

_FUGUE_TEST_BACKENDS: "Dict[str, Type[FugueTestBackend]]" = {}


class FugueTestBackend:
    """A named session factory (ref plugins.py:60-99 ``FugueTestBackend``).

    Single-engine build: every backend yields a SparkSession; a backend
    exists to pin session conf (e.g. ANSI mode, a Connect URL), not to
    switch engines."""

    name = ""
    session_conf: "Dict[str, Any]" = {}

    @classmethod
    @contextmanager
    def session_context(cls, session_conf: "Dict[str, Any]") -> Iterator[Any]:
        from fugue_spark.session import get_spark

        conf = dict(cls.session_conf)
        conf.update(session_conf)
        master = conf.pop("master", None)
        shuffle = conf.pop("shuffle_partitions", None)
        app = conf.pop("app_name", f"fugue_test_{cls.name or 'spark'}")
        spark = get_spark(
            app_name=app,
            master=master,
            shuffle_partitions=int(shuffle) if shuffle is not None else None,
            **{str(k).replace(".", "__"): str(v) for k, v in conf.items()},
        )
        yield spark


def fugue_test_backend(cls: "Type[FugueTestBackend]") -> "Type[FugueTestBackend]":
    """Register a test backend by name (ref plugins.py:100-136)."""
    if not (isinstance(cls, type) and issubclass(cls, FugueTestBackend)):
        raise ValueError(f"{cls} is not a FugueTestBackend")
    name = cls.name.strip().lower()
    if name in ("", "fugue"):
        raise ValueError(f"Fugue test backend name cannot be empty or fugue: {cls}")
    if name in _FUGUE_TEST_BACKENDS:
        raise ValueError(f"Duplicate Fugue test backend name: {name}")
    _FUGUE_TEST_BACKENDS[name] = cls
    return cls


@fugue_test_backend
class SparkTestBackend(FugueTestBackend):
    name = "spark"


@dataclass
class FugueTestContext:
    """Live-session handle injected into decorated suites
    (ref plugins.py:211-224 ``FugueTestContext``: engine + session + name)."""

    session: Any
    backend: str

    @property
    def engine(self) -> Any:
        # single-engine build: the SparkSession IS the execution engine
        return self.session


class FugueTestSuite:
    """Base class for decorated suites (ref plugins.py:139-190).

    The shipped corpora (DataFrameSuite / ExecutionEngineSuite /
    BuiltinSuite in suites.py) do not require this base — their methods
    take ``spark`` directly — but subclassing it adds the reference's
    ``context`` / ``engine`` / ``df_eq`` conveniences."""

    backend: str = "spark"
    _fugue_test_context: "FugueTestContext | None" = None

    __test__ = False

    @property
    def context(self) -> "FugueTestContext":
        assert self._fugue_test_context is not None, (
            "no FugueTestContext — decorate the class with @fugue_test_suite"
        )
        return self._fugue_test_context

    @property
    def engine(self) -> Any:
        return self.context.engine

    def df_eq(self, *args: Any, **kwargs: Any) -> bool:
        from fugue_spark.testing import df_eq

        return df_eq(*args, **kwargs)


def _parse_backend(backend: Any) -> "tuple[str, Dict[str, Any]]":
    """"spark" | ("spark", {conf}) | "spark(k=v)" → (name, conf)."""
    if isinstance(backend, (tuple, list)):
        return str(backend[0]).strip().lower(), dict(backend[1])
    s = str(backend).strip()
    if "(" in s and s.endswith(")"):
        name, _, rest = s.partition("(")
        conf: "Dict[str, Any]" = {}
        body = rest[:-1].strip()
        if body:
            for kv in body.split(","):
                k, _, v = kv.partition("=")
                conf[k.strip()] = v.strip().strip("'\"")
        return name.strip().lower(), conf
    return s.lower(), {}


def fugue_test_suite(backend: Any, mark_test: "bool | None" = None) -> Any:
    """Class decorator: bind a suite to a backend session
    (ref plugins.py:192-209 ``fugue_test_suite``). The class receives a
    class-scoped live session; its tests use the ``spark`` fixture (or
    ``self.context`` when also subclassing :class:`FugueTestSuite`)
    without the project defining any fixture."""

    def deco(cls: type) -> type:
        if not _HAS_PYTEST:  # pragma: no cover
            raise RuntimeError("fugue_test_suite requires pytest")
        name, conf = _parse_backend(backend)
        if name not in _FUGUE_TEST_BACKENDS:
            raise ValueError(
                f"unknown test backend {name!r} (registered: "
                f"{sorted(_FUGUE_TEST_BACKENDS)})"
            )
        cls.backend = name
        cls._fugue_session_conf = conf
        if mark_test is not None:
            cls.__test__ = mark_test
        elif getattr(cls, "__test__", True) is False:
            # subclassing FugueTestSuite sets __test__=False on the base;
            # decorating marks the leaf class as a real test class
            cls.__test__ = True
        return pytest.mark.usefixtures("_fugue_class_session")(cls)

    return deco


if _HAS_PYTEST:

    @pytest.fixture(scope="class")
    def _fugue_class_session(request):
        """Create (or reuse) the backend session for a decorated class."""
        cls = request.cls
        name = getattr(cls, "backend", "spark")
        conf = dict(getattr(cls, "_fugue_session_conf", {}) or {})
        backend = _FUGUE_TEST_BACKENDS[name]
        with backend.session_context(conf) as session:
            cls._fugue_test_context = FugueTestContext(session=session, backend=name)
            try:
                yield cls._fugue_test_context
            finally:
                cls._fugue_test_context = None

    @pytest.fixture
    def spark(request):
        """Session fixture for suite methods. Prefers the class-injected
        backend session; otherwise builds the engine default. A project's
        own ``spark`` fixture (conftest) overrides this one — normal
        pytest precedence."""
        ctx = getattr(request.cls, "_fugue_test_context", None) if request.cls else None
        if ctx is not None:
            return ctx.session
        from fugue_spark.session import get_spark

        return get_spark(app_name="fugue_test")
