"""Shared Spark fixture (session-scoped — one JVM for the whole suite)."""

from __future__ import annotations

import pytest

from validate_xml_rust_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vxrs-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias for hypothesis tests (session-scoped fixture is fine with
    hypothesis as long as the fixture itself is not function-scoped)."""
    return spark
