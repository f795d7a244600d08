"""Shared fixtures: one SparkSession per test session (JVM startup is ~10s)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from text_to_graph_spark.session import get_spark

    s = get_spark(app_name="t2g-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_smoke(spark):
    from text_to_graph_spark.sources.pages import synthesize_pages

    return synthesize_pages(spark, SF_SMOKE)
