"""Shared fixtures: one local SparkSession per test run, sf0.001 tables."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from tagtree_spark.io import load_table  # noqa: E402
from tagtree_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tagtree-tests", cpus=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def events(spark):
    return load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="session")
def documents(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="session")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="session")
def model(events):
    from tagtree_spark.tsdb.model import build_model

    series, postings, samples = build_model(events)
    return series.cache(), postings.cache(), samples.cache()
