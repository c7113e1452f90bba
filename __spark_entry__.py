"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2.12).
``oracle_sql()`` — duckdb-equivalent SQL per query for the hash compare.

All real logic lives in the ``tagtree_spark`` package; this module is a
thin registry wrapper.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tagtree_spark import queries as _q  # noqa: E402
from tagtree_spark import queries_ext as _qx  # noqa: E402,F401  (registers q24+)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full TSDB spine — derive the series/postings/samples
    model from events, resolve a 3-matcher conjunction (EQL + regex + NEQ),
    semi-join samples in a time range, aggregate. SURVEY.md §3.1."""
    return _q.QUERIES["q12_select_samples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLE)
