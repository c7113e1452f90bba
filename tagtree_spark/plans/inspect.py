"""Physical-plan inspection helpers — the ".explain and iterate" loop as
code, used by tests and tuning to pin the plan shapes we rely on at scale
(pushdown reaching the scan, no single-partition exchanges on data paths,
broadcast vs shuffle join choices)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — verifies column pruning."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def single_partition_exchanges(df: DataFrame) -> int:
    """Count of SinglePartition exchanges (0 on data paths; tiny side
    inputs like per-partition counter rows legitimately use one)."""
    return physical_plan(df).count("Exchange SinglePartition")


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in physical_plan(df)
