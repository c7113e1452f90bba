"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under the sf dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# events.ts has been observed in two physical forms across driver-generated
# testdata: parquet TIMESTAMP(NANOS) (unreadable natively — read as long
# nanos and truncate to micros, the same truncation duckdb applies casting
# TIMESTAMP_NS → TIMESTAMP) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
# (read natively as TIMESTAMP_NTZ). Everything downstream — unix_micros,
# event-time windows, watermarks — assumes the session type TIMESTAMP (LTZ),
# so normalize both forms here. The session timezone is pinned to UTC
# (session.py), making the NTZ→LTZ cast wall-clock-preserving and identical
# to duckdb's naive TIMESTAMP read.
_NANO_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    nano_cols = _NANO_TS_COLUMNS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nano_cols:
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
