"""Pluggable sample storage — the reference's abstract ``Storage`` seam
(/root/reference/include/tagtree/storage.h:49-53: ``Queryable::querier(mint,
maxt)`` → ``Querier::select(tsids)`` → ``SeriesSet``, plus ``Appender::add/
commit``), re-expressed in the DataFrame idiom.

The reference's pull-iterator chain (SeriesSet → Series → SeriesIterator,
storage.h:13-29) collapses to ONE declarative frame: ``select`` returns the
samples of the matching series in range, and the time bounds/tsid semi-join
become pushed filters in the scan instead of per-series seek loops. What
stays is the SEAM: the index layer (engine, matchers) never touches sample
bytes directly — it talks to a ``SampleStorage``, so parquet can be swapped
for Delta/Iceberg/a TSDB backend without touching the index code, exactly
the role the abstract class plays in the reference (the Prometheus adapter
binds its own Storage, /root/reference/src/adapters/prom/appender.cpp:14-23).

Implementations:
  * :class:`MemorySampleStorage` — frames derived in-session (engine built
    from ``events=``); append = lazy union.
  * :class:`ParquetSampleStorage` — the date-partitioned, Z-ordered store
    layout (tsdb/store.py); append = O(batch) partitioned file append,
    ``compact`` = fold small files (X1).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SampleStorage(ABC):
    """Samples are ``(tsid bigint, ts timestamp, value double)``."""

    @abstractmethod
    def read(self) -> DataFrame:
        """The full sample frame (lazy; filters push into the scan)."""

    @abstractmethod
    def append(self, samples: DataFrame) -> None:
        """Appender::add+commit for one batch — O(batch), idempotence and
        crash-consistency are the implementation's contract."""

    def select(self, tsids: DataFrame | None, start=None, end=None) -> DataFrame:
        """Querier::select — samples of the given series in
        ``[start, end]``; ``tsids=None`` selects every series (the querier
        over the full bitmap)."""
        from tagtree_spark.tsdb.matchers import select_series

        if tsids is None:
            out = self.read()
            if start is not None:
                out = out.where(F.col("ts") >= F.lit(start))
            if end is not None:
                out = out.where(F.col("ts") <= F.lit(end))
            return out
        return select_series(self.read(), tsids, start, end)

    def close(self) -> None:  # Storage::close — nothing to release by default
        pass

    def compact(self) -> None:
        """X1 — fold small files. Default no-op so custom backends satisfy
        the whole contract the engine invokes (TagTreeEngine.compact and the
        ingest_batch auto-compact path call it; ADVICE r4 low)."""


class MemorySampleStorage(SampleStorage):
    def __init__(self, samples: DataFrame):
        self._samples = samples

    def read(self) -> DataFrame:
        return self._samples

    def append(self, samples: DataFrame) -> None:
        self._samples = self._samples.unionByName(samples)


class ParquetSampleStorage(SampleStorage):
    """Date-partitioned parquet dir (the ``samples/`` table of the store
    layout, tsdb/store.py:materialize_model). Reads repair interrupted
    compactions first; appends write new files under the ds partitions."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        from tagtree_spark.tsdb.store import recover_table

        recover_table(self.path)
        return self.spark.read.parquet(self.path).drop("ds")

    def append(self, samples: DataFrame) -> None:
        (
            samples.withColumn("ds", F.to_date("ts"))
            .write.mode("append")
            .partitionBy("ds")
            .parquet(self.path)
        )

    def compact(self) -> None:
        from tagtree_spark.tsdb.store import compact_table

        compact_table(self.spark, self.path, ["ds"])


def open_storage(spark: SparkSession, store_dir: str) -> ParquetSampleStorage:
    return ParquetSampleStorage(spark, os.path.join(store_dir, "samples"))
