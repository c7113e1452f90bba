"""Streaming heavy hitters — continuous count-min sketch
(operators/sketch.py cms_registers) over a micro-batch stream, the
frequency twin of DistinctSink's continuous HLL.

State per stream is d×w register rows PLUS a bounded candidate set (the
classic CMS+heap construction: the sketch answers "how often", the
candidate set answers "which keys to ask about" — a sketch alone cannot
enumerate keys). Per batch:

  * the batch's occurrences fold into a register segment (≤ d×w rows,
    merged on read by (row, bucket) SUM — CMS is linear, so partials
    compose losslessly);
  * the batch's top-``cand_n`` values land in a candidate segment
    (merge-on-read distinct union; a value that is globally heavy is heavy
    in some batch for any skewed distribution — the standard CMS+heap
    recall argument, and ``cand_n`` is the dial);
  * replay is idempotent by segment naming; compaction re-aggregates both
    stores (SUM / distinct compose), keeping file counts bounded.

Live query: point-query the merged sketch for every candidate, take the
top k by estimate. No oracle entry by design (streaming) — the
stream≡batch equivalence test is the verification, like the other sinks.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.operators.sketch import CMS_D, CMS_W, cms_estimates, cms_registers
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


class HeavyHittersSink:
    """foreachBatch sink maintaining CMS register + candidate segments for
    the values of ``col``."""

    def __init__(
        self,
        store_path: str,
        col: str,
        cand_n: int = 32,
        d: int = CMS_D,
        w: int = CMS_W,
        compact_every: int | None = 8,
    ):
        self.store_path = store_path
        self.col = col
        self.cand_n = cand_n
        self.d = d
        self.w = w
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_sketch(spark, self.store_path, batch_id)
        regs = cms_registers(batch_df, self.col, d=self.d, w=self.w)
        regs.write.mode("overwrite").parquet(
            os.path.join(self.store_path, "regs", f"seg-{batch_id:010d}-delta")
        )
        cands = (
            batch_df.groupBy(self.col)
            .agg(F.count("*").alias("_n"))
            .orderBy(F.col("_n").desc(), self.col)
            .limit(self.cand_n)
            .select(F.col(self.col).alias("value"))
        )
        cands.write.mode("overwrite").parquet(
            os.path.join(self.store_path, "cands", f"seg-{batch_id:010d}-delta")
        )


def read_sketch(
    spark: SparkSession, store_path: str, before_batch: int | None = None
) -> tuple[DataFrame, DataFrame] | None:
    """(merged registers, distinct candidates) across completed segments."""
    rsegs = _list_segments(os.path.join(store_path, "regs"), before_batch)
    csegs = _list_segments(os.path.join(store_path, "cands"), before_batch)
    if not rsegs or not csegs:
        return None
    regs = (
        reduce(lambda a, b: a.unionByName(b), (spark.read.parquet(s) for s in rsegs))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    cands = reduce(
        lambda a, b: a.unionByName(b), (spark.read.parquet(s) for s in csegs)
    ).distinct()
    return regs, cands


def read_heavy_hitters(
    spark: SparkSession,
    store_path: str,
    k: int = 10,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame | None:
    """Top-k candidates by CMS estimate → ``(value, cms_est)``."""
    got = read_sketch(spark, store_path)
    if got is None:
        return None
    regs, cands = got
    est = cms_estimates(cands, regs, "value", d=d, w=w)
    return est.orderBy(F.col("cms_est").desc(), "value").limit(k)


def compact_sketch(spark: SparkSession, store_path: str, before_batch: int) -> None:
    """Fold register segments (SUM-merge) and candidate segments (distinct
    union) < before_batch into one base each — re-aggregating compaction,
    same crash-safe base-then-delete order as the other segment stores."""
    import glob as _glob
    import shutil as _shutil

    got = read_sketch(spark, store_path, before_batch=before_batch)
    if got is None:
        return
    regs, cands = got
    for sub, df in (("regs", regs), ("cands", cands)):
        root = os.path.join(store_path, sub)
        base = os.path.join(root, f"seg-{before_batch - 1:010d}-base")
        if not _complete(base):
            if len(_list_segments(root, before_batch)) <= 1:
                continue
            df.write.mode("overwrite").parquet(base)
            if not _complete(base):
                continue
        for dpath in _glob.glob(os.path.join(root, "seg-*")):
            if dpath == base:
                continue
            meta = _parse_segment(dpath)
            if meta is not None and meta[0] < before_batch:
                _shutil.rmtree(dpath, ignore_errors=True)
