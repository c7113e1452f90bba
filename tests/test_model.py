"""Data-model invariants: dense ids, postings shape, samples conservation,
and the scale-safe id-assignment scheme."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tagtree_spark.plans.inspect import physical_plan
from tagtree_spark.tsdb.model import LABEL_NAMES, build_series, dense_rank_ids


def test_tsids_dense_from_one(model):
    series, _, _ = model
    row = series.agg(
        F.min("tsid").alias("mn"),
        F.max("tsid").alias("mx"),
        F.count("*").alias("n"),
        F.countDistinct("tsid").alias("nd"),
    ).collect()[0]
    assert row.mn == 1 and row.mx == row.n == row.nd


def test_dense_rank_matches_global_row_number(events):
    """Per-partition offset scheme ≡ global row_number() OVER (ORDER BY labels)."""
    from tagtree_spark.tsdb.model import with_labels

    grouped = with_labels(events).groupBy(*LABEL_NAMES).agg(F.min("ts").alias("first_seen"))
    ours = dense_rank_ids(grouped, LABEL_NAMES).select(*LABEL_NAMES, "tsid")
    ref = grouped.select(
        *LABEL_NAMES,
        F.row_number().over(Window.orderBy(*LABEL_NAMES)).cast("bigint").alias("tsid"),
    )
    assert ours.exceptAll(ref).count() == 0 and ref.exceptAll(ours).count() == 0


def test_series_plan_partitions_the_id_window(events):
    """The r1 scale-killer was row_number() over Window.orderBy(labels) —
    a windowspec with NO partition key, funnelling every series through one
    task. The fixed shape partitions the window by _pid over a
    range-partitioned exchange; the only permissible global window is the
    per-partition counter cumsum (over ≤numPartitions rows)."""
    plan = physical_plan(build_series(events))
    assert "rangepartitioning" in plan.lower()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "event_type" in spec:  # the data-path window
            assert spec.strip().startswith("_pid"), spec


def test_postings_one_row_per_series_label(model):
    series, postings, _ = model
    assert postings.count() == series.count() * len(LABEL_NAMES)
    # postings carry the series activity interval
    bad = postings.join(series.select("tsid", F.col("first_seen").alias("sf")), "tsid").where(
        F.col("first_seen") != F.col("sf")
    )
    assert bad.count() == 0


def test_samples_conserve_events(model, events):
    _, _, samples = model
    assert samples.count() == events.count()


def test_samples_tsid_resolves_labels(model):
    """Every sample's tsid maps back to exactly one series."""
    series, _, samples = model
    joined = samples.join(series.select("tsid"), "tsid", "left_anti")
    assert joined.count() == 0
