"""Streaming distribution-drift monitor (streaming/drift.py): per-batch
count partials, merge-on-read distribution, replay idempotence,
re-aggregating compaction — the merged stream state must answer the
EXACT two-sample KS (q295's algebra) identically to a batch computation
over all data, no matter how the stream was chopped into batches."""

from __future__ import annotations

import glob


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS event_id",
        "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS key",
        "CAST(id % 2 AS BIGINT) AS grp",
        "CAST(10 + (id % 13) AS DOUBLE) AS value",
    )


def _ks_set(df):
    return {(r.event_type, r.n_a, r.n_b, r.ks_num) for r in df.collect()}


def _batch_ks(spark, df):
    from pyspark.sql import functions as F

    from tagtree_spark.streaming.drift import ks_from_distribution

    dist = df.groupBy("key", "grp", "value").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return ks_from_distribution(dist)


def test_stream_ks_equals_batch_and_replay(spark, tmpdir):
    from tagtree_spark.streaming.drift import (
        DistributionSink,
        ks_from_distribution,
        read_distribution,
    )

    sink = DistributionSink(f"{tmpdir}/drift", key_col="key")
    for b, (lo, hi) in enumerate([(0, 250), (250, 600), (600, 900)]):
        sink(_df(spark, lo, hi), b)
    merged = read_distribution(spark, f"{tmpdir}/drift")
    want = _ks_set(_batch_ks(spark, _df(spark, 0, 900)))
    assert _ks_set(ks_from_distribution(merged)) == want
    # replay batch 1 → overwrite by segment name, still equal
    sink(_df(spark, 250, 600), 1)
    got = ks_from_distribution(read_distribution(spark, f"{tmpdir}/drift"))
    assert _ks_set(got) == want


def test_stream_ks_compaction_lossless(spark, tmpdir):
    from tagtree_spark.streaming.drift import (
        DistributionSink,
        compact_distribution,
        ks_from_distribution,
        read_distribution,
    )

    store = f"{tmpdir}/drift2"
    sink = DistributionSink(store, key_col="key", compact_every=None)
    bounds = [(0, 200), (200, 500), (500, 700), (700, 900)]
    for b, (lo, hi) in enumerate(bounds):
        sink(_df(spark, lo, hi), b)
    compact_distribution(spark, store, before_batch=3)
    # only the base + the last delta remain
    segs = sorted(glob.glob(f"{store}/seg-*"))
    assert any(s.endswith("-base") for s in segs) and len(segs) == 2
    want = _ks_set(_batch_ks(spark, _df(spark, 0, 900)))
    got = ks_from_distribution(read_distribution(spark, store))
    assert _ks_set(got) == want


def test_live_monitor_prefix_reads(spark, tmpdir):
    """A mid-stream read (before_batch) must equal the batch statistic
    over exactly the data seen so far — the live-dashboard contract."""
    from tagtree_spark.streaming.drift import (
        DistributionSink,
        ks_from_distribution,
        read_distribution,
    )

    store = f"{tmpdir}/drift3"
    sink = DistributionSink(store, key_col="key", compact_every=None)
    for b, (lo, hi) in enumerate([(0, 300), (300, 650), (650, 900)]):
        sink(_df(spark, lo, hi), b)
    for cut, hi in [(1, 300), (2, 650), (None, 900)]:
        got = ks_from_distribution(
            read_distribution(spark, store, before_batch=cut)
        )
        assert _ks_set(got) == _ks_set(_batch_ks(spark, _df(spark, 0, hi))), cut


def test_stream_mann_whitney_equals_batch(spark, tmpdir):
    """The same streamed count state answers Mann-Whitney exactly — the
    sink really is the family's shared sufficient statistic."""
    from pyspark.sql import functions as F

    from tagtree_spark.streaming.drift import (
        DistributionSink,
        mann_whitney_from_distribution,
        read_distribution,
    )

    store = f"{tmpdir}/drift4"
    sink = DistributionSink(store, key_col="key")
    for b, (lo, hi) in enumerate([(0, 400), (400, 900)]):
        sink(_df(spark, lo, hi), b)
    dist_batch = _df(spark, 0, 900).groupBy("key", "grp", "value").agg(
        F.count("*").cast("bigint").alias("n")
    )
    want = {
        (r.event_type, r.n_a, r.n_b, r.two_u_a, r.two_u_b)
        for r in mann_whitney_from_distribution(dist_batch).collect()
    }
    got = {
        (r.event_type, r.n_a, r.n_b, r.two_u_a, r.two_u_b)
        for r in mann_whitney_from_distribution(
            read_distribution(spark, store)
        ).collect()
    }
    assert got == want and len(got) == 3


def test_regroup_crt_and_kruskal_wallis(spark):
    """grp stored at %6 granularity regroups losslessly to %2 and %3
    (CRT), and the Kruskal-Wallis blocks from the regrouped state match
    a direct %3 computation. H is hand-checked on a tie-free fixture:
    groups {1,2,3}, {4,5,6}, {7,8,9} → rank sums 6/15/24, H = 7.2."""
    from pyspark.sql import functions as F

    from tagtree_spark.streaming.drift import (
        kruskal_wallis_from_distribution,
        mann_whitney_from_distribution,
        regroup_distribution,
    )

    # grp must be independent of key (= event_id % 3): id//3 % 6 walks
    # all six residues within every key class
    rows = _df(spark, 0, 900).withColumn(
        "grp", (F.col("event_id") / 3).cast("bigint") % 6
    )
    dist6 = rows.groupBy("key", "grp", "value").agg(
        F.count("*").cast("bigint").alias("n")
    )
    dist2 = rows.withColumn("grp", F.col("grp") % 2).groupBy(
        "key", "grp", "value"
    ).agg(F.count("*").cast("bigint").alias("n"))
    got2 = mann_whitney_from_distribution(regroup_distribution(dist6, 2))
    want2 = mann_whitney_from_distribution(dist2)
    key = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert key(got2) == key(want2) and got2.count() == 3

    dist3 = rows.withColumn("grp", F.col("grp") % 3).groupBy(
        "key", "grp", "value"
    ).agg(F.count("*").cast("bigint").alias("n"))
    got3 = kruskal_wallis_from_distribution(regroup_distribution(dist6, 3))
    assert key(got3) == key(kruskal_wallis_from_distribution(dist3))
    r = {x.event_type: x for x in got3.collect()}
    assert set(r) == {"a", "b", "c"}
    for x in r.values():
        assert x.two_r_0 + x.two_r_1 + x.two_r_2 == x.n * (x.n + 1)

    # hand-checked H: 9 values 1..9, groups by tertile, no ties
    hand = spark.createDataFrame(
        [("k", (v - 1) // 3, float(v), 1) for v in range(1, 10)],
        "key string, grp int, value double, n bigint",
    )
    row = kruskal_wallis_from_distribution(hand).collect()[0]
    assert row.tie_cubed == 0.0 and abs(row.h_adj - 7.2) < 1e-12
    assert (row.two_r_0, row.two_r_1, row.two_r_2) == (12, 30, 48)


def test_stream_ks_chop_invariance_property(spark, tmpdir):
    """PROPERTY: the statistic is invariant to HOW the stream was
    chopped into micro-batches — any random partition of the rows into
    batches yields the identical KS and Mann-Whitney results (counts
    compose; hypothesis drives the chop points)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tagtree_spark.streaming.drift import (
        DistributionSink,
        ks_from_distribution,
        mann_whitney_from_distribution,
        read_distribution,
    )

    want_ks = _ks_set(_batch_ks(spark, _df(spark, 0, 500)))
    case = [0]

    @settings(max_examples=5, deadline=None)
    @given(cuts=st.lists(st.integers(min_value=1, max_value=499), min_size=0, max_size=4))
    def run(cuts):
        case[0] += 1
        store = f"{tmpdir}/prop{case[0]}"
        sink = DistributionSink(store, key_col="key", compact_every=2)
        bounds = sorted(set(cuts)) + [500]
        lo = 0
        for b, hi in enumerate(bounds):
            sink(_df(spark, lo, hi), b)
            lo = hi
        dist = read_distribution(spark, store)
        assert _ks_set(ks_from_distribution(dist)) == want_ks
        assert mann_whitney_from_distribution(dist).count() == 3

    run()
