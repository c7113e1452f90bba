"""Plan-shape regression tests: the properties that keep queries fast at
100 TB must hold in the physical plan, not just in intent."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagtree_spark.io import load_table
from tagtree_spark.plans.inspect import (
    has_cartesian,
    physical_plan,
    pushed_filters,
    scan_schemas,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.where(F.col("l_quantity") < 24).select("l_orderkey", "l_quantity")
    pf = pushed_filters(q)
    assert any("l_quantity" in f for f in pf), pf


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.select("l_orderkey", "l_linenumber")
    schemas = scan_schemas(q)
    assert schemas and all(
        "l_orderkey" in s and "l_extendedprice" not in s for s in schemas
    ), schemas


def test_topk_plans_take_ordered(spark):
    orders = load_table(spark, SF, "orders")
    q = orders.orderBy(F.col("o_totalprice").desc()).limit(10)
    assert "TakeOrderedAndProject" in physical_plan(q)


def test_small_dim_join_broadcasts(spark):
    nation = load_table(spark, SF, "nation")
    region = load_table(spark, SF, "region")
    q = nation.join(region, nation.n_regionkey == region.r_regionkey)
    assert "BroadcastHashJoin" in physical_plan(q)


def test_resolve_has_no_cartesian(model):
    from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp, resolve_label_matchers

    _, postings, _ = model
    q = resolve_label_matchers(
        postings,
        [
            LabelMatcher(MatchOp.EQL, "user_bucket", "u1"),
            LabelMatcher(MatchOp.NEQ, "event_type", "error"),
        ],
    )
    assert not has_cartesian(q)


def test_asof_broadcasts_grid_no_cartesian(spark, model):
    """The as-of eval grid must arrive broadcast; the range join must not
    plan as a cartesian product."""
    import datetime as dt

    from tagtree_spark.tsdb.asof import asof_instant, range_agg

    _, _, samples = model
    times = [dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)]
    for q in (
        asof_instant(samples, times, dt.timedelta(days=3)),
        range_agg(samples, times, dt.timedelta(days=3)),
    ):
        plan = physical_plan(q)
        assert "BroadcastNestedLoopJoin" in plan, plan  # range predicate join, broadcast side
        assert not has_cartesian(q)


def test_chunking_is_narrow(spark, documents):
    """Chunk generation must be scan → project → generate: zero shuffles."""
    from tagtree_spark.operators.text import chunk_documents

    plan = physical_plan(chunk_documents(documents))
    # spread()'s round-robin fan-out is the one allowed exchange — data-
    # dependent shuffles (hash/range) must not appear
    low = plan.lower()
    assert "hashpartitioning" not in low and "rangepartitioning" not in low, plan


def test_stratified_sample_pushes_to_scan(spark, documents):
    """Hash sampling is a pure filter — no shuffle, no aggregation."""
    from tagtree_spark.operators.sampling import stratified_sample

    plan = physical_plan(stratified_sample(documents, 20))
    assert "Exchange" not in plan and "Aggregate" not in plan, plan


def test_pack_sequences_window_is_partitioned(spark):
    """Sequence packing must never collapse to a single-partition global
    window — the per-shard window keys the exchange by shard."""
    from tagtree_spark.operators.packing import pack_sequences
    from tagtree_spark.plans.inspect import single_partition_exchanges

    docs = load_table(spark, SF, "documents")
    q = pack_sequences(docs, budget=128)
    assert single_partition_exchanges(q) == 0, physical_plan(q)


def test_semantic_dedup_no_cartesian(spark):
    from tagtree_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF, "embeddings")
    assert not has_cartesian(semantic_dedup(emb))


def test_simhash_fingerprint_is_shuffle_free(spark):
    """The r3 rewrite computes the fingerprint row-locally: no Exchange of
    any kind may appear before band bucketing."""
    from tagtree_spark.operators.dedup import simhash60

    docs = load_table(spark, SF, "documents")
    plan = physical_plan(simhash60(docs))
    # the only allowed exchange is the deliberate spread() round-robin
    # (single-file scan fan-out); no hash/range/single-partition shuffle
    assert "hashpartitioning" not in plan and "SinglePartition" not in plan, plan


def test_repetition_features_shuffle_free(spark):
    from tagtree_spark.operators.text import repetition_features

    docs = load_table(spark, SF, "documents")
    plan = physical_plan(repetition_features(docs))
    assert "hashpartitioning" not in plan and "SinglePartition" not in plan, plan


def test_q80_dimension_chain_broadcasts(spark):
    """The region→nation→supplier dimension chain must become broadcast
    joins — only lineitem⋈orders may shuffle-join."""
    from tagtree_spark.queries import ORACLE  # noqa: F401 (registry import)
    from __spark_entry__ import queries

    q = queries()["q80_regional_volume"](spark, SF)
    plan = physical_plan(q)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert not has_cartesian(q)


def test_store_matcher_prunes_name_partitions(spark, events):
    """q103-q105 read the PERSISTED name-partitioned postings: a matcher's
    postings scan must show a PartitionFilters entry on ``name`` (directory
    pruning — the disk-path analogue of the reference's per-(name,value)
    key ranges), not a full postings scan."""
    import shutil
    import tempfile

    from tagtree_spark.tsdb.matchers import (
        LabelMatcher,
        MatchOp,
        resolve_label_matchers,
    )
    from tagtree_spark.tsdb.store import load_model, materialize_model
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-store-prune-")
    try:
        materialize_model(spark, events, d)
        _, postings, _ = load_model(spark, d)
        q = resolve_label_matchers(
            postings, [LabelMatcher(MatchOp.EQL, "event_type", "click")]
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan, plan
        # the filter must actually constrain the name partition column
        import re

        pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert any("name" in f and f.strip() for f in pf), plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivf_store_probe_prunes_cell_partitions(spark, embeddings):
    """The persisted IVF probe must read only the probed cid partition
    directories — PartitionFilters on cid in the vectors scan, and the
    results must equal the in-memory ivf_topk bit-for-bit."""
    import shutil
    import tempfile

    from tagtree_spark.operators.similarity import (
        ivf_store_topk,
        ivf_topk,
        materialize_ivf,
    )
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-ivf-prune-")
    try:
        materialize_ivf(embeddings, d, n_cells=8)
        got = ivf_store_topk(spark, d, query_id=0, k=8, nprobe=1)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cid" in plan, plan
        mem = [
            (r.vec_id, r.score)
            for r in ivf_topk(embeddings, 0, k=8, n_cells=8, nprobe=1).collect()
        ]
        assert [(r.vec_id, r.score) for r in got.collect()] == mem
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivfpq_store_probe_prunes_and_matches_adc(spark, embeddings):
    """The persisted IVF+PQ probe must read only the probed cid partition
    directories (PartitionFilters on cid in the CODES scan — the store
    holds no vectors), and with every cell probed its ADC totals must
    equal the in-memory pq_adc_topk bit-for-bit (the store is the same
    quantization, just partitioned)."""
    import shutil
    import tempfile

    from tagtree_spark.operators.similarity import (
        ivfpq_store_topk,
        materialize_ivfpq,
        pq_adc_topk,
    )
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-ivfpq-prune-")
    try:
        materialize_ivfpq(embeddings, d, n_cells=8)
        got = ivfpq_store_topk(spark, d, embeddings, query_id=0, k=10, nprobe=2)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cid" in plan, plan
        # full probe == pure ADC (no cell is excluded, so the ranking is
        # exactly the in-memory quantized ranking)
        full = ivfpq_store_topk(spark, d, embeddings, query_id=0, k=10, nprobe=8)
        mem = [(r.vec_id, r.adist) for r in pq_adc_topk(embeddings, 0, k=10).collect()]
        assert [(r.vec_id, r.adist) for r in full.collect()] == mem
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_jl_project_is_map_only(spark):
    from tagtree_spark.operators.similarity import jl_project

    emb = load_table(spark, SF, "embeddings")
    plan = physical_plan(jl_project(emb, n_proj=4))
    # a projection over the scan: no aggregation/join exchanges at all
    assert "Exchange hashpartitioning" not in plan
    assert not has_cartesian(jl_project(emb, n_proj=4))


def test_sq8_grid_is_broadcast_not_shuffled_join(spark):
    from tagtree_spark.operators.similarity import sq8_topk

    emb = load_table(spark, SF, "embeddings")
    plan = physical_plan(sq8_topk(emb, query_id=0, k=5))
    # the one-row grid and the one-row query vector join as broadcast
    # nested loops, never as a shuffled join of the vector table
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # top-k stays TakeOrdered (no global sort of the scored scan)
    assert "TakeOrderedAndProject" in plan


def test_interpolate_grid_windows_partition_by_tsid(spark):
    import datetime as dt

    from tagtree_spark.plans.inspect import single_partition_exchanges
    from tagtree_spark.tsdb.rollup import interpolate_grid

    samples = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 30), 1.0)],
        "tsid bigint, ts timestamp, value double",
    )
    # both interpolation windows hash-partition on tsid — series count is
    # the parallelism, never a single-partition window
    assert single_partition_exchanges(interpolate_grid(samples)) == 0


def test_postings_store_phrase_scan_prunes_term_partitions(spark, tmpdir):
    from tagtree_spark.operators.text import materialize_postings, store_phrase_search

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)], ["doc_id", "text"]
    )
    path = f"{tmpdir}/postings"
    materialize_postings(docs, path)
    plan = store_phrase_search(spark, path, "alpha beta")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tp" in plan
    # and the search itself is correct through the store
    rows = store_phrase_search(spark, path, "alpha beta").collect()
    assert len(rows) == 20 and all(r.n_occ == 1 and r.first_pos == 0 for r in rows)


def test_q232_mincost_supplier_plan(spark):
    """Q2-shape decorrelation must keep every dimension join broadcast
    (supplier/nation/region/part) and compute the per-part min as a
    WINDOW over the single supply aggregation (r13) — lineitem is
    scanned once, in one subtree, not once per branch."""
    from __spark_entry__ import queries

    q = queries()["q232_mincost_supplier"](spark, SF)
    plan = physical_plan(q)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert not has_cartesian(q)
    # the min branch is a window over the one supply pass, not a second
    # aggregation joined back — so exactly ONE lineitem scan in the plan
    assert "min(cost" in plan and "Window" in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan


def test_q236_not_in_is_broadcast_anti_join(spark):
    """Q16-shape NOT IN must plan as a broadcast anti-join off the
    distinct (part, supplier) projection, never a shuffled join."""
    from __spark_entry__ import queries

    q = queries()["q236_parts_supplier_counts"](spark, SF)
    plan = physical_plan(q)
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    ), plan
    assert not has_cartesian(q)


def test_shingle_store_self_join_has_no_exchange(spark):
    """The persisted shingle store (q254) is bucketed by the shingle hash,
    so both s-keyed hot operations — the df-cap aggregate and the
    candidate self-join — must plan with NO Exchange on the store scans
    (the 100 TB rationale for materializing the session caches as tables,
    SCALE.md 'Shared derived artifacts')."""
    from tagtree_spark.queries_ext import _sh_store

    inv = spark.table(_sh_store(spark, "/root/testdata/sf0.001"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at the test's tiny scale the planner would broadcast (also fine,
        # but not the property under test); force the sort-merge path so
        # the BUCKET layout is what eliminates the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        agg = inv.groupBy("s").agg(F.count("*").alias("c"))
        assert "Exchange" not in agg._jdf.queryExecution().executedPlan().toString()
        a = inv.select(F.col("doc_id").alias("doc_a"), "s")
        b = inv.select(F.col("doc_id").alias("doc_b"), "s")
        j = a.join(b, "s").where(F.col("doc_a") < F.col("doc_b"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cc_clusters_read_from_versioned_store(spark):
    """VERDICT r9 #3: every cluster consumer reads the CC labelling from
    the VERSIONED STORE TABLE — the consumer-side frame is a bare
    parquet scan of the committed version (zero Exchange, zero joins:
    the label-propagation loop is NOT re-run per consumer)."""
    from tagtree_spark.queries_ext import _cc_store_dir, _clusters
    from tagtree_spark.tsdb.store import committed_version

    sf = "/root/testdata/sf0.001"
    df = _clusters(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower(), plan[:2000]
    assert "Join" not in plan, plan[:2000]
    assert "Exchange" not in plan, plan[:2000]
    assert committed_version(_cc_store_dir(spark, sf)) is not None


def test_wb_store_probe_prunes_bucket_partitions(spark):
    """The persisted hyperplane-LSH bucket table (VERDICT r10 #4 — _wb
    committed through versioned_overwrite, partitioned by bucket) must
    answer the q33 probe from ONE bucket directory: PartitionFilters on
    bucket in the pruned scan, and results bit-identical to the
    in-memory lsh_bucket_topk path."""
    from tagtree_spark.operators.similarity import bucket_store_topk, lsh_bucket_topk
    from tagtree_spark.queries_ext import _emb, _wb, _wb_store_dir

    sf = "/root/testdata/sf0.001"
    d = _wb_store_dir(spark, sf)
    got = bucket_store_topk(spark, d, query_id=0, k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    mem = lsh_bucket_topk(_emb(spark, sf), query_id=0, k=5, wb=_wb(spark, sf))
    want = [(r.vec_id, r.bucket, r.score) for r in mem.collect()]
    assert [(r.vec_id, r.bucket, r.score) for r in got.collect()] == want


def test_stats_unpartitioned_windows_are_post_aggregation(spark):
    """q341 (BH ranking) and q344 (bootstrap percentile picks) use
    PARTITION-LESS windows — safe only because their inputs are bounded
    post-aggregation frames (≤ |event_types| rows / bounded replicate
    count). Pin that: every partition-less Window in the optimized plan
    must have an Aggregate in its subtree, so a future edit can't
    silently move the window onto raw event rows (VERDICT r11 #8)."""
    import __spark_entry__ as entry

    from tagtree_spark.plans.inspect import (
        unpartitioned_windows_over_aggregate,
        windows_over_aggregate,
    )

    qs = entry.queries()
    # q341's BH ranking window is literally partition-less (m = 5 rows)
    df = qs["q341_bh_fdr"](spark, SF)
    flags = unpartitioned_windows_over_aggregate(df)
    assert flags, "q341: expected at least one partition-less window"
    assert all(flags), "q341: partition-less window over raw rows"
    # q344's percentile-pick windows partition by event_type but are
    # bounded only because the frame is per-(type, replicate) AGGREGATED
    # sums, not raw event rows — pin every window above an Aggregate
    df = qs["q344_bootstrap_ci"](spark, SF)
    flags = windows_over_aggregate(df, only_unpartitioned=False)
    assert flags, "q344: expected windows in the plan"
    assert all(flags), "q344: a window runs over raw rows"


def test_expr_store_metric_keeps_partition_filters(spark, events):
    """q377's registry twin: the SAME expression string evaluated against
    a STORE-backed metric must keep the persisted layout's pruning — the
    selector's postings scan shows a PartitionFilters entry on ``name``
    even when reached through the expression front-end's registry
    (VERDICT r12 next #2's plan pin)."""
    import re
    import shutil
    import tempfile

    from tagtree_spark.tsdb.exprlang import evaluate
    from tagtree_spark.tsdb.store import load_model, materialize_model
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-expr-store-")
    try:
        materialize_model(spark, events, d)
        series, postings, samples = load_model(spark, d)
        q = evaluate(
            'sum by (event_type) (rate(events_store{event_type="click"}[1d]))',
            metrics={"events_store": (samples, postings, series)},
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert any("name" in f and f.strip() for f in pf), plan
    finally:
        shutil.rmtree(d, ignore_errors=True)
