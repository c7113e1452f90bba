"""Graph statistics over the near-dup pair graph (E2b's analysis
companion): degree, strict 2-hop reach, and per-node triangle counts —
the structural signals a dedup pipeline uses to tell chain-shaped false
positives (low clustering) from genuine duplicate cliques (high
clustering) before collapsing clusters.

All exact integer counts over the VERIFIED pair set (already bounded by
the LSH band caps upstream) — the graph frame is orders of magnitude
smaller than the corpus, and every join below keys on a node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_stats(pairs: DataFrame) -> DataFrame:
    """Per-node stats of the undirected graph given as ``(doc_a, doc_b)``
    pairs (one row per edge, doc_a < doc_b):

    - ``degree``: distinct direct neighbors;
    - ``n_two_hop``: nodes at distance EXACTLY 2 (neighbors-of-neighbors
      that are neither the node nor its direct neighbors) — the dedup
      blast radius one transitive step out;
    - ``n_tri``: triangles through the node (adjacent neighbor pairs) —
      the clustering signal (cliques ≫ chains).

    Shape: symmetrize → distinct neighbor set → one self-join for 2-hop,
    one wedge join + edge probe for triangles; every join keys on a node
    id. → ``(doc_id, degree, n_two_hop, n_tri)``.
    """
    ed = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    nb = ed.distinct()

    two = (
        nb.alias("a")
        .join(nb.alias("b"), F.col("a.v") == F.col("b.u"))
        .where(F.col("b.v") != F.col("a.u"))
        .select(F.col("a.u").alias("u"), F.col("b.v").alias("w"))
        .distinct()
    )
    strict2 = two.join(
        nb.select(F.col("u"), F.col("v").alias("w")), ["u", "w"], "left_anti"
    )
    c2 = strict2.groupBy("u").agg(F.count("*").cast("bigint").alias("n_two_hop"))

    wedge = (
        nb.alias("a")
        .join(nb.alias("b"), F.col("a.u") == F.col("b.u"))
        .where(F.col("a.v") < F.col("b.v"))
        .select(F.col("a.u").alias("u"), F.col("a.v").alias("x"), F.col("b.v").alias("y"))
    )
    tri = (
        wedge.join(
            nb.select(F.col("u").alias("x"), F.col("v").alias("y")), ["x", "y"]
        )
        .groupBy("u")
        .agg(F.count("*").cast("bigint").alias("n_tri"))
    )

    deg = nb.groupBy("u").agg(F.countDistinct("v").cast("bigint").alias("degree"))
    return (
        deg.join(c2, "u", "left")
        .join(tri, "u", "left")
        .select(
            F.col("u").alias("doc_id"),
            "degree",
            F.coalesce("n_two_hop", F.lit(0)).cast("bigint").alias("n_two_hop"),
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
        )
    )


def pagerank_int(
    pairs: DataFrame, iters: int = 3, scale: int = 10**9
) -> DataFrame:
    """Integer fixed-point PageRank over the undirected near-dup pair graph
    — the canonical iterative/Pregel-style computation, expressed as a
    join+groupBy loop (one shuffle per round, lineage cut per round like
    ``near_dup_clusters``'s label propagation).

    Exactness: ranks are BIGINT fixed-point at ``scale`` (1.0 ≡ 10^9).
    Each round: every node sends ``r div deg`` (integral division) along
    each edge; a node's new rank is ``(15·scale) div 100 + (85·Σ) div
    100``. Integer sums are associative/commutative — no fp anywhere, so
    the result is order-free and bit-identical cross-engine (DuckDB ``//``
    ≡ Spark ``div`` on non-negative integers).

    Overflow headroom: each contribution ≤ scale, so Σ ≤ deg·scale — a
    node would need ~9·10^9 neighbors to overflow int64; the upstream LSH
    band caps bound degree far below that.

    → ``(doc_id, degree, rank_fp)``, rank_fp ≥ (15·scale) div 100.
    """
    ed = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    nb = ed.distinct()
    deg = nb.groupBy("u").agg(F.count("*").cast("bigint").alias("deg"))
    base = (15 * scale) // 100

    rk = deg.select(
        F.col("u").alias("doc_id"), "deg", F.lit(scale).cast("bigint").alias("r")
    )
    for _ in range(iters):
        contrib = nb.join(
            rk.select("doc_id", "deg", "r"), nb["v"] == F.col("doc_id")
        ).select(F.col("u"), F.expr("r div deg").alias("c"))
        summed = contrib.groupBy("u").agg(F.sum("c").cast("bigint").alias("s"))
        rk = (
            deg.join(summed, "u", "left")
            .select(
                F.col("u").alias("doc_id"),
                "deg",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(f"(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return rk.select(
        "doc_id", F.col("deg").alias("degree"), F.col("r").alias("rank_fp")
    )


def triangle_stats(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Exact triangle census of an undirected pair graph → one row
    ``(n_triangles, n_wedges, closure_ppm)``: triangle count, open-wedge
    count (Σ C(deg, 2) — 2-paths through each node), and the global
    clustering coefficient 3·triangles/wedges as exact ppm.

    The duplicate-cluster sanity metric: near-dup graphs from transitive
    similarity should close their wedges (high closure); a low closure
    with large clusters means chained false positives (A~B~C but A≁C) —
    read this BEFORE trusting connected components as dedup groups.

    ``pairs`` must carry each undirected edge once with a_col < b_col
    (the near-dup family's convention) — that ordering IS the standard
    distributed triangle orientation: each triangle a<b<c is found
    exactly once as (a,b)+(b,c) closed by (a,c), so the enumeration join
    is two edge-table equi-joins with no dedup pass and no candidate
    counted twice. All integers; closure's product runs in DECIMAL(38,0)
    (3·tri·10^6 overflows int64 on a 100 TB graph)."""
    from tagtree_spark.session import persist_tracked

    # the edge frame feeds a 3-way self-join plus the degree union (5
    # plan references); persist so a caller handing in a raw near-dup
    # pipeline doesn't recompute it per reference (CLAUDE.md perf trap —
    # q207 happens to pass a cached pair set, but the operator must not
    # rely on its call sites for that)
    e = persist_tracked(
        pairs.select(
            F.col(a_col).cast("bigint").alias("a"),
            F.col(b_col).cast("bigint").alias("b"),
        )
    )
    e2 = e.select(F.col("a").alias("b2a"), F.col("b").alias("b2b"))
    e3 = e.select(F.col("a").alias("b3a"), F.col("b").alias("b3b"))
    tri = (
        e.join(e2, F.col("b") == F.col("b2a"))
        .join(e3, (F.col("b3a") == F.col("a")) & (F.col("b3b") == F.col("b2b")))
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    und = e.select("a").unionAll(e.select(F.col("b").alias("a")))
    deg = und.groupBy("a").agg(F.count("*").alias("d"))
    wed = deg.agg(
        F.coalesce(F.sum(F.expr("d * (d - 1) DIV 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges")
    )
    return tri.crossJoin(F.broadcast(wed)).select(
        "n_triangles",
        "n_wedges",
        F.expr(
            "CAST(CASE WHEN n_wedges > 0 THEN "
            "(3 * CAST(n_triangles AS DECIMAL(38,0)) * 1000000) DIV n_wedges "
            "ELSE 0 END AS BIGINT)"
        ).alias("closure_ppm"),
    )


def kcore(
    pairs: DataFrame,
    k: int = 2,
    max_iters: int = 30,
    seed: DataFrame | None = None,
) -> DataFrame:
    """k-core peel of the undirected pair graph, run to CONVERGENCE:
    round i keeps the nodes with ≥ ``k`` neighbors INSIDE round i-1's
    survivor set (round 0 = all nodes, or ``seed``'s ``doc_id`` set —
    pass a (k-1)-core to skip re-peeling what a stricter core can never
    keep, since the k-core is a subset of the (k-1)-core). Survivor sets
    shrink monotonically, so an unchanged survivor COUNT between rounds
    proves the set is a fixed point — exactly the k-core restricted to
    the seed (the maximal subgraph of minimum degree k — the "dense
    duplicate nucleus" vs chain periphery signal for E2b cluster
    triage). ``max_iters`` caps the peel DEPTH (longest chain of
    dependent removals — an adversarial path graph peels one layer per
    round); one EXTRA confirmation round runs beyond the cap so a peel
    whose depth equals ``max_iters`` exactly still converges (the final
    peel round reaches the fixed point; proving it takes one more equal
    count — ADVICE r9); exhausting it RAISES, like ``near_dup_clusters`` — a
    silently returned superset would poison downstream triage (VERDICT
    r8: the earlier fixed-round form assumed depth ≤ 4 by measurement,
    not by check). Each round is one self-join + groupBy on the pair
    graph — orders of magnitude smaller than the corpus — with an eager
    lineage cut per round; the convergence probe is one count() per
    round on the just-checkpointed survivors. All-integer counts →
    order-free, bit-identical cross-engine.

    → ``(doc_id, core_deg)``: converged survivors with their
    within-core degree.
    """
    from tagtree_spark.session import persist_tracked

    if max_iters < 1:
        raise ValueError("kcore: max_iters must be >= 1")
    # every round references nb twice (u-side and v-side join) — without
    # a persist the symmetrize+distinct shuffle re-runs 2·rounds times
    nb = persist_tracked(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
    )
    alive = (
        seed.select("doc_id")
        if seed is not None
        else nb.select(F.col("u").alias("doc_id")).distinct()
    )
    prev = None
    # max_iters bounds the peel DEPTH (rounds that CHANGE the set); one
    # extra round may run beyond it, but only as a pure CONFIRMATION --
    # if that round still shrinks the set the depth genuinely exceeds
    # the cap and the raise below fires
    for i in range(max_iters + 1):
        out = (
            nb.join(alive.select(F.col("doc_id").alias("u")), "u")
            .join(alive.select(F.col("doc_id").alias("v")), "v")
            .groupBy("u")
            .agg(F.count("*").cast("bigint").alias("core_deg"))
            .where(F.col("core_deg") >= k)
            # NOTE (r13, measured): eager=False here does NOT reduce the
            # per-round job count — the 37 jobs are AQE shuffle-stage
            # materializations, not the checkpoint action — so the
            # simpler eager form stays
            .localCheckpoint()
        )
        n = out.count()
        # monotone shrink ⇒ equal count ⇔ equal set ⇔ fixed point
        if prev is not None and n == prev:
            return out.select(F.col("u").alias("doc_id"), "core_deg")
        # the empty set is trivially fixed (every later round is also
        # empty) -- but reaching it IS a peel, so it must land within cap
        if n == 0 and i < max_iters:
            return out.select(F.col("u").alias("doc_id"), "core_deg")
        if i == max_iters:
            break  # the confirmation round still changed the set
        prev = n
        alive = out.select(F.col("u").alias("doc_id"))
    raise ValueError(
        f"kcore did not converge in {max_iters} rounds — raise max_iters "
        "(peel depth exceeds it; a path graph peels one layer per round)"
    )


def bfs_layers(
    pairs: DataFrame,
    seed_doc: int | None = None,
    max_iters: int = 30,
) -> DataFrame:
    """Breadth-first distance layers from ``seed_doc`` (default: the
    graph's min doc id) over the undirected pair graph, run to
    convergence — the reachability-depth primitive (how far does a dedup
    decision propagate from a given document?) and the measured
    eccentricity of the seed. Each round expands the frontier through
    one join and keeps only UNSEEN nodes (left_anti against the settled
    set), so a node's first discovery round IS its BFS distance; an
    empty frontier is the fixed point. ``max_iters`` caps the depth and
    RAISES past it, like :func:`kcore` — a silent truncation would
    understate reach. One extra round runs beyond the cap purely to
    CONFIRM emptiness, so a seed whose eccentricity equals ``max_iters``
    exactly still converges (ADVICE r9) — that round never settles new
    nodes; a non-empty frontier there raises. One join + anti-join per round on the pair graph
    (≪ corpus), eager lineage cut per round; all-integer output.

    → ``(dist, n_nodes)`` — one row per BFS layer, layer 0 = the seed.
    """
    from pyspark.sql import functions as F

    from tagtree_spark.session import persist_tracked

    nb = persist_tracked(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
    )
    if seed_doc is None:
        seed_doc = nb.agg(F.min("u")).first()[0]
        if seed_doc is None:
            raise ValueError("bfs_layers: empty graph")
    spark = pairs.sparkSession
    settled = spark.createDataFrame(
        [(int(seed_doc), 0)], "doc_id bigint, dist bigint"
    ).localCheckpoint()
    frontier = settled.select("doc_id")
    for d in range(1, max_iters + 2):
        nxt = (
            nb.join(frontier.select(F.col("doc_id").alias("u")), "u")
            .select(F.col("v").alias("doc_id"))
            .distinct()
            .join(settled.select("doc_id"), "doc_id", "left_anti")
            .withColumn("dist", F.lit(d).cast("bigint"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            return settled.groupBy("dist").agg(
                F.count("*").cast("bigint").alias("n_nodes")
            )
        if d > max_iters:
            break  # the confirmation round found MORE nodes — genuine overrun
        settled = settled.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("doc_id")
    raise ValueError(
        f"bfs_layers did not converge in {max_iters} rounds — raise "
        "max_iters (the seed's eccentricity exceeds it)"
    )
