"""Scale-up smoke for the quadratic-risk dedup/ANN family (VERDICT r5
item 4): synthesize an ~Nx corpus locally and measure how the bucketed
pair/ANN queries grow with it.

The caps and prefix/band bounds argue by PLAN SHAPE that candidate
generation is linear in the corpus; this tool checks it EMPIRICALLY:

  * documents x N — copy i shifts doc_id by i*ID_OFFSET and suffixes every
    word with "~i", so copies keep the within-copy similarity structure but
    share no shingles ACROSS copies. True near-dup/candidate counts (and
    output rows) therefore scale ~N x sf0.1, which is exactly the regime
    the linearity claim is about (a naive all-pairs join would grow N^2).
  * embeddings x N — copy i shifts vec_id and ROTATES the vector by i
    positions (norms and pairwise within-copy geometry preserved, copies
    decorrelated), labels kept.
  * every other table is symlinked from the source sf dir.

Usage:
    python tools/scaleup.py             # N=10 vs sf0.1, the headline table
    python tools/scaleup.py --n 4       # quicker sanity run

Prints a markdown table (paste into SCALE.md): per query, rows + wall at
1x and Nx, and the wall ratio. Ratio ~= N (against an Nx candidate set)
confirms linear growth; ~= N^2 would flag an all-pairs path. Timings are
single-run local[32] walls — +-30% host variance applies (BASELINE.md).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tagtree_spark.io import TABLES  # noqa: E402
from tagtree_spark.session import get_spark  # noqa: E402

ID_OFFSET = 10_000_000

#: The quadratic-risk family named by the verdict: shingle/band dedup
#: (q25/q32/q126), fingerprint near-dup over decoded media (q139-q141),
#: simhash (q28). These bucket on CONTENT (band signatures / shingle
#: hashes), so distinct-content copies create NEW buckets and candidates
#: scale linearly. The embedding-LSH family (q151 etc.) is measured
#: separately if asked via --only: at FIXED n_planes its bucket occupancy
#: grows with the corpus until MAX_BUCKET drops hot buckets (visible as
#: fewer output rows at Nx) — the documented contract is to raise
#: n_planes with corpus size, so a fixed-parameter Nx run exercises the
#: cap telemetry, not linearity.
QUERIES = (
    "q25_minhash_neardup",
    "q28_simhash_neardup",
    "q32_ngram_jaccard",
    "q126_prefix_filter",
    "q139_image_dhash",
    "q140_audio_neardup",
    "q141_video_neardup",
    # r8 additions: the cluster-graph consumers — candidate pairs scale
    # ~N (per the family above), so the CC labelling, the fixed-round
    # k-core peel, and the within-cluster medoid pairwise step must too
    # (cluster SIZES stay constant across copies; only their COUNT grows)
    "q216_kcore",
    "q224_medoid_survivors",
    # r8-continuation additions: the CEP/behavior family — events scale by
    # user-copy (user_id/event_id shifted per copy, timestamps kept), so
    # per-user sequences are IDENTICAL across copies and match counts /
    # motif supports must scale exactly N x (per-key state is constant)
    "q238_sequence_match",
    "q244_session_cep",
    "q248_behavior_motifs",
)

#: VERDICT r8 #4: the overflow-prone exact-integer families + the
#: iterative families, for DEEP scale-ups (--n 100). The r5 HLL bug class
#: — ANSI ARITHMETIC_OVERFLOW that only fires on data shapes reaching
#: int64 limits — is found by scale DIVERSITY, not by more queries: sums
#: of shifted/scaled integer terms grow linearly with row count, so a
#: 100x corpus probes two more decimal orders of magnitude of headroom.
#: A failure here is an exception (ANSI throws), not a wrong number.
OVERFLOW_QUERIES = (
    "q101_hll_distinct",      # HLL register sums (the r5 bug's family)
    "q102_hll_by_group",
    "q109_cms_heavy_hitters",  # CMS counter sums
    "q123_kmv_distinct",       # KMV h60 aggregates
    "q239_cuped",              # n·Σxy − Σx·Σy exact-integer moments
    "q245_pmi_collocations",   # scaled log2 fixed-point + pair counts
    "q249_decayed_engagement", # 1<<k exact power-of-two weights
    "q258_centroid_drift",     # bigint element-sums, cleared-denominator squares
    "q260_dup_span_coverage",  # window-hash df counts + coverage explode
    "q274_exactsubstr_trim",   # r10: affected-doc reassembly + anti-join
    "q278_window_df_spectrum", # r10: occurrence-count sums
    # r10 exact-integer stats family over Nx events: rank/cdf sums grow
    # ~N^2 in magnitude and q296's cross-products ~N^3 per side (its
    # final comparison deliberately multiplies in double — the exact
    # 4-way product is the one thing that WOULD overflow DECIMAL(38,0)
    # near 100x, so this probes that the fix holds)
    "q294_mann_whitney",
    "q295_ks_distance",
    "q296_permutation_test",
    # iterative families: convergence depth / state growth vs corpus
    "q45_neardup_clusters",    # CC label propagation rounds
    "q216_kcore",              # convergence-checked peel (r9)
    "q238_sequence_match",     # CEP per-key sequence state
    # r10b exact-integer rank/sketch additions: doubled rank sums reach
    # n(n+1) (~4e14 at 100x), their squares ride DECIMAL(38,0)/HUGEINT
    # (kw_h_expr), Spearman per-term products c·2rx·2ry ~ 4n^3 forced
    # the rule-7 per-term DECIMAL casts this probes; the quantile
    # sketch's rank targets and the Kendall union-merge products grow
    # the same way. q314/q315 (embeddings) are probed separately at a
    # smaller --n: the moment explode is 64^2 per vector, so 100x
    # documents would time the explode, not the overflow headroom.
    "q301_kruskal_wallis",
    "q303_spearman_trend",
    "q304_autocorrelation",
    "q309_logquantile_sketch",
    "q310_logquantile_merge",
    "q312_bigram_coverage",
    "q313_kendall_tau",
)


def build_scaled_dir(spark, src_dir: str, out_dir: str, n: int) -> None:
    """Materialize the Nx corpus under out_dir (idempotent: rebuilt fresh)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for t in TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        os.symlink(
            os.path.join(src_dir, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet")
        )

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    copies = []
    for i in range(n):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * ID_OFFSET)).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                # suffix every word with the copy tag (JVM-side regex; a
                # Python lambda in F.transform would mis-bind the index)
                else F.regexp_replace("text", r"(\S+)", f"$1~{i}")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.parquet(os.path.join(out_dir, "documents.parquet"))

    from tagtree_spark.io import load_table as _lt

    ev = _lt(spark, src_dir, "events")
    ecopies_ev = []
    for i in range(n):
        ecopies_ev.append(
            ev.select(
                (F.col("event_id") + F.lit(i * ID_OFFSET)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * ID_OFFSET)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    evall = ecopies_ev[0]
    for c in ecopies_ev[1:]:
        evall = evall.unionByName(c)
    evall.repartition(32).write.parquet(os.path.join(out_dir, "events.parquet"))

    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    ecopies = []
    for i in range(n):
        rot = i % dim
        vec = (
            F.col("embedding")
            if rot == 0
            else F.concat(
                F.slice("embedding", rot + 1, dim - rot), F.slice("embedding", 1, rot)
            )
        )
        ecopies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * ID_OFFSET)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.repartition(32).write.parquet(os.path.join(out_dir, "embeddings.parquet"))


#: key columns shifted per copy for the FULL-inventory scaled dir — join
#: keys shift coherently (lineitem.l_orderkey matches orders.o_orderkey,
#: etc.), non-key attributes and dates stay, so every join/agg plan sees a
#: genuinely Nx fact universe. nation/region are fixed dims (symlinked).
_TPCH_KEY_SHIFTS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
}


def build_full_scaled_dir(spark, src_dir: str, out_dir: str, n: int) -> None:
    """Nx EVERY fact table (VERDICT r10 #6 — the sf1 full-inventory
    sweep): documents/embeddings/events via build_scaled_dir's
    decorrelated copies, plus the TPC-H facts with coherent key shifts;
    only the fixed dims (nation/region) stay 1x."""
    build_scaled_dir(spark, src_dir, out_dir, n)
    for t, keys in _TPCH_KEY_SHIFTS.items():
        link = os.path.join(out_dir, f"{t}.parquet")
        os.remove(link)  # drop the symlink build_scaled_dir made
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        copies = []
        for i in range(n):
            copies.append(
                df.select(
                    *[
                        (F.col(c) + F.lit(i * ID_OFFSET)).alias(c)
                        if c in keys
                        else F.col(c)
                        for c in df.columns
                    ]
                )
            )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(32).write.parquet(link)


def run_full_sweep(spark, src_dir: str, out_dir: str, n: int) -> None:
    """Run the ENTIRE query inventory once at 1x and once at Nx —
    one-time builds forced up front at each scale so per-query walls are
    steady-state — and print the markdown table sorted by ratio, worst
    first. Done-criterion: any >3x-scaling query gets a named cause in
    SCALE.md."""
    import __spark_entry__ as entry
    from tagtree_spark.queries_ext import one_time_builders
    from tagtree_spark.session import release_tracked

    qs = entry.queries()
    rows = []
    for sf in (src_dir, out_dir):
        t0 = time.perf_counter()
        for bname, build in one_time_builders().items():
            try:
                build(spark, sf)
            except Exception as exc:
                print(f"one-time {bname} @ {sf}: {exc!r}", file=sys.stderr)
        print(
            f"one-time builds @ {os.path.basename(sf)}: "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    for name, fn in qs.items():
        try:
            r1, w1 = time_query(fn, spark, src_dir)
            rn, wn = time_query(fn, spark, out_dir)
            rows.append((name, r1, w1, rn, wn, wn / w1 if w1 > 0 else 0.0))
        except Exception as exc:
            print(f"{name}: FAILED {exc!r}", file=sys.stderr)
            rows.append((name, -1, -1.0, -1, -1.0, -1.0))
        release_tracked()
    rows.sort(key=lambda r: -r[5])
    tot1 = sum(r[2] for r in rows if r[2] > 0)
    totn = sum(r[4] for r in rows if r[4] > 0)
    print(
        f"TOTAL: 1x {tot1:.1f}s, {n}x {totn:.1f}s, ratio {totn / tot1:.2f}x "
        f"over {len(rows)} queries",
        flush=True,
    )
    print(f"| query | rows 1x | wall 1x | rows {n}x | wall {n}x | ratio |")
    print("|---|---|---|---|---|---|")
    for name, r1, w1, rn, wn, ratio in rows:
        print(
            f"| {name} | {r1} | {w1:.2f}s | {rn} | {wn:.2f}s | {ratio:.1f}x |",
            flush=True,
        )


def build_series_scaled_dir(spark, src_dir: str, out_dir: str, n: int) -> None:
    """SERIES-count explosion (VERDICT r12 #5): Nx the label VOCABULARY,
    not just sample volume — copy i suffixes event_type with "~i" (new
    label values → new series/postings entries) and shifts event/user
    ids for uniqueness, so the derived model has N× the series at the
    SAME samples-per-series. This is the regime the vocabulary-bounded
    collect_list folds in exprlang's _agg_by/_over_subquery ride, and
    the index-cardinality bound of q351's driver-side tree build."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t == "events":
            continue
        src = os.path.join(src_dir, f"{t}.parquet")
        link = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(link):
            os.symlink(src, link)
    from tagtree_spark.io import load_table as _lt

    ev = _lt(spark, src_dir, "events")
    copies = []
    for i in range(n):
        copies.append(
            ev.select(
                (F.col("event_id") + F.lit(i * ID_OFFSET)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * ID_OFFSET)).alias("user_id"),
                F.concat(F.col("event_type"), F.lit(f"~{i}")).alias("event_type"),
                "value",
                "props",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.parquet(os.path.join(out_dir, "events.parquet"))


def run_series_sweep(spark, src_dir: str, out_dir: str, n: int) -> None:
    """Time the expression-family fold shapes at 1x and Nx SERIES: the
    `by`-grouped folds whose per-group collect_list grows with series
    count (sum by user_bucket: 10 groups × 25N series; global sum: one
    group × 250N per bucket), the group-count-scaled form (sum by
    event_type: 5N groups × 50), the per-series subquery fold, and the
    registered q351 tree walk (index cardinality ×N driver-side)."""
    import __spark_entry__ as entry
    from tagtree_spark.queries import _model
    from tagtree_spark.tsdb.exprlang import evaluate

    exprs = [
        ("sum_by_event_type_5N_groups", "sum by (event_type) (rate(events_total[1d]))"),
        ("sum_by_user_bucket_fold_25N", "sum by (user_bucket) (rate(events_total[1d]))"),
        ("global_sum_fold_250N", "sum(rate(events_total[1d]))"),
        ("subq_fold_per_series", "sum_over_time(rate(events_total[1d])[:1d])"),
        ("topk3_over_250N_series", "topk(3, last_over_time(events_total[1d]))"),
    ]
    print(f"| shape | rows 1x | wall 1x | rows {n}x | wall {n}x | ratio |")
    print("|---|---|---|---|---|---|")
    for label, ex in exprs:
        walls = []
        for sf in (src_dir, out_dir):
            series, postings, samples = _model(spark, sf)
            t0 = time.perf_counter()
            cnt = evaluate(ex, samples, postings, series=series).count()
            walls.append((cnt, time.perf_counter() - t0))
        (r1, w1), (rn, wn) = walls
        print(
            f"| {label} | {r1} | {w1:.2f}s | {rn} | {wn:.2f}s | "
            f"{wn / w1:.1f}x |",
            flush=True,
        )
    qs = entry.queries()
    for name in ("q351_cow_tree_walk",):
        r1, w1 = time_query(qs[name], spark, src_dir)
        rn, wn = time_query(qs[name], spark, out_dir)
        print(
            f"| {name} | {r1} | {w1:.2f}s | {rn} | {wn:.2f}s | "
            f"{wn / w1:.1f}x |",
            flush=True,
        )


def run_skew_case(spark, n_edges: int) -> None:
    """Adversarial SKEW stress for the iterative CC/k-core family
    (VERDICT r9 #6): the 100x sweep grew data uniformly; here ONE giant
    component holds ~50% of all edges — a hub node alone carries half
    the edge rows (the hot-key regime for the per-round label join +
    min-groupBy) plus a 16-deep chain for multi-round propagation — vs
    a same-edge-count uniform graph of disjoint single-edge components.
    Prints walls for plain and pointer-jumping (compress=True) CC and
    the k-core peel; the pass criterion is the skew/uniform ratio
    staying within the sweep's per-round bounds (no blow-up from the
    hot key — AQE skew-join splitting plus the min-aggregation's
    map-side partial combine absorb it)."""
    from tagtree_spark.operators.dedup import near_dup_clusters
    from tagtree_spark.operators.graph import kcore

    half = n_edges // 2
    depth = 16
    off = 1_000_000_000

    uni = spark.range(n_edges).select(
        (F.col("id") * 2).alias("doc_a"), (F.col("id") * 2 + 1).alias("doc_b")
    )
    # giant component: hub 0 → half-depth leaves, chain 0-1-...-depth
    hub = spark.range(half - depth).select(
        F.lit(0).cast("long").alias("doc_a"),
        (F.col("id") + 100 + depth).alias("doc_b"),
    )
    chain = spark.range(depth).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    rest = spark.range(n_edges - half).select(
        (F.col("id") * 2 + off).alias("doc_a"),
        (F.col("id") * 2 + 1 + off).alias("doc_b"),
    )
    skew = hub.unionByName(chain).unionByName(rest)

    def cc_wall(pairs, compress):
        t0 = time.perf_counter()
        n = near_dup_clusters(pairs, max_iters=40, compress=compress).count()
        return n, time.perf_counter() - t0

    print("| case | edges | labelled nodes | wall | vs uniform |")
    print("|---|---|---|---|---|")
    n_u, w_u = cc_wall(uni, False)
    print(f"| CC uniform | {n_edges} | {n_u} | {w_u:.2f}s | 1.0x |", flush=True)
    n_s, w_s = cc_wall(skew, False)
    print(f"| CC skew (50% one comp) | {n_edges} | {n_s} | {w_s:.2f}s | {w_s / w_u:.1f}x |", flush=True)
    n_sc, w_sc = cc_wall(skew, True)
    print(f"| CC skew, pointer-jump | {n_edges} | {n_sc} | {w_sc:.2f}s | {w_sc / w_u:.1f}x |", flush=True)
    t0 = time.perf_counter()
    k_n = kcore(skew, k=2).count()
    print(f"| k-core(2) skew | {n_edges} | {k_n} | {time.perf_counter() - t0:.2f}s | — |", flush=True)


def time_query(fn, spark, sf_dir: str) -> tuple[int, float]:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    return n, time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10, help="scale multiplier")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None, help="comma-separated query subset")
    ap.add_argument(
        "--family",
        choices=("dedup", "overflow", "skew", "full", "series"),
        default="dedup",
        help="query family: dedup (the quadratic-risk list), overflow "
        "(exact-integer + iterative families for deep --n runs), skew "
        "(synthetic hot-component CC/k-core stress; --n scales edge count "
        "in millions), full (the ENTIRE inventory at 1x and Nx with "
        "every fact table scaled — the sf1 sweep, VERDICT r10 #6), or "
        "series (Nx the label VOCABULARY/series count at constant "
        "samples-per-series — the exprlang fold-bound probe, r13)",
    )
    args = ap.parse_args()
    # symlink targets resolve relative to the LINK's directory, not the
    # CWD — a relative --src would create dangling links (review r7)
    args.src = os.path.abspath(args.src)

    spark = get_spark("tagtree-scaleup")
    if args.family == "skew":
        run_skew_case(spark, n_edges=args.n * 1_000_000)
        return 0
    out_dir = os.path.abspath(f".tmp/scaleup-x{args.n}")
    print(f"building x{args.n} corpus under {out_dir} ...", file=sys.stderr)
    t0 = time.perf_counter()
    if args.family == "full":
        build_full_scaled_dir(spark, args.src, out_dir, args.n)
        print(f"built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        run_full_sweep(spark, args.src, out_dir, args.n)
        shutil.rmtree(out_dir, ignore_errors=True)
        return 0
    if args.family == "series":
        out_dir = os.path.abspath(f".tmp/scaleup-series-x{args.n}")
        build_series_scaled_dir(spark, args.src, out_dir, args.n)
        print(f"built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        run_series_sweep(spark, args.src, out_dir, args.n)
        shutil.rmtree(out_dir, ignore_errors=True)
        return 0
    build_scaled_dir(spark, args.src, out_dir, args.n)
    print(f"built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    import __spark_entry__ as entry

    qs = entry.queries()
    fam = QUERIES if args.family == "dedup" else OVERFLOW_QUERIES
    names = args.only.split(",") if args.only else list(fam)
    print(f"| query | rows 1x | wall 1x | rows {args.n}x | wall {args.n}x | ratio |")
    print("|---|---|---|---|---|---|")
    # Per-query warm-up at sf0.01 (a third, tiny sf dir): warms JVM
    # codegen for the query's exact plan shape and the python worker pool
    # without touching either timed scale's caches. The timed runs are
    # then COLD at each scale — several of these queries persist shared
    # base tables and even their own pair output per (session, sf_dir), so
    # a repeat run at the same scale would measure a cache read, not the
    # pipeline. Cold-vs-cold keeps the ratio apples-to-apples (both sides
    # include their linear map-only base pass).
    warm_dir = os.path.join(os.path.dirname(args.src.rstrip("/")), "sf0.01")

    for name in names:
        fn = qs[name]
        if os.path.isdir(warm_dir):
            fn(spark, warm_dir).count()
        r1, w1 = time_query(fn, spark, args.src)
        rn, wn = time_query(fn, spark, out_dir)
        print(
            f"| {name} | {r1} | {w1:.2f}s | {rn} | {wn:.2f}s | "
            f"{wn / w1:.1f}x |",
            flush=True,
        )
    shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
