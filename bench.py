"""Benchmark harness: run the full query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print TWO
JSON lines — the detailed record then a compact totals-only record:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {"q01_eql": sec, ...},
     "spread": {"q01_eql": [min, max], ...}, "wall_sec": W, "sf": 0.1}

"queries" carries the per-query MIN of the two timed runs (the comparable
metric); "spread" carries [min, max] of both runs so a one-off outlier is
self-identifying from the artifact alone (r4: three queries read 2-5x
slower in the driver tail purely from host contention — with the spread
recorded, a wide [min,max] on an unchanged query reads as noise, not a
regression, without a re-run).
    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {"q01_eql": sec, ...}, "wall_sec": W,
     "sf": 0.1, "n_queries": Q, "n_failed": 0, "failed": []}

The LAST line is always small enough to survive a bounded tail capture
(the detailed line outgrew the driver's window at ~100 queries, r3; the
per-query minima map was ADDED to it in r14 — VERDICT r13 #1 — because
the driver parses only this line and had no per-query comparison without
it; it is ~1/3 the detailed line's size).
"canary"/"canary_ratio" (r11): three pinned cheap queries re-timed at the
END of the run vs the START — a contended host reads ratio >> 1.0, so an
inflated session self-identifies from the artifact alone.
Execution is forced through the noop sink (full plan runs, nothing is
transferred to the driver) — collect() would make the bench measure driver
materialization instead of the engine. All Spark logs go to stderr; stdout
carries exactly the two JSON lines.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tagtree_spark.session import get_spark, release_tracked  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    return float(m.group(1)) if m else 0.0


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tagtree-bench")

    import __spark_entry__ as entry

    qs = entry.queries()

    # Warm-up (outside the timed window): JVM codegen, parquet footer reads,
    # and Python worker pool (mapInPandas queries otherwise pay interpreter
    # startup on first use).
    from tagtree_spark.io import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, sf_dir, "lineitem").count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # One-time session cache/store builds, timed SEPARATELY (VERDICT r8
    # #5): these are materialize-once artifacts (shingle table, CC labels,
    # persisted/streamed stores) that every consumer query shares — timing
    # them inside the first consumer's run polluted round-over-round
    # comparison (q217 spread [1.2s, 11.0s]). Reported as the "one_time"
    # map; the per-query loop below then measures steady-state cost.
    from tagtree_spark.queries_ext import one_time_builders

    one_time: dict[str, float] = {}
    for bname, build in one_time_builders().items():
        t0 = time.time()
        try:
            build(spark, sf_dir)
            one_time[bname] = round(time.time() - t0, 3)
        except Exception as exc:
            print(f"bench: one-time build {bname} failed: {exc!r}", file=sys.stderr)
            one_time[bname] = -1.0
    one_time_total = round(sum(v for v in one_time.values() if v > 0), 3)
    # a failed build means its first consumer query silently re-pays the
    # build inside its timed run — surface that in the JSON so a polluted
    # per-query round is distinguishable from a clean one (ADVICE r9)
    one_time_failed = sorted(n for n, v in one_time.items() if v < 0)

    # Contention canary (VERDICT r10 #2): three pinned cheap queries timed
    # best-of-2 BEFORE and AFTER the main loop. On a quiet host the
    # end/start ratio sits near 1.0; a contended session reads high — so an
    # inflated total self-identifies quantitatively from the artifact alone
    # instead of needing a cross-round per-query diff.
    canary_names = [
        n for n in ("q01_eql", "q126_prefix_filter", "q216_kcore") if n in qs
    ]

    def _canary_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for n in canary_names:
            runs = []
            for _ in range(2):
                t0 = time.time()
                run_query(qs[n](spark, sf_dir))
                runs.append(time.time() - t0)
            out[n] = round(min(runs), 3)
            release_tracked()
        return out

    # Untimed settle pass (VERDICT r11 #5): the start canary used to run
    # IMMEDIATELY after the one-time builds, while the session was still
    # build-hot (GC debt, executor-thread churn, page-cache eviction) —
    # r11's driver artifact read its start pass ~3x slow (canary_ratio
    # 0.689, i.e. the END was the honest number). One untimed run of each
    # canary absorbs that adjacency for a bounded ~5s cost, so the timed
    # start pass measures steady state and ratio ~1.0 on a quiet host.
    for n in canary_names:
        run_query(qs[n](spark, sf_dir))
        release_tracked()

    # Host-load stamp (VERDICT r12 #6): the canary detects contention only
    # AFTER the run (end/start ratio); both judge r12 sessions burned ~15
    # min discovering their hosts were hot. getloadavg() before/after the
    # timed window makes a contended host visible from the artifact — and
    # BEFORE interpreting `value` (interpretation rule in BASELINE.md:
    # 1-min load >> cpu count at either stamp ⇒ treat `value` as inflated).
    loadavg_start = [round(v, 2) for v in os.getloadavg()]

    canary_start = _canary_pass()

    # Best-of-2 per query: this host shows ±30% run-to-run noise; the min
    # is a far stabler round-over-round signal than a single cold sample.
    # "value" = sum of per-query minima (the comparable metric); true
    # wall-clock of the whole run is reported as wall_sec.
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    t_all = time.time()
    for name, fn in qs.items():
        runs: list[float] = []
        for rep in range(2):
            # label jobs (guide §1.5) so an event-log/UI session attributes
            # stages to queries; no-op for the timing itself
            spark.sparkContext.setJobDescription(f"bench::{name}::{rep}")
            t0 = time.time()
            try:
                run_query(fn(spark, sf_dir))
                runs.append(time.time() - t0)
            except Exception as exc:  # keep benching; a broken query reads as -1
                print(f"bench: {name} failed: {exc!r}", file=sys.stderr)
                runs = []
                break
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(runs), 3) if runs else -1.0
        spreads[name] = (
            [round(min(runs), 3), round(max(runs), 3)] if runs else [-1.0, -1.0]
        )
        # operator-level caches are per-query; don't let 50 queries' worth
        # of persisted signature/bucket tables pile up in one session
        release_tracked()
    wall = round(time.time() - t_all, 3)
    total = round(sum(v for v in timings.values() if v > 0), 3)

    canary_end = _canary_pass()
    loadavg_end = [round(v, 2) for v in os.getloadavg()]
    c_start = sum(canary_start.values())
    canary_ratio = (
        round(sum(canary_end.values()) / c_start, 3) if c_start > 0 else -1.0
    )
    canary = {
        n: [canary_start[n], canary_end[n]] for n in canary_names
    }

    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "one_time": one_time,
                "one_time_sec": one_time_total,
                "one_time_failed": one_time_failed,
                "canary": canary,
                "canary_ratio": canary_ratio,
                "loadavg_start": loadavg_start,
                "loadavg_end": loadavg_end,
                "wall_sec": wall,
                "sf": _sf_of(sf_dir),
            }
        )
    )
    # Tail-proof summary: with ~100 queries the detailed line can outgrow a
    # bounded tail capture (r3: BENCH parsed null). The LAST stdout line is
    # always this compact, parseable record. r14 (VERDICT r13 #1/#2): the
    # driver parses ONLY this line, so round-over-round per-query
    # comparability needs the best-of-2 minima map HERE as well — additive
    # "queries" field, every pre-existing field kept. ~13 KB for 388
    # queries (the r3 overflow was the detailed line's spread/one_time/
    # canary payload, ~3x bigger).
    failed = sorted(n for n, v in timings.items() if v < 0)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "one_time_sec": one_time_total,
                "one_time_failed": one_time_failed,
                "canary_ratio": canary_ratio,
                "loadavg_start": loadavg_start,
                "loadavg_end": loadavg_end,
                "wall_sec": wall,
                "sf": _sf_of(sf_dir),
                "n_queries": len(timings),
                "n_failed": len(failed),
                "failed": failed[:10],
            }
        )
    )
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
