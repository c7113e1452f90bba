"""Plan-quality inventory: for every registered query, summarize the
physical plan properties that matter at 100 TB — exchange count, parquet
scan count, whole-stage-codegen coverage, broadcast joins, cartesians,
single-partition exchanges, and whether every scan prunes columns.

Usage:
    python tools/planaudit.py [--sf DIR] [--only name[,name...]]

Prints one line per query plus a summary; exits non-zero if any query has
a CartesianProduct (the one unconditional red flag — broadcast-1-row
cross joins show as BroadcastNestedLoopJoin and are allowed, each one
hand-audited in its operator's docstring).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tagtree_spark.session import get_spark, release_tracked  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark("tagtree-planaudit", cpus=4)
    import __spark_entry__ as entry

    qs = entry.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    bad = []
    print(f"{'query':34s} {'exch':>4} {'scan':>4} {'wscg':>4} {'bcast':>5} "
          f"{'1part':>5} {'cart':>4} full-width-scans")
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name:34s} ERROR {exc!r}")
            bad.append(name)
            continue
        finally:
            release_tracked()
        n_exch = plan.count("Exchange ")
        n_scan = plan.count("Scan parquet")
        n_wscg = plan.count("WholeStageCodegen")
        n_bcast = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
        n_1part = plan.count("Exchange SinglePartition")
        cart = "CartesianProduct" in plan
        # scans that read every column of a driver table (no pruning) —
        # heuristic: ReadSchema with >8 fields
        import re

        wide = [
            s
            for s in re.findall(r"ReadSchema: struct<([^>]*)", plan)
            if s.count(",") >= 8
        ]
        if cart:
            bad.append(name)
        print(
            f"{name:34s} {n_exch:4d} {n_scan:4d} {n_wscg:4d} {n_bcast:5d} "
            f"{n_1part:5d} {str(cart):>4} {len(wide)}"
        )
    if bad:
        print(f"\nFAIL: {bad}")
        return 1
    print("\nOK: no cartesian products; audit columns above are informational")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
