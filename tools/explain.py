"""Dump formatted physical plans for headline queries — the plan-first
feedback loop in tool form.

    python tools/explain.py q25_minhash_neardup q80_regional_volume
    python tools/explain.py --all          # every registered query

Prints each query's `.explain("formatted")` output plus a one-line audit:
exchange count, single-partition exchange count, broadcast joins,
cartesians, pushed filters present. The audit flags are the same
properties tests/test_plans.py pins; this tool is for eyeballing NEW
queries before they get a pinned test.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tagtree_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("tagtree-explain")

    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs) if "--all" in sys.argv else args
    unknown = [n for n in names if n not in qs]
    if unknown or not names:
        print(f"unknown or missing query names: {unknown or '(none given)'}")
        print("available:", ", ".join(qs))
        return 1

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_single = plan.count("SinglePartition")
        n_bhj = plan.count("BroadcastHashJoin")
        n_cart = plan.count("CartesianProduct")
        pushed = "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        )
        print(f"\n{'=' * 78}\n{name}")
        print(
            f"  exchanges={n_ex} single_partition={n_single} "
            f"broadcast_joins={n_bhj} cartesians={n_cart} pushed_filters={pushed}"
        )
        print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
