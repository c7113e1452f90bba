"""Local stand-in for the driver's correctness gate: run every entry in
``__spark_entry__.queries()`` on Spark and its ``oracle_sql()`` on duckdb
over the same sf dir, then compare row counts + order-insensitive values.

Usage: python tools/parity.py [--sf /root/testdata/sf0.01] [--only q01_eql,...]
"""

from __future__ import annotations

import argparse
import decimal
import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from tagtree_spark.io import TABLES  # noqa: E402
from tagtree_spark.session import get_spark, release_tracked  # noqa: E402


def _norm_cell(v):
    # TYPE-FAITHFUL comparison — must be at least as strict as the driver's
    # value hash. r1 lesson (VERDICT.md "What's wrong" #3): normalizing
    # Decimal scale here masked the driver's Decimal-vs-float64 mismatch.
    # A Spark Decimal('10759.3900') and a duckdb float64 10759.39 must
    # compare UNEQUAL so the bug class surfaces locally.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"float:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, (int,)):
        return f"int:{v}"
    if pd.isna(v):
        return "NULL"
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    keys = args.only.split(",") if args.only else list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    spark = get_spark("parity")
    failures = []
    for name in keys:
        t0 = time.time()
        release_tracked()  # per-query operator caches must not accumulate
        try:
            spark_pd = qs[name](spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns spark={s_cols} duck={d_cols}")
            failures.append(name)
            continue
        s, d = normalize(spark_pd), normalize(duck_pd)
        if len(s) != len(d):
            print(f"FAIL  {name}: rowcount spark={len(s)} duck={len(d)}")
            failures.append(name)
            continue
        diffs = [(a, b) for a, b in zip(s, d) if a != b]
        if diffs:
            print(f"FAIL  {name}: {len(diffs)} differing rows; first: spark={diffs[0][0]} duck={diffs[0][1]}")
            print(f"      spark dtypes: {dict(spark_pd.dtypes.astype(str))}")
            print(f"      duck  dtypes: {dict(duck_pd.dtypes.astype(str))}")
            failures.append(name)
            continue
        print(f"PASS  {name} ({len(s)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(keys)-len(failures)}/{len(keys)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
