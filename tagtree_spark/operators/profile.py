"""Table profiling — the data-quality sweep an analytics engine runs
before anything else touches a new table: per-column null counts, distinct
cardinality, and min/max, in ONE scan.

Shape: a single aggregate computes every column's stats (count-distincts
share one expand pass — k small aggregates beat k full scans by k×), then
an in-row ``stack`` unpivots the 1-row result into one row per column.
At 100 TB this is one pass over the table with map-side partial
aggregation; nothing is collected to the driver.

Cross-engine discipline: min/max are rendered as strings for the uniform
schema, so PROFILED COLUMNS MUST BE INT- OR STRING-TYPED — float-to-string
rendering differs between engines (Java shortest-double vs DuckDB's), and
the operator refuses floats rather than producing hash-unstable output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SAFE_PREFIXES = ("int", "bigint", "smallint", "tinyint", "string", "date")


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """→ one row per profiled column:
    ``(column, n_rows, n_nulls, n_distinct, min_s, max_s)``."""
    cols = (
        [c for c, t in df.dtypes if t in _SAFE_PREFIXES] if columns is None else columns
    )
    if not cols:
        raise ValueError("no profileable (int/string/date) columns")
    types = dict(df.dtypes)
    for c in cols:
        if types[c] not in _SAFE_PREFIXES:
            raise ValueError(
                f"column {c!r} has type {types[c]} — float/decimal min/max "
                "render differently across engines; profile int/string "
                "columns only"
            )
    aggs = [F.count("*").cast("bigint").alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"_nn_{c}"),
            F.countDistinct(c).cast("bigint").alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return one.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, n_distinct, min_s, max_s)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")


def expectations(df: DataFrame, rules: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Data-quality assertion report (the Great-Expectations shape) →
    one row per rule: ``(rule, n_rows, n_violations, n_nulls)``.

    ``rules`` is ``[(name, condition_column), ...]``; a row VIOLATES a
    rule when the condition is false, and rows where the condition is
    NULL (null inputs) are counted separately — the three-valued-logic
    pitfall made explicit instead of silently passing.

    All rules are evaluated in ONE scan (a single agg with a
    sum-per-rule, stack-unpivoted to rows, same shape as
    :func:`profile_table`) — at 100 TB the report costs one pass over
    the table regardless of how many expectations are attached.
    """
    if not rules:
        raise ValueError("no rules")
    aggs = [F.count("*").cast("bigint").alias("_n")]
    for i, (_, cond) in enumerate(rules):
        aggs += [
            F.sum(F.when(~cond, 1).otherwise(0)).cast("bigint").alias(f"_v_{i}"),
            F.sum(F.when(cond.isNull(), 1).otherwise(0)).cast("bigint").alias(f"_u_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _v_{i}, _u_{i}" for i, (name, _) in enumerate(rules)
    )
    return one.selectExpr(
        "_n AS n_rows",
        f"stack({len(rules)}, {stack_args}) AS (rule, n_violations, n_nulls)",
    ).select("rule", "n_rows", "n_violations", "n_nulls")


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """Privacy risk audit → ONE row ``(n_rows, n_groups, n_small_groups,
    n_rows_at_risk, min_group_size)``: group by the quasi-identifier
    columns; any group smaller than ``k`` re-identifies its members —
    the k-anonymity check run before a table leaves the pipeline.

    One hash agg on the quasi-identifiers, one tiny re-agg — the risk
    report costs a single shuffle of group keys regardless of table
    size."""
    g = df.groupBy(*quasi_cols).agg(F.count("*").cast("bigint").alias("_n"))
    return g.agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0)).cast("bigint").alias("n_small_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("_n").cast("bigint").alias("min_group_size"),
    )


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """Privacy risk audit beyond k-anonymity → ONE row ``(n_rows,
    n_groups, n_low_diversity_groups, n_rows_at_risk, min_diversity)``:
    a quasi-identifier group whose members share fewer than ``l``
    DISTINCT sensitive values leaks the sensitive attribute even when
    the group itself is large (the homogeneity attack k-anonymity
    misses — Machanavajjhala et al., ICDE'06).

    One hash agg on the quasi-identifiers carrying count +
    count_distinct(sensitive), then a tiny re-agg — a single shuffle of
    group keys regardless of table size."""
    g = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("_n"),
        F.count_distinct(F.col(sensitive_col)).cast("bigint").alias("_d"),
    )
    return g.agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("_d") < l, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low_diversity_groups"),
        F.sum(F.when(F.col("_d") < l, F.col("_n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("_d").cast("bigint").alias("min_diversity"),
    )


def fd_check(df: DataFrame, name: str, lhs: str, rhs: str) -> DataFrame:
    """Functional-dependency audit ``lhs → rhs`` → ONE row ``(fd,
    n_groups, n_violating, n_rows_in_violating, max_rhs_variants)``: a
    group violates when one lhs value maps to >1 distinct rhs values —
    the schema-discovery / data-cleaning primitive (does part →
    supplier hold? does order → customer?).

    One (lhs) hash agg carrying count + distinct-rhs, then a tiny
    re-agg."""
    g = df.groupBy(F.col(lhs).alias("_l")).agg(
        F.count("*").cast("bigint").alias("_n"),
        F.count_distinct(F.col(rhs)).cast("bigint").alias("_d"),
    )
    return g.agg(
        F.lit(name).alias("fd"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("_d") > 1, 1).otherwise(0)).cast("bigint").alias("n_violating"),
        F.sum(F.when(F.col("_d") > 1, F.col("_n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_in_violating"),
        F.max("_d").cast("bigint").alias("max_rhs_variants"),
    )


def chi2_contingency(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Pearson chi-square independence test over a contingency table →
    ONE row ``(n, n_cells, dof, chi2)`` — the drift test: are the two
    categoricals (e.g. time-half × event type) independent? Large chi2
    vs dof ⇒ the distribution moved.

    Exactness discipline: every count is an integer; each cell's
    (o−e)²/e uses ONE fixed IEEE chain, and the cell terms are summed by
    an ORDERED fold over (row, col)-sorted cells — same bracketing in
    both engines, so chi2 is bit-deterministic. One (row, col) hash agg
    + tiny broadcast total joins; cells ≤ |rows|·|cols|."""
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count("*").cast("bigint").alias("o"))
    rt = obs.groupBy("r").agg(F.sum("o").cast("bigint").alias("rt"))
    ct = obs.groupBy("c").agg(F.sum("o").cast("bigint").alias("ct"))
    gt = obs.agg(F.sum("o").cast("bigint").alias("n"))
    # FULL row x col lattice (tiny: |rows| x |cols|), so combinations the
    # data never produced still contribute their (0 - e)^2/e term — a
    # vanished category is exactly the drift the test must see
    cells = (
        rt.join(F.broadcast(ct))
        .join(F.broadcast(obs), ["r", "c"], "left")
        .select("r", "c", "rt", "ct", F.coalesce("o", F.lit(0)).cast("bigint").alias("o"))
    )
    e = (F.col("rt").cast("double") * F.col("ct").cast("double")) / F.col(
        "n"
    ).cast("double")
    term = (
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    )
    terms = cells.join(F.broadcast(gt)).select("r", "c", F.col("n"), term.alias("t"))
    return terms.groupBy().agg(
        F.max("n").alias("n"),
        F.count("*").cast("bigint").alias("n_cells"),
        (
            (F.count_distinct("r") - 1) * (F.count_distinct("c") - 1)
        ).cast("bigint").alias("dof"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "c", "t"))),
                lambda s: s["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("chi2"),
    )
