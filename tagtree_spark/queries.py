"""The declared query inventory (SURVEY.md §2.12) — Spark builders + duckdb
oracle SQL, registered side by side so `__spark_entry__.queries()` /
`oracle_sql()` stay in lock-step.

Conventions (FIXTURES.md §5):
  * every query ends with a total ORDER BY incl. tiebreakers;
  * double sums go through DECIMAL(18,4), output as DECIMAL(38,4);
  * timestamps in outputs are unix microseconds (Spark unix_micros /
    duckdb epoch_us) — never raw timestamps;
  * column names are aliased identically in both engines (the driver sorts
    columns by name before hashing);
  * regex stays in the RE2∩Java common subset.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.io import load_table
from tagtree_spark.session import tune
from tagtree_spark.tsdb.matchers import (
    LabelMatcher,
    MatchOp,
    label_values,
    resolve_label_matchers,
    select_series,
)
from tagtree_spark.tsdb.model import build_postings, build_samples, build_series

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# TSDB fixture CTE shared by every matcher-query oracle (FIXTURES.md §2).
# --------------------------------------------------------------------------

TSDB_CTE = r"""
WITH ev AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
         'u' || CAST(user_id % 10 AS VARCHAR) AS user_bucket,
         'k' || CAST(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 5 AS VARCHAR) AS k_bucket
  FROM events
), series AS (
  SELECT CAST(row_number() OVER (ORDER BY event_type, user_bucket, k_bucket) AS BIGINT) AS tsid,
         event_type, user_bucket, k_bucket, first_seen, last_seen
  FROM (
    SELECT event_type, user_bucket, k_bucket,
           min(ts) AS first_seen, max(ts) AS last_seen
    FROM ev GROUP BY 1, 2, 3
  ) g
), postings AS (
  SELECT 'event_type' AS name, event_type AS value, tsid, first_seen, last_seen FROM series
  UNION ALL
  SELECT 'user_bucket' AS name, user_bucket AS value, tsid, first_seen, last_seen FROM series
  UNION ALL
  SELECT 'k_bucket' AS name, k_bucket AS value, tsid, first_seen, last_seen FROM series
), samples AS (
  SELECT s.tsid, e.ts, e.value
  FROM ev e JOIN series s USING (event_type, user_bucket, k_bucket)
)
"""


def _model(spark: SparkSession, sf_dir: str):
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    series = build_series(events)
    return series, build_postings(series), events


def _resolve(spark, sf_dir, matchers, start=None, end=None) -> DataFrame:
    _, postings, _ = _model(spark, sf_dir)
    return resolve_label_matchers(postings, matchers, start, end).orderBy("tsid")


# Q8/Q12 literal time bounds (events span 2024-01; FIXTURES.md §3).
T_10 = _dt.datetime(2024, 1, 10)
T_20 = _dt.datetime(2024, 1, 20)
T_05 = _dt.datetime(2024, 1, 5)
T_25 = _dt.datetime(2024, 1, 25)


@query(
    "q01_eql",
    TSDB_CTE
    + "SELECT tsid FROM postings WHERE name='event_type' AND value='click' ORDER BY tsid",
)
def q01_eql(spark, sf_dir):
    """M1 EQL (/root/reference/src/index/mem_index.cpp:180-198)."""
    return _resolve(spark, sf_dir, [LabelMatcher(MatchOp.EQL, "event_type", "click")])


@query(
    "q02_neq",
    TSDB_CTE
    + """
SELECT tsid FROM (
  SELECT tsid FROM postings WHERE name='event_type' AND value='click'
  EXCEPT
  SELECT tsid FROM postings WHERE name='user_bucket' AND value='u1'
) t ORDER BY tsid""",
)
def q02_neq(spark, sf_dir):
    """M2 NEQ exclude-set semantics (/root/reference/src/index/mem_index.cpp:149-171)."""
    return _resolve(
        spark,
        sf_dir,
        [
            LabelMatcher(MatchOp.EQL, "event_type", "click"),
            LabelMatcher(MatchOp.NEQ, "user_bucket", "u1"),
        ],
    )


@query(
    "q03_eql_regex",
    TSDB_CTE
    + "SELECT tsid FROM postings WHERE name='event_type' AND regexp_matches(value, '^(click|view)$') ORDER BY tsid",
)
def q03_eql_regex(spark, sf_dir):
    """M3 EQL_REGEX (/root/reference/src/index/mem_index.cpp:35-51,221-231)."""
    return _resolve(
        spark, sf_dir, [LabelMatcher(MatchOp.EQL_REGEX, "event_type", "^(click|view)$")]
    )


@query(
    "q04_neq_regex",
    TSDB_CTE
    + """
SELECT tsid FROM (
  SELECT DISTINCT tsid FROM postings WHERE name='event_type'
  EXCEPT
  SELECT tsid FROM postings WHERE name='event_type' AND regexp_matches(value, '^p.*')
) t ORDER BY tsid""",
)
def q04_neq_regex(spark, sf_dir):
    """M4 NEQ_REGEX, all-negative form: name must exist with a non-matching
    value (/root/reference/src/index/mem_index.cpp:199-220)."""
    return _resolve(spark, sf_dir, [LabelMatcher(MatchOp.NEQ_REGEX, "event_type", "^p.*")])


@query(
    "q05_lss",
    TSDB_CTE
    + "SELECT tsid FROM postings WHERE name='event_type' AND value < 'purchase' ORDER BY tsid",
)
def q05_lss(spark, sf_dir):
    """M5 LSS byte-wise string order (/root/reference/src/index/index_tree.cpp:122-124)."""
    return _resolve(spark, sf_dir, [LabelMatcher(MatchOp.LSS, "event_type", "purchase")])


@query(
    "q05b_lte",
    TSDB_CTE
    + "SELECT tsid FROM postings WHERE name='event_type' AND value <= 'purchase' ORDER BY tsid",
)
def q05b_lte(spark, sf_dir):
    """M7 LTE (/root/reference/src/index/index_tree.cpp:128-130)."""
    return _resolve(spark, sf_dir, [LabelMatcher(MatchOp.LTE, "event_type", "purchase")])


@query(
    "q06_gtr",
    TSDB_CTE
    + "SELECT tsid FROM postings WHERE name='event_type' AND value > 'login' ORDER BY tsid",
)
def q06_gtr(spark, sf_dir):
    """M6 GTR (/root/reference/src/index/index_tree.cpp:125-127)."""
    return _resolve(spark, sf_dir, [LabelMatcher(MatchOp.GTR, "event_type", "login")])


@query(
    "q06b_gte",
    TSDB_CTE
    + "SELECT tsid FROM postings WHERE name='event_type' AND value >= 'login' ORDER BY tsid",
)
def q06b_gte(spark, sf_dir):
    """M8 GTE (/root/reference/src/index/index_tree.cpp:131-133)."""
    return _resolve(spark, sf_dir, [LabelMatcher(MatchOp.GTE, "event_type", "login")])


_Q7_MATCHERS = [
    LabelMatcher(MatchOp.EQL, "user_bucket", "u1"),
    LabelMatcher(MatchOp.EQL_REGEX, "k_bucket", "^k[12]$"),
    LabelMatcher(MatchOp.NEQ, "event_type", "error"),
]

_Q7_ORACLE_BODY = """
  SELECT tsid FROM postings WHERE name='user_bucket' AND value='u1'
  INTERSECT
  SELECT tsid FROM postings WHERE name='k_bucket' AND regexp_matches(value, '^k[12]$')
  EXCEPT
  SELECT tsid FROM postings WHERE name='event_type' AND value='error'
"""


@query("q07_conjunction", TSDB_CTE + f"SELECT tsid FROM ({_Q7_ORACLE_BODY}) t ORDER BY tsid")
def q07_conjunction(spark, sf_dir):
    """SO1-SO3: 3-matcher AND incl. one NEQ, one regex
    (/root/reference/src/index/mem_index.cpp:144-172)."""
    return _resolve(spark, sf_dir, _Q7_MATCHERS)


@query(
    "q08_time_pruned",
    TSDB_CTE
    + """
SELECT tsid FROM (
  SELECT tsid FROM postings WHERE name='user_bucket' AND value='u1'
    AND last_seen >= TIMESTAMP '2024-01-10 00:00:00' AND first_seen < TIMESTAMP '2024-01-20 00:00:00'
  INTERSECT
  SELECT tsid FROM postings WHERE name='k_bucket' AND regexp_matches(value, '^k[12]$')
    AND last_seen >= TIMESTAMP '2024-01-10 00:00:00' AND first_seen < TIMESTAMP '2024-01-20 00:00:00'
  EXCEPT
  SELECT tsid FROM postings WHERE name='event_type' AND value='error'
    AND last_seen >= TIMESTAMP '2024-01-10 00:00:00' AND first_seen < TIMESTAMP '2024-01-20 00:00:00'
) t ORDER BY tsid""",
)
def q08_time_pruned(spark, sf_dir):
    """Q7 + interval-overlap time pruning
    (/root/reference/src/index/index_tree.cpp:213-216,263-267)."""
    return _resolve(spark, sf_dir, _Q7_MATCHERS, start=T_10, end=T_20)


@query(
    "q09_label_values",
    TSDB_CTE
    + "SELECT DISTINCT value FROM postings WHERE name='event_type' ORDER BY value",
)
def q09_label_values(spark, sf_dir):
    """L5 label_values (/root/reference/src/index/index_server.cpp:151-158)."""
    _, postings, _ = _model(spark, sf_dir)
    return label_values(postings, "event_type").orderBy("value")


@query(
    "q10_get_labels",
    TSDB_CTE
    + "SELECT tsid, event_type, user_bucket, k_bucket FROM series WHERE tsid <= 10 ORDER BY tsid",
)
def q10_get_labels(spark, sf_dir):
    """L4 tsid → label set (/root/reference/src/index/index_server.cpp:138-149),
    flattened to columns for the oracle compare."""
    series, _, _ = _model(spark, sf_dir)
    return (
        series.where(F.col("tsid") <= 10)
        .select("tsid", "event_type", "user_bucket", "k_bucket")
        .orderBy("tsid")
    )


@query(
    "q11_dense_ids",
    TSDB_CTE
    + """
SELECT CAST(count(*) AS BIGINT) AS n_series,
       CAST(min(tsid) AS BIGINT) AS min_tsid,
       CAST(max(tsid) AS BIGINT) AS max_tsid,
       CAST(count(DISTINCT event_type || '#' || user_bucket || '#' || k_bucket) AS BIGINT) AS n_label_sets
FROM series""",
)
def q11_dense_ids(spark, sf_dir):
    """L1 dense id assignment: density + bijection summary
    (/root/reference/src/index/index_server.cpp:30-60, id_counter at
    index_server.h:66)."""
    series, _, _ = _model(spark, sf_dir)
    return series.agg(
        F.count("*").cast("bigint").alias("n_series"),
        F.min("tsid").cast("bigint").alias("min_tsid"),
        F.max("tsid").cast("bigint").alias("max_tsid"),
        F.countDistinct(
            F.concat_ws("#", "event_type", "user_bucket", "k_bucket")
        ).cast("bigint").alias("n_label_sets"),
    )


@query(
    "q12_select_samples",
    TSDB_CTE
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_samples,
       CAST(epoch_us(min(ts)) AS BIGINT) AS min_ts_us,
       CAST(epoch_us(max(ts)) AS BIGINT) AS max_ts_us,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_value
FROM samples
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-25 00:00:00'
  AND tsid IN ({_Q7_ORACLE_BODY})""",
)
def q12_select_samples(spark, sf_dir):
    """Querier::select — resolve matchers, semi-join samples, aggregate
    (/root/reference/src/adapters/prom/querier.cpp:13-21)."""
    series, postings, events = _model(spark, sf_dir)
    samples = build_samples(events, series)
    tsids = resolve_label_matchers(postings, _Q7_MATCHERS)
    sel = select_series(samples, tsids, start=T_05, end=T_25)
    return sel.agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.unix_micros(F.min("ts")).cast("bigint").alias("min_ts_us"),
        F.unix_micros(F.max("ts")).cast("bigint").alias("max_ts_us"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(38,4)").alias("sum_value"),
    )
