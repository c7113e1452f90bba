"""The matcher algebra: resolve_label_matchers(matchers, start, end) → tsids.

Re-expresses the reference's core query operator
(/root/reference/src/index/index_server.cpp:93-136, mem path
src/index/mem_index.cpp:136-232, disk path src/index/index_tree.cpp:91-453)
as a single-shuffle DataFrame plan over the long-format postings table.

Eight matcher ops (promql::MatchOp, switch at
/root/reference/src/index/index_tree.cpp:112-157): EQL NEQ EQL_REGEX
NEQ_REGEX LSS GTR LTE GTE. Ordering ops use byte-wise string order — both
Spark and the reference compare strings binary.

Conjunction semantics (standardized to Prometheus semantics; the reference's
mem/tree paths disagree on NEQ — deviation recorded in SURVEY.md §7.4.2):
  * positive matchers (EQL, EQL_REGEX, LSS, GTR, LTE, GTE) intersect;
  * negative matchers (NEQ, NEQ_REGEX) subtract the series whose value for
    that name matches — series *lacking* the name survive, as in the
    reference's mem path (src/index/mem_index.cpp:149-171);
  * if ALL matchers are negative, candidates are series that carry the
    name with a non-matching value (the reference's all-NEQ mem behaviour,
    src/index/mem_index.cpp:199-220).

Time pruning: a matcher query carries [start, end); a series qualifies when
its activity interval overlaps — first_seen < end AND last_seen >= start
(the per-key/per-page interval tests at
/root/reference/src/index/index_tree.cpp:213-216,263-267).

Scale notes: the whole resolve is ONE shuffle — postings are filtered by an
OR of all matcher predicates (pushed into the parquet scan), each surviving
row is tagged with per-matcher hit flags, and a single groupBy(tsid)
aggregates flags; negatives become one broadcast-able anti-join. No bitmap
ever materializes on the driver; the result stays a distributed
DataFrame[tsid].
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MatchOp(Enum):
    EQL = "="
    NEQ = "!="
    EQL_REGEX = "=~"
    NEQ_REGEX = "!~"
    LSS = "<"
    GTR = ">"
    LTE = "<="
    GTE = ">="


_NEGATIVE = {MatchOp.NEQ, MatchOp.NEQ_REGEX}
_REGEX_OPS = {MatchOp.EQL_REGEX, MatchOp.NEQ_REGEX}


def _validate_regex_subset(pattern: str) -> None:
    """Reject regex constructs outside the RE2∩Java common subset.

    The reference matches with RE2 (via libpromql); Spark matches with
    java.util.regex. Patterns in the intersection behave identically;
    anything else would silently diverge (SURVEY.md §7.4.3) — so reject at
    construction with a clear error instead of relying on convention:
      * lookahead/lookbehind ``(?= (?! (?<= (?<!`` — Java-only, RE2 rejects;
      * backreferences ``\\1``..``\\9``, ``\\k<name>`` — Java-only;
      * atomic groups ``(?>`` and conditionals ``(?(`` — neither RE2 nor
        this subset;
      * possessive quantifiers ``*+ ++ ?+ {n}+`` — Java-only;
      * named groups — the syntaxes differ (RE2 ``(?P<n>``, Java ``(?<n>``).
    """
    i, n = 0, len(pattern)
    in_class = False
    esc_char_pos = -1  # position of the most recent escaped character
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt.isdigit() and nxt != "0":
                raise ValueError(
                    f"regex {pattern!r}: backreference \\{nxt} is not in the "
                    "RE2∩Java subset (RE2 has no backreferences)"
                )
            if nxt in ("k", "K", "g"):
                raise ValueError(
                    f"regex {pattern!r}: \\{nxt} is not in the RE2∩Java subset"
                )
            esc_char_pos = i + 1
            i += 2
            continue
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        elif not in_class:
            if c == "(" and i + 1 < n and pattern[i + 1] == "?":
                rest = pattern[i + 2 : i + 4]
                if rest[:1] in ("=", "!", ">", "("):
                    raise ValueError(
                        f"regex {pattern!r}: lookaround/atomic/conditional groups "
                        "are not in the RE2∩Java subset"
                    )
                if rest[:1] == "<" or rest[:1] == "P":
                    raise ValueError(
                        f"regex {pattern!r}: named groups / lookbehind are not in "
                        "the RE2∩Java subset (the syntaxes diverge)"
                    )
            if (
                c == "+"
                and i > 0
                and pattern[i - 1] in ("*", "+", "?", "}")
                and i - 1 != esc_char_pos  # "\++" = escaped plus, one-or-more
            ):
                raise ValueError(
                    f"regex {pattern!r}: possessive quantifiers are Java-only, "
                    "not in the RE2∩Java subset"
                )
        i += 1
    import re as _re

    try:
        _re.compile(pattern)
    except _re.error as exc:
        raise ValueError(f"regex {pattern!r}: invalid pattern: {exc}") from exc


@dataclass(frozen=True)
class LabelMatcher:
    op: MatchOp
    name: str
    value: str

    def __post_init__(self) -> None:
        if self.op in _REGEX_OPS:
            _validate_regex_subset(self.value)

    @property
    def positive(self) -> bool:
        return self.op not in _NEGATIVE

    def value_predicate(self, value_col: Column) -> Column:
        """Predicate on the postings ``value`` column. For negative ops this
        is the predicate of the series to EXCLUDE (i.e. the positive form)."""
        v = F.lit(self.value)
        if self.op in (MatchOp.EQL, MatchOp.NEQ):
            return value_col == v
        if self.op in (MatchOp.EQL_REGEX, MatchOp.NEQ_REGEX):
            # promql regex matchers are fully anchored: =~"click" matches
            # only the exact string "click" (the reference inherits this via
            # matcher.match_value from libpromql). Java rlike is
            # search-semantics, so wrap in a non-capturing full anchor.
            return value_col.rlike(f"^(?:{self.value})$")
        if self.op is MatchOp.LSS:
            return value_col < v
        if self.op is MatchOp.GTR:
            return value_col > v
        if self.op is MatchOp.LTE:
            return value_col <= v
        if self.op is MatchOp.GTE:
            return value_col >= v
        raise ValueError(self.op)

    def row_predicate(self) -> Column:
        """Full predicate on a postings row (name AND value)."""
        return (F.col("name") == F.lit(self.name)) & self.value_predicate(F.col("value"))


def _time_filter(postings: DataFrame, start, end) -> DataFrame:
    if start is not None:
        postings = postings.where(F.col("last_seen") >= F.lit(start))
    if end is not None:
        postings = postings.where(F.col("first_seen") < F.lit(end))
    return postings


def resolve_label_matchers(
    postings: DataFrame,
    matchers: list[LabelMatcher],
    start=None,
    end=None,
) -> DataFrame:
    """→ DataFrame[tsid BIGINT], distinct, distributed (never collected).

    Mirrors IndexServer::resolve_label_matchers
    (/root/reference/src/index/index_server.cpp:93-136): seed/AND algebra for
    positives, deferred exclude-set for negatives
    (src/index/mem_index.cpp:144-172), interval overlap for time pruning.
    """
    if not matchers:
        raise ValueError("at least one matcher required")
    p = _time_filter(postings, start, end)
    positives = [m for m in matchers if m.positive]
    negatives = [m for m in matchers if not m.positive]

    if positives:
        preds = [m.row_predicate() for m in positives]
        any_hit = reduce(Column.__or__, preds)
        flags = [
            F.max(F.when(pred, F.lit(1)).otherwise(F.lit(0))).alias(f"m{i}")
            for i, pred in enumerate(preds)
        ]
        candidates = (
            p.where(any_hit)
            .groupBy("tsid")
            .agg(*flags)
            .where(reduce(Column.__and__, [F.col(f"m{i}") == 1 for i in range(len(preds))]))
            .select("tsid")
        )
    else:
        # all-negative: name must exist with some non-matching value
        # (reference mem path, src/index/mem_index.cpp:199-220)
        names = [F.col("name") == F.lit(m.name) for m in negatives]
        candidates = p.where(reduce(Column.__or__, names)).select("tsid").distinct()

    if negatives:
        # No broadcast hint: the exclude set is bounded only by series
        # cardinality (a NEQ on a high-cardinality label resolves millions of
        # TSIDs at 100 TB). AQE picks broadcast when the built side is small.
        excl_pred = reduce(Column.__or__, [m.row_predicate() for m in negatives])
        exclude = p.where(excl_pred).select("tsid")
        candidates = candidates.join(exclude.distinct(), "tsid", "left_anti")
    return candidates


def label_values(postings: DataFrame, name: str) -> DataFrame:
    """L5: distinct values of a label name
    (/root/reference/src/index/index_server.cpp:151-158). Exact — the
    reference's disk path drops sorted-list values (index_tree.cpp:487-489);
    deviation recorded in SURVEY.md §7.4.4."""
    return (
        postings.where(F.col("name") == F.lit(name))
        .select(F.col("value"))
        .distinct()
    )


def get_labels(series: DataFrame, tsids: list[int]) -> DataFrame:
    """L4: reverse lookup tsid → label set
    (/root/reference/src/index/index_server.cpp:138-149)."""
    return series.where(F.col("tsid").isin(tsids)).select("tsid", "labels")


def select_series(
    samples: DataFrame,
    resolved_tsids: DataFrame,
    start=None,
    end=None,
) -> DataFrame:
    """Querier::select(tsids) — semi-join samples against the resolved TSID
    set with a time-range filter (/root/reference/include/tagtree/storage.h:32-35,
    src/adapters/prom/querier.cpp:13-21). No broadcast hint: the resolved
    set is bounded only by series cardinality (a broad matcher resolves
    millions of TSIDs at 100 TB); AQE broadcasts it when it is small."""
    s = samples
    if start is not None:
        s = s.where(F.col("ts") >= F.lit(start))
    if end is not None:
        s = s.where(F.col("ts") < F.lit(end))
    return s.join(resolved_tsids.select("tsid"), "tsid", "left_semi")
