r"""PromQL-style EXPRESSION front-end (VERDICT r11 #6) — the composite
grammar over the engine's ~30 already-implemented PromQL function
analogues, so the engine is driveable from one STRING like

    max_over_time(rate(events_total{event_type="click"}[1d])[7d:1d])

The reference delegates ALL PromQL evaluation to the external ``promql``
library plus a modified Prometheus (/root/reference/README.org:11-24 —
out of repo), and its own boundary takes matcher structs
(tagtreego/helper.go:38-67); ``tsdb/selector.py`` brought the matcher
STRING in-engine in r9, and this module is the capstone: a
recursive-descent expression grammar (selectors, ranges, subqueries,
function calls, scalar arithmetic) compiling to the existing DataFrame
operators. Extension surface, not parity surface — documented as such in
SURVEY §2.

Semantics are the repo's established ALIGNED-BUCKET model (q96/q97/q225):
``f(m[R])`` evaluates per (tsid, bucket) with bucket = unix_micros(ts)
div R; a subquery ``inner[Rsub:step]`` keeps the trailing Rsub/step
buckets of the inner bucket series (unbounded when Rsub is omitted:
``[:step]``); an outer *_over_time collapses the bucket series per tsid.
This is deterministic and engine-reproducible (every q96/q97/q225-family
oracle uses it) — a deliberate, documented deviation from Prometheus'
instant-evaluation lookback model for RANGE math. Instant evaluation
itself is available where PromQL makes the wall-clock explicit: the
``@`` modifier (r13) evaluates ``m{sel} @ <unix-seconds>`` through the
as-of join with a staleness lookback, so the batch engine needs no
implicit "now".

Cross-engine exactness rules (CLAUDE.md): counter math runs in
DECIMAL(18,4) with ONE IEEE division per bucket (rate), and over-time
sums/avgs of the resulting DOUBLES fold sequentially in bucket order
(rule 12) so DuckDB's ``list_reduce(list_prepend(0.0, list(v ORDER BY
bucket)))`` matches bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagtree_spark.tsdb.matchers import LabelMatcher

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Number:
    value: float


@dataclass(frozen=True)
class Str:
    """A double-quoted string literal — valid only as a function argument
    (label_replace/label_join destinations, separators, regexes)."""

    value: str


@dataclass(frozen=True)
class VectorSelector:
    name: str
    matchers: Tuple[LabelMatcher, ...] = ()


@dataclass(frozen=True)
class At:
    """``m{sel} @ <unix-seconds>`` — PromQL's @ modifier: instant-vector
    evaluation at an explicit timestamp (the latest sample per series in
    ``(t - lookback, t]``, Prometheus' staleness rule; the lookback is an
    evaluation parameter, default 5m). ``at_us`` is the eval timestamp in
    microseconds. This retires the grammar's instant-eval
    NotImplementedError class (r12): the wall-clock the batch engine
    lacked is supplied explicitly in the expression string."""

    inner: VectorSelector
    at_us: int


@dataclass(frozen=True)
class MatrixSelector:
    """``m{sel}[R] [offset O]`` — R/O in milliseconds. The offset
    relabels buckets forward (the value observed O ago appears at the
    current bucket); O must be a multiple of R in the aligned-bucket
    model."""

    inner: VectorSelector
    range_ms: int
    offset_ms: int = 0


@dataclass(frozen=True)
class Subquery:
    """``expr[Rsub:step]`` — both in milliseconds; range_ms None for the
    unbounded ``[:step]`` form."""

    inner: "Expr"
    range_ms: Optional[int]
    step_ms: int


@dataclass(frozen=True)
class Call:
    func: str
    args: Tuple["Expr", ...]


@dataclass(frozen=True)
class BinOp:
    """Binary operation. ``op`` is arithmetic (+ - * /), comparison
    (> < >= <= == !=, PromQL FILTER semantics — the left vector's
    elements where the comparison holds), or a set operator
    (and / or / unless — (tsid, bucket) semi / preferring-left union /
    anti). ``on`` carries PromQL's ``on(labels)`` matching for
    arithmetic between BY-GROUPED vectors (r13)."""

    op: str
    left: "Expr"
    right: "Expr"
    on: Tuple[str, ...] = ()
    #: comparison ``bool`` modifier: 0/1 results instead of filtering
    bool_mode: bool = False
    #: ``on(...) group_left``: many-to-one matching — the LEFT side is a
    #: per-series vector, the right a by-grouped aggregate (the
    #: share-of-group idiom, q-group_share's shape)
    group_left: bool = False


@dataclass(frozen=True)
class AggExpr:
    """``sum by (l1, l2) (expr)`` / ``sum without (l) (expr)`` /
    ``max(expr)`` — PromQL aggregation operators. ``without`` grouping
    keeps every series label column EXCEPT the listed ones (r13)."""

    op: str
    by: Tuple[str, ...]
    expr: "Expr"
    without: bool = False


Expr = Union[
    Number, Str, VectorSelector, At, MatrixSelector, Subquery, Call, BinOp, AggExpr
]


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


class ExprParseError(ValueError):
    def __init__(self, s: str, pos: int, why: str):
        super().__init__(f"expr {s!r} at index {pos}: {why}")
        self.pos = pos


#: duration units in ms, descending (PromQL's set; y = 365d, w = 7d)
_UNITS = [
    ("y", 365 * 24 * 3600 * 1000),
    ("w", 7 * 24 * 3600 * 1000),
    ("d", 24 * 3600 * 1000),
    ("h", 3600 * 1000),
    ("ms", 1),  # listed before m for longest-match
    ("m", 60 * 1000),
    ("s", 1000),
]
_RANGE_FNS = {
    "rate",
    "increase",
    "resets",
    "changes",
    "delta",
    "sum_over_time",
    "avg_over_time",
    "max_over_time",
    "min_over_time",
    "count_over_time",
    "last_over_time",
    "first_over_time",
}
_SUBQ_FNS = {
    "sum_over_time",
    "avg_over_time",
    "max_over_time",
    "min_over_time",
    "count_over_time",
}
_AGG_OPS = {"sum", "avg", "max", "min", "count", "stddev", "stdvar"}
#: comparison operators, longest-match first (PromQL filter semantics)
_CMP_OPS = (">=", "<=", "==", "!=", ">", "<")
_SET_OPS = ("and", "unless", "or")
#: series-frame bookkeeping columns that are NOT labels — excluded from
#: `without (...)` grouping resolution (tsdb/model.py build_series:
#: series(tsid, labels, label_hash, first_seen, last_seen) + flat cols)
_NON_LABEL_SERIES_COLS = frozenset(
    {"tsid", "labels", "label_hash", "first_seen", "last_seen"}
)
#: r13 range-function families (1-arg over m[R], per (tsid, bucket)) —
#: each compiles to the SAME arithmetic spelling its standalone
#: driver-green operator proved (tsdb/promql.py: irate≡q65, idelta≡q88,
#: deriv≡q83, stddev≡q69, mad≡q116).
_RANGE_FNS2 = {
    "irate",
    "idelta",
    "deriv",
    "stddev_over_time",
    "stdvar_over_time",
    "mad_over_time",
}
#: instant-vector math functions — pure IEEE/selection ops (abs, sign,
#: floor/ceil picks, correctly-rounded sqrt), all bit-identical
#: cross-engine; exp/ln are deliberately ABSENT (libm results differ
#: between engines — honest refusal over a hash mismatch).
_VEC_MATH = {"abs", "sgn", "floor", "ceil", "sqrt"}


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def err(self, why: str) -> ExprParseError:
        return ExprParseError(self.s, self.i, why)

    def ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, ch: str) -> None:
        if not self.s.startswith(ch, self.i):
            raise self.err(f"expected {ch!r}")
        self.i += len(ch)

    def ident(self) -> str:
        self.ws()
        j = self.i
        if j >= len(self.s) or not (self.s[j].isalpha() or self.s[j] == "_"):
            raise self.err("expected an identifier")
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] in "_:"):
            j += 1
        out = self.s[self.i : j]
        self.i = j
        return out

    def number(self) -> float:
        self.ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isdigit() or self.s[j] in ".eE+-"):
            # stop a bare +/- that isn't an exponent sign
            if self.s[j] in "+-" and (j == self.i or self.s[j - 1] not in "eE"):
                break
            j += 1
        try:
            v = float(self.s[self.i : j])
        except ValueError:
            raise self.err("expected a number") from None
        self.i = j
        return v

    def duration(self) -> int:
        """Compound PromQL duration (``1h30m``) → milliseconds."""
        self.ws()
        total = 0
        last = -1
        any_part = False
        while self.i < len(self.s) and self.s[self.i].isdigit():
            j = self.i
            while j < len(self.s) and self.s[j].isdigit():
                j += 1
            n = int(self.s[self.i : j])
            self.i = j
            for u, ms in _UNITS:
                if self.s.startswith(u, self.i):
                    self.i += len(u)
                    break
            else:
                raise self.err("expected a duration unit (ms s m h d w y)")
            if last >= 0 and ms >= last:
                raise self.err("duration units must strictly descend")
            last = ms
            total += n * ms
            any_part = True
        if not any_part or total <= 0:
            raise self.err("expected a positive duration")
        return total

    # --- grammar (precedence, loosest first: or < and/unless < cmp <
    # +- < */ — PromQL's ordering) ---

    def _kw(self, word: str) -> bool:
        """Is ``word`` at the cursor with a word boundary after it?"""
        if not self.s.startswith(word, self.i):
            return False
        nxt = self.s[self.i + len(word) : self.i + len(word) + 1]
        return not (nxt.isalnum() or nxt == "_")

    def _maybe_on(self) -> Tuple[str, ...]:
        """Optional ``on(l1, l2)`` matching clause after an arithmetic
        operator (r13)."""
        self.ws()
        if not self._kw("on"):
            return ()
        save = self.i
        self.i += 2
        self.ws()
        if self.peek() != "(":
            self.i = save
            return ()
        self.eat("(")
        labels = [self.ident()]
        self.ws()
        while self.peek() == ",":
            self.eat(",")
            labels.append(self.ident())
            self.ws()
        self.eat(")")
        return tuple(labels)

    def expr(self) -> Expr:
        left = self.and_expr()
        while True:
            self.ws()
            if self._kw("or"):
                self.i += 2
                left = BinOp("or", left, self.and_expr())
            else:
                return left

    def and_expr(self) -> Expr:
        left = self.cmp()
        while True:
            self.ws()
            if self._kw("and"):
                self.i += 3
                left = BinOp("and", left, self.cmp())
            elif self._kw("unless"):
                self.i += 6
                left = BinOp("unless", left, self.cmp())
            else:
                return left

    def cmp(self) -> Expr:
        left = self.add()
        while True:
            self.ws()
            for op in _CMP_OPS:
                if self.s.startswith(op, self.i):
                    self.i += len(op)
                    self.ws()
                    boolm = self._kw("bool")
                    if boolm:
                        self.i += 4
                    left = BinOp(op, left, self.add(), bool_mode=boolm)
                    break
            else:
                return left

    def _maybe_group_left(self, on: Tuple[str, ...]) -> bool:
        if not on:
            return False
        self.ws()
        if self._kw("group_left"):
            self.i += 10
            return True
        return False

    def add(self) -> Expr:
        left = self.mul()
        while True:
            self.ws()
            c = self.peek()
            if c and c in "+-":
                self.i += 1
                on = self._maybe_on()
                gl = self._maybe_group_left(on)
                left = BinOp(c, left, self.mul(), on, group_left=gl)
            else:
                return left

    def mul(self) -> Expr:
        left = self.postfix()
        while True:
            self.ws()
            c = self.peek()
            if c and c in "*/":
                self.i += 1
                on = self._maybe_on()
                gl = self._maybe_group_left(on)
                left = BinOp(c, left, self.postfix(), on, group_left=gl)
            else:
                return left

    def string(self) -> str:
        """Double-quoted string literal with backslash escapes (the same
        lexical rule as parse_selector's value strings)."""
        self.eat('"')
        out = []
        while self.i < len(self.s) and self.s[self.i] != '"':
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < len(self.s):
                self.i += 1
                c = self.s[self.i]
            out.append(c)
            self.i += 1
        if self.i >= len(self.s):
            raise self.err("unterminated string literal")
        self.eat('"')
        return "".join(out)

    def postfix(self) -> Expr:
        e = self.primary()
        while True:
            self.ws()
            if self.peek() == "@" and isinstance(e, VectorSelector):
                self.eat("@")
                self.ws()
                neg = self.peek() == "-"
                if neg:
                    raise self.err("@ timestamps are non-negative unix seconds")
                t = self.number()
                # exact for any realistic epoch (us values ≪ 2^53)
                e = At(e, int(round(t * 1_000_000)))
                continue
            if self.peek() != "[":
                return e
            # matrix range on a bare selector; otherwise a subquery
            self.eat("[")
            self.ws()
            if isinstance(e, VectorSelector) and self.peek() != ":":
                r = self.duration()
                self.ws()
                if self.peek() == ":":
                    self.eat(":")
                    step = self.duration()
                    self.ws()
                    self.eat("]")
                    e = Subquery(e, r, step)
                else:
                    self.eat("]")
                    off = 0
                    self.ws()
                    if self.s.startswith("offset", self.i) and not (
                        self.s[self.i + 6 : self.i + 7].isalnum()
                        or self.s[self.i + 6 : self.i + 7] == "_"
                    ):
                        self.i += 6
                        off = self.duration()
                    e = MatrixSelector(e, r, off)
            else:
                rng: Optional[int] = None
                if self.peek() != ":":
                    rng = self.duration()
                    self.ws()
                self.eat(":")
                step = self.duration()
                self.ws()
                self.eat("]")
                e = Subquery(e, rng, step)

    def primary(self) -> Expr:
        self.ws()
        c = self.peek()
        if c == "(":
            self.eat("(")
            e = self.expr()
            self.ws()
            self.eat(")")
            return e
        if c.isdigit() or c == ".":
            return Number(self.number())
        if c == '"':
            return Str(self.string())
        if c == "-":
            # unary minus on a NUMBER literal only (constant-folded BinOps
            # can produce negative Number nodes, and format_expr emits
            # them as '-2' — ADVICE r12 #4). Unary minus on a vector stays
            # unsupported (loud error), matching the evaluator surface.
            self.eat("-")
            self.ws()
            if not (self.peek().isdigit() or self.peek() == "."):
                raise self.err("unary '-' applies to number literals only")
            return Number(-self.number())
        name = self.ident()
        self.ws()

        if name in _AGG_OPS and (
            self._kw("by") or self._kw("without") or self.peek() == "("
        ):
            by: Tuple[str, ...] = ()
            without = False
            if self._kw("by") or self._kw("without"):
                without = self._kw("without")
                self.i += 7 if without else 2
                self.ws()
                self.eat("(")
                labels = [self.ident()]
                self.ws()
                while self.peek() == ",":
                    self.eat(",")
                    labels.append(self.ident())
                    self.ws()
                self.eat(")")
                by = tuple(labels)
                self.ws()
            self.eat("(")
            inner = self.expr()
            self.ws()
            self.eat(")")
            return AggExpr(name, by, inner, without)
        if self.peek() == "(":
            self.eat("(")
            args = [self.expr()]
            self.ws()
            while self.peek() == ",":
                self.eat(",")
                args.append(self.expr())
                self.ws()
            self.eat(")")
            return Call(name, tuple(args))
        matchers: Tuple[LabelMatcher, ...] = ()
        if self.peek() == "{":
            from tagtree_spark.tsdb.selector import parse_selector

            # scan to the matching close brace, skipping quoted regions
            # ("..."/'...' with backslash escapes, `...` raw — the same
            # lexical rule as parse_selector's string lexer) so a matcher
            # VALUE containing '{' or '}' doesn't mis-slice the selector
            # (ADVICE r12 #2)
            depth = 0
            j = self.i
            while j < len(self.s):
                ch = self.s[j]
                if ch in "\"'`":
                    j += 1
                    while j < len(self.s) and self.s[j] != ch:
                        if ch != "`" and self.s[j] == "\\":
                            j += 1
                        j += 1
                    if j >= len(self.s):
                        raise self.err("unterminated string inside selector")
                elif ch == "{":
                    depth += 1
                elif ch == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0 or j >= len(self.s):
                raise self.err("unterminated selector braces")
            matchers = tuple(parse_selector(self.s[self.i : j + 1]))
            self.i = j + 1
        return VectorSelector(name, matchers)


def parse_expr(s: str) -> Expr:
    p = _P(s)
    e = p.expr()
    p.ws()
    if p.i != len(s):
        raise p.err("trailing input after expression")
    return e


# ---------------------------------------------------------------------------
# Formatter (canonical; parse(format_expr(x)) == x — hypothesis-pinned)
# ---------------------------------------------------------------------------


def format_duration(ms: int) -> str:
    if ms <= 0:
        raise ValueError("durations are positive")
    parts = []
    rest = ms
    # emission must be strictly descending by magnitude (the parser's
    # _UNITS listing puts ms before m only for longest-match)
    for u, width in sorted(_UNITS, key=lambda t: -t[1]):
        if u == "y":  # canonical form never emits y (365d round-trips)
            continue
        n = rest // width
        if n:
            parts.append(f"{n}{u}")
            rest -= n * width
    return "".join(parts)


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def format_expr(e: Expr) -> str:
    from tagtree_spark.tsdb.selector import format_selector

    if isinstance(e, Number):
        return _fmt_num(e.value)
    if isinstance(e, Str):
        q = e.value.replace("\\", "\\\\").replace('"', '\\"')
        return f'"{q}"'
    if isinstance(e, VectorSelector):
        sel = format_selector(list(e.matchers)) if e.matchers else ""
        return f"{e.name}{sel}"
    if isinstance(e, At):
        # at_us is exact µs; emit seconds (integer when whole)
        return f"{format_expr(e.inner)} @ {_fmt_num(e.at_us / 1_000_000)}"
    if isinstance(e, MatrixSelector):
        off = f" offset {format_duration(e.offset_ms)}" if e.offset_ms else ""
        return f"{format_expr(e.inner)}[{format_duration(e.range_ms)}]{off}"
    if isinstance(e, Subquery):
        rng = format_duration(e.range_ms) if e.range_ms is not None else ""
        return f"{format_expr(e.inner)}[{rng}:{format_duration(e.step_ms)}]"
    if isinstance(e, Call):
        return f"{e.func}({', '.join(format_expr(a) for a in e.args)})"
    if isinstance(e, AggExpr):
        kw = "without" if e.without else "by"
        by = f" {kw} ({', '.join(e.by)})" if e.by else ""
        return f"{e.op}{by} ({format_expr(e.expr)})"
    if isinstance(e, BinOp):
        on = f" on({', '.join(e.on)})" if e.on else ""
        gl = " group_left" if e.group_left else ""
        bm = " bool" if e.bool_mode else ""
        return f"({format_expr(e.left)} {e.op}{bm}{on}{gl} {format_expr(e.right)})"
    raise TypeError(f"unknown node {e!r}")


# ---------------------------------------------------------------------------
# Evaluator — compiles the AST onto the derived TSDB model
# ---------------------------------------------------------------------------


@dataclass
class _Vec:
    """A bucketed instant-vector frame: (tsid, bucket, value double),
    bucket = unix_micros div step_us (or the eval timestamp in µs for
    instant vectors, step_ms 0). ``series`` is the originating metric's
    series frame — stamped at selector resolution, replaced by
    label_replace/label_join, read by aggregation ``by`` grouping."""

    df: DataFrame
    step_ms: int
    series: Optional[DataFrame] = None


@dataclass
class _Ctx:
    """Evaluation context: the METRIC-NAME REGISTRY (VERDICT r12 #2 —
    ``name → (samples, postings, series)``; postings/series may be None
    for frames without an index/label table) and the instant-eval
    staleness lookback (PromQL's 5m default)."""

    metrics: dict
    lookback_ms: int = 300_000


def _metric(ctx: _Ctx, name: str):
    got = ctx.metrics.get(name)
    if got is None:
        raise ExprParseError(
            name, 0, f"unknown metric (registry has {sorted(ctx.metrics)})"
        )
    return got


def _resolve_selector(sel: VectorSelector, ctx: _Ctx):
    """→ (matcher-filtered samples frame, the metric's series frame or
    None). Matchers prune via the postings semi-join BEFORE any math."""
    samples, postings, series = _metric(ctx, sel.name)
    if not sel.matchers:
        return samples, series
    if postings is None:
        raise ValueError("selector has matchers but no postings frame was given")
    from tagtree_spark.tsdb.matchers import resolve_label_matchers

    tsids = resolve_label_matchers(postings, list(sel.matchers))
    return samples.join(tsids, "tsid", "left_semi"), series


def _range_eval(func: str, m: MatrixSelector, ctx: _Ctx) -> _Vec:
    from pyspark.sql import Window

    base, mser = _resolve_selector(m.inner, ctx)
    r_us = m.range_ms * 1000
    v = F.col("value").cast("decimal(18,4)")
    b = base.select(
        "tsid",
        "ts",
        v.alias("v"),
        F.expr(f"unix_micros(ts) div {r_us}").alias("bucket"),
    )
    if func in ("rate", "increase", "resets", "changes"):
        w = Window.partitionBy("tsid", "bucket").orderBy("ts", "v")
        b = b.withColumn("prev", F.lag("v").over(w))
        inc = F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("v") > F.col("prev")),
                F.col("v") - F.col("prev"),
            ).otherwise(F.lit(0).cast("decimal(18,4)"))
        ).cast("double")
        if func == "rate":
            g = b.groupBy("tsid", "bucket").agg(
                inc.alias("inc"),
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                .cast("bigint")
                .alias("span_us"),
            )
            out = g.where(F.col("span_us") > 0).select(
                "tsid",
                "bucket",
                (F.col("inc") / (F.col("span_us") / F.lit(1e6))).alias("value"),
            )
        elif func == "increase":
            out = b.groupBy("tsid", "bucket").agg(inc.alias("value"))
        elif func == "resets":
            out = b.groupBy("tsid", "bucket").agg(
                F.sum(
                    F.when(
                        F.col("prev").isNotNull() & (F.col("v") < F.col("prev")), 1
                    ).otherwise(0)
                )
                .cast("double")
                .alias("value")
            )
        else:  # changes
            out = b.groupBy("tsid", "bucket").agg(
                F.sum(
                    F.when(
                        F.col("prev").isNotNull() & (F.col("v") != F.col("prev")), 1
                    ).otherwise(0)
                )
                .cast("double")
                .alias("value")
            )
    elif func in ("sum_over_time", "avg_over_time"):
        g = b.groupBy("tsid", "bucket").agg(
            F.sum("v").alias("s"), F.count("*").alias("n")
        )
        val = (
            F.col("s").cast("double")
            if func == "sum_over_time"
            # decimal sum, ONE IEEE division — order-free (rule 2)
            else F.col("s").cast("double") / F.col("n").cast("double")
        )
        out = g.select("tsid", "bucket", val.alias("value"))
    elif func == "max_over_time":
        out = b.groupBy("tsid", "bucket").agg(
            F.max("v").cast("double").alias("value")
        )
    elif func == "min_over_time":
        out = b.groupBy("tsid", "bucket").agg(
            F.min("v").cast("double").alias("value")
        )
    elif func == "count_over_time":
        out = b.groupBy("tsid", "bucket").agg(
            F.count("*").cast("double").alias("value")
        )
    elif func in ("last_over_time", "first_over_time", "delta"):
        # endpoint picks under the total (ts, v) order — deterministic
        # under duplicate timestamps, same tie rule as the lag windows
        w_asc = Window.partitionBy("tsid", "bucket").orderBy("ts", "v")
        w_desc = Window.partitionBy("tsid", "bucket").orderBy(
            F.col("ts").desc(), F.col("v").desc()
        )
        x = b.withColumn("rn_a", F.row_number().over(w_asc)).withColumn(
            "rn_d", F.row_number().over(w_desc)
        )
        g = x.groupBy("tsid", "bucket").agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("v"))).alias("first_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("v"))).alias("last_v"),
        )
        if func == "delta":
            # decimal − decimal, ONE cast — exact cross-engine
            val = (F.col("last_v") - F.col("first_v")).cast("double")
        elif func == "last_over_time":
            val = F.col("last_v").cast("double")
        else:
            val = F.col("first_v").cast("double")
        out = g.select("tsid", "bucket", val.alias("value"))
    else:
        raise NotImplementedError(f"range function {func}")
    if m.offset_ms:
        if m.offset_ms % m.range_ms:
            raise NotImplementedError(
                "offset must be a multiple of the range in the aligned-bucket model"
            )
        shift = m.offset_ms // m.range_ms
        out = out.withColumn("bucket", F.col("bucket") + F.lit(shift))
    return _Vec(out, m.range_ms, mser)


def _quantile_eval(phi: float, m: MatrixSelector, ctx: _Ctx) -> _Vec:
    """``quantile_over_time(φ, m[R])`` — the EXACT rank pick (type-1
    quantile: the sample at rank ⌈φ·n⌉ under the total (value, ts)
    order), a documented deviation from PromQL's linear interpolation:
    the pick is an actual stored sample, value-deterministic and
    bit-identical cross-engine. The rank is computed in INTEGER
    arithmetic from φ's exact decimal form — ``ceil(0.9·n)`` in doubles
    reads 10 at n=10 (0.9 is not a binary fraction), the integer form
    (9n+9)//10 never drifts."""
    from fractions import Fraction

    from pyspark.sql import Window

    if not (0.0 <= phi <= 1.0):
        raise ExprParseError(str(phi), 0, "quantile must be in [0, 1]")
    frac = Fraction(repr(phi)).limit_denominator(10**9)
    p_num, p_den = frac.numerator, frac.denominator
    base, mser = _resolve_selector(m.inner, ctx)
    r_us = m.range_ms * 1000
    v = F.col("value").cast("decimal(18,4)")
    b = base.select(
        "tsid",
        "ts",
        v.alias("v"),
        F.expr(f"unix_micros(ts) div {r_us}").alias("bucket"),
    )
    w = Window.partitionBy("tsid", "bucket").orderBy("v", "ts")
    wn = Window.partitionBy("tsid", "bucket")
    x = b.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    rank = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr(f"CAST(({p_num} * n + {p_den} - 1) DIV {p_den} AS BIGINT)"),
    )
    out = (
        x.where(F.col("rn") == rank)
        .select("tsid", "bucket", F.col("v").cast("double").alias("value"))
    )
    vec = _Vec(out, m.range_ms, mser)
    if m.offset_ms:
        if m.offset_ms % m.range_ms:
            raise NotImplementedError(
                "offset must be a multiple of the range in the aligned-bucket model"
            )
        vec = _Vec(
            out.withColumn(
                "bucket", F.col("bucket") + F.lit(m.offset_ms // m.range_ms)
            ),
            m.range_ms,
            mser,
        )
    return vec


def _range_eval2(func: str, m: MatrixSelector, ctx: _Ctx) -> _Vec:
    """r13 range functions per (tsid, bucket) — each reuses the EXACT
    arithmetic spelling its standalone driver-green operator proved
    (tsdb/promql.py: irate≡q65, idelta≡q88, stddev/stdvar≡q69,
    mad≡q116), so the cross-engine determinism argument carries over
    unchanged: raw-double endpoint picks and single IEEE ops for
    irate/idelta/mad, order-free decimal moments for stddev/stdvar."""
    from pyspark.sql import Window

    base, mser = _resolve_selector(m.inner, ctx)
    r_us = m.range_ms * 1000
    bkt = F.expr(f"unix_micros(ts) div {r_us}").alias("bucket")
    if func in ("irate", "idelta"):
        b = base.select("tsid", "ts", "value", bkt)
        w = Window.partitionBy("tsid", "bucket").orderBy(
            F.col("ts").desc(), F.col("value").desc()
        )
        ranked = b.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
        t_s = F.expr("unix_micros(ts) div 1000000")
        last = ranked.where(F.col("rn") == 1).select(
            "tsid", "bucket", t_s.alias("tl"), F.col("value").alias("vl")
        )
        prev = ranked.where(F.col("rn") == 2).select(
            "tsid", "bucket", t_s.alias("tp"), F.col("value").alias("vp")
        )
        j = last.join(prev, ["tsid", "bucket"])
        if func == "irate":
            dt = (F.col("tl") - F.col("tp")).cast("bigint")
            out = j.where(dt > 0).select(
                "tsid",
                "bucket",
                ((F.col("vl") - F.col("vp")) / dt.cast("double")).alias("value"),
            )
        else:
            out = j.select(
                "tsid", "bucket", (F.col("vl") - F.col("vp")).alias("value")
            )
    elif func in ("stddev_over_time", "stdvar_over_time"):
        v = F.col("value").cast("decimal(18,4)")
        b = base.select("tsid", v.alias("v"), bkt)
        g = b.groupBy("tsid", "bucket").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v").alias("s"),
            F.sum((F.col("v") * F.col("v")).cast("decimal(28,8)")).alias("ss"),
        )
        num = (
            F.col("n") * F.col("ss")
            - (F.col("s") * F.col("s")).cast("decimal(38,8)")
        ).cast("double")
        den = (F.col("n") * F.col("n")).cast("double")
        val = num / den if func == "stdvar_over_time" else F.sqrt(num / den)
        out = g.select("tsid", "bucket", val.alias("value"))
    elif func == "mad_over_time":
        # q116's discrete median + MAD rank picks, per (tsid, bucket)
        wv = Window.partitionBy("tsid", "bucket").orderBy("value", "ts")
        wn = Window.partitionBy("tsid", "bucket")
        k = (
            F.floor(F.lit(0.5) * (F.count("*").over(wn) - 1).cast("double")) + 1
        ).cast("bigint")
        d = (
            base.select("tsid", "ts", "value", bkt)
            .withColumn("rn", F.row_number().over(wv))
            .withColumn("kk", k)
            .withColumn(
                "med",
                F.max(F.when(F.col("rn") == F.col("kk"), F.col("value"))).over(wn),
            )
            .withColumn("dev", F.abs(F.col("value") - F.col("med")))
        )
        wd = Window.partitionBy("tsid", "bucket").orderBy("dev", "ts")
        d = d.withColumn("rd", F.row_number().over(wd))
        out = d.groupBy("tsid", "bucket").agg(
            F.max(F.when(F.col("rd") == F.col("kk"), F.col("dev"))).alias("value")
        )
    else:  # pragma: no cover - guarded by dispatch
        raise NotImplementedError(f"range function {func}")
    if m.offset_ms:
        if m.offset_ms % m.range_ms:
            raise NotImplementedError(
                "offset must be a multiple of the range in the aligned-bucket model"
            )
        out = out.withColumn(
            "bucket", F.col("bucket") + F.lit(m.offset_ms // m.range_ms)
        )
    return _Vec(out, m.range_ms, mser)


def _linreg_vec(m: MatrixSelector, ctx: _Ctx, horizon_s: Optional[int]) -> _Vec:
    """``deriv(m[R])`` (horizon None) / ``predict_linear(m[R], t)`` per
    (tsid, bucket): q83/q86's exact-moment least squares — centered
    integer-second x, DECIMAL(18,4) y, order-independent moment sums,
    then ONE double division (and for predict_linear the same FIXED IEEE
    chain as q86: intercept = (Σy − slope·Σx)/n, pred = intercept +
    slope·(span + t)). Zero-variance groups drop (PromQL emits nothing
    for single-sample series)."""
    from pyspark.sql import Window

    base, mser = _resolve_selector(m.inner, ctx)
    r_us = m.range_ms * 1000
    w = Window.partitionBy("tsid", "bucket")
    d = base.select(
        "tsid",
        F.expr("unix_micros(ts) div 1000000").alias("t"),
        F.col("value").cast("decimal(18,4)").alias("y"),
        F.expr(f"unix_micros(ts) div {r_us}").alias("bucket"),
    )
    d = d.withColumn("x", (F.col("t") - F.min("t").over(w)).cast("bigint"))
    g = d.groupBy("tsid", "bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
        F.max("x").alias("span"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    g = g.where(den != F.lit(0.0))
    slope = num / den
    if horizon_s is None:
        val = slope
    else:
        intercept = (
            F.col("sy").cast("double") - slope * F.col("sx").cast("double")
        ) / F.col("n").cast("double")
        val = intercept + slope * (F.col("span") + F.lit(int(horizon_s))).cast(
            "double"
        )
    return _Vec(g.select("tsid", "bucket", val.alias("value")), m.range_ms, mser)


def _holt_vec(m: MatrixSelector, ctx: _Ctx, sf: float, tf: float) -> _Vec:
    """``holt_winters(m[R], sf, tf)`` per (tsid, bucket): q89's
    sequential left-to-right Holt fold over the bucket's time-ordered
    values — Spark ``F.aggregate`` ≡ the oracle's step-per-rank
    recursive CTE (NOT list_reduce: DuckDB's struct-state fold mutates
    in place, q89's documented trap). ``1−sf``/``1−tf`` are computed
    once in Python (one IEEE subtraction) and embedded as literals in
    both engines."""
    if not (0.0 < sf < 1.0 and 0.0 < tf < 1.0):
        raise ExprParseError(f"{sf},{tf}", 0, "holt_winters factors must be in (0,1)")
    base, mser = _resolve_selector(m.inner, ctx)
    r_us = m.range_ms * 1000
    inv_sf, inv_tf = 1.0 - sf, 1.0 - tf

    def step(acc, x):
        s, b, i = acc["s"], acc["b"], acc["i"]
        beff = F.when(i == 1, x - s).otherwise(b)
        snew = F.when(i == 0, x).otherwise(
            F.lit(sf) * x + F.lit(inv_sf) * (s + beff)
        )
        bnew = F.when(i == 0, F.lit(0.0)).otherwise(
            F.lit(tf) * (snew - s) + F.lit(inv_tf) * beff
        )
        return F.struct(snew.alias("s"), bnew.alias("b"), (i + F.lit(1)).alias("i"))

    g = base.select(
        "tsid",
        "ts",
        "value",
        F.expr(f"unix_micros(ts) div {r_us}").alias("bucket"),
    ).groupBy("tsid", "bucket").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "value"))),
            lambda st: st["value"],
        ).alias("_vs")
    )
    zero = F.struct(
        F.lit(0.0).alias("s"), F.lit(0.0).alias("b"), F.lit(0).alias("i")
    )
    out = g.select(
        "tsid",
        "bucket",
        F.aggregate(F.col("_vs"), zero, step, lambda st: st["s"]).alias("value"),
    )
    return _Vec(out, m.range_ms, mser)


#: implicit value-bucket width for the grammar's histogram_quantile —
#: the same 100-wide buckets q70's standalone operator uses.
_HISTQ_WIDTH = 100


def _histq_vec(phi: float, m: MatrixSelector, ctx: _Ctx) -> _Vec:
    """``histogram_quantile(φ, m[R])`` per (tsid, bucket): q70's
    implicit-value-bucket interpolation (bucket by floor(value/100),
    exact-integer cumulative target rank from φ's exact decimal form,
    one linear interpolation inside the hit bucket)."""
    from fractions import Fraction

    from pyspark.sql import Window

    if not (0.0 <= phi <= 1.0):
        raise ExprParseError(str(phi), 0, "quantile must be in [0, 1]")
    frac = Fraction(repr(phi)).limit_denominator(10**9)
    pn, pd = frac.numerator, frac.denominator
    base, mser = _resolve_selector(m.inner, ctx)
    r_us = m.range_ms * 1000
    wd = _HISTQ_WIDTH
    counts = (
        base.select(
            "tsid",
            F.expr(f"unix_micros(ts) div {r_us}").alias("bucket"),
            F.floor(F.col("value") / wd).cast("bigint").alias("bk"),
        )
        .groupBy("tsid", "bucket", "bk")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    w = (
        Window.partitionBy("tsid", "bucket")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("tsid", "bucket")
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(wt)
    )
    target = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr(f"CAST((total * {pn} + {pd} - 1) DIV {pd} AS BIGINT)"),
    )
    hit = cum.where((F.col("cum") >= target) & (F.col("cum") - F.col("c") < target))
    below = F.col("cum") - F.col("c")
    fr = (target - below).cast("double") / F.col("c").cast("double")
    out = hit.select(
        "tsid",
        "bucket",
        (F.col("bk").cast("double") * wd + fr * wd).alias("value"),
    )
    return _Vec(out, m.range_ms, mser)


def _vec_map(func: str, side, args: Tuple[float, ...]):
    """Instant-vector math on a _Vec or value DataFrame — pure
    IEEE/selection ops only (abs, sign, floor/ceil picks cast back to
    double, correctly-rounded sqrt, least/greatest clamps), all
    bit-identical cross-engine. exp/ln stay NotImplemented (libm
    divergence)."""
    v = F.col("value")
    if func == "abs":
        newv = F.abs(v)
    elif func == "sgn":
        newv = F.when(v > 0, 1.0).when(v < 0, -1.0).otherwise(0.0)
    elif func == "floor":
        newv = F.floor(v).cast("double")
    elif func == "ceil":
        newv = F.ceil(v).cast("double")
    elif func == "sqrt":
        newv = F.sqrt(v)
    elif func == "clamp":
        lo, hi = args
        newv = F.least(F.greatest(v, F.lit(float(lo))), F.lit(float(hi)))
    elif func == "clamp_min":
        newv = F.greatest(v, F.lit(float(args[0])))
    elif func == "clamp_max":
        newv = F.least(v, F.lit(float(args[0])))
    else:  # pragma: no cover - guarded by dispatch
        raise NotImplementedError(func)
    if isinstance(side, _Vec):
        return _Vec(side.df.withColumn("value", newv), side.step_ms, side.series)
    return side.withColumn("value", newv)


def _label_fn(func: str, e: "Call", ctx: _Ctx) -> _Vec:
    """``label_replace(v, "dst", "repl", "src", "regex")`` /
    ``label_join(v, "dst", "sep", "src"...)``: transform the vector's
    CARRIED series frame via the driver-green q56/q73 operators
    (tsdb/promql.py) — the derived flat ``dst`` column then grouppable
    by an outer ``<agg> by (dst) (...)``. The sample frame is untouched
    (labels live on series, PromQL's model)."""
    inner = _eval(e.args[0], ctx)
    if not isinstance(inner, _Vec):
        raise NotImplementedError(f"{func} applies to a vector expression")
    if inner.series is None:
        raise ValueError(f"{func} needs the metric's series frame (register series=)")
    strs = []
    for a in e.args[1:]:
        if not isinstance(a, Str):
            raise NotImplementedError(
                f"{func} arguments after the vector must be string literals"
            )
        strs.append(a.value)
    from tagtree_spark.tsdb import promql as _pq

    if func == "label_replace":
        if len(strs) != 4:
            raise ExprParseError(
                format_expr(e), 0, "label_replace takes (v, dst, repl, src, regex)"
            )
        new_series = _pq.label_replace(inner.series, strs[0], strs[1], strs[2], strs[3])
    else:
        if len(strs) < 2:
            raise ExprParseError(
                format_expr(e), 0, "label_join takes (v, dst, sep, src...)"
            )
        new_series = _pq.label_join(inner.series, strs[0], strs[1], list(strs[2:]))
    return _Vec(inner.df, inner.step_ms, new_series)


def _absent_eval(sel: VectorSelector, ctx: _Ctx) -> DataFrame:
    """``absent(m{sel})`` → one row ``(name, value=1.0)`` when NO series
    matches, empty otherwise. An UNREGISTERED metric name is absent by
    definition (PromQL semantics — absent() is the one place an unknown
    name is an answer, not an error)."""
    got = ctx.metrics.get(sel.name)
    if got is None:
        if not ctx.metrics:
            raise ValueError("absent() needs at least one registered metric")
        any_samples = next(iter(ctx.metrics.values()))[0]
        return (
            any_samples.sparkSession.range(1)
            .select(F.lit(sel.name).alias("name"), F.lit(1.0).alias("value"))
        )
    samples, postings, _ = got
    if sel.matchers:
        if postings is None:
            raise ValueError("selector has matchers but no postings frame was given")
        from tagtree_spark.tsdb.matchers import resolve_label_matchers

        tsids = resolve_label_matchers(postings, list(sel.matchers))
    else:
        tsids = samples.select("tsid")
    n = tsids.agg(F.count("*").alias("_n"))
    return n.where(F.col("_n") == 0).select(
        F.lit(sel.name).alias("name"), F.lit(1.0).alias("value")
    )


def _instant_eval(e: At, ctx: _Ctx) -> _Vec:
    """``m{sel} @ t`` → the latest sample per series in
    ``(t − lookback, t]`` via the driver-green as-of join (tsdb/asof.py,
    q46): broadcast 1-row grid, ONE (tsid, eval_ts) argmax shuffle. The
    result is an instant vector keyed by the eval timestamp in µs
    (bucket := eval_us, step_ms 0), so instant vectors compose with
    aggregation operators and each other."""
    import datetime as _dt

    from tagtree_spark.tsdb.asof import asof_instant

    base, mser = _resolve_selector(e.inner, ctx)
    t = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=e.at_us)
    out = asof_instant(
        base, [t], _dt.timedelta(milliseconds=ctx.lookback_ms)
    )
    return _Vec(
        out.select("tsid", F.col("eval_us").alias("bucket"), "value"), 0, mser
    )


def _count_values_eval(inner: _Vec) -> DataFrame:
    """``count_values(v)``: how many vector elements carry each value,
    bucketed by ``floor(value)`` so the group key is an exact integer
    (q62's deterministic form — grouping raw doubles cross-engine is
    undefined under different aggregation orders)."""
    return (
        inner.df.groupBy(F.floor("value").cast("bigint").alias("vbucket"))
        .agg(F.count("*").cast("double").alias("value"))
    )


def _subquery_frame(v: _Vec, sq: Subquery) -> _Vec:
    if sq.step_ms != v.step_ms:
        raise NotImplementedError(
            "aligned-bucket subquery needs step == inner range "
            f"({format_duration(sq.step_ms)} vs {format_duration(v.step_ms)}); "
            "overlapping lookback windows are the instant-eval model"
        )
    df = v.df
    if sq.range_ms is not None:
        n = sq.range_ms // sq.step_ms
        if n <= 0 or sq.range_ms % sq.step_ms:
            raise NotImplementedError("subquery range must be a multiple of step")
        # trailing-window bound relative to the dataset's last bucket —
        # the batch analogue of "now"; one broadcast scalar
        mx = df.agg(F.max("bucket").alias("mb"))
        df = df.join(F.broadcast(mx)).where(
            F.col("bucket") > F.col("mb") - F.lit(n)
        ).drop("mb")
    return _Vec(df, v.step_ms, v.series)


def _over_subquery(func: str, v: _Vec) -> DataFrame:
    """Collapse a bucket series per tsid → (tsid, value). Sum/avg fold
    SEQUENTIALLY in bucket order (rule 12) — the bucket values are
    doubles, so a plain SUM would be engine-order-dependent."""
    if func == "max_over_time":
        return v.df.groupBy("tsid").agg(F.max("value").alias("value"))
    if func == "min_over_time":
        return v.df.groupBy("tsid").agg(F.min("value").alias("value"))
    if func == "count_over_time":
        return v.df.groupBy("tsid").agg(
            F.count("*").cast("double").alias("value")
        )
    if func in ("sum_over_time", "avg_over_time"):
        g = v.df.groupBy("tsid").agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "value"))),
                    lambda t: t["value"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
            F.count("*").alias("n"),
        )
        val = (
            F.col("s")
            if func == "sum_over_time"
            else F.col("s") / F.col("n").cast("double")
        )
        return g.select("tsid", val.alias("value"))
    raise NotImplementedError(f"over-time function {func} on a subquery")


def _scalar_of(e: Expr) -> Optional[float]:
    if isinstance(e, Number):
        return e.value
    return None


def _agg_by(op: str, vec: _Vec, by: Tuple[str, ...]) -> DataFrame:
    """PromQL aggregation over a bucketed vector → (by..., bucket,
    value). max/min/count are order-free; sum/avg fold SEQUENTIALLY in
    tsid order (rule 12) because the per-series values are doubles. The
    collect_list is bounded by the label-vocabulary series count per
    group — the same boundedness every TSDB query here rides (the
    series table is vocabulary-sized, not event-sized). The series
    frame is the one the vector CARRIES (stamped at selector
    resolution; possibly rewritten by label_replace/label_join)."""
    series = vec.series
    if by:
        if series is None:
            raise ValueError("by-grouping needs the series frame")
        missing = [c for c in by if c not in series.columns]
        if missing:
            raise ValueError(f"unknown grouping label(s) {missing}")
        df = vec.df.join(series.select("tsid", *by), "tsid")
        keys = list(by) + ["bucket"]
    else:
        df = vec.df
        keys = ["bucket"]
    g = df.groupBy(*keys)
    if op == "max":
        out = g.agg(F.max("value").alias("value"))
    elif op == "min":
        out = g.agg(F.min("value").alias("value"))
    elif op == "count":
        out = g.agg(F.count("*").cast("double").alias("value"))
    elif op in ("stddev", "stdvar"):
        # population variance from TWO sequential folds in tsid order
        # (values and squares — each fold rule-12 bracketed ≡ DuckDB
        # list_reduce over list(... ORDER BY tsid)), then ONE fixed IEEE
        # chain: (n·Σv² − (Σv)²)/n² — spelled identically in oracles.
        gg = g.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tsid", "value"))),
                lambda t: t["value"],
            ).alias("_vs"),
            F.count("*").alias("n"),
        )
        s1 = F.aggregate(F.col("_vs"), F.lit(0.0), lambda a, x: a + x)
        s2 = F.aggregate(
            F.transform(F.col("_vs"), lambda v: v * v),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        nd = F.col("n").cast("double")
        var = (nd * s2 - s1 * s1) / (nd * nd)
        val = F.sqrt(var) if op == "stddev" else var
        out = gg.select(*keys, val.alias("value"))
    else:  # sum / avg — deterministic sequential fold in tsid order
        out = g.agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tsid", "value"))),
                    lambda t: t["value"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
            F.count("*").alias("n"),
        )
        val = F.col("s") if op == "sum" else F.col("s") / F.col("n").cast("double")
        out = out.select(*keys, val.alias("value"))
    return out.select(*keys, "value")


def _cmp_op(op: str, left, right):
    return {
        ">": left > right,
        "<": left < right,
        ">=": left >= right,
        "<=": left <= right,
        "==": left == right,
        "!=": left != right,
    }[op]


def _cmp_eval(e: BinOp, ctx: _Ctx):
    """PromQL comparison semantics: FILTER by default (keep the vector
    side's elements where the comparison holds, value untouched), 0/1
    results with the ``bool`` modifier — pure comparisons on doubles
    either way, cross-engine exact."""
    ls, rs = _scalar_of(e.left), _scalar_of(e.right)
    if ls is not None and rs is not None:
        if not e.bool_mode:
            raise NotImplementedError(
                "scalar-scalar comparison needs the bool modifier"
            )
        py = {
            ">": ls > rs,
            "<": ls < rs,
            ">=": ls >= rs,
            "<=": ls <= rs,
            "==": ls == rs,
            "!=": ls != rs,
        }[e.op]
        return Number(1.0 if py else 0.0)
    v = F.col("value")

    def _apply(df, cond):
        if e.bool_mode:
            return df.withColumn(
                "value", F.when(cond, 1.0).otherwise(0.0)
            )
        return df.where(cond)

    if ls is None and rs is None:
        lv = _eval(e.left, ctx)
        rv = _eval(e.right, ctx)
        if not (isinstance(lv, _Vec) and isinstance(rv, _Vec)):
            raise NotImplementedError(
                "vector-vector comparison needs two bucketed vectors"
            )
        if lv.step_ms != rv.step_ms:
            raise NotImplementedError("comparison needs matching bucket widths")
        j = lv.df.select("tsid", "bucket", F.col("value").alias("_l")).join(
            rv.df.select("tsid", "bucket", F.col("value").alias("_r")),
            ["tsid", "bucket"],
        )
        cond = _cmp_op(e.op, F.col("_l"), F.col("_r"))
        if e.bool_mode:
            out = j.select(
                "tsid", "bucket", F.when(cond, 1.0).otherwise(0.0).alias("value")
            )
        else:
            out = j.where(cond).select(
                "tsid", "bucket", F.col("_l").alias("value")
            )
        return _Vec(out, lv.step_ms, lv.series)
    side = _eval(e.left if ls is None else e.right, ctx)
    lit = F.lit(rs if ls is None else ls)
    cond = _cmp_op(e.op, v, lit) if ls is None else _cmp_op(e.op, lit, v)
    if isinstance(side, _Vec):
        return _Vec(_apply(side.df, cond), side.step_ms, side.series)
    if isinstance(side, DataFrame):
        return _apply(side, cond)
    raise NotImplementedError("comparison needs a vector side")


def _on_binop(e: BinOp, ctx: _Ctx) -> DataFrame:
    """``a <op> on(l1, ...) b`` between two BY-GROUPED vectors (q57's
    vector-matching shape from a string): both sides must be aggregation
    results carrying the ``on`` labels; they join on (labels..., bucket)
    and the op applies once per matched pair. Division drops zero
    denominators (rule 18's documented deviation)."""
    lv = _eval(e.left, ctx)
    rv = _eval(e.right, ctx)
    if not (isinstance(lv, DataFrame) and isinstance(rv, DataFrame)):
        raise NotImplementedError(
            "on() matching applies between by-grouped aggregation results"
        )
    for side_df, side_name in ((lv, "left"), (rv, "right")):
        missing = [c for c in e.on if c not in side_df.columns]
        if missing:
            raise ValueError(
                f"on() label(s) {missing} absent from the {side_name} side "
                f"(its columns: {side_df.columns})"
            )
    keys = list(e.on) + ["bucket"]
    j = lv.select(*keys, F.col("value").alias("_l")).join(
        rv.select(*keys, F.col("value").alias("_r")), keys
    )
    if e.op == "/":
        j = j.where(F.col("_r") != 0.0)
    lcol, rcol = F.col("_l"), F.col("_r")
    newv = {
        "+": lcol + rcol,
        "-": lcol - rcol,
        "*": lcol * rcol,
        "/": lcol / rcol,
    }[e.op]
    return j.select(*keys, newv.alias("value"))


def _group_left_binop(e: BinOp, ctx: _Ctx) -> _Vec:
    """``v <op> on(l) group_left agg`` — PromQL many-to-one matching:
    each LEFT element (a per-series vector) pairs with its label
    group's aggregate (the share-of-group idiom, tsdb/promql.py
    group_share's shape from a string). The left's carried series frame
    supplies the on-labels; the group aggregate is broadcast-sized
    (label vocabulary). Division drops zero denominators (rule 18)."""
    lv = _eval(e.left, ctx)
    rv = _eval(e.right, ctx)
    if not isinstance(lv, _Vec):
        raise NotImplementedError("group_left needs a per-series vector LEFT side")
    if not isinstance(rv, DataFrame):
        raise NotImplementedError(
            "group_left needs a by-grouped aggregation RIGHT side"
        )
    if lv.series is None:
        raise ValueError("group_left needs the metric's series frame")
    missing = [c for c in e.on if c not in lv.series.columns]
    if missing:
        raise ValueError(f"on() label(s) {missing} absent from the series frame")
    missing_r = [c for c in e.on if c not in rv.columns]
    if missing_r:
        raise ValueError(
            f"on() label(s) {missing_r} absent from the right side "
            f"(its columns: {rv.columns})"
        )
    keys = list(e.on) + ["bucket"]
    labeled = lv.df.join(lv.series.select("tsid", *e.on), "tsid")
    j = labeled.join(
        F.broadcast(rv.select(*keys, F.col("value").alias("_r"))), keys
    )
    if e.op == "/":
        j = j.where(F.col("_r") != 0.0)
    lcol, rcol = F.col("value"), F.col("_r")
    newv = {
        "+": lcol + rcol,
        "-": lcol - rcol,
        "*": lcol * rcol,
        "/": lcol / rcol,
    }[e.op]
    return _Vec(
        j.select("tsid", "bucket", newv.alias("value")), lv.step_ms, lv.series
    )


def _quantile_agg(phi: float, vec: _Vec) -> DataFrame:
    """``quantile(φ, v)`` aggregation operator: the exact rank-⌈φ·n⌉
    element across ALL series per bucket under the total (value, tsid)
    order — the same integer-rank discipline as quantile_over_time
    (q359's ceil-in-doubles trap dodged)."""
    from fractions import Fraction

    from pyspark.sql import Window

    if not (0.0 <= phi <= 1.0):
        raise ExprParseError(str(phi), 0, "quantile must be in [0, 1]")
    frac = Fraction(repr(phi)).limit_denominator(10**9)
    pn, pd = frac.numerator, frac.denominator
    w = Window.partitionBy("bucket").orderBy("value", "tsid")
    wn = Window.partitionBy("bucket")
    x = vec.df.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    rank = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr(f"CAST(({pn} * n + {pd} - 1) DIV {pd} AS BIGINT)"),
    )
    return x.where(F.col("rn") == rank).select("bucket", "value")


def evaluate(
    expr: Union[str, Expr],
    samples: Optional[DataFrame] = None,
    postings: Optional[DataFrame] = None,
    series: Optional[DataFrame] = None,
    metrics: Optional[dict] = None,
    lookback_ms: int = 300_000,
) -> DataFrame:
    """Evaluate a PromQL-style expression.

    Metric names resolve through ``metrics`` — a registry mapping
    ``name → (samples, postings, series)`` (VERDICT r12 #2); the
    positional ``samples``/``postings``/``series`` trio is shorthand for
    registering the single default metric ``events_total`` (the derived
    fixture model's name). ``lookback_ms`` is the instant-eval (@)
    staleness window, PromQL's 5m by default.

    Returns (tsid, value) for expressions whose outermost vector is a
    *_over_time over a subquery, (tsid, bucket, value) for a bare
    range-function or @-instant expression, (by-labels..., bucket,
    value) for an aggregation operator, (name, value) for absent(), and
    (vbucket, value) for count_values(); scalar arithmetic applies
    elementwise. Unsupported PromQL shapes raise NotImplementedError
    (honest refusal, the codec-triage convention) rather than
    approximating."""
    e = parse_expr(expr) if isinstance(expr, str) else expr
    reg = dict(metrics) if metrics else {}
    if samples is not None and "events_total" not in reg:
        reg["events_total"] = (samples, postings, series)
    ctx = _Ctx(reg, lookback_ms)
    out = _eval(e, ctx)
    if isinstance(out, _Vec):
        return out.df.select("tsid", "bucket", "value")
    if isinstance(out, DataFrame):
        return out
    raise NotImplementedError("top-level expression must be a vector")


def _eval(e: Expr, ctx: _Ctx):
    if isinstance(e, Call):
        if (
            e.func in ("topk", "bottomk")
            and len(e.args) == 2
            and isinstance(e.args[0], Number)
        ):
            from pyspark.sql import Window

            inner = _eval(e.args[1], ctx)
            if not isinstance(inner, _Vec):
                raise NotImplementedError("topk/bottomk need a bucketed vector")
            kk = int(e.args[0].value)
            order = (
                [F.col("value").desc(), F.col("tsid")]
                if e.func == "topk"
                else [F.col("value").asc(), F.col("tsid")]
            )
            w = Window.partitionBy("bucket").orderBy(*order)
            df = (
                inner.df.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= kk)
                .drop("rn")
            )
            return _Vec(df, inner.step_ms, inner.series)
        if (
            e.func == "quantile_over_time"
            and len(e.args) == 2
            and isinstance(e.args[0], Number)
            and isinstance(e.args[1], MatrixSelector)
        ):
            return _quantile_eval(e.args[0].value, e.args[1], ctx)
        if (
            e.func == "quantile"
            and len(e.args) == 2
            and isinstance(e.args[0], Number)
        ):
            inner = _eval(e.args[1], ctx)
            if not isinstance(inner, _Vec):
                raise NotImplementedError(
                    "quantile() aggregates a bucketed vector"
                )
            return _quantile_agg(e.args[0].value, inner)
        if (
            e.func == "histogram_quantile"
            and len(e.args) == 2
            and isinstance(e.args[0], Number)
            and isinstance(e.args[1], MatrixSelector)
        ):
            return _histq_vec(e.args[0].value, e.args[1], ctx)
        if (
            e.func == "predict_linear"
            and len(e.args) == 2
            and isinstance(e.args[0], MatrixSelector)
            and isinstance(e.args[1], Number)
        ):
            return _linreg_vec(e.args[0], ctx, int(e.args[1].value))
        if (
            e.func == "holt_winters"
            and len(e.args) == 3
            and isinstance(e.args[0], MatrixSelector)
            and isinstance(e.args[1], Number)
            and isinstance(e.args[2], Number)
        ):
            return _holt_vec(e.args[0], ctx, e.args[1].value, e.args[2].value)
        if e.func in ("label_replace", "label_join") and len(e.args) >= 2:
            return _label_fn(e.func, e, ctx)
        if (
            e.func == "absent"
            and len(e.args) == 1
            and isinstance(e.args[0], VectorSelector)
        ):
            return _absent_eval(e.args[0], ctx)
        if e.func == "count_values" and len(e.args) == 1:
            inner = _eval(e.args[0], ctx)
            if not isinstance(inner, _Vec):
                raise NotImplementedError("count_values needs a bucketed vector")
            return _count_values_eval(inner)
        if e.func in _VEC_MATH and len(e.args) == 1:
            side = _eval(e.args[0], ctx)
            if not isinstance(side, (_Vec, DataFrame)):
                raise NotImplementedError(f"{e.func} applies to a vector")
            return _vec_map(e.func, side, ())
        if e.func in ("clamp", "clamp_min", "clamp_max"):
            want = 3 if e.func == "clamp" else 2
            if len(e.args) != want or not all(
                isinstance(a, Number) for a in e.args[1:]
            ):
                raise ExprParseError(
                    format_expr(e), 0, f"{e.func} takes a vector and {want - 1} scalar(s)"
                )
            side = _eval(e.args[0], ctx)
            if not isinstance(side, (_Vec, DataFrame)):
                raise NotImplementedError(f"{e.func} applies to a vector")
            return _vec_map(e.func, side, tuple(a.value for a in e.args[1:]))
        if len(e.args) == 1 and isinstance(e.args[0], MatrixSelector):
            if e.func == "deriv":
                return _linreg_vec(e.args[0], ctx, None)
            if e.func in _RANGE_FNS2:
                return _range_eval2(e.func, e.args[0], ctx)
            if e.func not in _RANGE_FNS:
                raise NotImplementedError(f"function {e.func} over a range")
            return _range_eval(e.func, e.args[0], ctx)
        if len(e.args) == 1 and isinstance(e.args[0], Subquery):
            if e.func not in _SUBQ_FNS:
                raise NotImplementedError(f"function {e.func} over a subquery")
            inner = _eval(e.args[0].inner, ctx)
            if not isinstance(inner, _Vec):
                raise NotImplementedError("subquery inner must be a bucket vector")
            return _over_subquery(e.func, _subquery_frame(inner, e.args[0]))
        raise NotImplementedError(f"call shape {format_expr(e)}")
    if isinstance(e, At):
        return _instant_eval(e, ctx)
    if isinstance(e, AggExpr):
        inner = _eval(e.expr, ctx)
        if not isinstance(inner, _Vec):
            raise NotImplementedError(
                "aggregation operators apply to a bucketed vector"
            )
        by = e.by
        if e.without:
            # keep every series LABEL column except the listed ones
            # (unknown names ignored, PromQL semantics); the non-label
            # bookkeeping columns never group
            if inner.series is None:
                raise ValueError("without-grouping needs the series frame")
            drop = set(e.by) | _NON_LABEL_SERIES_COLS
            by = tuple(c for c in inner.series.columns if c not in drop)
        return _agg_by(e.op, inner, by)
    if isinstance(e, BinOp):
        if e.op in _SET_OPS:
            lv = _eval(e.left, ctx)
            rv = _eval(e.right, ctx)
            if not (isinstance(lv, _Vec) and isinstance(rv, _Vec)):
                raise NotImplementedError(
                    "set operators apply between two bucketed vectors"
                )
            if lv.step_ms != rv.step_ms:
                raise NotImplementedError(
                    "set operators need matching bucket widths"
                )
            rk = rv.df.select("tsid", "bucket")
            if e.op == "and":
                df = lv.df.join(rk, ["tsid", "bucket"], "left_semi")
            elif e.op == "unless":
                df = lv.df.join(rk, ["tsid", "bucket"], "left_anti")
            else:  # or — every lhs element, plus rhs elements lhs lacks
                lk = lv.df.select("tsid", "bucket")
                df = lv.df.unionByName(
                    rv.df.join(lk, ["tsid", "bucket"], "left_anti")
                )
            return _Vec(df, lv.step_ms, lv.series)
        if e.op in _CMP_OPS:
            return _cmp_eval(e, ctx)
        if e.on and e.group_left:
            return _group_left_binop(e, ctx)
        if e.on:
            return _on_binop(e, ctx)
        # evaluate both sides first — a side may be a literal Number OR
        # an expression that FOLDS to a scalar (e.g. a bool comparison)
        lv = _eval(e.left, ctx)
        rv = _eval(e.right, ctx)
        ls = lv.value if isinstance(lv, Number) else None
        rs = rv.value if isinstance(rv, Number) else None
        if ls is not None and rs is not None:
            v = {"+": ls + rs, "-": ls - rs, "*": ls * rs, "/": ls / rs}[e.op]
            return Number(v)
        if ls is None and rs is None:
            # vector ⊗ vector: PromQL one-to-one matching on the full
            # label set — here the (tsid, bucket) identity. An inner
            # join (unmatched samples drop, PromQL semantics); division
            # DROPS zero denominators (documented deviation from
            # PromQL's ±Inf — ANSI Spark throws on double /0, rule 18,
            # and a dropped row is honest where an Inf literal is not)
            if not (isinstance(lv, _Vec) and isinstance(rv, _Vec)):
                raise NotImplementedError(
                    "vector-vector arithmetic needs two bucketed vectors"
                )
            if lv.step_ms != rv.step_ms:
                raise NotImplementedError(
                    "vector-vector arithmetic needs matching bucket widths"
                )
            j = lv.df.select(
                "tsid", "bucket", F.col("value").alias("_l")
            ).join(
                rv.df.select("tsid", "bucket", F.col("value").alias("_r")),
                ["tsid", "bucket"],
            )
            if e.op == "/":
                j = j.where(F.col("_r") != 0.0)
            lcol, rcol = F.col("_l"), F.col("_r")
            newv = {
                "+": lcol + rcol,
                "-": lcol - rcol,
                "*": lcol * rcol,
                "/": lcol / rcol,
            }[e.op]
            return _Vec(
                j.select("tsid", "bucket", newv.alias("value")),
                lv.step_ms,
                lv.series,
            )
        side = lv if ls is None else rv
        sc = F.lit(rs if ls is None else ls)
        col = F.col("value")
        if ls is None:  # vector op scalar
            newv = {"+": col + sc, "-": col - sc, "*": col * sc, "/": col / sc}[e.op]
        else:  # scalar op vector
            newv = {"+": sc + col, "-": sc - col, "*": sc * col, "/": sc / col}[e.op]
        if isinstance(side, _Vec):
            return _Vec(side.df.withColumn("value", newv), side.step_ms, side.series)
        if isinstance(side, DataFrame):
            return side.withColumn("value", newv)
        raise NotImplementedError("arithmetic needs a vector side")
    if isinstance(e, (VectorSelector, MatrixSelector, Subquery)):
        raise NotImplementedError(
            f"bare {type(e).__name__} is not an evaluable vector here; "
            "wrap it in a range/over-time function, or evaluate an "
            "instant vector with the @ modifier"
        )
    if isinstance(e, Str):
        raise NotImplementedError(
            "string literals are only valid as function arguments"
        )
    if isinstance(e, Number):
        return e
    raise TypeError(f"unknown node {e!r}")
