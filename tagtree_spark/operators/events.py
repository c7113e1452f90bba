"""Behavioral event analytics (§2.11 extension surface): ordered funnels
and cohort retention — the two queries every product-analytics user of a
TSDB-shaped event store runs (the reference stores exactly this event
shape; its downstream Prometheus engine cannot express either).

Cross-engine discipline: every output is an exact integer count or an
epoch-integer time — no float arithmetic anywhere.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    window: _dt.timedelta = _dt.timedelta(days=7),
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: how many users performed ``steps`` in
    order, each step strictly after the previous one and all within
    ``window`` of the user's FIRST step-1 event.

    Semantics (the standard product-analytics funnel): step 1 anchors at
    the user's earliest ``steps[0]`` event; step k's timestamp is the
    user's earliest ``steps[k]`` event strictly after step k−1 and within
    the window. min-of-timestamp picks only — deterministic, no floats.

    Scale shape: one filtered groupBy(user) per step, each joined to the
    previous stage's (user, ts) frame — the stage frames only SHRINK down
    the funnel, and each join keys on user_id (AQE broadcasts the later,
    smaller stages). No windows over raw events, no event-list collection.
    All stage counts come back in ONE plan (a union of one-row
    aggregates; identical stage subtrees dedupe via ReusedExchange) — a
    per-stage ``.count()`` loop paid k driver round-trips and re-executed
    stage i's chain inside stages i+1..k (r13, the q222 job-count class).

    → one row per stage: ``(stage, step, n_users)`` with stage 1-based.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    win_s = int(window.total_seconds())
    stage = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min("ts").alias("t1"))
        .withColumn("deadline", F.col("t1") + F.expr(f"INTERVAL {win_s} SECOND"))
    )

    def _stage_row(df: DataFrame, i: int, step: str) -> DataFrame:
        return df.agg(
            F.lit(i + 1).cast("bigint").alias("stage"),
            F.lit(step).alias("step"),
            F.count("*").cast("bigint").alias("n_users"),
        )

    parts = [_stage_row(stage, 0, steps[0])]
    prev = stage.select(user_col, F.col("t1").alias("tprev"), "deadline")
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.where(F.col(type_col) == step)
            .join(prev, user_col)
            .where((F.col("ts") > F.col("tprev")) & (F.col("ts") <= F.col("deadline")))
            .groupBy(user_col, "deadline")
            .agg(F.min("ts").alias("tprev"))
            .select(user_col, "tprev", "deadline")
        )
        parts.append(_stage_row(nxt, i, step))
        prev = nxt
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("stage")


def retention_cohorts(
    events: DataFrame,
    max_weeks: int = 4,
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    as retained in each later week they were active.

    ``cohort_day`` is the Monday of the user's first event's ISO week as
    days since 2024-01-01 (integer — dates/timestamps never cross the
    engine boundary raw); ``week_offset`` counts whole weeks from the
    cohort week. Exact distinct-user counts.

    Scale shape: the first-seen table is one groupBy(user) (shrinks to
    one row per user, broadcastable); activity is a distinct over (user,
    week); one join + one count agg. No windows over raw events.

    → ``(cohort_day, week_offset, n_active)``.
    """
    epoch = F.lit("2024-01-01").cast("date")
    first = (
        events.groupBy(user_col)
        .agg(F.min("ts").alias("t0"))
        .select(
            user_col,
            F.datediff(F.date_trunc("week", F.col("t0")).cast("date"), epoch).alias(
                "cohort_day"
            ),
        )
    )
    active = events.select(
        user_col,
        F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), epoch).alias(
            "week_day"
        ),
    ).distinct()
    return (
        active.join(F.broadcast(first), user_col)
        .withColumn(
            "week_offset", ((F.col("week_day") - F.col("cohort_day")) / 7).cast("bigint")
        )
        .where(F.col("week_offset") <= max_weeks)
        .groupBy("cohort_day", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .select(
            F.col("cohort_day").cast("bigint").alias("cohort_day"),
            "week_offset",
            "n_active",
        )
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence — the product-analytics "path analysis" primitive (what do
    users do AFTER a search?) and the order-1 sequence model a
    training-data pipeline fits to session logs.

    Per user, events are totally ordered by (ts, event_id) (ties fixed by
    the unique id, so the lag pairing is deterministic); each consecutive
    pair emits one (from_type, to_type) transition. One user-partitioned
    lag window + one groupBy — user count is the parallelism, the
    transition matrix is |event_types|² rows. ``p`` is the row-normalized
    probability: exact integer counts, ONE final IEEE division —
    order-independent and cross-engine exact.

    → ``(from_type, to_type, n, p)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "ts", "event_id", F.col("event_type").alias("to_type")
    ).withColumn("from_type", F.lag("to_type").over(w))
    counts = (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wtot = Window.partitionBy("from_type")
    return counts.withColumn(
        "p",
        F.col("n").cast("double") / F.sum("n").over(wtot).cast("double"),
    )


def type_cooccurrence(events: DataFrame) -> DataFrame:
    """Event-type co-occurrence (the market-basket primitive) →
    ``(type_a, type_b, n_userdays)``: for every unordered pair of event
    types, how many (user, day) cells saw both.

    One shuffle: groupBy (user, day) collects the SORTED distinct type
    set, then a narrow nested ``transform`` expands the in-row pairs —
    never a self-join, so the pair blowup is bounded by the per-cell
    type-set size (≤ the type-domain cardinality, a constant), not by
    corpus size. The pair counts then reduce map-side. At 100 TB the
    heavy table shuffles once on (user, day) and everything after is
    tiny. Expects the events schema (``user_id``, ``ts`` timestamp,
    ``event_type``)."""
    day = F.expr("unix_micros(ts) div 86400000000")
    n = events.sparkSession.sparkContext.defaultParallelism
    cells = (
        # user-sized keyed exchange (not the groupBy's own): the cell
        # table's post-shuffle BYTES are tiny, so AQE otherwise coalesces
        # the collect_set aggregate AND the per-cell pair transform below
        # onto ONE task (r13 event log: 14.5 s serialized CPU) — the
        # q303/q244 pattern; same keys, so the groupBy adds no exchange
        events.select(F.col("user_id"), day.alias("d"), F.col("event_type"))
        .repartition(n, "user_id", "d")
        .groupBy("user_id", "d")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    pairs = cells.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("types"),
                    lambda a, i: F.transform(
                        F.slice(F.col("types"), i + 2, F.size("types")),
                        lambda b: F.struct(a.alias("type_a"), b.alias("type_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_userdays"))
    )


def last_touch_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    touch_type: str = "click",
    window_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Last-touch attribution → one row per conversion event:
    ``(event_id, user_id, touch_id, gap_us)`` where ``touch_id`` is the
    LAST preceding touch event by the same user within ``window_us``
    (−1 / −1 when none) — the point-in-time credit-assignment join of
    every growth/ads pipeline, and the event-table twin of the as-of
    join (tsdb/asof.py) with an inline type filter.

    Shape: filter to the two types (pushed to the scan), ONE user-keyed
    window with a GROWING frame carrying the last touch forward (never a
    shrinking frame — CLAUDE perf trap), then keep conversions. At
    100 TB: one shuffle on user_id, per-user state is a single struct.
    """
    from pyspark.sql import Window

    ev = events.where(F.col("event_type").isin(convert_type, touch_type)).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("us"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_id = F.when(F.col("event_type") == touch_type, F.col("event_id"))
    touch_us = F.when(F.col("event_type") == touch_type, F.col("us"))
    carried = ev.select(
        "event_id",
        "user_id",
        "us",
        "event_type",
        F.last(touch_id, ignorenulls=True).over(w).alias("t_id"),
        F.last(touch_us, ignorenulls=True).over(w).alias("t_us"),
    )
    in_window = F.col("t_id").isNotNull() & (
        F.col("us") - F.col("t_us") <= F.lit(window_us)
    )
    return carried.where(F.col("event_type") == convert_type).select(
        "event_id",
        "user_id",
        F.when(in_window, F.col("t_id")).otherwise(F.lit(-1)).cast("bigint").alias("touch_id"),
        F.when(in_window, F.col("us") - F.col("t_us"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("gap_us"),
    )


def symbol_column(symbols: dict[str, str], type_col: str = "event_type"):
    """Column mapping an event-type column to its single-char CEP symbol
    (NULL for types outside the alphabet) — the one shared definition the
    batch matcher, the session-windowed variant, and the motif miner all
    build their symbol strings from."""
    if len(set(symbols.values())) != len(symbols):
        raise ValueError("symbol characters must be distinct")
    return F.create_map(*[F.lit(x) for kv in symbols.items() for x in kv])[
        F.col(type_col)
    ]


def validate_cep_args(pattern: str, symbols: dict[str, str]) -> None:
    """Shared validation for the CEP operators (batch + streaming):
    symbols must be distinct single ASCII chars, and the pattern must be
    position-innocent — no anchors/boundaries (``^ $ \\A \\Z \\b \\B``)
    and no empty match. Both restrictions protect the first-match
    anchoring: the batch operator locates the first match by substring
    position of the matched text, which equals the regex match position
    exactly when matches are context-free (any occurrence of the matched
    text IS a match) and non-empty; anchored or empty-matchable patterns
    would silently break that equivalence (and ``element_at(seq, 0)``
    throws on an empty match)."""
    import re as _re

    for t, c in symbols.items():
        if len(c) != 1 or ord(c) > 127:
            raise ValueError(f"symbol for {t!r} must be one ASCII char, got {c!r}")
    if len(set(symbols.values())) != len(symbols):
        raise ValueError("symbol characters must be distinct")
    if _re.search(r"(?<!\\)[\^$]|\\[AZbB]", pattern):
        raise ValueError(
            f"pattern {pattern!r} uses anchors/boundaries; sequence_match "
            "anchors the first match by matched-text position, which is "
            "only position-true for context-free patterns"
        )
    # Enforce the RE2∩Java∩Python common subset structurally (ADVICE r8):
    # the batch operator evaluates patterns with JVM regexp_* while the
    # streaming twin uses Python re — engine-divergent syntax (inline
    # flags `(?i)`, lookaround, `\b\d\w` classes, backrefs, unicode class
    # semantics) would make the two silently diverge instead of erroring.
    # Allowed tokens: alphabet symbols, escaped non-alphanumeric literals,
    # plain groups `(...)`, alternation `|`, quantifiers `* + ? {n,m}`,
    # and character classes `[...]` over the same token set.
    alphabet = set(symbols.values())

    def _bad(i: int, why: str) -> ValueError:
        return ValueError(
            f"pattern {pattern!r} at index {i}: {why} — outside the "
            "Java/Python/RE2 common subset the CEP operators guarantee "
            "identical batch/stream semantics for"
        )

    i, in_class = 0, False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            nxt = pattern[i + 1] if i + 1 < len(pattern) else ""
            if not nxt or nxt.isalnum():
                raise _bad(i, f"escape '\\{nxt}' (class/anchor/backref)")
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            elif c == "[" and pattern[i + 1 : i + 2] == ":":
                raise _bad(i, "POSIX class inside [...]")
            elif c == "-" or c in alphabet:
                pass
            else:
                raise _bad(i, f"char {c!r} inside [...] not in the symbol alphabet")
            i += 1
            continue
        if c == "[":
            in_class = True
            if pattern[i + 1 : i + 2] == "^":
                i += 1  # negation over the alphabet is well-defined
            i += 1
            continue
        if c == "(":
            if pattern[i + 1 : i + 2] == "?":
                raise _bad(i, "'(?' construct (inline flag/lookaround/named group)")
            i += 1
            continue
        if c in ")|*+?":
            i += 1
            continue
        if c == "{":
            j = pattern.find("}", i)
            body = pattern[i + 1 : j] if j != -1 else ""
            if j == -1 or not _re.fullmatch(r"\d+(,\d*)?", body):
                raise _bad(i, "malformed {n,m} quantifier")
            i = j + 1
            continue
        if c in alphabet:
            i += 1
            continue
        raise _bad(i, f"char {c!r} not in the symbol alphabet")
    if in_class:
        raise _bad(len(pattern) - 1, "unterminated [...] class")
    if _re.compile(pattern).match(""):
        raise ValueError(
            f"pattern {pattern!r} can match the empty string; require at "
            "least one symbol (e.g. 'v+' not 'v*')"
        )


def sequence_match(
    events: DataFrame,
    pattern: str,
    symbols: dict[str, str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_events: int | None = None,
) -> DataFrame:
    """CEP sequence-pattern matching (the MATCH_RECOGNIZE analogue):
    per key, order events by (ts, id), map each event type to a single
    ASCII symbol, and run ``pattern`` (a regex over the symbol alphabet,
    RE2∩Java common subset — no backrefs/lookaround) over the resulting
    symbol string. Flink CEP / MATCH_RECOGNIZE express exactly this
    NFA-over-ordered-rows semantics; here the per-key sequence is one
    collect + one JVM regex pass, no Python in the loop.

    Returns one row per key with >=1 match:
    ``(user_col, n_matches, first_pos, first_len, first_event_id,
    first_ts_us, first_span_us)`` — n_matches counts NON-OVERLAPPING
    leftmost matches (identical in Java and RE2 for the common subset),
    first_pos is the 1-based event index of the first match, first_span_us
    the elapsed time the first matched subsequence covers.

    Scale shape: ONE shuffle (groupBy on the key); per-group state is the
    symbol string + id/ts arrays, bounded by events-per-key — pass
    ``max_events`` to hard-slice pathological hot keys (the first
    max_events events in order are kept; a real deployment would also
    day-bucket the key, as streaming/sessions.py does). Events with a
    type absent from ``symbols`` are dropped before collection, so the
    pattern alphabet prunes the scan first.

    The pattern must be anchor-free and unable to match the empty string
    (``validate_cep_args``): first_pos is located via the first substring
    occurrence of the matched text, which provably equals the regex match
    position for context-free patterns (an earlier occurrence of the
    matched text would itself start a match, contradicting leftmostness)
    but NOT for ``^ $ \\b``-anchored ones.
    """
    validate_cep_args(pattern, symbols)
    sym = symbol_column(symbols, type_col)
    base = events.select(
        F.col(user_col),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        sym.alias("_sym"),
    ).where(F.col("_sym").isNotNull())
    seq = base.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_id", "_sym"))).alias("seq")
    )
    if max_events is not None:
        seq = seq.withColumn("seq", F.slice("seq", 1, max_events))
    seq = seq.withColumn(
        "s", F.array_join(F.transform("seq", lambda x: x["_sym"]), "")
    )
    first = F.regexp_extract(F.col("s"), pattern, 0)
    matched = (
        seq.withColumn("n_matches", F.regexp_count(F.col("s"), F.lit(pattern)).cast("bigint"))
        .where(F.col("n_matches") >= 1)
        .withColumn("first", first)
        .withColumn("first_pos", F.instr(F.col("s"), F.col("first")).cast("bigint"))
        .withColumn("first_len", F.length("first").cast("bigint"))
    )
    at = lambda p: F.element_at(F.col("seq"), p.cast("int"))  # noqa: E731
    return matched.select(
        user_col,
        "n_matches",
        "first_pos",
        "first_len",
        at(F.col("first_pos"))["_id"].alias("first_event_id"),
        F.unix_micros(at(F.col("first_pos"))["_ts"]).alias("first_ts_us"),
        (
            F.unix_micros(at(F.col("first_pos") + F.col("first_len") - 1)["_ts"])
            - F.unix_micros(at(F.col("first_pos"))["_ts"])
        ).alias("first_span_us"),
    )
