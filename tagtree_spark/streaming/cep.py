"""Streaming CEP: incremental sequence-pattern matching per key
(SURVEY.md §2.9 + the q238 batch operator's streaming twin).

The batch operator (operators/events.py sequence_match) runs one regex
pass over each key's (ts, id)-ordered symbol string. The streaming form
keeps that ordered symbol sequence as Spark-managed keyed state
(``applyInPandasWithState``): each micro-batch's rows are merge-sorted
into the state — so LATE or out-of-order events land in their correct
position, not at the end — and the key's match summary is re-emitted.
Latest-wins per key therefore always reflects the full history seen so
far, and after draining any split of the input the result equals the
batch operator bit-for-bit (test + q240 driver oracle).

State is bounded: per key it is the (ts_us, id, symbol) sequence,
hard-capped by ``max_events`` (the same hot-key guard as batch); events
whose type is outside the symbol alphabet are filtered BEFORE the
stateful operator, so the pattern alphabet prunes the stream first.

Reference analogue: the reference's ingest path maintains per-series
in-memory state under a WAL (/root/reference/src/index/mem_index.cpp:
16-24,112-127); here the state store checkpoint plays the WAL role and
the NFA-over-ordered-rows semantics come from the regex pass.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
        StructField("syms", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_matches", LongType()),
        StructField("first_pos", LongType()),
        StructField("first_len", LongType()),
        StructField("first_event_id", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("first_span_us", LongType()),
    ]
)


def sequence_match_stream(
    events: DataFrame,
    pattern: str,
    symbols: dict[str, str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_events: int | None = None,
) -> DataFrame:
    """Streaming DataFrame → one updated CEP match summary per key per
    micro-batch (update mode): same output columns as the batch
    ``sequence_match``; keys currently without a match emit
    ``n_matches = 0`` rows (filter on read — a stateful update-mode sink
    cannot retract, so the no-match row is the explicit 'nothing yet').
    """
    from tagtree_spark.operators.events import validate_cep_args

    validate_cep_args(pattern, symbols)
    sym_map = dict(symbols)
    rex = re.compile(pattern)

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        ts, ids, syms = state.get if state.exists else ([], [], "")
        rows = list(zip(ts, ids, syms))
        for pdf in pdfs:
            ts_us = pdf[ts_col].astype("int64") // 1000  # ns → µs
            for t, i, et in zip(ts_us, pdf[id_col], pdf[type_col]):
                rows.append((int(t), int(i), sym_map[et]))
        rows.sort()  # (ts, id) unique per key → total order, sym never reached
        if max_events is not None:
            rows = rows[:max_events]
        s = "".join(r[2] for r in rows)
        state.update(([r[0] for r in rows], [r[1] for r in rows], s))
        out = {
            "user_id": key[0],
            "n_matches": 0,
            "first_pos": None,
            "first_len": None,
            "first_event_id": None,
            "first_ts_us": None,
            "first_span_us": None,
        }
        ms = list(rex.finditer(s))
        if ms:
            m = ms[0]
            p, e = m.start(), m.end()
            out.update(
                n_matches=len(ms),
                first_pos=p + 1,
                first_len=e - p,
                first_event_id=rows[p][1],
                first_ts_us=rows[p][0],
                first_span_us=rows[e - 1][0] - rows[p][0],
            )
        yield pd.DataFrame([out])

    filtered = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col),
        F.col(id_col),
        F.col(type_col),
    ).where(F.col(type_col).isin(list(sym_map)))
    return filtered.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
