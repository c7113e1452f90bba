"""Stream-stream interval join — §2.9's last streaming shape: correlate
two live event streams ("every error within an hour after a click by the
same user") without ever materializing either side.

Spark-native semantics (Structured Streaming inner stream-stream join):
both sides carry an event-time WATERMARK and the join condition bounds
``r.ts`` to a closed interval relative to ``l.ts`` — together these let
the engine expire buffered state for rows that can no longer match, so
the join's state is O(watermark × input rate), not O(stream length). At
100 TB/day this is the property that matters: an unbounded-state
stream-stream join dies; the watermark + interval bound is what makes it
run forever.

No oracle entry by design (streaming; the stream≡batch equivalence test
in tests/test_streaming_joins.py is the verification, like the other
sinks) — the BATCH equivalent of the same join is expressible and checked
against it after draining.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Inner-join two (streaming or batch) frames on ``keys`` with
    ``r.ts ∈ [l.ts + lower, l.ts + upper]``. Non-key columns come back
    prefixed ``l_``/``r_`` (including the two event times).

    On streaming inputs both sides are watermarked by ``watermark`` —
    required for state expiry; pick it ≥ the expected cross-stream skew
    plus ``upper``. On batch inputs ``withWatermark`` is a no-op analyzer
    hint, so the SAME function body is the batch groundtruth.
    """
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    lp = lw.select(
        *keys,
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in keys],
    )
    rp = rw.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in keys],
    )
    cond = reduce(and_, [lp[k] == rp[f"_rk_{k}"] for k in keys])
    cond = (
        cond
        & (F.col(f"r_{ts_col}") >= F.expr(f"l_{ts_col} + INTERVAL {lower}"))
        & (F.col(f"r_{ts_col}") <= F.expr(f"l_{ts_col} + INTERVAL {upper}"))
    )
    return lp.join(rp, cond, "inner").drop(*[f"_rk_{k}" for k in keys])
