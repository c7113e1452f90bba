"""Sequence packing — the "concat and chunk" step of an LLM training-data
pipeline: documents are concatenated in a deterministic order and cut into
fixed token-budget training sequences; each document is mapped to the
sequence range it lands in.

The reference engine has no analogue (it is a TSDB index); this is one of
the mandated beyond-the-reference pipeline operators. Semantics follow the
standard pretraining packing recipe: a document may straddle a sequence
boundary (begin_seq < end_seq) — the manifest records the straddle instead
of padding, so a loader can materialize either policy.

Scale stance: packing is a running sum, which is inherently sequential —
so the stream is SHARDED first (``shard_col``, e.g. source / path prefix /
hash bucket) and each shard packs independently with a window partitioned
by shard. No global window (no single-partition collapse); shard count is
the parallelism dial, and sequence ids are per-shard (a loader namespaces
them by shard). All arithmetic is exact bigint; offsets are exclusive
prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tagtree_spark.session import spread


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_subshards: int | None = None,
) -> DataFrame:
    """→ ``(shard, doc_id, n_tokens, start_offset, begin_seq, end_seq)``.

    ``start_offset`` is the document's first token position in its shard's
    concatenated token stream (exclusive prefix sum, ordered by ``id_col``);
    ``begin_seq``/``end_seq`` are the first/last ``budget``-sized sequence
    the document's tokens fall into. Empty docs pack zero tokens and sit at
    their boundary (end_seq = begin_seq).

    ``n_subshards`` is the 100 TB parallelism dial: when the natural shard
    column has low cardinality (20 sources would cap the window at 20
    tasks), each shard is split into ``n_subshards`` deterministic
    h60(doc_id) sub-streams — ``shard`` becomes ``"<shard>:<k>"`` and each
    sub-stream packs independently. Deterministic (hash of the id, not of
    placement), so the manifest is reproducible across runs and engines.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    b = int(budget)
    toks = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    shard = F.col(shard_col).cast("string")
    if n_subshards is not None:
        if n_subshards <= 0:
            raise ValueError("n_subshards must be positive")
        from tagtree_spark.functions.hashing import h60

        sub = h60(F.col(id_col).cast("string")) % n_subshards
        shard = F.concat(shard, F.lit(":"), sub.cast("string"))
    d = spread(docs).select(
        shard.alias("shard"),
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "shard", "doc_id", "n_tokens", (cum - F.col("n_tokens")).alias("start_offset")
    )
    # integer DIV keeps sequence ids exact bigints (no double rounding)
    return packed.select(
        "shard",
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {b}").alias("begin_seq"),
        F.expr(f"greatest(start_offset + n_tokens - 1, start_offset) DIV {b}").alias(
            "end_seq"
        ),
    )


def packing_report(
    docs: DataFrame,
    budget: int = 256,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing-efficiency accounting over :func:`pack_sequences` — the
    numbers a training job plans capacity with: how many fixed-budget
    sequences each shard yields, how many documents straddle a sequence
    boundary (and would be cut or need attention-mask resets), and how
    much of the final sequence is tail padding.

    → ``(shard, n_docs, total_tokens, n_seqs, n_straddlers,
    tail_waste)``, one row per shard, all exact bigints:

      * ``n_seqs``      = ceil(total_tokens / budget)
      * ``n_straddlers``= docs with begin_seq < end_seq
      * ``tail_waste``  = n_seqs * budget - total_tokens (pad tokens in
        the shard's final sequence; intermediate sequences are full by
        construction of the concat-and-chunk layout).

    Scale: reduces the per-doc manifest to one row per shard — a plain
    partial-aggregating groupBy on the already-sharded frame; the only
    sort anywhere is pack_sequences' per-shard window.
    """
    b = int(budget)
    m = pack_sequences(docs, b, shard_col, id_col, text_col)
    return m.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.expr(f"CAST((sum(n_tokens) + {b} - 1) DIV {b} AS BIGINT)").alias("n_seqs"),
        F.sum(F.when(F.col("begin_seq") < F.col("end_seq"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_straddlers"),
        F.expr(
            f"CAST(((sum(n_tokens) + {b} - 1) DIV {b}) * {b} - sum(n_tokens) "
            "AS BIGINT)"
        ).alias("tail_waste"),
    )
