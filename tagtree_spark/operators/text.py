"""Text analysis operators (E4, SURVEY.md §2.11): token stats, language ID,
quality scoring, document fingerprinting.

All metrics are computed as INTEGER per-document features first; group
ratios are then double divisions of exact bigint sums. This keeps every
output either exact-integer or a single correctly-rounded IEEE division —
bit-identical between Spark and the DuckDB oracle regardless of aggregation
order (a double SUM would not be: floating-point addition is not
associative and the engines aggregate in different orders).

No Python UDFs — everything is built-in column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import h60
from tagtree_spark.operators.dedup import word_shingles
from tagtree_spark.session import spread

#: Tiny per-language lexicons for the n-gram/stopword language-ID heuristic.
#: Deliberately simple and 100% deterministic — the point is the operator
#: shape (score tokens against K lexicons, argmax with a fixed tie order),
#: not linguistic accuracy. NOTE (recorded deviation): the driver's synthetic
#: `documents.lang` column is a label with NO signal in the text (all langs
#: share one English word pool), so predictions won't correlate with it —
#: q29's oracle checks both engines compute the same function, which is the
#: actual contract.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "value", "query", "fast"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "et", "des", "une"),
}


def token_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document integer features: n_tokens, n_chars_calc, n_uniq_tokens,
    max_token_len, n_short_tokens (len<=2). Narrow projection, no shuffle.

    Grouping metadata (``lang``, ``source``) passes through only when the
    input carries it — the function works on any (id, text) frame, not just
    the documents fixture (ADVICE r2)."""
    words = F.split(F.col(text_col), " ")
    passthrough = [F.col(c) for c in ("lang", "source") if c in docs.columns]
    return spread(docs).select(
        F.col(id_col).alias("doc_id"),
        *passthrough,
        F.size(words).cast("bigint").alias("n_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars_calc"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_uniq_tokens"),
        F.array_max(F.transform(words, lambda w: F.length(w))).cast("bigint").alias("max_token_len"),
        F.size(F.filter(words, lambda w: F.length(w) <= 2)).cast("bigint").alias("n_short_tokens"),
    )


def lang_stats(docs: DataFrame) -> DataFrame:
    """E4 per-language corpus stats → one row per lang. Ratios are double
    divisions of exact bigint sums (see module docstring)."""
    feats = token_features(docs)
    return (
        feats.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.sum("n_chars_calc").cast("bigint").alias("sum_chars"),
            F.sum("n_uniq_tokens").cast("bigint").alias("sum_uniq"),
            F.max("max_token_len").cast("bigint").alias("max_token_len"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_tokens",
            "sum_chars",
            "max_token_len",
            (F.col("sum_tokens").cast("double") / F.col("n_docs")).alias("avg_tokens"),
            (F.col("sum_uniq").cast("double") / F.col("sum_tokens")).alias("uniq_ratio"),
        )
    )


def _lexicon_score(words: Column, lexicon: tuple[str, ...]) -> Column:
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(words, lambda w: F.array_contains(lex, w))).cast("bigint")


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Language-ID heuristic → (doc_id, pred_lang, best_score). Scores each
    document's tokens against the per-language lexicons; argmax with a
    deterministic tie-break (lexicon declaration order), 'und' when all
    scores are zero."""
    words = F.split(F.col(text_col), " ")
    # the declared-lang column passes through only when present — the
    # function works on any (id, text) frame (same rule as token_features)
    passthrough = ["lang"] if "lang" in docs.columns else []
    scored = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in passthrough],
        *[_lexicon_score(words, lex).alias(f"score_{lang}") for lang, lex in LANG_LEXICONS.items()],
    )
    langs = list(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → build from last
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)).otherwise(pred)
    return scored.select("doc_id", *passthrough, pred.alias("pred_lang"), best.alias("best_score"))


#: "BPE-ish" pre-tokenization regex (RE2∩Java common subset): alphanumeric
#: runs or single punctuation marks — the usual pre-split a BPE tokenizer
#: applies before merges.
BPE_SPLIT_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """E4 token counting, two ways per document: whitespace tokens and
    BPE-ish regex tokens → (doc_id, n_ws_tokens, n_re_tokens, n_chars_calc)."""
    return spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text_col, F.lit(BPE_SPLIT_RE), 0))
        .cast("bigint")
        .alias("n_re_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars_calc"),
    )


def top_tokens(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """E4 corpus-wide heavy hitters → top-k tokens by frequency
    ``(token, n)``, ties broken by token order.

    Shape: explode → ONE groupBy(token) with map-side partial counts (the
    shuffle carries (token, partial_count), not token occurrences) →
    TakeOrderedAndProject for the top-k (no global sort). At 100 TB this
    is the exact-count form; the sketch alternative (count-min, d×w fixed
    registers) is operators/sketch.py cms_registers — h60-seeded, so it IS
    oracle-checkable (q109)."""
    words = spread(docs).select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
    return (
        words.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(k)
    )


def chunk_documents(
    docs: DataFrame,
    size: int = 100,
    stride: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-data chunking → one row per overlapping character window:
    ``(doc_id, chunk_idx, chunk_h60, n_chunk_chars)``. The step that turns
    documents into fixed-size training examples (stride < size ⇒ overlap).

    CHARACTER-indexed on both engines (Spark ``substr`` and DuckDB
    ``substr`` are 1-based char slicing), so multibyte text chunks
    identically — the byte/char trap the r2 ADVICE flagged on the
    multimodal oracle. Pure projection + generator (posexplode): no
    shuffle, rows expand 1→ceil(len/stride), perfectly scan-parallel.
    """
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(starts, lambda s: F.col(text_col).substr(s, F.lit(size)))
    return (
        spread(docs)
        .select(F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            h60("chunk").alias("chunk_h60"),
            F.length("chunk").cast("bigint").alias("n_chunk_chars"),
        )
    )


#: RE2∩Java-safe redaction pattern (word-boundary alternation; both engines
#: support \b and non-capturing alternation identically on ASCII).
REDACT_PATTERN = r"\b(customer|query|vector)\b"


def redact(
    docs: DataFrame,
    pattern: str = REDACT_PATTERN,
    repl: str = "<TERM>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII-style pattern redaction → ``(doc_id, n_hits, red_h60,
    n_red_chars)``: replace every match with ``repl``, report the match
    count and the redacted text's h60 (the full redacted body stays in the
    engine — callers select it from the projection if they want it).

    Narrow per-row JVM regex work — no shuffle, no Python. The default
    pattern redacts fixture vocabulary; real deployments pass email/phone/
    SSN patterns from the RE2∩Java common subset (same guard rationale as
    tsdb.matchers' dialect check).
    """
    red = F.regexp_replace(F.col(text_col), pattern, repl)
    return spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(text_col, F.lit(pattern), 0)).cast("bigint").alias("n_hits"),
        h60(red).alias("red_h60"),
        F.length(red).cast("bigint").alias("n_red_chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """E4 quality scoring, aggregated per source → one row per source.

    Per-doc quality signals (all integers): token count in a sane band,
    unique-token ratio, short-token ratio. The per-source output keeps the
    raw bigint sums plus double ratios.
    """
    feats = token_features(docs)
    flagged = feats.select(
        "source",
        "n_tokens",
        "n_uniq_tokens",
        "n_short_tokens",
        F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 80), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("len_ok"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("len_ok").cast("bigint").alias("n_len_ok"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.sum("n_uniq_tokens").cast("bigint").alias("sum_uniq"),
            F.sum("n_short_tokens").cast("bigint").alias("sum_short"),
        )
        .select(
            "source",
            "n_docs",
            "n_len_ok",
            (F.col("sum_uniq").cast("double") / F.col("sum_tokens")).alias("uniq_ratio"),
            (F.col("sum_short").cast("double") / F.col("sum_tokens")).alias("short_ratio"),
        )
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """E4 document fingerprinting → (doc_id, fp, min_shingle_h, max_shingle_h,
    n_shingles). fp = content hash of the whole text; min/max shingle hashes
    are a 2-element bottom/top-k sketch of the shingle set (the same family
    as winnowing: representative shingle hashes picked deterministically)."""
    # cheap word-count predicate instead of size(shingles)>0: the latter is
    # pushed below the projection and rebuilds the shingle pipeline per row
    sh = word_shingles(
        spread(docs).where(F.size(F.split(F.col(text_col), " ")) >= n),
        n=n,
        text_col=text_col,
    )
    # Single fold computing (min, max) in one pass: array_min + array_max on
    # the same transform() would md5 every shingle twice (CollapseProject
    # duplicates the shared subexpression). The fold lives in its OWN
    # withColumn: selecting .mn/.mx of an inline expression would paste the
    # whole md5 fold once PER FIELD into the projection (2× hashing, r3
    # measured); a multi-use non-cheap alias is kept materialized.
    minmax = F.aggregate(
        F.transform(F.col("shingles"), lambda s: h60(s)),
        F.struct(
            F.lit(1 << 62).cast("bigint").alias("mn"), F.lit(-1).cast("bigint").alias("mx")
        ),
        lambda acc, h: F.struct(
            F.least(acc.mn, h).alias("mn"), F.greatest(acc.mx, h).alias("mx")
        ),
    )
    return sh.withColumn("_mm", minmax).select(
        F.col(id_col).alias("doc_id"),
        h60(text_col).alias("fp"),
        F.col("_mm.mn").alias("min_shingle_h"),
        F.col("_mm.mx").alias("max_shingle_h"),
        F.size("shingles").cast("bigint").alias("n_shingles"),
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (the Gopher-rules family of
    quality filters: heavily repetitive documents are low-value training
    data and get dropped before dedup even runs).

    Per-document integer counters — token multiset vs set, word-bigram
    multiset vs set, and immediate token repeats (``w[i] == w[i+1]``) —
    plus the two duplicate fractions as single exact-int divisions:

    ``(doc_id, n_tokens, n_uniq_tokens, n_2grams, n_uniq_2grams,
    n_repeat_pairs, dup_token_frac, dup_2gram_frac)``

    Shape: narrow projection, zero shuffles — the token/bigram arrays are
    materialized once per row (each in its own withColumn so higher-order
    lambdas don't re-split per element) and never leave the executor. At
    100 TB this is a map-only pass that AQE pipelines into whatever scan
    feeds it.
    """
    d = (
        spread(docs)
        .withColumn("_w", F.split(F.col(text_col), " "))
        .withColumn(
            "_g2",
            F.zip_with(
                F.expr("slice(_w, 1, size(_w) - 1)"),
                F.expr("slice(_w, 2, size(_w) - 1)"),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        )
    )
    n_tokens = F.size("_w").cast("bigint")
    n_uniq = F.size(F.array_distinct("_w")).cast("bigint")
    n_2g = F.size("_g2").cast("bigint")
    n_uniq_2g = F.size(F.array_distinct("_g2")).cast("bigint")
    n_rep = F.size(
        F.filter(
            F.zip_with(
                F.expr("slice(_w, 1, size(_w) - 1)"),
                F.expr("slice(_w, 2, size(_w) - 1)"),
                lambda a, b: a == b,
            ),
            lambda x: x,
        )
    ).cast("bigint")
    return d.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        n_2g.alias("n_2grams"),
        n_uniq_2g.alias("n_uniq_2grams"),
        n_rep.alias("n_repeat_pairs"),
        ((n_tokens - n_uniq).cast("double") / n_tokens).alias("dup_token_frac"),
        F.when(n_2g > 0, (n_2g - n_uniq_2g).cast("double") / n_2g)
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
    )


def token_rarity(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-statistics quality signal: per-document mean DOCUMENT
    FREQUENCY of its distinct tokens — a rarity/perplexity proxy (low mean
    df = rare vocabulary, high = boilerplate). All-integer surrogate (sum
    of dfs + one final division) so the score is aggregation-order
    independent cross-engine — a log-prob average would not hash-match
    (libm vs JVM transcendentals differ in the last ulp).

    → ``(doc_id, n_terms, df_sum, mean_df)``. Shape: distinct-token
    explode → groupBy(token) df counts → join back → groupBy(doc). The
    vocabulary side of the join is tiny after aggregation (vocab ≪
    corpus), so AQE broadcasts it; the explode never carries the text,
    only (doc_id, token).
    """
    from tagtree_spark.session import persist_tracked

    # both sides of the vocab join consume toks — persist it or the whole
    # scan+split+explode pipeline runs twice (the self-join recompute trap)
    toks = persist_tracked(
        spread(docs).select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
        )
    )
    vocab = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("df").cast("bigint").alias("df_sum"),
        )
        .select(
            "doc_id",
            "n_terms",
            "df_sum",
            (F.col("df_sum").cast("double") / F.col("n_terms")).alias("mean_df"),
        )
    )


def adjacent_pair_stats(docs: DataFrame, k: int = 30, text_col: str = "text") -> DataFrame:
    """Corpus bigram (adjacent token pair) frequencies — the statistic a
    BPE/WordPiece vocabulary builder's first merge round consumes, and a
    cheap collocation signal for corpus QA.

    Shape: split once per row (words materialized before the transform so
    the lambda indexes, never re-splits), one transform over an index
    sequence building "a b" pair strings, explode, ONE count shuffle
    (map-side partial agg collapses repeated pairs per partition first),
    TakeOrdered top-k. Pair strings are the shuffle key — bounded by 2×
    max token length; at 100 TB swap the string key for h60(pair) and
    join the winners back for display.

    → ``(pair, n_pairs)``, top-``k`` by count with a total (count desc,
    pair) order.
    """
    with_words = spread(docs).withColumn("_words", F.split(F.col(text_col), " "))
    pairs = F.expr(
        "transform(sequence(1, size(_words) - 1), "
        "i -> concat(element_at(_words, i), ' ', element_at(_words, i + 1)))"
    )
    return (
        with_words.where(F.size("_words") >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "pair")
        .limit(k)
    )


def gopher_rules(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality-rule verdicts in the Gopher/C4 filter style
    (Rae et al. 2021 §A1.1, public) — the row-wise keep/drop stage a
    training pipeline applies before anything expensive:

      * r_len      — at least 20 tokens;
      * r_wordlen  — mean word length in [3, 10] chars, tested as the
        integer cross-multiplication ``3·n_tokens <= wchars <= 10·n_tokens``
        (no division → no fp, cross-engine exact);
      * r_ttr      — type-token ratio >= 1/2 (``2·n_uniq >= n_tokens``);
      * r_rep      — top token <= 20% of tokens (``5·max_tf <= n_tokens``);
      * keep       — all four.

    Everything derives from ONE (doc, token) count table: n_tokens = Σc,
    n_uniq = #rows, max_tf = max(c), wchars = Σ len(token)·c — a single
    narrow shuffle, flags are integer comparisons.
    → ``(doc_id, n_tokens, n_uniq, max_tf, wchars, r_len, r_wordlen,
    r_ttr, r_rep, keep)``.
    """
    words = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    tf = words.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    g = tf.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_uniq"),
        F.max("c").cast("bigint").alias("max_tf"),
        F.sum(F.length("token") * F.col("c")).cast("bigint").alias("wchars"),
    )
    r_len = (F.col("n_tokens") >= 20).cast("bigint")
    r_wordlen = (
        (F.lit(3) * F.col("n_tokens") <= F.col("wchars"))
        & (F.col("wchars") <= F.lit(10) * F.col("n_tokens"))
    ).cast("bigint")
    r_ttr = (F.lit(2) * F.col("n_uniq") >= F.col("n_tokens")).cast("bigint")
    r_rep = (F.lit(5) * F.col("max_tf") <= F.col("n_tokens")).cast("bigint")
    return g.select(
        "doc_id",
        "n_tokens",
        "n_uniq",
        "max_tf",
        "wchars",
        r_len.alias("r_len"),
        r_wordlen.alias("r_wordlen"),
        r_ttr.alias("r_ttr"),
        r_rep.alias("r_rep"),
        (r_len * r_wordlen * r_ttr * r_rep).cast("bigint").alias("keep"),
    )


def vocab_encode(
    docs: DataFrame,
    vocab_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary encoding — the tokenize→id step of training prep:
    build a frequency vocabulary (top ``vocab_size`` tokens by count,
    ties broken by token; id = 1-based rank, OOV = 0), encode every
    document as its id sequence → ``(doc_id, n_tokens, n_oov, ids_h60)``
    where ids_h60 hashes the comma-joined sequence (cross-engine h60, so
    the ENTIRE encoded sequence is oracle-checked, not just its length).

    Shape: one token-count aggregate; the vocabulary rank is a window over
    the LIMITed V-row frame (bounded metadata — the single-partition
    exchange holds vocab_size rows, never corpus rows); ids come back via
    one broadcast-sized left join; per-doc sequences reassemble with a
    position-sorted fold, no second shuffle of token occurrences beyond
    the doc_id regroup.
    """
    from pyspark.sql import Window

    from tagtree_spark.functions.hashing import h60

    toks = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("_n"))
    top = counts.orderBy(F.col("_n").desc(), "token").limit(vocab_size)
    vocab = top.select(
        "token",
        F.row_number()
        .over(Window.orderBy(F.col("_n").desc(), "token"))
        .cast("bigint")
        .alias("vid"),
    )
    enc = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos", F.coalesce(F.col("vid"), F.lit(0)).cast("bigint").alias("id")
    )
    seq = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "id"))), lambda x: x["id"]
        ),
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("id") == 0, 1).otherwise(0)).cast("bigint").alias("n_oov"),
        h60(seq).alias("ids_h60"),
    )


def boilerplate_prefix(
    docs: DataFrame,
    n_prefix: int = 4,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """E4 boilerplate detection by repeated leading prefix: per group
    (site/source), the most frequent ``n_prefix``-token document prefix;
    docs carrying it are flagged — the header/banner screen a web-corpus
    pipeline runs before dedup (repeated nav/disclaimer text skews both
    MinHash bands and n-gram LMs).

    Shape: one (group, prefix) count shuffle over one row per doc, a
    per-group top-1 window over the tiny distinct-prefix table, then a
    BROADCAST join of the one-row-per-group winners back to the docs —
    never a shuffle of document bodies. Tie-break on (count desc, prefix
    asc) is total, so the winner is deterministic.

    → ``(doc_id, group, is_boilerplate, top_count)`` with
    ``top_count`` = the winning prefix's frequency in the doc's group
    (NULL when the group has no prefix reaching ``min_count``).
    """
    words = F.split(F.col(text_col), " ")
    pref = F.when(
        F.size(words) >= n_prefix,
        F.concat_ws(" ", F.slice(words, 1, n_prefix)),
    )
    d = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        pref.alias("prefix"),
    )
    counts = (
        d.where(F.col("prefix").isNotNull())
        .groupBy("group", "prefix")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("group").orderBy(F.col("n").desc(), "prefix")
    top = (
        counts.where(F.col("n") >= min_count)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("group", F.col("prefix").alias("top_prefix"), F.col("n").alias("top_count"))
    )
    return d.join(F.broadcast(top), "group", "left").select(
        "doc_id",
        "group",
        (F.col("prefix").isNotNull() & (F.col("prefix") == F.col("top_prefix")))
        .cast("boolean")
        .alias("is_boilerplate"),
        "top_count",
    )


# Contract bound on driver-paced training rounds: each round is one
# distributed pair-count job + one bounded collect, so wall-clock grows
# with n_merges, not data size. 4096 rounds ≈ a small-model vocab; past
# that, raise batch_k (rounds shrink by the per-round acceptance factor)
# or pre-tokenize with a published vocab instead of training in-line.
BPE_MAX_MERGES = 4096


def bpe_train(
    docs: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
    batch_k: int = 1,
) -> DataFrame:
    """E4 byte-pair-encoding merge training (Sennrich et al. 2016 — the
    public BPE algorithm every modern tokenizer derives from): learn the
    first ``n_merges`` merge rules from the corpus.

    Industrial shape: BPE trains on the WORD-FREQUENCY table, not the raw
    corpus — one token-count shuffle reduces 100 TB of text to a
    vocab-sized (word, n) frame, and every merge round then runs windows
    partitioned by word over that small frame. Per round: (1) adjacent
    symbol pairs via a lead window, weighted pair counts, argmax with a
    total (count desc, left, right) tie order — ONE driver scalar per
    round (bounded, like kmeans' centroid collect); (2) greedy
    left-to-right non-overlapping merge application, set-based: match
    runs via gaps-and-islands, select even offsets within each run
    (exactly the sequential fold's choices — overlapping matches share a
    symbol, so greedy keeps alternate ones), drop consumed successors,
    renumber. Lineage is truncated each round (localCheckpoint, like
    near_dup_clusters' rounds).

    Everything is integer counts and string equality — no floats anywhere
    — so the DuckDB oracle replays the identical unrolled rounds and every
    merge rule, count included, hash-matches.

    SCALE CONTRACT: the loop is driver-paced — one pair-count shuffle and
    one bounded collect per ROUND — so wall-clock grows with the merge
    count, not the data size. ``n_merges`` is capped at
    ``BPE_MAX_MERGES`` (=4096). ``batch_k > 1`` learns up to ``batch_k``
    merges per round: the top-k pairs are collected once and the maximal
    PROVABLY-SEQUENTIAL-EQUIVALENT prefix is accepted — candidates must
    be mutually symbol-disjoint (so applying one cannot change another's
    count) and must strictly outrank an upper bound on every pair a
    previously-accepted merge can create (new pairs (x, l·r)/(l·r, y)
    inherit ≤ the count of the old (x, l)/(r, y) they came from). The
    accepted batch is applied in ONE window pass. Batched output is
    therefore IDENTICAL to sequential on every corpus — the check falls
    back to smaller batches when merges interact — it only changes the
    round count (→ job count), ~k× fewer on natural text.

    → ``(step, lsym, rsym, cnt)``, one row per learned merge, step 1-based.
    """
    merges, _ = _bpe_rounds(docs, n_merges, text_col, batch_k)
    return docs.sparkSession.createDataFrame(
        merges, "step bigint, lsym string, rsym string, cnt bigint"
    ).orderBy("step")


def bpe_apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """One greedy left-to-right merge round over a symbol frame
    ``(word, n, pos, sym)`` — the set-based equivalent of the sequential
    fold: match positions → consecutive-match runs (gaps-and-islands) →
    keep even offsets within each run (overlapping matches share a
    symbol) → drop consumed successors → renumber. Shared by training
    and encoding; all windows partition by word (one shuffle, reused)."""
    return bpe_apply_merges(syms, [(left, right)])


def bpe_apply_merges(syms: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Apply a batch of MUTUALLY SYMBOL-DISJOINT merge rules in one
    window pass. Disjointness makes this exactly the sequential
    application of each rule in turn: a match site identifies exactly one
    rule, and two consecutive match positions would share their middle
    symbol across rules — impossible when rules share no symbols — so
    every gaps-and-islands run is single-rule and the even-offset greedy
    selection is unchanged. Callers must pass a disjoint batch
    (:func:`_bpe_rounds` enforces it); a single rule is trivially one."""
    if len(rules) > 1:
        seen: set[str] = set()
        for lft, rgt in rules:
            if lft in seen or rgt in seen:
                raise ValueError(
                    f"bpe_apply_merges: rules share symbols ({lft!r},{rgt!r})"
                    " — batch application would diverge from sequential"
                )
            seen.update((lft, rgt))
    m = F.lit(False)
    merged = F.col("sym")
    for lft, rgt in rules:
        hit = (F.col("sym") == F.lit(lft)) & (F.col("nxt") == F.lit(rgt))
        m = m | hit
        merged = F.when(hit, F.concat(F.col("sym"), F.lit(rgt))).otherwise(merged)
    wseq = Window.partitionBy("word").orderBy("pos")
    d = (
        syms.withColumn("nxt", F.lead("sym").over(wseq))
        .withColumn("m", m)
        .withColumn("merged", merged)
        .withColumn(
            "cm",
            F.sum(F.when(F.col("m"), 1).otherwise(0)).over(
                wseq.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("island", F.when(F.col("m"), F.col("pos") - F.col("cm")))
    )
    d = d.withColumn(
        "sel",
        F.when(
            F.col("m"),
            ((F.col("pos") - F.min("pos").over(
                Window.partitionBy("word", "island")
            )) % 2) == 0,
        ).otherwise(F.lit(False)),
    ).withColumn(
        "consumed", F.coalesce(F.lag("sel").over(wseq), F.lit(False))
    )
    return (
        d.where(~F.col("consumed"))
        .select(
            "word",
            "n",
            F.row_number().over(wseq).cast("bigint").alias("pos"),
            F.when(F.col("sel"), F.col("merged")).otherwise(F.col("sym")).alias("sym"),
        )
    )


def _bpe_rounds(
    docs: DataFrame, n_merges: int, text_col: str, batch_k: int = 1
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the BPE training rounds; return (merge rules, final symbol
    frame). The final frame IS the encoded vocabulary — encoding a corpus
    is a join against it (see :func:`bpe_encode`).

    ``batch_k > 1`` learns several merges per round when provably safe
    (see :func:`bpe_train`'s scale contract); the output is identical to
    sequential for ANY corpus, only the round count changes."""
    if n_merges > BPE_MAX_MERGES:
        raise ValueError(
            f"bpe_train: n_merges={n_merges} exceeds BPE_MAX_MERGES="
            f"{BPE_MAX_MERGES}. Rounds are driver-paced Spark jobs; train "
            "large vocabs with batch_k to cut rounds, or bring a published "
            "vocab (bpe_encode_from_vocab) instead of in-line training."
        )
    if batch_k < 1:
        raise ValueError(f"bpe_train: batch_k must be >= 1, got {batch_k}")
    toks = spread(docs).select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    wc = (
        toks.where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    chars = F.expr("filter(split(word, ''), x -> x <> '')")
    syms = wc.select(
        "word", "n", F.posexplode(chars).alias("p0", "sym")
    ).select("word", "n", (F.col("p0") + 1).cast("bigint").alias("pos"), "sym")
    syms = syms.localCheckpoint()

    wseq = Window.partitionBy("word").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = (
            syms.withColumn("nxt", F.lead("sym").over(wseq))
            .where(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("n").cast("bigint").alias("cnt"))
        )
        want = min(batch_k, n_merges - len(merges))
        if want > 1:
            pairs = pairs.persist()
        top = pairs.orderBy(F.col("cnt").desc(), "sym", "nxt").limit(want).collect()
        if not top:
            if want > 1:
                pairs.unpersist()
            break
        accepted = _bpe_safe_prefix(pairs, top) if want > 1 else top[:1]
        if want > 1:
            pairs.unpersist()
        base = len(merges)
        merges.extend(
            (base + 1 + i, r.sym, r.nxt, r.cnt) for i, r in enumerate(accepted)
        )
        syms = bpe_apply_merges(
            syms, [(r.sym, r.nxt) for r in accepted]
        ).localCheckpoint()
    return merges, syms


def _bpe_safe_prefix(pairs: DataFrame, top: list) -> list:
    """Maximal prefix of the ranked top-k pair list whose batched
    application is EXACTLY the sequential rounds:

    - stop at the first candidate sharing a symbol with an earlier one
      (applying the earlier merge could change its count or greedy sites);
    - stop when an earlier accepted merge (l, r) could CREATE a pair that
      outranks the candidate. A created pair (x, l·r) / (l·r, y) occurs at
      most as often as the old (x, l) / (r, y) it replaces, so
      max(count of pairs ending in l or starting with r) is a sound upper
      bound; requiring the candidate's count to be STRICTLY above it also
      absorbs the unknown tie-order of the created pair's name.

    - stop right after accepting a merge whose created NAME l·r already
      exists in the pair table (or equals an earlier accepted name): the
      created pair (x, l·r) would then share its name with pre-existing
      pairs and ACCRETE their count (old + created), so the starts-from-0
      bound above no longer holds for later candidates (ADVICE r6
      medium). Reachability: an exhaustive search over ARBITRARY merge
      sequences (not just count-argmax; all <=2-distinct-word {a,b}
      corpora to length 6, depth 10) plus 100k randomized larger corpora
      found NO state where a live pair's concatenated name coexists with
      a same-named symbol — greedy application consumes every (l, r)
      adjacency and re-creating one needs a second same-named symbol,
      which is this very state — but the argument is not a proof for
      unbounded corpora, so the guard (one driver-side set probe per
      round) removes any reliance on it.

    Extra bounded work per round (three ≤k-row collects over the
    persisted pair table) — independent of corpus size."""
    lefts = [r.sym for r in top]
    rights = [r.nxt for r in top]
    names = [r.sym + r.nxt for r in top]
    lb = {
        r.nxt: r.b
        for r in pairs.where(F.col("nxt").isin(lefts))
        .groupBy("nxt").agg(F.max("cnt").alias("b")).collect()
    }
    rb = {
        r.sym: r.b
        for r in pairs.where(F.col("sym").isin(rights))
        .groupBy("sym").agg(F.max("cnt").alias("b")).collect()
    }
    # symbols already spelled like a candidate's merged name: only tokens
    # with a neighbour can accrete counts, and those all appear in the
    # pair table (an isolated whole-word token forms no pairs)
    colliding = {
        r.s
        for r in pairs.select(F.col("sym").alias("s"))
        .where(F.col("sym").isin(names))
        .unionByName(
            pairs.select(F.col("nxt").alias("s")).where(F.col("nxt").isin(names))
        )
        .distinct()
        .collect()
    }
    accepted = [top[0]]
    used = {top[0].sym, top[0].nxt}
    taken_names = {top[0].sym + top[0].nxt}
    if top[0].sym + top[0].nxt in colliding:
        return accepted
    created_bound = max(lb.get(top[0].sym, 0), rb.get(top[0].nxt, 0))
    for cand in top[1:]:
        if cand.sym in used or cand.nxt in used:
            break
        if created_bound >= cand.cnt:
            break
        accepted.append(cand)
        name = cand.sym + cand.nxt
        if name in colliding or name in taken_names:
            break
        taken_names.add(name)
        used.update((cand.sym, cand.nxt))
        created_bound = max(created_bound, lb.get(cand.sym, 0), rb.get(cand.nxt, 0))
    return accepted


def bpe_encode(
    docs: DataFrame,
    n_merges: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE rules on the corpus and ENCODE every
    document with them — the tokenizer-application step that follows
    :func:`bpe_train` in a real pipeline.

    Industrial shape again: only the VOCABULARY is encoded (the training
    rounds' final symbol frame, vocab-sized); documents then join their
    tokens to the encoded vocab — the corpus-sized side does one explode,
    one broadcastable join, one per-doc re-assembly. The h60 of each
    document's full symbol stream makes the end-to-end encoding
    oracle-checkable.

    → ``(doc_id, n_tokens, n_syms, enc_h60)``.
    """
    _, syms = _bpe_rounds(docs, n_merges, text_col)
    return bpe_encode_from_vocab(docs, syms, id_col, text_col)


def bpe_encode_from_vocab(
    docs: DataFrame,
    syms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents against an already-trained symbol frame (the
    second element of :func:`_bpe_rounds` — lets callers train once and
    encode many corpora/batches)."""
    wenc = syms.groupBy("word").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                lambda x: x["sym"],
            ),
        ).alias("enc"),
        F.count("*").cast("bigint").alias("w_syms"),
    )
    dt = (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "word"),
        )
        .where(F.col("word") != "")
        .select("doc_id", F.col("p0").cast("bigint").alias("pos"), "word")
    )
    joined = dt.join(F.broadcast(wenc), "word")
    stream = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "enc"))),
            lambda x: x["enc"],
        ),
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("w_syms").cast("bigint").alias("n_syms"),
        h60(stream).alias("enc_h60"),
    )


def hash_classifier(
    docs: DataFrame, mod: int = 2001, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hashed linear quality classifier → ``(doc_id, n_tokens, score,
    keep)``: each token contributes an integer weight derived from its
    hash bucket (``h60(tok) % mod`` centered on zero), the document score
    is the tf-weighted sum, and ``keep`` is the sign — the fastText-style
    linear-scorer shape (hashed n-gram features ⋅ weight vector) used as
    a cheap corpus quality screen, with a deterministic weight table so
    both engines reproduce every score bit-for-bit.

    Map-only narrow projection: one md5 per token inside a single
    ``aggregate`` fold (score and token count computed in ONE pass; the
    fold lives in its own withColumn so the per-field extraction doesn't
    re-paste it). Real deployments swap the hash-derived weights for a
    broadcast-joined learned table — the plan shape is identical.
    At 100 TB this is embarrassingly parallel with zero shuffles.
    """
    half = (mod - 1) // 2
    fold = F.aggregate(
        F.col("_toks"),
        F.struct(
            F.lit(0).cast("bigint").alias("s"), F.lit(0).cast("bigint").alias("n")
        ),
        lambda acc, t: F.struct(
            (acc.s + (h60(t) % mod - half)).alias("s"), (acc.n + 1).alias("n")
        ),
    )
    return (
        spread(docs)
        .withColumn("_toks", F.split(F.col(text_col), " "))
        .withColumn("_sc", fold)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col("_sc.n").alias("n_tokens"),
            F.col("_sc.s").alias("score"),
            (F.col("_sc.s") > 0).cast("bigint").alias("keep"),
        )
    )


#: Normalization pipeline: collapse runs of whitespace, trim, lowercase —
#: the standard pre-tokenization cleaning pass.
def normalization_report(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Text normalization with effect accounting → ``(doc_id, changed,
    norm_h60, n_chars_norm, n_ws_runs)``: lowercase + collapse
    whitespace runs + trim, reporting whether the document changed, the
    normalized content hash (the body stays in-engine; join it back by
    doc_id), and how many multi-whitespace runs were collapsed.

    Map-only narrow JVM regex work — the cheapest pass in the pipeline,
    and the one that makes every later hash-keyed dedup stage actually
    fire on cosmetically-different duplicates."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return spread(docs).select(
        F.col(id_col).alias("doc_id"),
        (norm != F.col(text_col)).cast("bigint").alias("changed"),
        h60(norm).alias("norm_h60"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        F.size(F.regexp_extract_all(text_col, F.lit(r"\s\s+"), 0))
        .cast("bigint")
        .alias("n_ws_runs"),
    )


def phrase_search(
    docs: DataFrame, phrase: str, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional phrase search → ``(doc_id, n_occ, first_pos)`` for
    documents containing ``phrase`` as ADJACENT whitespace tokens — the
    inverted-index-with-positions primitive (the capability plain
    bag-of-words postings can't answer).

    Build: posexplode to (doc, pos, term), filtered immediately to the
    phrase's terms (the filter rides the scan projection, so only the
    queried terms' postings ever materialize — at 100 TB the persisted
    form of this is the positional postings table partitioned by term,
    and a k-term phrase touches k partitions). Match: k−1 equi-joins on
    (doc_id, pos+j) — position adjacency as join keys, never a regex
    over bodies.
    """
    terms = phrase.split(" ")
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 tokens")
    toks = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    m = (
        toks.where(F.col("term") == terms[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for j, t in enumerate(terms[1:], start=1):
        tj = toks.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - j).alias("p0")
        )
        m = m.join(tj, ["doc_id", "p0"])
    return m.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_occ"),
        F.min("p0").cast("bigint").alias("first_pos"),
    )


def materialize_postings(
    docs: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text",
    n_term_parts: int = 64,
) -> None:
    """Persist the POSITIONAL postings table ``(doc_id, pos, term)``
    partitioned by ``tp = h60(term) % n_term_parts`` — the on-disk
    inverted index with positions. Hash-prefix partitioning bounds the
    directory count against an unbounded term domain while still letting
    a k-term query read only k partitions (PartitionFilters; pinned by
    plan test). The search-engine twin of the IVF vector store
    (similarity.materialize_ivf) and the name-partitioned label postings
    (tsdb/store.py)."""
    toks = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        # NULL text → '' (one empty token): posexplode(split(NULL)) would
        # silently drop the doc, diverging from the streamed sink's
        # dl=1 stance (ADVICE r8)
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "pos", "term"
        ),
    )
    # refuse a zero-row dynamic-partitioned write: it would emit only
    # _SUCCESS and poison every later read with UNABLE_TO_INFER_SCHEMA
    # (CLAUDE.md rule 13) — an explicit error beats a broken store
    if toks.isEmpty():
        raise ValueError("materialize_postings: no tokens to index")
    toks.withColumn("tp", (h60("term") % n_term_parts).cast("int")).write.mode(
        "overwrite"
    ).partitionBy("tp").parquet(path)


def store_phrase_search(
    spark, path: str, phrase: str, n_term_parts: int = 64
) -> DataFrame:
    """Phrase search answered from the PERSISTED postings store → same
    output as :func:`phrase_search`. The scan reads ONLY the phrase
    terms' tp partitions (computed driver-side from the same h60) and
    filters to the terms inside them — a k-term phrase touches k of
    ``n_term_parts`` partitions no matter how large the corpus."""
    from tagtree_spark.functions.hashing import h60_py

    terms = phrase.split(" ")
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 tokens")
    tps = sorted({h60_py(t) % n_term_parts for t in terms})
    toks = (
        spark.read.parquet(path)
        .where(F.col("tp").isin(tps) & F.col("term").isin(terms))
        .select("doc_id", "pos", "term")
    )
    m = toks.where(F.col("term") == terms[0]).select("doc_id", F.col("pos").alias("p0"))
    for j, t in enumerate(terms[1:], start=1):
        tj = toks.where(F.col("term") == t).select("doc_id", (F.col("pos") - j).alias("p0"))
        m = m.join(tj, ["doc_id", "p0"])
    return m.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_occ"),
        F.min("p0").cast("bigint").alias("first_pos"),
    )


def token_windows(
    docs: DataFrame,
    size: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-context training windows with overlap → ``(doc_id, start,
    w_h60)``: every ``size``-token window at ``stride`` offsets (the LM
    training-example extractor — stride < size keeps cross-boundary
    context that disjoint chunking loses). Documents shorter than one
    window emit nothing; each window's joined text is hashed end-to-end
    so the oracle verifies the exact content, not just offsets.

    1→N narrow explode — tokens are materialized ONCE per doc (own
    withColumn), each window is a bounded slice. At 100 TB this is the
    map-only stage before packing (operators/packing.py)."""
    toks = spread(docs).withColumn("_toks", F.split(F.col(text_col), " ")).where(
        F.size("_toks") >= size
    )
    starts = F.sequence(F.lit(0), F.size("_toks") - size, F.lit(stride))
    return (
        toks.select(
            F.col(id_col).alias("doc_id"), "_toks", F.explode(starts).alias("start")
        )
        .select(
            "doc_id",
            F.col("start").cast("bigint").alias("start"),
            h60(F.concat_ws(" ", F.slice("_toks", F.col("start") + 1, size))).alias(
                "w_h60"
            ),
        )
    )


def bigram_novelty(
    train: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-shift screen → per target doc ``(doc_id, n_bg,
    n_seen, novelty_pct)``: the fraction of the doc's word bigrams never
    seen in the TRAIN corpus — the held-out novelty score that flags a
    crawl drifting away from (or duplicating) the reference corpus
    before any model sees it.

    Train side reduces to a distinct bigram-hash set (one hash agg);
    target bigrams left-semi-count against it via ONE equi-join on the
    60-bit hash. Integer percent output."""
    def bigrams(df):
        toks = spread(df).withColumn("_toks", F.split(F.col(text_col), " ")).where(
            F.size("_toks") >= 2
        )
        return toks.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.transform(
                    F.slice("_toks", 1, F.size("_toks") - 1),
                    lambda w, i: h60(
                        F.concat_ws(" ", w, F.element_at("_toks", i + 2))
                    ),
                )
            ).alias("bg"),
        )

    seen = bigrams(train).select("bg").distinct().withColumn("_hit", F.lit(1))
    tb = bigrams(target)
    # no broadcast hint: the train bigram set grows with the corpus — let
    # AQE choose; the join key is the 60-bit hash either way
    joined = tb.join(seen, "bg", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bg"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("bigint").alias("n_seen"),
    ).select(
        "doc_id",
        "n_bg",
        "n_seen",
        F.expr("100 * (n_bg - n_seen) div n_bg").cast("bigint").alias("novelty_pct"),
    )


def tokenizer_fertility(
    docs: DataFrame,
    syms: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility report: BPE symbols emitted per whitespace word,
    aggregated by stratum (language, source, ...) — the number a tokenizer
    team watches per language, since high fertility means a language pays
    more sequence length (and training cost) per word than another.

    ``syms`` is a trained symbol frame (:func:`_bpe_rounds` second
    element, shared with :func:`bpe_encode_from_vocab`). Fertility is
    reported as exact parts-per-million (``Σsyms · 10^6 DIV Σwords``) —
    integer-only, order-free, bit-identical cross-engine; the product is
    DECIMAL(38,0) since Σsyms · 10^6 overflows int64 at corpus scale.

    → ``(stratum, n_docs, n_words, n_syms, fertility_ppm)``. Shape: the
    per-doc encode (vocab-broadcast join) then TWO partial-aggregating
    groupBys (doc, stratum) — no window, no sort.
    """
    enc = bpe_encode_from_vocab(docs, syms, id_col, text_col)
    lab = docs.select(
        F.col(id_col).alias("doc_id"), F.col(stratum_col).alias("stratum")
    )
    return (
        enc.join(lab, "doc_id")
        .groupBy("stratum")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_syms"),
            F.expr(
                "CAST((CAST(sum(n_syms) AS DECIMAL(38,0)) * 1000000)"
                " DIV sum(n_tokens) AS BIGINT)"
            ).alias("fertility_ppm"),
        )
    )


def code_switching(
    docs: DataFrame,
    chunk_chars: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E4 chunk-level language-mixture (code-switching) detector — the
    per-WINDOW twin of :func:`lang_id`, used by corpus filters that drop
    or route documents whose language flips mid-text (a doc-level
    argmax hides a 50/50 mix entirely).

    Slices each document into fixed CHARACTER windows, scores each
    window against the lexicons with the same deterministic argmax, and
    reports per document: ``n_chunks`` (total windows), ``n_identified``
    (windows with a nonzero best score), ``n_langs`` (distinct predicted
    languages over identified windows), ``dom_chunks`` (the dominant
    language's window count — n_identified == dom_chunks iff the doc is
    monolingual as far as the lexicons can see).

    Shape: explode to ~len/chunk_chars rows per doc (bounded fan-out),
    map-side lexicon scoring, two shrinking groupBys on (doc, lang) then
    doc — no joins against the corpus body."""
    d = spread(docs).select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    n_chunks = F.expr(f"greatest(1, (length(text) + {chunk_chars - 1}) div {chunk_chars})")
    chunks = d.select(
        "doc_id",
        n_chunks.cast("bigint").alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("ci"),
        "text",
    ).select(
        "doc_id",
        "n_chunks",
        F.expr(f"substring(text, ci * {chunk_chars} + 1, {chunk_chars})").alias("chunk"),
    )
    words = F.split(F.col("chunk"), " ")
    scored = chunks.select(
        "doc_id",
        "n_chunks",
        *[
            _lexicon_score(words, lex).alias(f"score_{lang}")
            for lang, lex in LANG_LEXICONS.items()
        ],
    )
    langs = list(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties — lang_id's rule
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)).otherwise(pred)
    per_lang = (
        scored.select("doc_id", "n_chunks", pred.alias("pred"), best.alias("best"))
        .where(F.col("best") > 0)
        .groupBy("doc_id", "n_chunks", "pred")
        .agg(F.count("*").alias("n"))
    )
    agg = per_lang.groupBy("doc_id", "n_chunks").agg(
        F.sum("n").cast("bigint").alias("n_identified"),
        F.count("*").cast("bigint").alias("n_langs"),
        F.max("n").cast("bigint").alias("dom_chunks"),
    )
    return (
        d.select("doc_id", n_chunks.cast("bigint").alias("n_chunks"))
        .join(agg, ["doc_id", "n_chunks"], "left")
        .na.fill(0, ["n_identified", "n_langs", "dom_chunks"])
    )
