"""Deduplication operators (E1/E2): exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data-pipeline surface mandated by the project north
star (SURVEY.md §2.11), absent from the reference (it indexes time series,
not documents); designed Spark-first for 100 TB corpora.

Scale stance:
  * NOTHING here cross-joins. Near-dup candidate generation is always a
    bucket join — LSH band buckets (MinHash), bit-band buckets (SimHash),
    or a shingle inverted index (exact Jaccard) — so work is proportional
    to colliding pairs, not to |docs|².
  * All hashing is ``h60`` (md5-derived, tagtree_spark.functions.hashing)
    so the DuckDB oracle reproduces every signature bit-identically.
  * Everything is JVM-native column expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import h60

# MinHash defaults: 12 permutations, 4 bands x 3 rows. For a pair with
# Jaccard J the candidate probability is 1-(1-J^3)^4 — ~0.05 at J=0.25,
# ~0.97 at J=0.8 — the standard S-curve for "near-dup" thresholds >=0.5.
N_PERM = 12
N_BANDS = 4
ROWS_PER_BAND = 3


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Add ``shingles``: the distinct word n-grams of ``text_col``.

    Pure projection (no shuffle). Guarded for texts shorter than n words —
    Spark's sequence() would otherwise generate a DESCENDING range.
    """
    words = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))"
    )
    return docs.withColumn(
        "shingles",
        F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        ),
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """E1 exact dedup → one survivor row per distinct content hash:
    ``(keep_id, n_copies)``. The group key is h60(text), i.e. the
    hash-groupBy shape that scales (the shuffle key is a 60-bit int, never
    the document body)."""
    return (
        docs.groupBy(h60(text_col).alias("text_h60"))
        .agg(
            F.min(id_col).cast("bigint").alias("keep_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def minhash_signature(shingle_col: str = "shingles", n_perm: int = N_PERM) -> Column:
    """MinHash signature column: array<bigint> of length ``n_perm``;
    element j = min over shingles of h60(j || '#' || shingle)."""
    def _perm(j: int):
        # closure, NOT a default arg: a 2-param lambda would make
        # F.transform pass the array index as the second argument.
        return lambda s: h60(F.concat(F.lit(f"{j}#"), s))

    mins = [
        F.array_min(F.transform(F.col(shingle_col), _perm(j))) for j in range(n_perm)
    ]
    return F.array(*mins)


def lsh_band_keys(
    sig_col: str = "sig", n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> Column:
    """array of per-band bucket keys: band b → h60(b ':' sig[b*r..b*r+r-1])."""
    keys = []
    for b in range(n_bands):
        parts = [
            F.col(sig_col)[b * rows_per_band + r].cast("string")
            for r in range(rows_per_band)
        ]
        keys.append(h60(F.concat_ws("#", F.lit(f"{b}:"), *parts)))
    return F.array(*keys)


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = N_PERM,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    min_match: int = 6,
) -> DataFrame:
    """E2 near-dup pairs via MinHash + LSH banding → ``(doc_a, doc_b,
    n_match)`` where n_match = #agreeing signature positions (>= min_match).

    Plan shape (the 100 TB path):
      1. narrow: shingle + signature per doc (no shuffle);
      2. explode band keys → groupBy-join on (band key): candidates are
         generated per bucket — NO cross join anywhere;
      3. verify candidates on the full signature (join back to signatures,
         count agreeing positions).
    """
    sigs = (
        word_shingles(docs, text_col=text_col)
        .where(F.size("shingles") > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            minhash_signature("shingles", n_perm=n_perm).alias("sig"),
        )
    )
    bands = sigs.select(
        "doc_id", F.explode(lsh_band_keys("sig", n_bands, rows_per_band)).alias("band")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    n_match = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", n_match.cast("bigint").alias("n_match"))
        .where(F.col("n_match") >= min_match)
    )


def simhash60(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """E2 SimHash: 60-bit fingerprint per document → ``(doc_id, simhash)``.

    Classic Charikar scheme over word unigrams weighted by term frequency:
    bit b of the fingerprint is set iff sum over words of
    (count if bit b of h60(word) else -count) > 0.

    Plan: explode words → one groupBy(doc, word) for counts → one
    groupBy(doc) folding all 60 bit-sums — two shuffles total, both on keys
    that shrink with aggregation; no per-bit passes over the data.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    wc = words.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    hw = wc.select("doc_id", h60("word").alias("hw"), "cnt")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("hw"), b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"s{b}")
        for b in range(60)
    ]
    per_doc = hw.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for b in range(60):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("bigint") * (1 << b)).otherwise(
            F.lit(0).cast("bigint")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_doc.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs → ``(doc_a, doc_b, hamming)``.

    Bit-band LSH: split the 60-bit fingerprint into ``n_bands`` 15-bit
    bands; any pair within hamming distance < n_bands shares at least one
    exact band (pigeonhole), so a bucket join on band values has full
    recall for max_hamming <= n_bands - 1. Verification = popcount(XOR).
    """
    width = 60 // n_bands
    fp = simhash60(docs, id_col=id_col, text_col=text_col)
    mask = (1 << width) - 1
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("bigint")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard_pct: int = 50,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted index →
    ``(doc_a, doc_b, n_common, n_a, n_b)`` for J >= min_jaccard_pct/100.

    Candidates come from joining the exploded (shingle → doc) index with
    itself on the shingle — i.e. only pairs that SHARE a shingle are ever
    materialized; J is then exact from integer counts (output stays
    integer so both engines hash identically; J = c/(n_a+n_b-c)).

    At 100 TB the refinement is to drop ultra-frequent shingles (df cap)
    before the self-join — stop-shingles generate quadratic bucket blowup
    while contributing nothing to near-dup detection.
    """
    sh = (
        word_shingles(docs, n=n, text_col=text_col)
        .where(F.size("shingles") > 0)
        .select(F.col(id_col).alias("doc_id"), "shingles")
    )
    sizes = sh.select("doc_id", F.size("shingles").cast("bigint").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("s"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = common.join(sa, "doc_a").join(sb, "doc_b")
    return out.where(
        F.col("n_common") * 100 >= F.lit(min_jaccard_pct) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    ).select("doc_a", "doc_b", "n_common", "n_a", "n_b")
