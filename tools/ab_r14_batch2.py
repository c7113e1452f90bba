"""Interleaved A/B timing + plan dumps for the r14 batch-2 family rides
(q75/q84/q195/q345): BEFORE = the r13 inline paths (reconstructed from the
still-present operator code paths), AFTER = the committed queries.
Methodology matches bench.py (noop sink, best-of-N interleaved so host
drift hits both sides equally). One-time builders are warmed OUTSIDE the
timed region, exactly as bench.py times them separately."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from tagtree_spark.session import tune, release_tracked


def run(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .appName("ab_r14_batch2")
        .getOrCreate()
    )
    tune(spark)
    import tagtree_spark.queries_ext as qx
    from tagtree_spark.operators.dedup import (
        cross_corpus_near_dup,
        lsh_band_histogram,
        ngram_jaccard_pairs,
        shingle_hashes,
        word_shingles,
    )
    from tagtree_spark.session import persist_tracked, spread

    # warm the shared one-time frames (bench times these separately)
    qx._sh(spark, sf_dir)
    qx._spc(spark, sf_dir)
    qx._msig(spark, sf_dir)
    qx._mh_pairs(spark, sf_dir)

    docs = qx._docs(spark, sf_dir)

    def q75_before():
        og = F.substring("source", 4, 10).cast("int") % 2
        return cross_corpus_near_dup(
            docs.where(og == 0), docs.where(og == 1)
        ).orderBy("a_id", "b_id")

    def q84_before():
        hs = word_shingles(
            spread(docs).where(F.size(F.split(F.col("text"), " ")) >= 3)
        ).select(F.col("doc_id"), shingle_hashes("shingles").alias("hs"))
        pairs = qx._mh_pairs(spark, sf_dir)
        ha = hs.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
        hb = hs.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
        common = F.size(F.array_intersect("ha", "hb")).cast("bigint")
        na = F.size("ha").cast("bigint")
        nb = F.size("hb").cast("bigint")
        return (
            pairs.join(ha, "doc_a")
            .join(hb, "doc_b")
            .select(
                "doc_a", "doc_b", "n_match",
                common.alias("n_common"), na.alias("n_a"), nb.alias("n_b"),
                (F.col("n_match").cast("double") / 12).alias("j_est"),
                (common.cast("double") / (na + nb - common)).alias("j_exact"),
            )
            .orderBy("doc_a", "doc_b")
        )

    def q195_before():
        return lsh_band_histogram(docs, sh=qx._sh(spark, sf_dir)).orderBy(
            "bucket_size"
        )

    def q345_before():
        pairs = persist_tracked(
            ngram_jaccard_pairs(docs, min_jaccard_pct=50, sh=qx._sh(spark, sf_dir))
        )
        thr = F.explode(F.array(*[F.lit(t) for t in (50, 60, 70, 80, 90)])).alias("t")
        hit = (
            pairs.select("doc_a", "doc_b", "n_common", "n_a", "n_b", thr)
            .where(
                F.col("n_common") * 100
                >= F.col("t") * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            )
            .select("t", "doc_a", "doc_b")
        )
        np_ = hit.groupBy("t").agg(F.count("*").cast("bigint").alias("n_pairs"))
        pd_ = (
            hit.select("t", F.col("doc_a").alias("d"))
            .union(hit.select("t", F.col("doc_b").alias("d")))
            .distinct()
        )
        nd_ = pd_.groupBy("t").agg(F.count("*").cast("bigint").alias("n_docs"))
        base = spark.createDataFrame([(t,) for t in (50, 60, 70, 80, 90)], "t int")
        return (
            base.join(np_, "t", "left")
            .join(nd_, "t", "left")
            .select(
                F.col("t").alias("threshold_pct"),
                F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
                F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            )
            .orderBy("threshold_pct")
        )

    cases = {
        "q75_cross_corpus_dedup": (q75_before, lambda: qx.q75_cross_corpus_dedup(spark, sf_dir)),
        "q84_minhash_calibration": (q84_before, lambda: qx.q84_minhash_calibration(spark, sf_dir)),
        "q195_lsh_band_histogram": (q195_before, lambda: qx.q195_lsh_band_histogram(spark, sf_dir)),
        "q345_threshold_sweep": (q345_before, lambda: qx.q345_threshold_sweep(spark, sf_dir)),
    }
    reps = 3
    out = {}
    for name, (bf, af) in cases.items():
        tb, ta = [], []
        for _ in range(reps):
            t0 = time.time(); run(bf()); tb.append(time.time() - t0)
            release_tracked()
            t0 = time.time(); run(af()); ta.append(time.time() - t0)
            release_tracked()
        out[name] = (min(tb), min(ta))
        for tag, mk in (("before", bf), ("after", af)):
            df = mk()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"/root/repo/plans/r14/{name}_{tag}.txt", "w") as f:
                f.write(plan)
        release_tracked()
        print(f"{name}: before={min(tb):.3f}s after={min(ta):.3f}s "
              f"(all before={['%.2f' % t for t in tb]}, after={['%.2f' % t for t in ta]})")
    print({k: (round(b, 3), round(a, 3)) for k, (b, a) in out.items()})


if __name__ == "__main__":
    main()
