"""Interleaved A/B for the r14 q126 pair-gen vectorization: BEFORE = the
r13 interpreted transform/filter HOF fold (reconstructed inline), AFTER =
the committed mapInArrow path. Same noop-sink methodology as bench.py."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import Window

from tagtree_spark.session import persist_tracked, release_tracked, tune


def run(df):
    df.write.format("noop").mode("overwrite").save()


def old_prefix_filtered_jaccard(docs, sh, min_jaccard_pct=50):
    """The r13 body of prefix_filtered_jaccard, verbatim (interpreted
    HOF pair-gen)."""
    sh = sh.withColumn("n_sh", F.size("hs").cast("bigint"))
    inv = sh.select("doc_id", "n_sh", F.explode("hs").alias("s"))
    df_ = inv.groupBy("s").agg(F.count("*").cast("bigint").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    plen = F.expr(f"((100 - {int(min_jaccard_pct)}) * n_sh) div 100") + 1
    pref = (
        inv.join(F.broadcast(df_), "s")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= plen)
        .select("s", "doc_id", "n_sh", "rn")
    )
    pct = int(min_jaccard_pct)
    n_part = pref.sparkSession.sparkContext.defaultParallelism
    buckets = pref.repartition(n_part, "s").groupBy("s").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n_sh", "rn"))).alias("ds")
    )
    pair_structs = F.explode(
        F.flatten(
            F.expr(
                "transform(ds, (x, i) -> filter("
                "transform(slice(ds, i + 2, size(ds)), "
                "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
                "x.n_sh AS na, y.n_sh AS nb, x.rn AS pa, y.rn AS pb)), "
                f"p -> {pct} * greatest(p.na, p.nb) <= 100 * least(p.na, p.nb)))"
            )
        )
    )
    cand = (
        buckets.where(F.size("ds") >= 2)
        .select(pair_structs.alias("p"))
        .select("p.doc_a", "p.doc_b", "p.na", "p.nb", "p.pa", "p.pb")
    )
    agg = cand.groupBy("doc_a", "doc_b").agg(
        F.count("*").cast("bigint").alias("npc"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.max("pa").alias("pa_max"),
        F.max("pb").alias("pb_max"),
    )
    alpha = F.expr(f"({pct} * (na + nb) + {100 + pct} - 1) div {100 + pct}")
    ubound = F.col("npc") + F.least(
        F.col("na") - F.col("pa_max"), F.col("nb") - F.col("pb_max")
    )
    kept = agg.where(ubound >= alpha).select("doc_a", "doc_b")
    ha = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    hb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    ver = (
        kept.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).cast("bigint").alias("n_common"),
            F.size("hs_a").cast("bigint").alias("n_a"),
            F.size("hs_b").cast("bigint").alias("n_b"),
        )
    )
    return ver.where(
        F.col("n_common") * 100
        >= F.lit(int(min_jaccard_pct)) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    )


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .appName("ab_r14_q126")
        .getOrCreate()
    )
    tune(spark)
    import tagtree_spark.queries_ext as qx

    qx._sh(spark, sf_dir)
    docs = qx._docs(spark, sf_dir)

    def before():
        return old_prefix_filtered_jaccard(
            docs, qx._sh(spark, sf_dir), 50
        ).orderBy("doc_a", "doc_b")

    def after():
        return qx.q126_prefix_filter(spark, sf_dir)

    tb, ta = [], []
    for _ in range(3):
        t0 = time.time(); run(before()); tb.append(time.time() - t0)
        release_tracked()
        t0 = time.time(); run(after()); ta.append(time.time() - t0)
        release_tracked()
    for tag, mk in (("before", before), ("after", after)):
        df = mk()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"/root/repo/plans/r14/q126_prefix_filter_{tag}.txt", "w") as f:
            f.write(plan)
    release_tracked()
    print(f"q126: before={min(tb):.3f} after={min(ta):.3f} "
          f"(before={['%.2f' % t for t in tb]}, after={['%.2f' % t for t in ta]})")


if __name__ == "__main__":
    main()
