"""salted_join must produce exactly the plain join's rows while keying the
shuffle on (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagtree_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed fact: 90% of rows share one hot key
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    plain = fact.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(fact, dim, on=["k"], n_salt=8).select("k", "payload", "attr")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark):
    fact = spark.range(0, 100).select(
        (F.col("id") % 60).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 30).select(F.col("id").alias("k"), F.lit("x").alias("attr"))
    plain = fact.join(dim, "k", "left").select("k", "payload", "attr")
    salted = salted_join(fact, dim, on=["k"], n_salt=4, how="left").select(
        "k", "payload", "attr"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_rejects_right_and_full(spark):
    """right/full would duplicate unmatched exploded-side rows n_salt times."""
    import pytest

    fact = spark.range(2).select(F.col("id").alias("k"), F.col("id").alias("p"))
    dim = spark.range(2).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(fact, dim, on=["k"], how=how)


def test_salt_is_deterministic(spark):
    fact = spark.range(0, 500).select((F.col("id") % 3).alias("k"), F.col("id").alias("p"))
    dim = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("a").alias("attr"))
    a = salted_join(fact, dim, on=["k"]).orderBy("p").collect()
    b = salted_join(fact, dim, on=["k"]).orderBy("p").collect()
    assert a == b


def test_salted_agg_equals_plain_groupby(spark):
    from tagtree_spark.operators.skew import salted_agg

    # 95% of rows on one hot key
    df = spark.range(0, 4000).select(
        F.when(F.col("id") % 20 < 19, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") % 7).cast("decimal(18,4)").alias("v"),
    )
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n_rows"], r["sv"])
        for r in salted_agg(df, ["k"], {"sv": F.col("v")}, n_salt=8).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    """Phase 1 must group on (keys, salt): the partial row count for the
    hot key exceeds 1, i.e. no single reducer saw every hot row."""
    from tagtree_spark.operators.skew import SALT_COL, salted_agg

    df = spark.range(0, 1000).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("rid"),
        F.lit(1).cast("decimal(18,4)").alias("v"),
    )
    partial = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64("rid"), F.lit(8)).cast("int")
    ).groupBy("k", SALT_COL).count()
    assert partial.count() > 1
    out = salted_agg(df, ["k"], {"sv": F.col("v")}, n_salt=8).collect()
    assert out[0]["n_rows"] == 1000 and int(out[0]["sv"]) == 1000
