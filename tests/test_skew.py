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
