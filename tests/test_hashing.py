"""Cross-engine hash determinism: h60 must be bit-identical in Spark,
DuckDB, and driver-side Python — every signature/bucket in E2/E3 relies
on it."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import duck_h60, duck_h60_seeded, h60, h60_seeded

SAMPLES = ["", "a", "click", "the quick brown fox", "ünïcode-ış", "0#x y z", "1" * 100]


def py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_h60_spark_equals_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    got = {r.s: r.h for r in df.select("s", h60("s").alias("h")).collect()}
    assert got == {s: py_h60(s) for s in SAMPLES}


def test_h60_duckdb_equals_python():
    con = duckdb.connect()
    for s in SAMPLES:
        (got,) = con.execute(f"SELECT {duck_h60('?')}", [s]).fetchone()
        assert got == py_h60(s), s


def test_h60_seeded_cross_engine(spark):
    con = duckdb.connect()
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    for seed in (0, 7):
        spark_vals = {
            r.s: r.h for r in df.select("s", h60_seeded("s", seed).alias("h")).collect()
        }
        for s in SAMPLES:
            (duck,) = con.execute(f"SELECT {duck_h60_seeded('?', seed)}", [s]).fetchone()
            assert duck == spark_vals[s] == py_h60(f"{seed}#{s}")


def test_h60_fits_signed_64(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    rows = df.select(h60("s").alias("h")).collect()
    assert all(0 <= r.h < 2**60 for r in rows)


# --- property tests (SURVEY.md §5) -------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_h60_duckdb_matches_python_property(s):
    """∀ strings: duck_h60(s) == python md5-derived h60(s) — the invariant
    every MinHash signature, LSH bucket, and fingerprint oracle rests on."""
    con = duckdb.connect()
    (got,) = con.execute(f"SELECT {duck_h60('?')}", [s]).fetchone()
    assert got == py_h60(s)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=63), _TEXT)
def test_h60_seeded_matches_python_property(seed, s):
    con = duckdb.connect()
    (got,) = con.execute(f"SELECT {duck_h60_seeded('?', seed)}", [s]).fetchone()
    assert got == py_h60(f"{seed}#{s}")


def test_minhash_params_valid():
    from tagtree_spark.functions.hashing import MINHASH_P, minhash_params

    params = minhash_params(64)
    assert len(set(params)) == 64  # distinct permutations
    for a, b in params:
        assert 1 <= a < MINHASH_P and 0 <= b < MINHASH_P


def test_h60_py_is_the_single_driver_side_definition(spark):
    """h60_py (functions/hashing.py) is the ONE driver-side h60 used for
    partition pruning against store layouts written with the Spark-side
    h60 — it must equal h60 bit-for-bit (ADVICE r8: drift would silently
    prune reads to the wrong tp partitions and return empty)."""
    from tagtree_spark.functions.hashing import h60_py

    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    got = {r.s: r.h for r in df.select("s", h60("s").alias("h")).collect()}
    assert got == {s: h60_py(s) for s in SAMPLES}
