"""Deterministic cross-engine hashing.

The reference hashes label sets with xxHash64
(/root/reference/src/series/series_manager.cpp:11-24) and tree keys with
std::hash (/root/reference/src/index/index_tree.cpp:955-982). Inside Spark we
use the built-in ``xxhash64`` for the same role (label identity). But the
duckdb oracle cannot evaluate Spark's xxhash64, so every hash that must
REPRODUCE IDENTICALLY in both engines (MinHash permutations, LSH bands,
fingerprints) uses ``h60``:

    h60(s) = int(md5(s)[:15 hex chars], 16)   -- a 60-bit positive integer

md5 is available and bit-identical in Spark and DuckDB; 15 hex digits keep
the value inside a signed 64-bit integer in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Separator used when hashing a label set into a single key; mirrors the
#: 0xff separator in /root/reference/src/series/series_manager.cpp:11-24.
LABEL_SEP = "\x01"


def h60(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_py(s: str) -> int:
    """Driver-side Python h60 — MUST stay bit-identical to :func:`h60`
    and :func:`duck_h60` (all three definitions live in this file so a
    change to one is a change to all). Used wherever the driver computes
    partition pruning keys (e.g. ``tp = h60(term) % n_term_parts``) for
    stores whose layout was written with the Spark-side h60: any drift
    would silently prune reads to the WRONG partitions and return empty
    results rather than erroring (ADVICE r8)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def h60_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: h60(seed || '#' || s) — one per MinHash permutation."""
    c = F.col(col) if isinstance(col, str) else col
    return h60(F.concat(F.lit(f"{seed}#"), c))


def duck_h60(expr: str) -> str:
    """DuckDB SQL fragment computing the same h60 as :func:`h60`.

    DuckDB has no hex→int conversion function, so fold the 15 hex digits
    with a lambda: digit_i << 4*(15-i). The lambda variable is named
    ``hxi`` so callers can embed ``expr`` that itself references an outer
    lambda variable (e.g. ``i`` inside list_transform) without shadowing.
    """
    return (
        "CAST(list_sum(list_transform(range(1, 16), hxi -> "
        f"CAST(strpos('0123456789abcdef', substr(md5({expr}), CAST(hxi AS INT), 1)) - 1 AS BIGINT)"
        " * (CAST(1 AS BIGINT) << CAST(4 * (15 - hxi) AS INT)))) AS BIGINT)"
    )


def duck_h60_seeded(expr: str, seed: int) -> str:
    return duck_h60(f"'{seed}#' || {expr}")


#: Mersenne prime 2^31-1 — modulus of the MinHash affine permutation family.
MINHASH_P = 2_147_483_647


def minhash_params(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine MinHash family
    h_j(x) = (a_j*x + b_j) mod (2^31-1), derived from h60 so both engines
    and driver-side Python regenerate them identically. One md5 per
    shingle + n_perm integer ops replaces n_perm md5s per shingle (~12x
    less hashing in the hot path)."""
    return [
        (h60_py(f"a#{j}") % (MINHASH_P - 1) + 1, h60_py(f"b#{j}") % MINHASH_P)
        for j in range(n_perm)
    ]


def label_hash(*cols: Column | str) -> Column:
    """xxhash64 over a label set, separator-joined (Spark-internal only;
    never compared against the oracle). Reference:
    /root/reference/src/series/series_manager.cpp:11-24."""
    parts: list[Column] = []
    for i, col in enumerate(cols):
        if i:
            parts.append(F.lit(LABEL_SEP))
        parts.append(F.col(col) if isinstance(col, str) else col)
    return F.xxhash64(F.concat(*parts))
