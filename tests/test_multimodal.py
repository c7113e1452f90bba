"""E5 multimodal plumbing: BINARY payload round-trip through Arrow-batched
mapInPandas; codec decode is stubbed and must say so loudly."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tagtree_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_from_documents,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media("image", b"\x89PNG")


def test_media_schema(documents):
    m = media_from_documents(documents)
    assert dict(m.dtypes) == {
        "media_id": "bigint",
        "modality": "string",
        "payload": "binary",
        "meta": "map<string,string>",
    }


def test_extract_features_matches_python_md5(documents):
    docs = documents.orderBy("doc_id").limit(5).collect()
    feats = {
        r.media_id: r
        for r in extract_features(media_from_documents(documents))
        .orderBy("media_id")
        .limit(5)
        .collect()
    }
    for d in docs:
        f = feats[d.doc_id]
        assert f.n_bytes == len(d.text.encode())
        assert f.head_h60 == int(hashlib.md5(d.text.encode()[:16]).hexdigest()[:15], 16)


def test_resize_is_stubbed():
    from tagtree_spark.operators.multimodal import resize_media

    with pytest.raises(NotImplementedError):
        resize_media("image", b"\x89PNG", 224, 224)


def test_sample_frames_row_expansion(documents):
    from tagtree_spark.operators.multimodal import (
        CHUNK_CHARS,
        MAX_CHUNKS,
        sample_frames,
    )

    media = media_from_documents(documents)
    frames = sample_frames(media)
    per_doc = {r.media_id: r.n for r in frames.groupBy("media_id").agg(
        F.count("*").alias("n")).collect()}
    for d in documents.select("doc_id", "text").collect():
        # chunk domain is CHARACTERS of the decoded text payload
        expect = min(MAX_CHUNKS, (len(d.text) + CHUNK_CHARS - 1) // CHUNK_CHARS)
        assert per_doc[d.doc_id] == expect


def test_metadata_preserved(documents):
    m = media_from_documents(documents).limit(1).collect()[0]
    assert set(m.meta) == {"lang", "source"}


def test_multibyte_text_chunks_by_characters(spark):
    """The fake features must slice by CHARACTERS of the decoded payload —
    a byte slice would split multibyte characters and diverge from the
    oracle's character-indexed substr (ADVICE r2). Verified against DuckDB
    on a multibyte document."""
    import duckdb

    from tagtree_spark.functions.hashing import duck_h60
    from tagtree_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
        sample_frames,
    )

    # 2-byte chars: 150 'é' → 2 chunks of chars (100 + 50), 300 bytes
    text = "é" * 150
    docs = spark.createDataFrame(
        [(1, text, "fr", "s", len(text))], ["doc_id", "text", "lang", "source", "n_chars"]
    )
    media = media_from_documents(docs)

    feat = extract_features(media).collect()[0]
    assert feat.n_bytes == 300  # byte length (DuckDB strlen)

    frames = {r.chunk_idx: r.chunk_h60 for r in sample_frames(media).collect()}
    assert len(frames) == 2

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1 AS doc_id, ? AS text", [text])
    d_head = con.execute(f"SELECT {duck_h60('substr(text, 1, 16)')} FROM documents").fetchone()[0]
    d_chunks = dict(
        con.execute(
            f"""SELECT i, {duck_h60("substr(text, CAST(i * 100 + 1 AS INT), 100)")}
            FROM documents, range(0, 5) t(i)
            WHERE i < least(5, CAST(ceil(length(text) / 100.0) AS BIGINT))"""
        ).fetchall()
    )
    assert feat.head_h60 == d_head
    assert frames == d_chunks


def test_audio_windows_geometry_and_overlap(spark):
    from tagtree_spark.operators.multimodal import audio_from_documents, audio_windows

    docs = spark.createDataFrame(
        [(1, "x" * 120, "en", "s", 120)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    # sr=100, win=50, hop=30 → starts 0,30,60,90 (120 chars); window 3 is
    # the 30-char tail
    rows = sorted(
        audio_windows(audio_from_documents(docs)).collect(), key=lambda r: r.win_idx
    )
    assert [r.start_unit for r in rows] == [0, 30, 60, 90]
    assert [r.n_units for r in rows] == [50, 50, 50, 30]
    # overlap: identical content ('x'*50) → identical window hashes
    assert rows[0].win_h60 == rows[1].win_h60 == rows[2].win_h60
    assert rows[3].win_h60 != rows[0].win_h60


def test_audio_windows_caps_window_count(spark):
    from tagtree_spark.operators.multimodal import (
        MAX_WINDOWS,
        audio_from_documents,
        audio_windows,
    )

    docs = spark.createDataFrame(
        [(1, "y" * 5000, "en", "s", 5000)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    assert audio_windows(audio_from_documents(docs)).count() == MAX_WINDOWS
