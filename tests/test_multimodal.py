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
        CHUNK_BYTES,
        MAX_CHUNKS,
        sample_frames,
    )

    media = media_from_documents(documents)
    frames = sample_frames(media)
    per_doc = {r.media_id: r.n for r in frames.groupBy("media_id").agg(
        F.count("*").alias("n")).collect()}
    for d in documents.select("doc_id", "text").collect():
        expect = min(MAX_CHUNKS, (len(d.text.encode()) + CHUNK_BYTES - 1) // CHUNK_BYTES)
        assert per_doc[d.doc_id] == expect


def test_metadata_preserved(documents):
    m = media_from_documents(documents).limit(1).collect()[0]
    assert set(m.meta) == {"lang", "source"}
