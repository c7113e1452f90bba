"""Multimodal column handling (E5, SURVEY.md §2.11).

Treats image/audio/video payloads as opaque BINARY columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the Spark-idiomatic
shape for media pipelines at 100 TB (payload bytes never pass through
row-at-a-time Python; each task streams pandas batches).

The container has no image/audio codecs, so the actual decode step is
STUBBED (``decode_media`` raises NotImplementedError, as mandated by the
project brief); ``extract_features`` runs the same mapInPandas plumbing
with a deterministic fake feature (md5-derived — reproducible in the
DuckDB oracle), so schema, batching, and partitioning are real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagtree_spark.session import spread
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal schema: one row per media object.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # 'text' | 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("head_h60", LongType()),  # h60 of the first 16 payload bytes
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from the driver's ``documents`` fixture:
    payload = utf-8 bytes of the text (a stand-in for image bytes), typed
    metadata map. Pure projection."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def decode_media(modality: str, payload: bytes):
    """STUB — real decode needs PIL/ffmpeg/librosa, not in this container.

    The contract a production build would implement: image → HxWxC uint8
    array, audio → PCM float32, video → sampled frames. Deliberately raises
    so callers can't silently treat fake features as real decodes.
    """
    raise NotImplementedError(
        f"decode_media({modality!r}): media codecs are not available in this "
        "environment; use extract_features() (deterministic md5-based fake) "
        "for pipeline plumbing."
    )


def resize_media(modality: str, payload: bytes, width: int, height: int):
    """STUB — resize requires a real decode (PIL/ffmpeg), not in this
    container; see decode_media."""
    raise NotImplementedError(
        f"resize_media({modality!r}, {width}x{height}): requires decode_media"
    )


def _h60_bytes(b: bytes) -> int:
    return int(hashlib.md5(b).hexdigest()[:15], 16)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("chunk_h60", LongType()),
    ]
)

CHUNK_CHARS = 100
MAX_CHUNKS = 5


def _chunk_units(payload: bytes) -> str | bytes:
    """Chunking domain for a payload: decoded text when the payload is
    valid utf-8, raw bytes otherwise. Slicing by CHARACTERS (not bytes) for
    text keeps the fake features aligned with the oracle's
    character-indexed ``substr`` — a byte slice would split a multibyte
    character and silently diverge (ADVICE r2). Real codecs would make this
    frames/samples instead."""
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame/chunk sampling — the 1→N mapInPandas shape a video pipeline
    uses (decode → every-Nth-frame). With codecs stubbed, "frames" are
    fixed-size payload chunks (100 CHARACTERS for text payloads, mirroring
    the oracle's substr) and the "feature" is the content hash of the
    chunk's utf-8 bytes — the row-expansion plumbing (one input row yields
    up to MAX_CHUNKS output rows inside the Arrow batch) is the real part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "chunk_idx": [], "chunk_h60": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                units = _chunk_units(bytes(payload))
                n = min(MAX_CHUNKS, (len(units) + CHUNK_CHARS - 1) // CHUNK_CHARS)
                for i in range(n):
                    chunk = units[i * CHUNK_CHARS : (i + 1) * CHUNK_CHARS]
                    raw = chunk.encode("utf-8") if isinstance(chunk, str) else chunk
                    out["media_id"].append(int(mid))
                    out["chunk_idx"].append(i)
                    out["chunk_h60"].append(_h60_bytes(raw))
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "chunk_idx": "int64", "chunk_h60": "int64"}
            )

    return spread(media).mapInPandas(batches, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas streams pandas batches per task — payload bytes stay inside
    the Arrow buffers; the fake feature (h60 of the utf-8 bytes of the
    first 16 CHARACTERS) matches ``duck_h60(substr(text, 1, 16))`` in the
    oracle because substr is character-indexed and Python/Spark/DuckDB md5
    agree byte-for-byte. ``n_bytes`` stays BYTE length (= DuckDB strlen).
    """

    def _head16(b: bytes) -> int:
        units = _chunk_units(bytes(b))
        head = units[:16]
        return _h60_bytes(head.encode("utf-8") if isinstance(head, str) else head)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "head_h60": pdf["payload"].map(_head16).astype("int64"),
                }
            )

    # spread: a single-file input would otherwise run all Python batches
    # in ONE task — Arrow parallelism needs input partitions.
    return spread(media).mapInPandas(batches, schema=FEATURE_SCHEMA)


MAX_WINDOWS = 6

AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("start_unit", LongType()),
        StructField("n_units", LongType()),
        StructField("win_h60", LongType()),
    ]
)


def audio_from_documents(docs: DataFrame) -> DataFrame:
    """Audio-shaped multimodal table from the documents fixture: payload =
    utf-8 bytes standing in for PCM samples, with the sample-rate metadata
    a real audio table carries (sample_rate drives window geometry)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.map_from_arrays(
            F.array(F.lit("sample_rate"), F.lit("channels")),
            F.array(F.lit("100"), F.lit("1")),
        ).alias("meta"),
    )


def audio_windows(media: DataFrame, win_ms: int = 500, hop_ms: int = 300) -> DataFrame:
    """Overlapping analysis windows over an audio payload — the STFT/VAD
    framing shape (window length and hop derived from the row's OWN
    sample-rate metadata, hop < win ⇒ overlap), 1→N inside the Arrow
    batch. With codecs stubbed, "samples" are characters of the decoded
    payload (mirroring the oracle's char-indexed substr); the window
    feature is the content hash of the window's bytes. Real decode would
    swap `_chunk_units` for PCM frames — geometry, schema, and batching
    are the real, tested part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "win_idx": [], "start_unit": [], "n_units": [], "win_h60": []
            }
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                sr = int(m.get("sample_rate", "100"))
                win = max(1, sr * win_ms // 1000)
                hop = max(1, sr * hop_ms // 1000)
                units = _chunk_units(bytes(payload))
                k = 0
                while k * hop < len(units) and k < MAX_WINDOWS:
                    chunk = units[k * hop : k * hop + win]
                    raw = chunk.encode("utf-8") if isinstance(chunk, str) else chunk
                    out["media_id"].append(int(mid))
                    out["win_idx"].append(k)
                    out["start_unit"].append(k * hop)
                    out["n_units"].append(len(chunk))
                    out["win_h60"].append(_h60_bytes(raw))
                    k += 1
            yield pd.DataFrame(out).astype(
                {c: "int64" for c in ("media_id", "win_idx", "start_unit", "n_units", "win_h60")}
            )

    return spread(media).mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA)
