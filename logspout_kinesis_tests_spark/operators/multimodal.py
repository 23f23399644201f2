"""Multimodal column conventions (SURVEY.md §2 C12).

Convention: a modality payload is an opaque ``binary`` column plus a typed
metadata struct — the same shape Spark's own ``binaryFile`` source and the
open lakehouse image schemas use:

    payload: binary
    meta:    struct<mime: string, modality: string, n_bytes: long,
                    width: int, height: int, sample_rate: int>

Metadata-level operations (filter by mime, project dims, size stats) are
ordinary columnar ops — cheap at any scale because the binary column is
pruned away unless actually selected (columnar parquet + column pruning).

Decode / feature-extract runs as Arrow-batched ``mapInPandas`` so payload
bytes stream through Python in batches, never row-at-a-time.  The actual
image/audio decoding libraries are not available in this container, so the
decode body is STUBBED: real libraries are attempted first, then a
clearly-marked deterministic fake (hash-derived pseudo-features) keeps the
plumbing — schema, batching, partitioning — fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Metadata struct for any modality payload.
MODALITY_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sample_rate", LongType()),
    ]
)

#: Output schema of the (stubbed) feature extractor.
FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_text_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text column in the multimodal convention (payload + meta).

    Text is the modality present in the driver tables; image/audio payloads
    arrive the same way (binary column + meta struct) from a binaryFile or
    lakehouse scan.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit("text").alias("modality"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in features: byte-prefix statistics.

    STUB — replaces (PIL/librosa/decord) feature extraction, which is not
    installed in this container.  Deterministic so tests can assert values.
    """
    if not payload:
        return [0.0] * n
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:16]) % 997),
    ][:n]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode/feature-extract over multimodal payloads.

    Expects the ``attach_*_payload`` shape (payload + meta).  Tries the real
    decoder stack first; otherwise falls back to the deterministic stub so
    the distributed plumbing (batch iteration, schema, partition layout)
    stays exercised end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401

            real_decoder = True
        except ImportError:
            real_decoder = False

        for pdf in batches:
            if real_decoder and (pdf["meta"].map(lambda m: m["modality"]) == "image").any():
                # Real decode path would go here (Image.open over BytesIO per
                # payload, batched).  Unreachable in this container.
                raise NotImplementedError("image decode requires PIL at runtime")
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "features": pdf["payload"].map(lambda p: _fake_features(bytes(p))),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURES_SCHEMA)


#: Output schema of the segment sampler (video frames / audio chunks).
SEGMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("seg_idx", LongType()),
        StructField("seg_payload", StringType()),  # decoded for testability
        StructField("seg_len", LongType()),
    ]
)


def sample_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    segment_bytes: int = 64,
    stride_segments: int = 1,
) -> DataFrame:
    """Fixed-size segment split + stride sampling over multimodal payloads.

    The video-frame-sampling / audio-chunking plumbing: one payload row in,
    one row out per kept segment.  A real video decoder replaces the
    byte-slicer with keyframe extraction (decord/ffmpeg) inside the same
    ``mapInPandas`` body — the Spark-side shape (Arrow batch in, exploded
    Arrow batch out, binary pruned upstream unless selected) is identical.
    ``stride_segments=1`` is contiguous chunking (audio); ``k>1`` keeps
    every k-th segment (frame sampling).

    Scale shape: a scan-side row multiplier — no shuffle, no state; output
    row count is bounded by payload_bytes / segment_bytes / stride.
    Segments decode as ASCII/UTF-8 strings here so the DuckDB oracle can
    byte-compare them (the corpus is ASCII; a real modality would emit
    binary).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            segs: list[str] = []
            lens: list[int] = []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                raw = bytes(payload)
                for s in range(0, len(raw), segment_bytes * stride_segments):
                    seg = raw[s : s + segment_bytes]
                    ids.append(i)
                    idxs.append(s // segment_bytes)
                    segs.append(seg.decode("utf-8", errors="replace"))
                    lens.append(len(seg))
            yield pd.DataFrame(
                {"doc_id": ids, "seg_idx": idxs, "seg_payload": segs, "seg_len": lens}
            )

    return df.mapInPandas(run, SEGMENTS_SCHEMA)
