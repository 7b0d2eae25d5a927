"""Multimodal column plumbing (SURVEY.md §2.4 north-star extension).

Images/audio/video are carried as opaque ``binary`` columns plus typed
metadata; decode / feature-extract run as Arrow-batched pandas
functions over ``mapInPandas``.  The actual codec libraries are not in
this container, so the decode kernel is STUBBED (clearly marked below)
behind a deterministic fake — the Spark-side plumbing (schema,
partitioning, batch iteration, UDF signatures) is real and tested.

At 100 TB: binary payloads ride in the same parquet row groups as their
metadata; filters on metadata (mime/side/bytes) prune row groups before
any payload is decoded, and ``mapInPandas`` streams Arrow batches so an
executor never materializes a partition of blobs at once.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

MEDIA_SCHEMA = (
    "doc_id long, mime string, n_bytes long, sha256 string, width long, height long"
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake for image decode.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload))
    (library not available in this container).  The fake derives a
    stable (width, height) from the digest so tests are reproducible.
    """
    digest = hashlib.sha256(payload).digest()
    return 16 + digest[0] % 64, 16 + digest[1] % 64


def decode_media_batches(batches: Iterator, *, _real: bool = False) -> Iterator:
    """mapInPandas kernel: bytes -> metadata features, one Arrow batch
    at a time (bounded memory regardless of partition size)."""
    import pandas as pd

    if _real:
        raise NotImplementedError(
            "real image/audio decode requires PIL/av, not present in this container"
        )
    for pdf in batches:
        widths, heights, shas, sizes = [], [], [], []
        for payload in pdf["payload"]:
            b = bytes(payload)
            w, h = _fake_decode(b)
            widths.append(w)
            heights.append(h)
            shas.append(hashlib.sha256(b).hexdigest())
            sizes.append(len(b))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": sizes,
                "sha256": shas,
                "width": widths,
                "height": heights,
            }
        )


def media_table(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize a binary media table from documents (no binary column
    exists in the testdata): payload = utf-8 bytes of the text."""
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.lit("image/fake").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )


@query("q_multimodal_decode_stub", oracle=None)
def q_multimodal_decode_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column decode pipeline through mapInPandas (rows-only:
    the decode kernel is a deterministic stub)."""
    media = media_table(spark, sf)
    return media.mapInPandas(decode_media_batches, MEDIA_SCHEMA)


@query(
    "q_multimodal_meta_filter",
    oracle="""
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents WHERE length(text) > 300
    """,
)
def q_multimodal_meta_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Metadata-predicate pruning over a binary column: filter on byte
    length BEFORE any decode touches payload bytes (the ascii corpus
    makes octet_length == char length, so the oracle can check it)."""
    media = media_table(spark, sf)
    return media.select(
        "doc_id", F.octet_length("payload").cast("long").alias("n_bytes")
    ).filter(F.col("n_bytes") > 300)


RESIZED_SCHEMA = "doc_id long, width long, height long, out_w long, out_h long, thumb binary"


def resize_batches(target: int = 32):
    """mapInPandas kernel factory: decode -> resize-to-target thumbnail.
    The pixel work is STUBBED (no PIL in this container): the fake
    'thumbnail' is a deterministic digest-derived byte block of the
    right nominal size, but the batch shape, aspect-ratio math, and
    binary-out schema are the real plumbing."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "out_w": [], "out_h": [], "thumb": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h = _fake_decode(b)
                scale = target / max(w, h)
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                # STUB: real path would be img.resize((ow, oh)).tobytes()
                digest = hashlib.sha256(b).digest()
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["out_w"].append(ow)
                out["out_h"].append(oh)
                out["thumb"].append(digest * (ow * oh * 3 // len(digest) + 1))
            yield pd.DataFrame(out)

    return kernel


@query("q_multimodal_resize_stub", oracle=None)
def q_multimodal_resize_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Image-resize pipeline over binary payloads (stubbed pixels, real
    Arrow-batched plumbing).  At 100 TB the thumb column is ~3*t^2
    bytes/row regardless of source size — output partitions stay
    bounded."""
    media = media_table(spark, sf)
    return media.mapInPandas(resize_batches(32), RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_ts_ms long, frame binary"


def sample_frame_batches(every_ms: int = 1000, max_frames: int = 4):
    """mapInPandas kernel factory for video frame sampling: one input
    row (video payload) fans out to <= max_frames frame rows.  Decode
    is STUBBED (no av/ffmpeg here): fake duration/frames derive from
    the digest; the row-explosion shape, timestamp spacing, and binary
    frame column are real."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                digest = hashlib.sha256(b).digest()
                fake_duration_ms = 500 + int.from_bytes(digest[:2], "big")
                n = min(max_frames, max(1, fake_duration_ms // every_ms))
                for i in range(n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    # STUB: real path seeks the container and decodes
                    out["frame"].append(digest)
            yield pd.DataFrame(out)

    return kernel


@query("q_multimodal_frame_sample_stub", oracle=None)
def q_multimodal_frame_sample_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling fan-out through mapInPandas (stubbed codec,
    real row-explosion plumbing)."""
    media = media_table(spark, sf)
    return media.mapInPandas(sample_frame_batches(), FRAMES_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, frame_idx long, start_byte long, n_samples long, "
    "energy long, peak long"
)


def audio_feature_batches(frame_bytes: int = 256):
    """mapInPandas kernel factory for audio feature extraction: one
    input row (audio payload) fans out to one row per fixed-size
    analysis frame, with per-frame energy (sum of sample magnitudes)
    and peak.  Only the CODEC is conceptually stubbed (a real pipeline
    would decode mp3/flac to PCM first — no av/soundfile in this
    container); the frame windowing and per-frame reductions below run
    on the actual payload bytes treated as unsigned 8-bit PCM, so the
    features are real, deterministic integer DSP — recomputable by the
    test without Spark.

    Scale shape: a T-second clip yields T*rate/frame_bytes rows of
    fixed width — output size is decoupled from payload size, and the
    Arrow batches bound executor memory exactly like the resize
    kernel."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "start_byte": [],
                "n_samples": [],
                "energy": [],
                "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                # STUB boundary: real path = decode container -> PCM;
                # here the raw bytes ARE the samples.
                for i in range(0, len(b), frame_bytes):
                    frame = b[i : i + frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame_bytes)
                    out["start_byte"].append(i)
                    out["n_samples"].append(len(frame))
                    out["energy"].append(sum(frame))
                    out["peak"].append(max(frame))
            yield pd.DataFrame(out)

    return kernel


@query("q_multimodal_audio_features_stub", oracle=None)
def q_multimodal_audio_features_stub(spark: SparkSession, sf: str) -> DataFrame:
    """Audio feature-extraction fan-out through mapInPandas (stubbed
    codec, real frame windowing + integer reductions), completing the
    decode / feature-extract / resize / frame-sample kernel set."""
    media = media_table(spark, sf)
    return media.mapInPandas(audio_feature_batches(), AUDIO_SCHEMA)
