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
