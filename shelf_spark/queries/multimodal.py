"""Multimodal-column operators (BASELINE north star §2.4).

Pattern: media (image/audio/video) travels as an opaque ``binary`` column
with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched Pandas functions over ``mapInPandas``. The real codec
libraries aren't in this container, so the *decode* is a clearly marked
deterministic stub — but the Spark plumbing (binary schema, Arrow batch
transfer, UDF signature, partition behavior) is real and oracle-checked:
the stub derives metadata from the bytes deterministically, so DuckDB can
verify the full path.

At scale: mapInPandas streams Arrow batches (spark.sql.execution.arrow.
maxRecordsPerBatch) so one task never materializes a partition of media
blobs; pair with small files → maxPartitionBytes tuning for real media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

_DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_hash string, "
    "fake_width bigint, fake_height bigint, n_frames bigint"
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic pseudo-metadata from the raw bytes.

    A real deployment plugs Pillow/torchaudio/PyAV in here; the container
    has none of them, so we derive (width, height, frames) from byte
    length — keeping every downstream shape real and testable.
    """
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        dims = [_decode_stub(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in payloads],
                "content_hash": [hashlib.sha256(p).hexdigest() for p in payloads],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
            }
        )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)       AS n_bytes,
           sha256(text)                                     AS content_hash,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT)       AS fake_width,
           CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS fake_height,
           CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT)        AS n_frames
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # documents.text encoded to a BinaryType payload stands in for media
    # bytes; mapInPandas(+Arrow) carries it to Python, the stub "decodes",
    # and DuckDB independently recomputes the metadata from the same bytes.
    d = spark.table("documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return d.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


@query(
    "multimodal_filter_resize",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS w,
             CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS h
      FROM documents
    )
    SELECT doc_id, n_bytes, w, h,
           CAST(least(w, 224) AS BIGINT) AS out_w,
           CAST(least(h, 224) AS BIGINT) AS out_h,
           round(CAST(w AS DOUBLE) / h, 6) AS aspect
    FROM meta
    WHERE n_bytes >= 200
    """,
)
def multimodal_filter_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Typical media pipeline stage: filter on metadata, compute resize
    # targets JVM-side (the actual pixel resample would live in the same
    # mapInPandas stage as the decode stub).
    d = spark.table("documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    meta = d.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        (F.length("payload") % 640 + 1).cast("long").alias("w"),
        ((F.length("payload") * 7) % 480 + 1).cast("long").alias("h"),
    )
    return meta.filter(F.col("n_bytes") >= 200).select(
        "doc_id",
        "n_bytes",
        "w",
        "h",
        F.least(F.col("w"), F.lit(224)).cast("long").alias("out_w"),
        F.least(F.col("h"), F.lit(224)).cast("long").alias("out_h"),
        F.round(F.col("w").cast("double") / F.col("h"), 6).alias("aspect"),
    )
