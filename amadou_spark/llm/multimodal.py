"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features / NotImplementedError
for real codecs). Everything around it — schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested:
swap `_decode_stub` for a PIL/librosa call and the pipeline is
production-shaped.

Scale notes: binary payloads ride in parquet pages; `mapInPandas`
streams Arrow batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads; decode
parallelism == partition count, so `repartition(n)` before decode is
the throughput knob at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),      # image|audio|video
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),     # sha2-256 hex
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media-shaped table from the documents fixture: payload =
    utf-8 bytes of the text (a stand-in for real image/audio bytes),
    metadata derived entirely JVM-side."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("content_hash"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decode: a real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` → resize → pixel features.
    Deterministic fake: first 8 bytes, scaled. Raises for payloads that
    a real codec would reject (empty)."""
    if not payload:
        raise NotImplementedError("real codec required for empty/invalid payloads")
    head = payload[:8].ljust(8, b"\0")
    return [b / 255.0 for b in head]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    The pandas function sees ``Iterator[pd.DataFrame]`` — one Arrow
    batch at a time, never the whole partition — which is what keeps
    memory bounded when payloads are megabytes each."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [_decode_stub(p) for p in pdf["payload"]],
                }
            )

    out = media
    if batch_hint:
        out = out.repartition(batch_hint)
    return out.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx, frame
    payload-slice) rows. The slicing is a deterministic stand-in for
    real frame extraction; the explode shape (one media row → many
    frame rows) is the real contract."""
    n_frames = F.greatest(
        (F.col("meta.n_bytes") / (8 * every_n)).cast("int"), F.lit(1)
    )
    step = 8 * every_n
    return (
        media.select(
            "doc_id",
            "payload",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.expr(f"substring(payload, 1 + frame_idx * {step}, 8)").alias("frame_bytes"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
    ]
)


def resize_stub(media: DataFrame, factor: int = 4) -> DataFrame:
    """STUB resize: a real implementation decodes, resizes (e.g.
    PIL.Image.resize), and re-encodes. Deterministic fake: keep every
    ``factor``-th byte of the payload — preserving the real contract
    (binary in → smaller binary out + size metadata) and the real
    batching (mapInPandas, Arrow)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            resized = [p[::factor] for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "n_bytes_in": [len(p) for p in payloads],
                    "n_bytes_out": [len(r) for r in resized],
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)
