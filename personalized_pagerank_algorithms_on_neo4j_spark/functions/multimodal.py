"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(NotImplementedError or a deterministic fake) — but every Spark-side piece a
100 TB pipeline needs is real and tested: the schema, the Arrow-batched
`mapInPandas` plumbing, the batch shapes, and the partitioning strategy
(media blobs are large -> repartition by id before the decode stage so a
single straggler file can't skew a partition).

Swap `_decode_image_stub` for a real `PIL.Image.open` (etc.) on a cluster
with codecs installed; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA table from the documents fixture (payload =
    utf-8 bytes) — a deterministic stand-in for real blobs in tests."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Real decode needs an image codec — not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; install codecs and replace this stub"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature extractor: md5-seeded pseudo-embedding.
    Keeps the downstream plumbing (schema, shapes, joins) fully exercisable."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.md5(payload).digest()
    raw = [h[i % 16] ^ (i * 37 % 251) for i in range(dim)]
    return [round(b / 255.0 - 0.5, 6) for b in raw]


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, kind, features array<double>, n_bytes) via Arrow-batched
    mapInPandas — the real-codec version only swaps the per-row function."""
    schema = (
        "media_id long, kind string, features array<double>, n_bytes long"
    )

    # NOTE: the batch function must be fully self-contained (no references to
    # module-level names) — cloudpickle ships nested closures by value, but
    # module-level functions by *reference*, which breaks on executors whose
    # Python workers don't have this package importable.
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def feats(payload):
            if payload is None:
                return [0.0] * dim
            h = _hl.md5(bytes(payload)).digest()
            raw = [h[i % 16] ^ (i * 37 % 251) for i in range(dim)]
            return [round(b / 255.0 - 0.5, 6) for b in raw]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(feats),
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                }
            )

    shuffle_n = int(media.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return media.repartition(shuffle_n, "media_id").mapInPandas(op, schema=schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode a (media_id, frame_ts_ms) plan
    from the duration metadata. The decode of each frame is the stubbed step;
    the explode/partition shape is the real scale concern (a 2h video at 1fps
    is 7200 rows — explode BEFORE decode so frames parallelize)."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning from metadata (scale factor per row); the pixel work is
    the stubbed decode stage."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.where(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )
