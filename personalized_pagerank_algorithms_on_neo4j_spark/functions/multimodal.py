"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode is REAL for the uncompressed formats that need no codec library:
netpbm images (P5 grayscale / P6 RGB, 8- and 16-bit) via a pure-numpy
parser, and RIFF/WAVE PCM audio via the stdlib ``wave`` module. Compressed
formats (JPEG/PNG/MP3/...) raise NotImplementedError — this container has
no codec libs, and pretending otherwise would be worse than the honest
boundary. Every Spark-side piece a 100 TB pipeline needs is real and
tested either way: the schema, the Arrow-batched `mapInPandas` plumbing,
the batch shapes, and the partitioning strategy (media blobs are large ->
repartition by id before the decode stage so a single straggler file
can't skew a partition).

Swap `decode_image` for `PIL.Image.open` (etc.) on a cluster with codecs
installed; nothing else changes.
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


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an uncompressed netpbm image with pure numpy.

    P5 (grayscale) -> (h, w) array; P6 (RGB) -> (h, w, 3). 8-bit payloads
    decode to uint8, 16-bit (maxval > 255, big-endian per spec) to uint16.
    Anything else — i.e. every format that needs an actual codec — raises
    NotImplementedError, the honest boundary in a codec-free container."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    payload = bytes(payload)
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(
            f"only netpbm P5/P6 decode without a codec library (got {magic!r}); "
            "install PIL/opencv and replace decode_image for compressed formats"
        )
    # header: magic, width, height, maxval — tokens separated by whitespace,
    # '#' starts a comment running to end of line
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    pos += 1  # single whitespace byte after maxval, then raster data
    width, height, maxval = tokens
    channels = 3 if magic == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    count = width * height * channels
    data = np.frombuffer(payload, dtype=dtype, count=count, offset=pos)
    shape = (height, width, 3) if channels == 3 else (height, width)
    return data.reshape(shape)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM audio with the stdlib ``wave`` module (no codec
    needed for PCM). Returns ((n_frames, n_channels) int16 array, rate).
    Compressed audio raises through ``wave``'s format error."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload))) as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    elif width == 1:  # 8-bit WAV is unsigned; center it
        arr = (np.frombuffer(raw, dtype="u1").astype(np.int16) - 128) * 256
    else:
        raise NotImplementedError(f"PCM sample width {width} not supported")
    return arr.reshape(-1, channels), rate


def image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic real features from a decoded image: per-channel mean
    and std (scaled to [0, 1]) followed by an (dim - 2*channels)-bin
    luminance histogram — fixed length regardless of image size."""
    arr = img.astype(np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    peak = float(arr.max()) or 1.0
    arr = arr / peak
    feats: list[float] = []
    for c in range(arr.shape[2]):
        feats.append(float(arr[:, :, c].mean()))
        feats.append(float(arr[:, :, c].std()))
    lum = arr.mean(axis=2)
    n_bins = max(dim - len(feats), 1)
    hist, _ = np.histogram(lum, bins=n_bins, range=(0.0, 1.0))
    feats.extend((hist / max(lum.size, 1)).tolist())
    return [round(f, 6) for f in feats[:dim]] + [0.0] * max(dim - len(feats), 0)


def audio_features(
    samples: np.ndarray, rate: int, dim: int = FEATURE_DIM
) -> list[float]:
    """Deterministic real features from PCM samples: RMS level,
    zero-crossing rate, then log-energies of (dim - 2) equal FFT bands."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    if mono.size == 0:
        return [0.0] * dim
    rms = float(np.sqrt((mono**2).mean()))
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if mono.size > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono)) ** 2
    n_bands = max(dim - 2, 1)
    bands = [
        float(np.log1p(chunk.sum()))
        for chunk in np.array_split(spec, n_bands)
    ]
    feats = [rms, zcr, *bands]
    return [round(f, 6) for f in feats[:dim]] + [0.0] * max(dim - len(feats), 0)


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


def extract_decoded_features(
    media: DataFrame, dim: int = FEATURE_DIM, on_error: str = "null"
) -> DataFrame:
    """(media_id, kind, features, n_bytes, decode_ok): REAL decode +
    feature extraction for payloads in the codec-free formats
    (netpbm images, PCM WAV), dispatched by the mime column.

    ``on_error='null'`` (default) tags undecodable rows decode_ok=false
    with null features instead of raising — at 100 TB one corrupt blob
    must not kill the stage; ``on_error='raise'`` propagates for strict
    runs. Same repartition-by-id shape as `extract_features`."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    schema = (
        "media_id long, kind string, features array<double>, "
        "n_bytes long, decode_ok boolean"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from personalized_pagerank_algorithms_on_neo4j_spark.functions import (
            multimodal as _mm,
        )

        def one(payload, mime):
            if payload is None:
                return None
            mime = (mime or "").lower()
            if mime in ("image/x-portable-graymap", "image/x-portable-pixmap"):
                return _mm.image_features(_mm.decode_image(payload), dim)
            if mime in ("audio/wav", "audio/x-wav"):
                return _mm.audio_features(*_mm.decode_audio(payload), dim=dim)
            raise NotImplementedError(f"no codec-free decoder for {mime!r}")

        for pdf in batches:
            feats, ok = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                try:
                    f = one(payload, mime)
                except Exception:
                    if on_error == "raise":
                        raise
                    f = None
                feats.append(f)
                ok.append(f is not None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "decode_ok": ok,
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
