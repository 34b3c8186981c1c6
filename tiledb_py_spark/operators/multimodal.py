"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (or ``NotImplementedError`` when
``strict=True``) — but all Spark-side plumbing is real and tested:
schemas, batch iteration, UDF signatures, partition sizing.  Swapping the
fake for Pillow/torchaudio is a one-function change inside the UDF.

This corresponds to the reference's Filestore (blobs stored in arrays,
``/root/reference/tiledb/filestore.py:9-151``) generalized to the
training-pipeline shape: ``spark.read.format("binaryFile")`` ingestion +
per-batch Python feature extraction.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("content", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("feat_dim", T.IntegerType(), True),
])


def ingest_binary_files(spark, path: str, kind: str = "image") -> DataFrame:
    """Directory of files -> media table via the binaryFile source."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _content_seed(content: bytes) -> int:
    # md5, not hash(): Python's bytes hash is salted per-process, which
    # would make results differ across executors.  First 8 hex chars =
    # 32-bit seed, reproducible in any SQL engine via substr(md5(x),1,8).
    import hashlib

    return int(hashlib.md5(content).hexdigest()[:8], 16)


# Knuth multiplicative-hash constant; seed + C*(j+1) stays under 2^63 for
# any 32-bit seed and j < ~3.4e9, so the arithmetic is BIGINT-safe in SQL.
_PIX_MULT = 2654435761


def _fake_decode_image(content: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """STUB: deterministic fake decode — a real build replaces this with
    PIL.Image.open(BytesIO(content)).  Produces a pseudo-image whose pixels
    are a hash-seeded deterministic function of the bytes, chosen to be
    reproducible in plain SQL (md5 seed + integer sequence, exact
    power-of-two division): pixel j = ((seed + C*(j+1)) mod 2^31) / 2^31."""
    seed = _content_seed(content)
    j = np.arange(out_hw[0] * out_hw[1] * 3, dtype=np.int64)
    vals = ((seed + _PIX_MULT * (j + 1)) % (1 << 31)) / float(1 << 31)
    return vals.astype(np.float32).reshape(out_hw[0], out_hw[1], 3)


def extract_image_features(df: DataFrame, feat_dim: int = 64,
                           resize_hw: tuple[int, int] = (32, 32),
                           strict: bool = False,
                           decode_fn=None) -> DataFrame:
    """decode -> resize -> pooled feature vector, Arrow-batched.

    ``decode_fn(content: bytes, out_hw: (h, w)) -> np.ndarray[h, w, 3]``
    is the decoder; it defaults to the deterministic fake above.  Pass a
    real one (e.g. wrapping ``PIL.Image.open``) to run actual decode —
    the Spark plumbing is identical either way.

    Partition note: mapInPandas streams Arrow record batches, so executor
    memory is bounded by batch size (spark.sql.execution.arrow.
    maxRecordsPerBatch), not partition size — the right shape for binary
    blobs of MBs each."""
    decode = decode_fn or _fake_decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict and decode_fn is None:
            raise NotImplementedError(
                "image decode requires an imaging library not present in this container")
        for pdf in it:
            feats = []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    continue
                img = np.asarray(decode(bytes(content), resize_hw))
                # contract check: a decoder returning the wrong shape
                # would otherwise silently yield truncated features
                if img.shape != (resize_hw[0], resize_hw[1], 3):
                    raise ValueError(
                        f"decode_fn returned shape {img.shape}, expected "
                        f"{(resize_hw[0], resize_hw[1], 3)}")
                if img.dtype == np.uint8:  # normalize integer decoders
                    img = img.astype("float32") / 255.0
                pooled = img.reshape(-1)[:feat_dim].astype("float32")
                if pooled.size < feat_dim:
                    pooled = np.pad(pooled, (0, feat_dim - pooled.size))
                feats.append(pooled.tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": feats,
                "feat_dim": feat_dim,
            })

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        strict: bool = False) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame timestamp.
    The frame decode is stubbed; timestamps come from duration metadata,
    so the explode is real Spark (no Python)."""
    if strict:
        raise NotImplementedError("video decode requires codecs not present here")
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn(
        "frame_id", F.xxhash64(F.col("media_id"), F.col("frame_ts_ms")))


def _fake_decode_audio(content: bytes) -> np.ndarray:
    """STUB: deterministic fake PCM decode — a real build replaces this
    with e.g. soundfile/torchaudio.  Returns float32 samples."""
    rng = np.random.default_rng(_content_seed(content))
    return rng.standard_normal(1024).astype("float32")


def audio_stats(df: DataFrame, strict: bool = False,
                decode_fn=None) -> DataFrame:
    """Audio feature plumbing over mapInPandas.

    ``decode_fn(content: bytes) -> np.ndarray`` of float32 PCM samples;
    defaults to the deterministic fake above."""
    decode = decode_fn or _fake_decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict and decode_fn is None:
            raise NotImplementedError("audio decode requires codecs not present here")
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    rows.append((mid, None, None))
                    continue
                pcm = np.asarray(decode(bytes(content)), dtype="float32")
                # true RMS sqrt(mean(x^2)), NOT std() — they differ for
                # any signal with a DC offset
                rows.append((mid, float(np.abs(pcm).mean()),
                             float(np.sqrt(np.mean(pcm.astype("float64") ** 2)))))
            out = pd.DataFrame(rows, columns=["media_id", "mean_amplitude", "rms"])
            yield out

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_amplitude", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ])
    return df.filter(F.col("kind") == "audio").mapInPandas(batches, schema=schema)
