"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque `binary` columns travelling next to typed
metadata (media_type, n_bytes, digest). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched `mapInPandas` stages so each
executor processes whole record batches without per-row Python overhead —
the pattern a real pipeline uses with PIL/ffmpeg on the executors.

The actual codecs are NOT available in this environment, so `decode_media`
is a clearly marked stub: it raises NotImplementedError unless
`fake_features=True`, in which case it derives deterministic pseudo-features
from the payload's md5 (keeping the Spark-side schema, batching, and
partitioning behavior fully real and testable).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("feat0", DoubleType()),
        StructField("feat1", DoubleType()),
        StructField("feat2", DoubleType()),
        StructField("feat3", DoubleType()),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_col: str,
                 media_type: str = "text/plain") -> DataFrame:
    """Wrap an existing column as an opaque media payload with typed
    metadata — the canonical envelope a media lakehouse table uses."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def decode_media(df: DataFrame, fake_features: bool = False) -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors via mapInPandas.

    Real decode (PIL/librosa/ffmpeg) is unavailable in this container —
    stubbed behind NotImplementedError. With fake_features=True the stage
    derives 4 deterministic doubles from the payload digest, exercising the
    identical Arrow batch path, schema contract, and partitioning.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_features:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) not available in this environment; "
                    "run with fake_features=True for the deterministic stub"
                )
            feats = {f"feat{i}": [] for i in range(4)}
            digests = []
            for payload in pdf["payload"]:
                digest = hashlib.md5(bytes(payload)).hexdigest()
                digests.append(digest)
                for i in range(4):
                    # 4 doubles from successive 8-hex-digit md5 windows, scaled to [0,1).
                    feats[f"feat{i}"].append(
                        int(digest[i * 8:(i + 1) * 8], 16) / float(1 << 32)
                    )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "digest": digests,
                    **{k: pd.Series(v, dtype="float64") for k, v in feats.items()},
                }
            )
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("payload", BinaryType()),
        StructField("digest", StringType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int,
                  fake: bool = False) -> DataFrame:
    """Resize image payloads to width×height via mapInPandas (1 row in →
    1 row out, payload replaced, metadata updated).

    Real decode+resample (PIL) is unavailable here — stubbed behind
    NotImplementedError. With fake=True the stage emits a deterministic
    payload (md5-seeded bytes, length width*height) so the Arrow batch
    path, schema contract, and size accounting stay real and testable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image codecs (PIL) not available in this environment; "
                    "run with fake=True for the deterministic stub"
                )
            payloads, digests = [], []
            for payload in pdf["payload"]:
                seed = hashlib.md5(bytes(payload)).hexdigest()
                # deterministic pseudo-pixels: repeat the md5 hex digest to
                # the target byte size (hex-string form, not raw bytes, so
                # an external SQL oracle can reproduce the digest chain —
                # substring(repeat(md5(payload), ...)) — bit-for-bit)
                buf = (
                    seed * (width * height // len(seed) + 1)
                )[: width * height].encode("ascii")
                payloads.append(buf)
                digests.append(hashlib.md5(buf).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "digest": digests,
                    "width": pd.Series([width] * len(pdf), dtype="int64"),
                    "height": pd.Series([height] * len(pdf), dtype="int64"),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, frame_ms: int = 1000,
                  fake: bool = False) -> DataFrame:
    """Sample n_frames frames per video payload via mapInPandas — the 1→N
    batch shape (each input row explodes into frame rows).

    Real demux (ffmpeg) is unavailable here — stubbed behind
    NotImplementedError. With fake=True each frame payload derives
    deterministically from (digest, frame_idx).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video demux (ffmpeg) not available in this environment; "
                    "run with fake=True for the deterministic stub"
                )
            rows = {k: [] for k in ("media_id", "frame_idx", "frame_ts_ms",
                                    "payload", "digest")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                base = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(n_frames):
                    # frame payload is the hex digest of (base, idx) — hex
                    # form so the digest chain is SQL-reproducible:
                    # md5(md5(payload) || ':' || idx)
                    frame = hashlib.md5(f"{base}:{i}".encode()).hexdigest().encode("ascii")
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * frame_ms)
                    rows["payload"].append(frame)
                    rows["digest"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int64"),
                    "frame_ts_ms": pd.Series(rows["frame_ts_ms"], dtype="int64"),
                    "payload": rows["payload"],
                    "digest": rows["digest"],
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)
