"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque `binary` columns travelling next to typed
metadata (media_type, n_bytes, digest). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched `mapInPandas` stages so each
executor processes whole record batches without per-row Python overhead —
the pattern a real pipeline uses with PIL/ffmpeg on the executors.

Codec strategy: each stage probes its codec library at STAGE-BUILD time
(on the driver) behind an optional import — pillow for images, PyAV for
video demux. When the library is present the real path runs inside the
same Arrow-batched mapInPandas stage; when absent (as in this container,
where PIL/ffmpeg do not exist) the stage raises NotImplementedError with
install guidance unless the deterministic fake path is requested
(`fake_features=True` / `fake=True`), which derives payload-md5-seeded
outputs so the schema, batching, and partitioning behavior stay fully
real, testable, and SQL-oracle-reproducible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd


def _pil_image():
    """Optional pillow import, resolved once per stage build (driver side;
    executors re-import inside the UDF)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _pyav():
    """Optional PyAV import (ffmpeg bindings) for video demux."""
    try:
        import av
        return av
    except ImportError:
        return None

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

    Real image decode runs when pillow is importable: feat0/feat1 are the
    decoded width/height and feat2/feat3 the grayscale mean/stddev in
    [0,1] — deterministic functions of the pixels, engine-independent.
    Without pillow (this container) the stage raises NotImplementedError
    unless fake_features=True, which derives 4 deterministic doubles from
    the payload digest — identical Arrow batch path, schema contract, and
    partitioning either way.
    """
    use_real = not fake_features and _pil_image() is not None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _pil_image() if use_real else None
        for pdf in it:
            if not fake_features and Image is None:
                raise NotImplementedError(
                    "media codecs not available (pip install pillow for "
                    "images); run with fake_features=True for the "
                    "deterministic stub"
                )
            feats = {f"feat{i}": [] for i in range(4)}
            digests = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                digest = hashlib.md5(raw).hexdigest()
                digests.append(digest)
                if Image is not None:
                    img = Image.open(io.BytesIO(raw)).convert("L")
                    px = list(img.getdata())
                    n = max(len(px), 1)
                    mean = sum(px) / n / 255.0
                    var = sum((p / 255.0 - mean) ** 2 for p in px) / n
                    feats["feat0"].append(float(img.width))
                    feats["feat1"].append(float(img.height))
                    feats["feat2"].append(mean)
                    feats["feat3"].append(var ** 0.5)
                else:
                    for i in range(4):
                        # 4 doubles from successive 8-hex-digit md5
                        # windows, scaled to [0,1).
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

    Real decode+resample runs when pillow is importable: the payload is
    decoded, resized with bilinear resampling, and re-emitted as raw RGB
    bytes (`tobytes()` — deterministic, no encoder entropy). Without
    pillow the stage raises NotImplementedError unless fake=True, which
    emits a deterministic payload (md5-seeded bytes, length width*height)
    so the Arrow batch path, schema contract, and size accounting stay
    real and testable.
    """
    use_real = not fake and _pil_image() is not None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _pil_image() if use_real else None
        for pdf in it:
            if not fake and Image is None:
                raise NotImplementedError(
                    "image codecs not available (pip install pillow); "
                    "run with fake=True for the deterministic stub"
                )
            if Image is not None:
                payloads, digests = [], []
                for payload in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(payload)))
                    buf = img.resize((width, height),
                                     Image.BILINEAR).convert("RGB").tobytes()
                    payloads.append(buf)
                    digests.append(hashlib.md5(buf).hexdigest())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "media_type": pdf["media_type"],
                        "payload": payloads,
                        "n_bytes": pd.Series([len(p) for p in payloads],
                                             dtype="int64"),
                        "digest": digests,
                        "width": pd.Series([width] * len(pdf), dtype="int64"),
                        "height": pd.Series([height] * len(pdf), dtype="int64"),
                    }
                )
                continue
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

    Real demux runs when PyAV (ffmpeg bindings) is importable: frames are
    decoded at frame_ms intervals and emitted as raw RGB bytes. Without
    PyAV the stage raises NotImplementedError unless fake=True, where
    each frame payload derives deterministically from (digest, frame_idx).
    """
    use_real = not fake and _pyav() is not None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        av = _pyav() if use_real else None
        for pdf in it:
            if not fake and av is None:
                raise NotImplementedError(
                    "video demux not available (pip install av for the "
                    "ffmpeg bindings); run with fake=True for the "
                    "deterministic stub"
                )
            if av is not None:
                rows = {k: [] for k in ("media_id", "frame_idx",
                                        "frame_ts_ms", "payload", "digest")}
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    with av.open(io.BytesIO(bytes(payload))) as container:
                        stream = container.streams.video[0]
                        step = frame_ms / 1000.0
                        next_t, idx = 0.0, 0
                        for frame in container.decode(stream):
                            if idx >= n_frames:
                                break
                            t = float(frame.pts * stream.time_base) \
                                if frame.pts is not None else next_t
                            if t + 1e-9 < next_t:
                                continue
                            buf = frame.to_ndarray(
                                format="rgb24").tobytes()
                            rows["media_id"].append(mid)
                            rows["frame_idx"].append(idx)
                            rows["frame_ts_ms"].append(int(t * 1000))
                            rows["payload"].append(buf)
                            rows["digest"].append(
                                hashlib.md5(buf).hexdigest())
                            idx += 1
                            next_t += step
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(rows["media_id"],
                                              dtype="int64"),
                        "frame_idx": pd.Series(rows["frame_idx"],
                                               dtype="int64"),
                        "frame_ts_ms": pd.Series(rows["frame_ts_ms"],
                                                 dtype="int64"),
                        "payload": rows["payload"],
                        "digest": rows["digest"],
                    }
                )
                continue
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
