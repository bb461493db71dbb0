"""Multimodal column handling: opaque binary payloads + typed metadata.

Charter extension. Media (image/audio/video) is modeled as a `binary`
column plus a metadata struct; heavy per-item work (decode, feature
extraction, resize, frame sampling) runs as Arrow-batched pandas
iterators via `mapInPandas` — the sanctioned Python path, ~10-100× faster
than row-at-a-time UDFs and memory-bounded by the Arrow batch size.

The codec layer (PIL/ffmpeg/librosa) is NOT available in this container,
so `decode_media` raises NotImplementedError unless the deterministic
fake decoder is requested — the Spark-side plumbing (schema, partition
flow, UDF signature, batch shape) is real and tested either way.

Scale posture: payload bytes never pass through a shuffle — all
extraction is a narrow map over the scan; only the (tiny) extracted
features are aggregated/joined downstream. Partition sizing is governed
by `spark.sql.files.maxPartitionBytes` on the payload files.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)


def as_media(
    df: DataFrame, id_col: str, payload_col: str, mime: str, source_col: str
) -> DataFrame:
    """Wrap an id + binary column into the canonical media frame."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.col(source_col).alias("source"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str, fake: bool = False) -> dict[str, Any]:
    """Decode one media payload.

    REAL stdlib codecs back two formats (functions/codecs.py): image/png
    (full zlib+filter decode) and audio/wav (PCM via `wave`) — for those,
    the returned width/height/channels/duration/mean_intensity are actual
    decoded values. Other formats need PIL/ffmpeg (absent here) and raise
    NotImplementedError. `fake=True` yields the deterministic digest-based
    stand-in for formats without a codec, keeping plumbing testable."""
    if fake:
        d = hashlib.md5(payload or b"").digest()
        return {
            "width": 1 + d[0] % 64,
            "height": 1 + d[1] % 64,
            "channels": 3,
            "mean_intensity": d[2] / 255.0,
            "duration_ms": None,
        }
    from ..functions import codecs

    if mime == "image/png":
        img = codecs.decode_png(payload)
        return {
            "width": img["width"],
            "height": img["height"],
            "channels": img["channels"],
            "mean_intensity": img["mean_intensity"],
            "duration_ms": None,
        }
    if mime in ("audio/wav", "audio/x-wav"):
        au = codecs.decode_wav(payload)
        return {
            "width": None,
            "height": None,
            "channels": au["channels"],
            "mean_intensity": au["mean_intensity"],
            "duration_ms": au["duration_ms"],
        }
    if mime in ("image/jpeg", "image/jpg"):
        # full pixel decode for the supported profile (baseline —
        # interleaved AND non-interleaved scans — plus progressive
        # Huffman, 4:4:4/4:2:2/4:2:0 subsampling, restart intervals,
        # EXIF orientation — functions/jpeg_codec.py);
        # detect-and-degrade to the SOF header walk for header-only
        # artifacts and the still-unsupported profiles (12-bit,
        # hierarchical, arithmetic coding). Genuinely corrupt bytes
        # still raise ValueError so the quarantine channel keeps
        # routing them.
        from ..functions import jpeg_codec

        try:
            img = jpeg_codec.decode_jpeg(payload)
            return {
                "width": img["width"],
                "height": img["height"],
                "channels": img["channels"],
                "mean_intensity": img["mean_intensity"],
                "duration_ms": None,
            }
        except (jpeg_codec.NoScanData, NotImplementedError):
            pass
        w, h, ncomp = codecs.jpeg_info(payload)
        return {
            "width": w,
            "height": h,
            "channels": ncomp,
            "mean_intensity": None,
            "duration_ms": None,
        }
    if mime == "image/gif":
        # full first-frame decode (palette + GIF-LZW, functions/codecs.py
        # r10); animation frames beyond the first are length-walked only
        img = codecs.decode_gif(payload)
        return {
            "width": img["width"],
            "height": img["height"],
            "channels": img["channels"],
            "mean_intensity": img["mean_intensity"],
            "duration_ms": None,
        }
    if mime == "image/webp":
        # full VP8L lossless decode (functions/webp_codec.py, r10);
        # lossy VP8 raises NotImplementedError inside decode_webp →
        # degrade to the container-header walk (dims only), same
        # two-tier contract as unsupported JPEG profiles.
        from ..functions import webp_codec

        try:
            img = webp_codec.decode_webp(payload)
            return {
                "width": img["width"],
                "height": img["height"],
                "channels": img["channels"],
                "mean_intensity": img["mean_intensity"],
                "duration_ms": None,
            }
        except NotImplementedError:
            pass
        info = webp_codec.webp_info(payload)
        return {
            "width": info["width"],
            "height": info["height"],
            "channels": None,
            "mean_intensity": None,
            "duration_ms": None,
        }
    if mime in ("audio/mpeg", "audio/mp3"):
        # frame-header walk: real channels/duration, no entropy decode
        au = codecs.mp3_info(payload)
        return {
            "width": None,
            "height": None,
            "channels": au["channels"],
            "mean_intensity": None,
            "duration_ms": au["duration_ms"],
        }
    if mime == "video/mp4":
        # moov box walk: real dimensions + duration, no sample decode
        vi = codecs.mp4_info(payload)
        return {
            "width": vi["width"],
            "height": vi["height"],
            "channels": None,
            "mean_intensity": None,
            "duration_ms": vi["duration_ms"],
        }
    if mime in ("video/y4m", "video/x-yuv4mpeg"):
        # FULL raw-frame decode (r5): dimensions, frame count/duration
        # and pixel-level mean luma over sampled frames —
        # functions/codecs.py::decode_y4m. Unsupported colorspaces /
        # interlace raise NotImplementedError (degrade); malformed bytes
        # ValueError (quarantine), same contract as the other codecs.
        vi = codecs.decode_y4m(payload, sample_every=1)
        return {
            "width": vi["width"],
            "height": vi["height"],
            "channels": vi["channels"],
            "mean_intensity": vi["mean_intensity"],
            "duration_ms": vi["duration_ms"],
        }
    raise NotImplementedError(
        f"no codec for {mime} in this environment (stdlib codecs cover "
        "image/png, audio/wav and video/y4m fully; image/jpeg baseline+"
        "progressive; audio/mpeg and video/mp4 header-only) — pass "
        "fake=True for the deterministic stub decoder"
    )


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Cheap per-item features via mapInPandas (Arrow batches): byte length
    and content digest. The iterator shape keeps peak memory at one Arrow
    batch regardless of corpus size."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)

#: decode_features(on_error="quarantine") schema: features + a per-row
#: error column (NULL for successfully decoded rows).
DECODED_Q_SCHEMA = T.StructType(
    list(DECODED_SCHEMA.fields) + [T.StructField("error", T.StringType())]
)

_NULL_FEATURES: dict[str, Any] = {
    "width": None,
    "height": None,
    "channels": None,
    "duration_ms": None,
    "mean_intensity": None,
}


def decode_features(
    media: DataFrame, fake: bool = False, on_error: str = "raise"
) -> DataFrame:
    """Per-item decode via mapInPandas: each row decoded with the codec
    for ITS meta.mime (real stdlib codecs for image/png and audio/wav;
    `fake=True` for formats without one). The plan is a narrow map over
    the scan — payloads never shuffle; only the small feature rows do.

    ``on_error='quarantine'`` mirrors the reference's rejected-rows side
    channel (/root/reference/dataflow/BookingDataTransformation.json:31-34)
    at the media layer: a corrupt or unsupported payload becomes a row
    with NULL features and a non-null ``error`` column instead of failing
    the whole task — at 100 TB one truncated JPEG must not kill a
    multi-hour stage. Catches the codec contract errors only (ValueError
    for malformed payloads, NotImplementedError for formats without a
    codec); genuine bugs still raise. Pair with
    :func:`split_quarantine` for the two-stream shape."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    quarantine = on_error == "quarantine"

    def _decode_row(b, m) -> dict[str, Any]:
        if not quarantine:
            return {**decode_media(b, m, fake=fake), "error": None}
        try:
            return {**decode_media(b, m, fake=fake), "error": None}
        except (ValueError, NotImplementedError) as e:
            return {**_NULL_FEATURES, "error": f"{type(e).__name__}: {e}"}

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_row(b, m) for b, m in zip(pdf["payload"], pdf["mime"])
            ]
            out = {
                "media_id": pdf["media_id"],
                "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                "height": pd.array([r["height"] for r in rows], dtype="Int32"),
                "channels": pd.array(
                    [r["channels"] for r in rows], dtype="Int32"
                ),
                "duration_ms": pd.array(
                    [r["duration_ms"] for r in rows], dtype="Int64"
                ),
                "mean_intensity": [r["mean_intensity"] for r in rows],
            }
            if quarantine:
                out["error"] = [r["error"] for r in rows]
            yield pd.DataFrame(out)

    slim = media.select("media_id", "payload", F.col("meta.mime").alias("mime"))
    return slim.mapInPandas(
        _decode, DECODED_Q_SCHEMA if quarantine else DECODED_SCHEMA
    )


def split_quarantine(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) from a ``decode_features(on_error='quarantine')``
    frame — the media-layer analog of the reference's conditional-split →
    rejected-rows sink (SURVEY §2 S9): good rows drop the error column,
    quarantined rows keep it for the side-channel sink."""
    good = decoded.filter(F.col("error").isNull()).drop("error")
    bad = decoded.filter(F.col("error").isNotNull())
    return good, bad


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing (video → frame rows): each payload fans out
    to ceil(duration/every_ms) synthetic frame records. Real decoder would
    emit actual frame bytes; the flatMap shape (1 → N rows inside
    mapInPandas) is what matters for the plan."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_digest": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError("no video codec in this environment")
                n = 1 + (len(payload or b"") % 4)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_digest"].append(
                        hashlib.md5((payload or b"") + bytes([i])).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(_frames, schema)


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize: payload -> resized payload + updated meta. image/png rows
    run the REAL stdlib decode→nearest-neighbor→re-encode path
    (functions/codecs.py); other mimes need PIL/ffmpeg and must use
    `fake=True` (digest stand-in). The Spark plan — narrow mapInPandas,
    meta struct rebuild, payload stays executor-side — is identical
    either way."""

    def _resize_one(payload: bytes, mime: str) -> bytes:
        if fake:
            # deterministic stand-in: digest-seeded bytes of the target
            # size's signature
            d = hashlib.md5(
                (payload or b"") + f"{width}x{height}".encode()
            ).digest()
            return d * 4
        if mime == "image/png":
            from ..functions.codecs import resize_png

            return resize_png(payload, width, height)
        raise NotImplementedError(
            f"no resize codec for {mime} — pass fake=True for the stub"
        )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _resize_one(b, (m if isinstance(m, dict) else m.asDict())["mime"])
                for b, m in zip(pdf["payload"], pdf["meta"])
            ]
            out["meta"] = out["meta"].map(
                lambda m: {**(m if isinstance(m, dict) else m.asDict()),
                           "width": width, "height": height}
            )
            yield out

    return media.mapInPandas(_resize, media.schema)
