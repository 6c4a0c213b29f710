"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample operators.

The Spark-side plumbing (schemas, partition strategy, Arrow UDF
signatures, batch shapes) is real and tested. Real codecs are GUARDED
OPTIONAL imports: with ``deterministic_fake=False`` each operator
imports PIL / cv2 and runs a real decode kernel where those exist, and
raises a clear NotImplementedError where they don't (this sandbox has
neither). ``deterministic_fake=True`` (default) uses seeded reproducible
pseudo-decodes keyed on the payload hash — the test/oracle path. Every
DataFrame contract is identical across the two paths.

Scale notes: media blobs are the widest column by far — every operator
here prunes to (id, payload) before the Python stage, emits fixed-width
features (never re-emits the blob), and processes per Arrow batch so
executor memory is bounded by ``maxRecordsPerBatch x blob size``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), False),  # png | wav | mp4 | ...
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_png", BinaryType(), False),
    ]
)


def _fake_bytes(payload: bytes, n: int, salt: str) -> np.ndarray:
    """Deterministic pseudo-decode: seeded on sha1(payload || salt)."""
    seed = int.from_bytes(hashlib.sha1(payload + salt.encode()).digest()[:4], "big")
    return np.random.RandomState(seed).randint(0, 256, size=n, dtype=np.uint8)


def _optional(module: str):
    """Guarded optional import for real codecs: the operators light up
    where PIL/opencv exist and degrade to a clear NotImplementedError
    where they don't (this sandbox), without touching any caller."""
    import importlib

    try:
        return importlib.import_module(module)
    except Exception:
        return None


def _require_codec(module: str, what: str):
    mod = _optional(module)
    if mod is None:
        raise NotImplementedError(
            f"real {what} requires {module} (not importable in this "
            f"environment); install it or use deterministic_fake=True"
        )
    return mod


def decode_image_features(
    media: DataFrame, dim: int = 64, deterministic_fake: bool = True
) -> DataFrame:
    """binary payload -> (width, height, embedding[dim]).

    Batch shape: one Arrow batch in, one fixed-width feature frame out —
    the blob column never leaves the Python worker.
    """
    if not deterministic_fake:
        _require_codec("PIL.Image", "image decoding")

        def kernel(iterator):
            import io
            import math

            from PIL import Image

            side = max(1, int(math.isqrt(dim)))
            for pdf in iterator:
                embs, ws, hs = [], [], []
                for payload in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(payload)))
                    ws.append(int(img.width))
                    hs.append(int(img.height))
                    # embedding = row-major downsampled grayscale, padded
                    g = np.asarray(
                        img.convert("L").resize((side, side)), dtype=np.float32
                    ).ravel() / 255.0
                    embs.append(np.pad(g, (0, dim - len(g)))[:dim].tolist())
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"], "width": ws, "height": hs,
                     "embedding": embs}
                )

    else:

        def kernel(iterator):
            for pdf in iterator:
                embs, ws, hs = [], [], []
                for payload in pdf["payload"]:
                    raw = _fake_bytes(bytes(payload), dim + 2, "imgfeat")
                    ws.append(int(raw[0]) * 8 + 64)
                    hs.append(int(raw[1]) * 8 + 64)
                    embs.append((raw[2:].astype(np.float32) / 255.0).tolist())
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"], "width": ws, "height": hs,
                     "embedding": embs}
                )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224, deterministic_fake: bool = True
) -> DataFrame:
    """binary -> resized binary (same schema back, new payload).

    Partition note: resize is pure map — no shuffle; output written
    partitioned however the caller partitions (typically by kind/format).
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    if not deterministic_fake:
        _require_codec("PIL.Image", "image resizing")

        def kernel(iterator):
            import io

            from PIL import Image

            for pdf in iterator:
                outs = []
                for p in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(p))).resize(
                        (target_w, target_h)
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    outs.append(buf.getvalue())
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"], "payload": outs,
                     "width": target_w, "height": target_h}
                )

    else:

        def kernel(iterator):
            for pdf in iterator:
                outs = [
                    bytes(_fake_bytes(bytes(p), 32, f"resize{target_w}x{target_h}"))
                    for p in pdf["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": outs,
                        "width": target_w,
                        "height": target_h,
                    }
                )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        kernel, schema=out_schema
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, deterministic_fake: bool = True
) -> DataFrame:
    """video binary -> exploded (media_id, frame_idx, frame_png) rows.

    1->N explode happens INSIDE the Arrow kernel (no JVM-side explode of
    blobs); frame count is bounded by max_frames so output batch size is
    bounded.
    """
    if not deterministic_fake:
        _require_codec("cv2", "video frame sampling")

        def kernel(iterator):
            import os
            import tempfile

            import cv2

            for pdf in iterator:
                ids, idxs, frames = [], [], []
                for mid, payload, dur in zip(
                    pdf["media_id"], pdf["payload"], pdf["duration_ms"]
                ):
                    # cv2.VideoCapture needs a file path; spill the blob
                    with tempfile.NamedTemporaryFile(
                        suffix=".bin", delete=False
                    ) as f:
                        f.write(bytes(payload))
                        tmp = f.name
                    try:
                        cap = cv2.VideoCapture(tmp)
                        n = min(max_frames, max(1, int((dur or 0) // every_ms)))
                        for i in range(n):
                            cap.set(cv2.CAP_PROP_POS_MSEC, i * every_ms)
                            ok, frame = cap.read()
                            if not ok:
                                break
                            ok2, png = cv2.imencode(".png", frame)
                            if not ok2:
                                break
                            ids.append(mid)
                            idxs.append(i)
                            frames.append(png.tobytes())
                        cap.release()
                    finally:
                        os.unlink(tmp)
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": idxs, "frame_png": frames}
                )

    else:

        def kernel(iterator):
            for pdf in iterator:
                ids, idxs, frames = [], [], []
                for mid, payload, dur in zip(
                    pdf["media_id"], pdf["payload"], pdf["duration_ms"]
                ):
                    n = min(max_frames, max(1, int((dur or 0) // every_ms)))
                    for i in range(n):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(bytes(_fake_bytes(bytes(payload), 16, f"frame{i}")))
                yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_png": frames})

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(kernel, schema=FRAME_SCHEMA)


def sample_video_frames_md5(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """sample_video_frames with an md5-derived fake frame id instead of a
    numpy-RNG pseudo-decode: md5 is identical in Spark/Python/DuckDB, so
    the WHOLE operator — binary payload column pruning, in-kernel 1->N
    frame explode, bounded batch output — is checkable by the driver's
    SQL oracle end-to-end. Frame id = md5(payload || ':' || frame_idx);
    the real ffmpeg kernel replaces only the hash line."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_md5", StringType(), False),
        ]
    )

    def kernel(iterator):
        for pdf in iterator:
            ids, idxs, hashes = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = min(max_frames, max(1, int((dur or 0) // every_ms)))
                pb = bytes(payload)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    # >>> STUB: real impl = ffmpeg frame grab + hash
                    hashes.append(hashlib.md5(pb + f":{i}".encode()).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(kernel, schema=schema)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture table (binary payloads from seeds)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        fmt = {"image": "png", "audio": "wav", "video": "mp4"}[kind]
        payload = bytes(_fake_bytes(str(i).encode(), 128, "payload"))
        rows.append(
            (i, kind, fmt, payload, 640 if kind == "image" else None,
             480 if kind == "image" else None,
             5000 + i * 100 if kind != "image" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
