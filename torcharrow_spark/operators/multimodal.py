"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas iterators.

The Spark-side design is real and tested — schemas, partitioning, UDF
signatures, batch shapes. The actual media decode is STUBBED (the
image/audio libraries are not in this container): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder derived from the byte content stands in, so the distributed
plumbing can be exercised end-to-end.

At 100 TB: media bytes stay columnar in parquet; mapInPandas streams
Arrow batches through Python once, and feature outputs are small numeric
columns — so the expensive bytes are read exactly once and never shuffled.
"""

from __future__ import annotations

import typing as _ty

from pyspark.sql import DataFrame as SDF
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
    ]
)


def attach_media(
    df: SDF,
    bytes_col: str,
    media_type: str = "image",
    fmt: str | None = None,
) -> SDF:
    """Wrap a binary column with typed metadata (width/height unknown
    until decode)."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.col(bytes_col)).cast("long").alias("n_bytes"),
        F.lit(fmt).cast("string").alias("format"),
    )
    return df.withColumn(f"{bytes_col}_meta", meta)


def _fake_decode(data: bytes) -> _ty.Tuple[int, int, list]:
    """Deterministic stand-in for an image decoder: derives a fake
    (width, height) and an 8-dim feature vector from the bytes."""
    n = len(data)
    w = 16 + (n % 64)
    h = 16 + ((n // 64) % 64)
    feats = [float((sum(data[i::8]) % 1000)) / 1000.0 for i in range(8)] if n else [0.0] * 8
    return w, h, feats


def decode_features(
    df: SDF,
    bytes_col: str,
    id_col: str,
    fake: bool = False,
    batch_size_hint: int = 1024,
) -> SDF:
    """Decode media bytes -> (id, width, height, features: array<float>)
    via mapInPandas: one Python pass per partition, Arrow-batched.

    With fake=False this raises NotImplementedError at executor time —
    plug in a real decoder (PIL/torchvision/ffmpeg) in its place."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("features", T.ArrayType(T.FloatType(), False), True),
        ]
    )
    src = df.select(id_col, bytes_col)

    def decode_iter(batches):
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, fs = [], [], [], []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    ids.append(i), ws.append(None), hs.append(None), fs.append(None)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "media decode requires an image/audio library not in "
                        "this container; pass fake=True for the deterministic stub"
                    )
                w, h, feats = _fake_decode(bytes(data))
                ids.append(i), ws.append(w), hs.append(h), fs.append(feats)
            yield pd.DataFrame({id_col: ids, "width": ws, "height": hs, "features": fs})

    return src.mapInPandas(decode_iter, out_schema)


def frame_sample_plan(
    df: SDF,
    bytes_col: str,
    id_col: str,
    every_n: int = 30,
) -> SDF:
    """Video frame-sampling *plan*: emits (id, frame_index) rows for a
    downstream decoder, sized from metadata only — no bytes touched. The
    explode keeps each video's frames in one partition's batch."""
    n_frames = (F.length(F.col(bytes_col)) / 1000).cast("int")  # stub: 1 frame/KB
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
            "frame_index"
        ),
    )


def resize_media(
    df: SDF,
    bytes_col: str,
    id_col: str,
    target_w: int = 224,
    target_h: int = 224,
    fake: bool = False,
) -> SDF:
    """Resize media to (target_w, target_h) -> (id, resized: binary,
    meta struct) via mapInPandas — binary in, binary out, metadata updated,
    one Arrow-batched Python pass, no shuffle.

    The resample kernel itself is STUBBED (no imaging library in this
    container): fake=True produces deterministic bytes whose length is
    target_w*target_h*3//256 so batch shapes and downstream schemas are
    exercised for real; fake=False raises NotImplementedError at executor
    time — swap in PIL/torchvision there."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META_SCHEMA, False),
        ]
    )
    src = df.select(id_col, bytes_col)

    def resize_iter(batches):
        import pandas as pd

        for pdf in batches:
            ids, outs, metas = [], [], []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(i)
                if data is None:
                    outs.append(None)
                    metas.append(
                        {"media_type": "image", "width": None, "height": None,
                         "n_bytes": 0, "format": None}
                    )
                    continue
                if not fake:
                    raise NotImplementedError(
                        "media resize requires an imaging library not in this "
                        "container; pass fake=True for the deterministic stub"
                    )
                n = target_w * target_h * 3 // 256
                seed = (len(data) * 2654435761) % 256
                outs.append(bytes((seed + j) % 256 for j in range(n)))
                metas.append(
                    {"media_type": "image", "width": target_w, "height": target_h,
                     "n_bytes": n, "format": "raw"}
                )
            yield pd.DataFrame({id_col: ids, "resized": outs, "meta": metas})

    return src.mapInPandas(resize_iter, out_schema)
