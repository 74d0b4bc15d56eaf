"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas iterators.

The Spark-side design is real and tested — schemas, partitioning, UDF
signatures, batch shapes. Image decode is REAL for png/bmp/ppm via the
pure-stdlib codecs in :mod:`imagecodec` (fake=False is the default
executable path); `fake=True` remains as a deterministic byte-derived
stand-in for formats without an in-container decoder (jpeg, audio,
video frames).

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


def _real_features(data: bytes):
    """Decode via imagecodec and project an 8-dim stats vector:
    [w, h, channels, mean, std, min, max, n_px] — small numeric outputs
    so the heavy bytes never leave the scan."""
    import numpy as np

    from .imagecodec import decode_image

    w, h, px = decode_image(data)
    flat = px.astype(np.float64)
    return w, h, [
        float(w),
        float(h),
        float(px.shape[2]),
        float(flat.mean()),
        float(flat.std()),
        float(flat.min()),
        float(flat.max()),
        float(w * h),
    ]


def decode_features(
    df: SDF,
    bytes_col: str,
    id_col: str,
    fake: bool = False,
    batch_size_hint: int = 1024,
) -> SDF:
    """Decode media bytes -> (id, width, height, features: array<float>)
    via mapInPandas: one Python pass per partition, Arrow-batched.

    fake=False (default) REALLY decodes png/bmp/ppm with the pure-stdlib
    codecs (imagecodec.py) and emits an 8-dim stats feature vector;
    unsupported formats raise ValueError at executor time — swap a SIMD
    decoder (PIL/torchvision) into the same slot for jpeg etc.
    fake=True keeps the deterministic byte-derived stand-in."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("features", T.ArrayType(T.FloatType(), False), True),
        ]
    )
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    # decode is per-row Python: a narrow (single-row-group) source
    # would run every decode in ONE task — spread first (no-op at any
    # healthy file layout; see spread_narrow_source)
    src = spread_narrow_source(df.select(id_col, bytes_col))

    def decode_iter(batches):
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, fs = [], [], [], []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    ids.append(i), ws.append(None), hs.append(None), fs.append(None)
                    continue
                if fake:
                    w, h, feats = _fake_decode(bytes(data))
                else:
                    w, h, feats = _real_features(bytes(data))
                ids.append(i), ws.append(w), hs.append(h), fs.append(feats)
            yield pd.DataFrame({id_col: ids, "width": ws, "height": hs, "features": fs})

    return src.mapInPandas(decode_iter, out_schema)


def decode_image_stats(
    df: SDF, bytes_col: str, id_col: str, squares: bool = False
) -> SDF:
    """REAL image decode -> exact pixel statistics:
    ``(id, width, height, fmt, n_px, px_sum, px_mean)``.

    The integer ``px_sum`` over all decoded samples makes the decode
    independently verifiable (a checksum an external system — or the
    driver's SQL oracle — can reproduce arithmetically for synthetic
    images); mapInPandas streams Arrow batches, outputs are tiny.
    ``squares=True`` (r9, for the JPEG oracle q152) appends the exact
    integer ``px_sq_sum`` — a second moment that a structured error
    (e.g. a sign flip in an AC basis) cannot leave invariant the way
    it can leave a plain sum."""
    fields = [
        T.StructField(id_col, T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
    ]
    if squares:
        fields.append(T.StructField("px_sq_sum", T.LongType(), True))
    out_schema = T.StructType(fields)
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    # per-row Python decode: spread a narrow source first (no-op at
    # any healthy layout; see spread_narrow_source)
    src = spread_narrow_source(df.select(id_col, bytes_col))
    cols = [f.name for f in fields]

    def stats_iter(batches):
        import pandas as pd

        from .imagecodec import decode_image, sniff_format

        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    rows.append((i,) + (None,) * (len(cols) - 1))
                    continue
                b = bytes(data)
                w, h, px = decode_image(b)
                px64 = px.astype("int64")
                total = int(px64.sum())
                n = int(px.size)
                row = (i, w, h, sniff_format(b), n, total, total / n)
                if squares:
                    row += (int((px64 * px64).sum()),)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(stats_iter, out_schema)


def frame_sample_plan(
    df: SDF,
    bytes_col: str,
    id_col: str,
    every_n: int = 30,
    fake: bool = False,
) -> SDF:
    """Video frame-sampling plan: (id, frame_index) rows for every
    ``every_n``-th frame, with the REAL frame count read from the
    container's stsz sample table (r6 — formerly a 1-frame/KB stub).
    Container-metadata parse only: sample payloads are never touched,
    so the pass costs a box walk per video, not a decode. Videos with
    no video track emit no rows. mapInPandas (the sample-table walk is
    imperative), Arrow-batched; each video's frame rows are generated
    inside one batch.

    ``fake=True`` keeps the deterministic 1-frame/KB length stub for
    non-container media (the `decode_features(fake=True)` twin for
    plumbing tests), a zero-Python codegen projection."""
    if fake:
        n_frames = (F.length(F.col(bytes_col)) / 1000).cast("int")
        return df.select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_index"),
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
        ]
    )
    # NO spread here (r7, measured): this pass is a cheap metadata/
    # checksum walk whose payload bytes dominate any exchange — at
    # sf0.1 spreading cost 1.75x wall on audio (moving 1.5 MB of WAV
    # to save a sub-0.2s single-task walk); the heavy PIXEL-decode
    # paths (decode_features/decode_image_stats/decode_video_frames_
    # stats/resize_media) do spread
    src = df.select(id_col, bytes_col)

    def plan_iter(batches):
        import pandas as pd

        from .videocodec import parse_mp4_samples

        for pdf in batches:
            ids, idxs = [], []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    continue
                for tr in parse_mp4_samples(bytes(data)):
                    if tr["handler"] != "vide":
                        continue
                    for fi in range(0, len(tr["samples"]), every_n):
                        ids.append(i)
                        idxs.append(fi)
                    break
            yield pd.DataFrame({id_col: ids, "frame_index": idxs})

    return src.mapInPandas(plan_iter, out_schema)


def decode_video_frames_stats(
    df: SDF,
    bytes_col: str,
    id_col: str,
    every_n: int = 1,
) -> SDF:
    """REAL video FRAME decode -> one row per sampled frame: ``(id,
    frame_index, width, height, fmt, n_px, px_sum, px_mean)`` — the r6
    close of the last multimodal planning stub. The first video track's
    sample table (videocodec.parse_mp4_samples: stsz/stsc/stco walked
    exactly) locates each frame's bytes inside mdat; frames stored as
    stdlib-decodable images (PNG/BMP/PPM — the contract
    `encode_mp4_video` documents) decode through `imagecodec` with the
    same exact-pixel arithmetic q126 proves for still images. A frame
    in an entropy-coded format (H.264 etc.) raises at executor time —
    decoding those needs codec libraries the container doesn't ship,
    and a silent skip would misreport corpus stats. mapInPandas,
    Arrow-batched, no shuffle; stats per frame are exact integers so an
    external SQL oracle replays them arithmetically (q147)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("fmt", T.StringType(), True),
            T.StructField("n_px", T.LongType(), True),
            T.StructField("px_sum", T.LongType(), True),
            T.StructField("px_mean", T.DoubleType(), True),
        ]
    )
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    # per-row Python decode: spread a narrow source first (no-op at
    # any healthy layout; see spread_narrow_source)
    src = spread_narrow_source(df.select(id_col, bytes_col))

    def frames_iter(batches):
        import pandas as pd

        from .imagecodec import decode_image, sniff_format
        from .videocodec import parse_mp4_samples

        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    continue
                b = bytes(data)
                for tr in parse_mp4_samples(b):
                    if tr["handler"] != "vide":
                        continue
                    for fi in range(0, len(tr["samples"]), every_n):
                        off, sz = tr["samples"][fi]
                        fb = b[off: off + sz]
                        w, h, px = decode_image(fb)
                        total = int(px.astype("int64").sum())
                        n = int(px.size)
                        rows.append(
                            (i, fi, w, h, sniff_format(fb), n, total,
                             total / n)
                        )
                    break
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_index", "width", "height", "fmt",
                         "n_px", "px_sum", "px_mean"],
            )

    return src.mapInPandas(frames_iter, out_schema)


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

    fake=False (default) REALLY resizes: png/bmp/ppm/baseline-jpeg
    decode (imagecodec.py dispatch; jpegcodec.py since r9), vectorized
    nearest-neighbor resample, re-encode as P6 PPM (deterministic,
    bit-exact, library-free); unsupported input formats raise
    ValueError at executor time. fake=True keeps the deterministic
    byte-stub for formats without an in-container decoder."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META_SCHEMA, False),
        ]
    )
    from torcharrow_spark.operators.preprocess import spread_narrow_source

    # per-row Python decode: spread a narrow source first (no-op at
    # any healthy layout; see spread_narrow_source)
    src = spread_narrow_source(df.select(id_col, bytes_col))

    def resize_iter(batches):
        import pandas as pd

        from .imagecodec import decode_image, encode_ppm, resize_nearest

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
                if fake:
                    n = target_w * target_h * 3 // 256
                    seed = (len(data) * 2654435761) % 256
                    out = bytes((seed + j) % 256 for j in range(n))
                    fmt = "raw"
                else:
                    _, _, px = decode_image(bytes(data))
                    out = encode_ppm(resize_nearest(px, target_w, target_h))
                    fmt = "ppm"
                outs.append(out)
                metas.append(
                    {"media_type": "image", "width": target_w, "height": target_h,
                     "n_bytes": len(out), "format": fmt}
                )
            yield pd.DataFrame({id_col: ids, "resized": outs, "meta": metas})

    return src.mapInPandas(resize_iter, out_schema)


def decode_audio_stats(df: SDF, bytes_col: str, id_col: str) -> SDF:
    """REAL audio decode -> exact sample statistics:
    ``(id, sample_rate, n_channels, n_samples, duration_ms, amp_sum,
    amp_mean)`` — the audio twin of :func:`decode_image_stats`, backed
    by the pure-stdlib RIFF/PCM parser in `operators/audiocodec`.

    ``amp_sum`` is the exact integer sum of |sample| over all decoded
    PCM16 samples — a checksum an external system (or the driver's SQL
    oracle, q142) reproduces arithmetically for synthetic audio, so the
    decode is independently verifiable. ``duration_ms`` is integer
    frame-count math (frames * 1000 DIV rate), engine-exact.
    mapInPandas streams Arrow batches; bytes stay columnar, outputs are
    tiny."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("amp_sum", T.LongType(), True),
            T.StructField("amp_mean", T.DoubleType(), True),
        ]
    )
    # NO spread here (r7, measured): this pass is a cheap metadata/
    # checksum walk whose payload bytes dominate any exchange — at
    # sf0.1 spreading cost 1.75x wall on audio (moving 1.5 MB of WAV
    # to save a sub-0.2s single-task walk); the heavy PIXEL-decode
    # paths (decode_features/decode_image_stats/decode_video_frames_
    # stats/resize_media) do spread
    src = df.select(id_col, bytes_col)

    def stats_iter(batches):
        import numpy as np
        import pandas as pd

        from .audiocodec import decode_wav

        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    rows.append((i, None, None, None, None, None, None))
                    continue
                rate, ch, samples = decode_wav(bytes(data))
                n = int(samples.size)
                frames = n // ch if ch else 0
                total = int(np.abs(samples.astype("int64")).sum())
                rows.append(
                    (
                        i, rate, ch, n, frames * 1000 // rate if rate else None,
                        total, total / n if n else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "n_channels", "n_samples",
                         "duration_ms", "amp_sum", "amp_mean"],
            )

    return src.mapInPandas(stats_iter, out_schema)


def video_container_stats(df: SDF, bytes_col: str, id_col: str) -> SDF:
    """REAL video CONTAINER parse -> ``(id, major_brand, timescale,
    duration, duration_ms, n_tracks)`` via the pure-stdlib ISO-BMFF box
    walker in `operators/videocodec` — the metadata a curation pipeline
    filters on (drop sub-second clips, cap durations, require a/v
    tracks) without decoding a single frame. Frame DECODE stays behind
    `frame_sample_plan`'s planning stub (codec libraries aren't in the
    container; the Spark-side plumbing — schema, batching, binary
    columns — is real and tested). mapInPandas, Arrow-batched."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("major_brand", T.StringType(), True),
            T.StructField("timescale", T.LongType(), True),
            T.StructField("duration", T.LongType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("n_tracks", T.IntegerType(), True),
        ]
    )
    # NO spread here (r7, measured): this pass is a cheap metadata/
    # checksum walk whose payload bytes dominate any exchange — at
    # sf0.1 spreading cost 1.75x wall on audio (moving 1.5 MB of WAV
    # to save a sub-0.2s single-task walk); the heavy PIXEL-decode
    # paths (decode_features/decode_image_stats/decode_video_frames_
    # stats/resize_media) do spread
    src = df.select(id_col, bytes_col)

    def stats_iter(batches):
        import pandas as pd

        from .videocodec import parse_mp4_meta

        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[bytes_col]):
                if data is None:
                    rows.append((i, None, None, None, None, None))
                    continue
                m = parse_mp4_meta(bytes(data))
                rows.append(
                    (i, m["major_brand"], m["timescale"], m["duration"],
                     m["duration_ms"], m["n_tracks"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "major_brand", "timescale", "duration",
                         "duration_ms", "n_tracks"],
            )

    return src.mapInPandas(stats_iter, out_schema)
