"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Beyond-reference. The decode step itself is STUBBED (image/audio codecs
are not in this container) — behind ``decode_fn`` injection points with a
deterministic fake decoder for tests — but everything Spark-side is real:
schemas, Arrow-batched ``mapInPandas`` signatures, batch shapes,
partition sizing.

Scale design: media bytes never pass through a shuffle — all transforms
are map-side ``mapInPandas`` over the scan; metadata-only operations
(filtering by width/duration, sampling frame indices) are pure column
expressions on the typed metadata struct so they prune/push down without
touching the blobs. Keep blob partitions small via
``spark.sql.files.maxPartitionBytes`` (Arrow batches hold
``batch_size`` rows of bytes in memory at once).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata accompanying each media blob.
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def fake_decode_image(data: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for a real image decode + feature extract:
    a stable byte-histogram projection. Replace with PIL/torchvision
    decode where those libraries exist."""
    if data is None:
        return [0.0] * n_features
    acc = [0] * n_features
    for i, b in enumerate(data):
        acc[i % n_features] += b
    total = max(1, len(data))
    return [a / total for a in acc]


def extract_image_features(
    df: DataFrame,
    blob_col: str = "image",
    id_col: str = "doc_id",
    n_features: int = 8,
    decode_fn: Callable[[bytes, int], list[float]] = fake_decode_image,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs via mapInPandas.

    Output: (id, features array<float>). The UDF sees pandas batches of
    raw bytes; real decoders (PIL, soundfile, av) drop in by swapping
    ``decode_fn`` — the Spark plumbing does not change.
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    cols = df.select(id_col, blob_col)

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            feats = [decode_fn(b, n_features) for b in pdf[blob_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return cols.mapInPandas(run, schema=out_schema)


def sample_frame_indices(
    df: DataFrame,
    n_frames_col: str,
    every_n: int = 30,
    out_col: str = "frame_indices",
) -> DataFrame:
    """Frame-sampling plan for video: emit the frame indices to decode
    (0, every_n, 2*every_n, ...) as a native sequence — the decode itself
    is then a mapInPandas over (blob, frame_indices)."""
    return df.withColumn(
        out_col,
        F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n)),
    )


def nearest_neighbor_resample(
    data: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int
) -> bytes:
    """Pure-Python nearest-neighbor resample of a row-major single-channel
    byte image — the reference implementation for ``resize_images``'s
    injection point, and a working stand-in where PIL/opencv are absent.
    A real deployment injects e.g.
    ``lambda b, w, h: PIL.Image.open(io.BytesIO(b)).resize((w, h)).tobytes()``.
    """
    if data is None or src_w <= 0 or src_h <= 0:
        return b""
    out = bytearray(dst_w * dst_h)
    for y in range(dst_h):
        sy = min(src_h - 1, y * src_h // dst_h)
        row = sy * src_w
        for x in range(dst_w):
            sx = min(src_w - 1, x * src_w // dst_w)
            idx = row + sx
            out[y * dst_w + x] = data[idx] if idx < len(data) else 0
    return bytes(out)


def resize_images(
    df: DataFrame,
    blob_col: str,
    width: int,
    height: int,
    meta_col: str = "meta",
    resize_fn: Callable[[bytes, int, int, int, int], bytes] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Resize every image blob to (width, height) via an Arrow-batched
    ``mapInPandas``; the typed metadata struct is rewritten to the new
    dimensions so downstream metadata-only predicates stay truthful.

    ``resize_fn(bytes, src_w, src_h, dst_w, dst_h) -> bytes`` is the
    injection point — ``None`` raises at execution time (the historical
    stub behavior: plans build and schemas resolve without codec
    libraries); ``nearest_neighbor_resample`` is a working pure-Python
    default for raw single-channel buffers.
    """
    out_name = out_col or blob_col
    fields = [f for f in df.schema.fields if f.name not in (blob_col, meta_col)]
    out_schema = T.StructType(
        [
            *fields,
            T.StructField(out_name, T.BinaryType()),
            T.StructField(meta_col, IMAGE_META_SCHEMA),
        ]
    )
    pass_cols = [f.name for f in fields]

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        if resize_fn is None:
            raise NotImplementedError(
                "resize_images needs a resize_fn (PIL/opencv not present in "
                "this environment); nearest_neighbor_resample works for raw "
                "single-channel buffers"
            )
        for pdf in batches:
            blobs = [
                resize_fn(
                    b,
                    int(m["width"]) if m is not None else 0,
                    int(m["height"]) if m is not None else 0,
                    width,
                    height,
                )
                for b, m in zip(pdf[blob_col], pdf[meta_col])
            ]
            metas = [
                {"width": width, "height": height,
                 "format": (m["format"] if m is not None else None)}
                for m in pdf[meta_col]
            ]
            yield pd.DataFrame(
                {**{c: pdf[c] for c in pass_cols}, out_name: blobs, meta_col: metas}
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(df: DataFrame, blob_col: str, width: int, height: int) -> DataFrame:
    """Back-compat alias: ``resize_images`` with no injected resize_fn —
    the plan (schema, partitioning) is fully formed; execution raises."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        raise NotImplementedError(
            "image resize requires a codec library (PIL/opencv) not present "
            "in this environment; inject a resize_fn via resize_images"
        )

    return df.mapInPandas(run, schema=df.schema)
