"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.  The
Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
partitioning — is real and tested; the *codec* itself is stubbed because
no image/audio libraries ship in this container:

* ``decode_stub="deterministic"`` (default) derives metadata (width,
  height, duration) as a pure function of the payload's md5 — testable
  end-to-end and oracle-reproducible in SQL;
* ``decode_stub="raise"`` marks where a real decoder (PIL/ffmpeg/...)
  plugs in, raising ``NotImplementedError`` per batch.

The pandas UDF is Arrow-vectorized: one Python call per record *batch*
(``spark.sql.execution.arrow.maxRecordsPerBatch``), never per row.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image | audio | video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta_width", T.IntegerType(), True),
    T.StructField("meta_height", T.IntegerType(), True),
    T.StructField("meta_duration_ms", T.IntegerType(), True),
    T.StructField("payload_md5", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def to_media(df: DataFrame, id_col: str, payload_col, kind: str = "image") -> DataFrame:
    """Wrap any binary-producing expression as an opaque media column."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload_col.cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str, int]:
    md5 = hashlib.md5(payload).hexdigest()
    h60 = int(md5[:15], 16)
    return (
        int(h60 % 1920) + 1,            # width
        int((h60 >> 16) % 1080) + 1,    # height
        int((h60 >> 32) % 60000),       # duration_ms
        md5,
        len(payload),
    )


def decode_media_native(df: DataFrame) -> DataFrame:
    """JVM fast-path of the deterministic decode stub: the stub's metadata
    is a pure function of ``md5(payload)``, so it is expressible as native
    codegen'd columns — no Python, no Arrow transfer.  Bit-identical to
    ``decode_media(..., "deterministic")`` (pinned by test); real codecs
    still go through the Arrow slot."""
    md5 = F.md5(F.col("payload"))
    h60 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("bigint")
    return df.select(
        "media_id", "kind", "payload",
        (F.pmod(h60, F.lit(1920)) + 1).cast("int").alias("meta_width"),
        (F.pmod(F.shiftright(h60, 16), F.lit(1080)) + 1).cast("int").alias("meta_height"),
        F.pmod(F.shiftright(h60, 32), F.lit(60000)).cast("int").alias("meta_duration_ms"),
        md5.alias("payload_md5"),
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
    )


def decode_media(df: DataFrame, decode_stub: str = "deterministic",
                 native: bool = True) -> DataFrame:
    """Extract metadata from payloads.

    ``decode_stub="deterministic"`` with ``native=True`` (default) runs
    entirely JVM-side (``decode_media_native``); ``native=False`` routes
    the same stub through the Arrow-batched ``mapInPandas`` slot — the
    path a real codec (``decode_stub="raise"`` plug point) must take."""
    if decode_stub == "deterministic" and native:
        return decode_media_native(df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; plug in here"
                )
            decoded = [
                _fake_decode(bytes(p)) if p is not None else (None,) * 5
                for p in pdf["payload"]
            ]
            pdf = pdf.copy()
            pdf["meta_width"] = pd.array([d[0] for d in decoded], dtype="Int32")
            pdf["meta_height"] = pd.array([d[1] for d in decoded], dtype="Int32")
            pdf["meta_duration_ms"] = pd.array([d[2] for d in decoded], dtype="Int32")
            pdf["payload_md5"] = [d[3] for d in decoded]
            pdf["n_bytes"] = pd.array([d[4] for d in decoded], dtype="Int64")
            yield pdf

    return df.mapInPandas(gen, MEDIA_SCHEMA)


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Aspect-preserving fit-inside resize plan for image payloads.

    Real resize math over the decoded dimensions (scale = min(tw/w, th/h),
    never upscale), JVM-side; the pixel work itself belongs to the codec
    slot.  Output: (media_id, width, height, out_width, out_height,
    scale)."""
    meta = decode_media(df)
    scale = F.least(
        F.lit(float(target_w)) / F.col("meta_width"),
        F.lit(float(target_h)) / F.col("meta_height"),
        F.lit(1.0),
    )
    return meta.select(
        "media_id",
        F.col("meta_width").alias("width"),
        F.col("meta_height").alias("height"),
        F.greatest(F.floor(F.col("meta_width") * scale).cast("int"),
                   F.lit(1)).alias("out_width"),
        F.greatest(F.floor(F.col("meta_height") * scale).cast("int"),
                   F.lit(1)).alias("out_height"),
        F.round(scale, 6).alias("scale"),
    )


def extract_features(df: DataFrame, n_coeffs: int = 8,
                     decode_stub: str = "deterministic") -> DataFrame:
    """Per-payload feature vector (MFCC-like coefficient stub).

    Plumbing shape is real — one feature row per (media, coefficient),
    ready for the embedding/ANN operators downstream; the coefficient
    values are a deterministic pure function of the payload md5 (the real
    DSP plugs into the Arrow slot like ``decode_media``'s codec)."""
    md5 = F.md5(F.col("payload"))
    rows = df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_coeffs - 1))).alias("coeff_idx"),
        md5.alias("__md5"),
    )
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("__md5"), F.lit(":c:"),
                       F.col("coeff_idx").cast("string"))), 1, 15),
        16, 10).cast("bigint")
    return rows.select(
        "media_id", "coeff_idx",
        (F.pmod(h, F.lit(2_000_001)) / F.lit(1_000_000.0) - 1.0).alias("value"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand each video into its frame-sample timestamps (plumbing for a
    frame extractor): JVM-side sequence, no Python."""
    meta = decode_media(df)
    return meta.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
