"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode/feature libraries (PIL, ffmpeg, torchaudio...) are NOT in this
container, so the *decode kernels* are stubbed — deterministic fakes or
NotImplementedError — while everything Spark-side is real and tested:
the schema contract, Arrow batch shapes, ``mapInPandas`` plumbing,
partitioning, and the pandas-UDF signatures a real decoder would drop into.

This is the sanctioned pandas/Arrow UDF slow path (BASELINE.json.input_hint
allows vectorized pandas UDFs; never per-row Python): binaries cross to
Python as Arrow batches, are processed batch-at-a-time, and return typed
columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

HAVE_PIL = False  # import-try gate for the real decoder
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def synthetic_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for testing
    the plumbing; shape matches MEDIA_SCHEMA exactly."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.sha2(F.concat(F.lit("media:"), F.col("id").cast("string")), 512)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit(f"{kind}/x-fake").alias("mime"),
            (F.pmod(F.col("id"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("id"), F.lit(48)) + 16).cast("int").alias("height"),
            (F.pmod(F.col("id"), F.lit(9000)) + 1000).alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )
    return df


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: sha-chain -> floats."""
    out = []
    h = payload or b""
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 255.0 for b in h[:8])
    return out[:dim]


def extract_features(df: DataFrame, dim: int = 16, batch_hint: int = 256) -> DataFrame:
    """Image/audio feature extraction over mapInPandas.

    REAL: Arrow batch transfer, schema, iterator protocol, output typing.
    STUB: the per-payload kernel (``_fake_feature``) — swap in a real
    decoder (PIL/torch) behind the HAVE_PIL gate; the Spark plan is
    unchanged.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                _fake_feature(p, dim) for p in pdf["payload"]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — requires PIL; raises cleanly when absent so
    callers can gate on HAVE_PIL."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL, not present in this container; "
            "use extract_features (deterministic stub) for plumbing tests"
        )
    raise NotImplementedError("real decoder wiring pending a PIL-enabled image")


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling *plan*: computes the frame timestamps to decode
    per row (expression-only); the actual frame extraction is the stubbed
    kernel above. Returns one row per (media_id, frame_ts_ms)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
