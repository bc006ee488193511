"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
so bytes move columnar and the Python stage sees whole batches, never
rows. The actual media decoding is STUBBED (the image/audio libraries are
not in this container): ``mode="fake"`` produces deterministic
hash-derived features with the real batch shape, ``mode="real"`` raises
NotImplementedError at the exact seam where PIL/librosa/ffmpeg calls
would go. Everything Spark-side — schema, partitioning, UDF signature,
batch iteration — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_worker_imports

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)

_MODALITIES = ("image", "audio", "video")


def synth_assets(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic synthetic asset table (JVM-side: range → sha2 → unhex,
    no Python in the generation path)."""
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.lit(list(_MODALITIES)), (F.col("id") % 3 + 1).cast("int")
        ).alias("modality"),
        # payload: 3 chained sha2 digests = 96 deterministic bytes
        F.unhex(
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("x")), 256),
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("y")), 256),
            )
        ).alias("payload"),
        F.struct(
            F.concat(F.lit("application/fake-"),
                     F.element_at(F.lit(list(_MODALITIES)),
                                  (F.col("id") % 3 + 1).cast("int"))).alias("mime"),
            F.lit(96).cast("int").alias("n_bytes"),
            F.concat(F.lit("synthetic://asset/"), F.col("id")).alias("source_uri"),
        ).alias("meta"),
    )


def _decode_batch(pdf: pd.DataFrame, mode: str) -> pd.DataFrame:
    if mode == "real":
        # Real decoding seam: PIL.Image.open(io.BytesIO(payload)) /
        # librosa.load / ffmpeg frame extraction would go here.
        raise NotImplementedError(
            "media decoding libraries are not available in this environment;"
            " use mode='fake' for the deterministic stub"
        )
    out = {
        "asset_id": pdf["asset_id"],
        "modality": pdf["modality"],
        "n_bytes": pdf["payload"].map(len).astype("int32"),
        "payload_sha": pdf["payload"].map(
            lambda b: hashlib.sha256(bytes(b)).hexdigest()
        ),
        # fake decode: dimensions derived deterministically from content
        "width": pdf["payload"].map(lambda b: 64 + bytes(b)[0] % 192).astype("int32"),
        "height": pdf["payload"].map(lambda b: 64 + bytes(b)[1] % 192).astype("int32"),
        "mean_byte": pdf["payload"].map(
            lambda b: sum(bytes(b)) / len(bytes(b))
        ),
    }
    return pd.DataFrame(out)


def decode_features(assets: DataFrame, mode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    ensure_worker_imports(assets.sparkSession)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf, mode)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize(
    assets: DataFrame, target_w: int = 64, target_h: int = 64, mode: str = "fake"
) -> DataFrame:
    """Image-resize plumbing: Arrow-batched transform emitting a resized
    payload + updated metadata. ``mode="fake"`` deterministically
    truncates/pads the payload to target_w*target_h/64 bytes (stand-in
    for the decoded-pixels buffer); ``mode="real"`` raises at the seam
    where PIL's ``Image.resize`` would run."""
    ensure_worker_imports(assets.sparkSession)
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    n_bytes = max(1, target_w * target_h // 64)

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "PIL is not available in this environment;"
                    " use mode='fake'"
                )
            payloads = pdf["payload"].map(
                lambda b: (bytes(b) * (n_bytes // max(len(bytes(b)), 1) + 1))[
                    :n_bytes
                ]
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": payloads,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return assets.filter(F.col("modality") == "image").select(
        "asset_id", "payload"
    ).mapInPandas(run, out_schema)


def frame_sample(assets: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled offset (the
    stand-in for per-frame decode), pure column expressions."""
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.length("payload") - 1,
                    F.lit(every_n_bytes),
                )
            ).alias("frame_offset"),
        )
    )
