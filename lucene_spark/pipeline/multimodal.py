"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (no codec libraries in this environment) behind
`decode_image_stub` — a deterministic fake that produces a stable feature
vector from the bytes — while the Spark-side plumbing (schema, Arrow batch
shape, mapInPandas signature, partitioning) is real and tested. Swap the
stub for a real decoder (PIL/torchaudio/decord) without touching the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),          # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),        # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_DIM = 16


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decoder': bytes -> FEATURE_DIM float32 feature.
    A real implementation raises NotImplementedError without the codec lib;
    this fake keeps the distributed plumbing testable."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint8).astype(np.float32)
    return (raw[:FEATURE_DIM] - 128.0) / 128.0


def extract_features(df: DataFrame, decode_fn=None,
                     feature_dim: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches: the real shape of
    a decode/resize/embed stage (batched, columnar, no driver involvement).
    Returns (media_id, kind, feature array<float>).

    decode_fn: bytes -> np.ndarray[float32, feature_dim] — the injection
    point for a real decoder (PIL/torchaudio/decord). It is serialized
    into the task closure, so it must be picklable (a module-level
    function or functools.partial). Defaults to decode_image_stub; the
    plan, schema, batching, and partitioning are identical either way —
    swapping the decoder changes NOTHING Spark-side."""
    decode = decode_fn or decode_image_stub
    want_dim = feature_dim

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                v = np.asarray(decode(p), dtype=np.float32)
                if want_dim is not None and v.shape != (want_dim,):
                    raise ValueError(
                        f"decode_fn returned shape {v.shape}, expected "
                        f"({want_dim},)")
                feats.append(v.tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
            })

    return df.mapInPandas(run, "media_id long, kind string, feature array<float>")


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (JVM-side sequence explode); the actual frame decode would run in a
    downstream mapInPandas like extract_features."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("ts_ms", F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))))
        .select("media_id", "mime", "ts_ms")
    )


def make_fake_media(spark, n: int = 64):
    """Deterministic synthetic media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(hashlib.sha256(f"media-{i}".encode()).digest() * 4)
        rows.append((i, kind, f"x/{kind}", payload, 64, 64, 5000 if kind == "video" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame, text_col: str = "text",
                         key_col: str = "doc_id") -> DataFrame:
    """Derive an opaque-binary media table from a text table (payload =
    UTF-8 bytes of the text): the oracle-checkable ingest shape — an
    external engine can recompute sha256(payload) as sha256(text). The
    plumbing (binary column, typed metadata, Arrow batching downstream)
    is identical to real image/audio payload handling."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(key_col) % 3 + 1).cast("int"))
    return docs.select(
        F.col(key_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("x/"), kind).alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.when(F.col(key_col) % 3 == 2, F.lit(5000)).otherwise(
            F.lit(None).cast("long")).alias("duration_ms"),
    )
