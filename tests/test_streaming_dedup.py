"""Stateful streaming dedup (applyInPandasWithState) and watermarked
windowed facet counts."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_across_batches(spark, tmp_path):
    from lucene_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    # batch 0: one internal dup pair (1,3); batch written before the
    # query starts so it is micro-batch #0
    _write_batch(spark, src, [
        (1, "alpha beta"), (2, "gamma"), (3, "alpha beta"), (4, "delta")])

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = streaming_exact_dedup(stream, "doc_id", text_col="text")
    q = (out.writeStream.format("memory").queryName("dedup_t")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    try:
        q.processAllAvailable()
        got0 = {r["key"] for r in spark.sql("select * from dedup_t").collect()}
        assert got0 == {1, 2, 4}  # 3 collapsed into 1 within the batch

        # batch 1: 5 repeats batch-0 text (cross-batch dup → dropped via
        # STATE, not within-batch comparison); 6 is new
        _write_batch(spark, src, [(5, "gamma"), (6, "epsilon")])
        q.processAllAvailable()
        got1 = {r["key"] for r in spark.sql("select * from dedup_t").collect()}
        assert got1 == {1, 2, 4, 6}
    finally:
        q.stop()


def test_streaming_dedup_requires_one_source(spark):
    from lucene_spark.streaming import streaming_exact_dedup

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        streaming_exact_dedup(df, "doc_id")
    with pytest.raises(ValueError):
        streaming_exact_dedup(df, "doc_id", text_col="text", hash_col="text")


def test_streaming_dedup_hash_col_batch_semantics(spark, tmp_path):
    """hash_col variant + a high-collision derived key: survivors are
    the min doc_id per hash (single batch)."""
    from lucene_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ck2")
    _write_batch(spark, src, [(i, f"t{i % 3}") for i in range(9)])
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src)).withColumn("sig", F.md5("text"))
    out = streaming_exact_dedup(stream, "doc_id", hash_col="sig")
    q = (out.writeStream.format("memory").queryName("dedup_h")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["key"] for r in spark.sql("select * from dedup_h").collect()}
        assert got == {0, 1, 2}
    finally:
        q.stop()


def test_streaming_dedup_string_keys(spark, tmp_path):
    """Non-numeric keys (UUID-style ids) survive: the key column keeps
    its type; min-key election is lexicographic."""
    from lucene_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "in3")
    ckpt = str(tmp_path / "ck3")
    pdf = pd.DataFrame({"uid": ["b-2", "a-1", "c-3"],
                        "text": ["same", "same", "other"]})
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("uid string, text string").parquet(src)
    out = streaming_exact_dedup(stream, "uid", text_col="text")
    q = (out.writeStream.format("memory").queryName("dedup_s")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["key"] for r in spark.sql("select * from dedup_s").collect()}
        assert got == {"a-1", "c-3"}
    finally:
        q.stop()


def test_streaming_facet_counts_watermark(spark, tmp_path):
    from lucene_spark.streaming import streaming_facet_counts

    src = str(tmp_path / "fin")
    ckpt = str(tmp_path / "fck")
    pdf = pd.DataFrame({
        "ts": pd.to_datetime([
            "2026-01-01 00:01", "2026-01-01 00:02",
            "2026-01-01 00:12", "2026-01-01 00:13"]),
        "lang": ["en", "en", "de", "en"],
    })
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, lang string").parquet(src)
    out = streaming_facet_counts(stream, "ts", "lang",
                                 window="10 minutes", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("facet_t")
         .option("checkpointLocation", ckpt).outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(str(r["window_start"]), r["value"]): r["count"]
               for r in spark.sql("select * from facet_t").collect()}
        assert got[("2026-01-01 00:00:00", "en")] == 2
        assert got[("2026-01-01 00:10:00", "de")] == 1
        assert got[("2026-01-01 00:10:00", "en")] == 1
    finally:
        q.stop()
