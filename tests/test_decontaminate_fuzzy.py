"""Fuzzy (MinHash-LSH) benchmark decontamination: composition of gated
dedup primitives; result equals exact cross-side Jaccard on fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def setup(spark):
    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta IOTA"),   # near-copy of bench
        (2, "completely different text about nothing shared here at all"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # exact copy
    ], "doc_id long, text string")
    bench = spark.createDataFrame([
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
    ], "doc_id long, text string")
    return docs, bench


def test_fuzzy_flags_exact_and_near_copies(spark, setup):
    from lucene_spark.pipeline.decontaminate import fuzzy_contaminated_docs

    docs, bench = setup
    out = {r["key"]: r["max_jaccard"] for r in
           fuzzy_contaminated_docs(docs, bench, "text", "doc_id",
                                   threshold=0.5).collect()}
    assert set(out) == {0, 1, 3}
    assert out[0] == 1.0 and out[3] == 1.0
    assert 0.5 <= out[1] < 1.0


def test_matches_exact_cross_jaccard(spark, setup):
    """LSH + verify == exact cross-side Jaccard (the oracle contract)."""
    from lucene_spark.pipeline import dedup
    from lucene_spark.pipeline.decontaminate import fuzzy_contaminated_docs

    docs, bench = setup
    fuzzy = {(r["key"], round(r["max_jaccard"], 4)) for r in
             fuzzy_contaminated_docs(docs, bench, "text", "doc_id",
                                     threshold=0.3).collect()}
    # brute force: shingle both sides, all cross pairs
    both = docs.unionByName(bench)
    exact = dedup.exact_jaccard_pairs(both, "text", "doc_id",
                                      threshold=0.3)
    cross = exact.filter(
        ((F.col("key_a") >= 100) & (F.col("key_b") < 100)) |
        ((F.col("key_b") >= 100) & (F.col("key_a") < 100)))
    corp = cross.withColumn(
        "key", F.when(F.col("key_a") < 100, F.col("key_a"))
        .otherwise(F.col("key_b"))).groupBy("key").agg(
        F.max("jaccard").alias("mj"))
    brute = {(r["key"], round(r["mj"], 4)) for r in corp.collect()}
    assert fuzzy == brute
