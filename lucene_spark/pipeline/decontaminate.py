"""Benchmark decontamination — n-gram collision scan of a training corpus
against an evaluation/benchmark set.

The training-data operator behind "remove eval contamination" (the
GPT-3/PaLM-style 13-gram overlap rule): any training document sharing at
least `min_hits` distinct word n-grams with any benchmark document is
flagged. There is no Lucene analogue (this is a corpus-hygiene op, not a
search op); the Spark shape mirrors the engine's exact-dedup design:

- benchmark n-grams are hashed JVM-side (xxhash64) and DISTINCT-ed —
  at 100 TB the benchmark side is tiny (eval sets are MBs), so the join
  is a BROADCAST semi-join against the training corpus's exploded
  n-gram stream; no shuffle of the big side.
- the training side explodes to (doc, gram_hash) with array_distinct
  applied per-doc first, then aggregates hits per doc with map-side
  combine. One wide scan, one broadcast join, one groupBy.

Outputs are exact (no sketching) — contamination is a correctness
gate for training data, so the scale path IS the exact path here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _gram_hashes(text: Column, n: int) -> Column:
    """Distinct xxhash64 hashes of the lowercased word n-grams of text."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    valid = F.filter(grams, lambda g: F.size(F.split(g, " ")) >= n)
    return F.array_distinct(F.transform(valid, lambda g: F.xxhash64(g)))


def contaminated_docs(
    corpus: DataFrame, benchmark: DataFrame, text_col: str, key_col: str,
    n: int = 13, min_hits: int = 1,
) -> DataFrame:
    """Training docs sharing ≥ min_hits distinct n-grams with the
    benchmark. Returns (key, hits) sorted by key.

    corpus: the big table; benchmark: the small eval table (broadcast).
    Documents shorter than n words produce no n-grams and are never
    flagged (matching the published overlap rules, which skip short
    sequences)."""
    bench = (
        benchmark.select(F.explode(_gram_hashes(F.col(text_col), n)).alias("gh"))
        .distinct()
    )
    grams = corpus.select(
        F.col(key_col).alias("key"),
        F.explode(_gram_hashes(F.col(text_col), n)).alias("gh"),
    )
    hits = (
        grams.join(F.broadcast(bench), "gh")
        .groupBy("key")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )
    return hits.orderBy("key")


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, text_col: str, key_col: str,
    n: int = 13, min_hits: int = 1,
) -> DataFrame:
    """The filter form: corpus minus contaminated docs (left anti join)."""
    bad = contaminated_docs(corpus, benchmark, text_col, key_col, n, min_hits)
    return corpus.join(
        bad.select(F.col("key").alias(key_col)), key_col, "left_anti")
