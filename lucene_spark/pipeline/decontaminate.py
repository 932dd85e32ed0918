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


def fuzzy_contaminated_docs(
    docs, bench, text_col: str, key_col: str, n: int = 3,
    threshold: float = 0.5, num_hashes: int = 64, bands: int = 32,
    rows_per_band: int = 2, max_bucket: int = 500,
):
    """FUZZY benchmark decontamination: flag corpus documents whose
    n-gram Jaccard similarity with ANY benchmark document reaches
    `threshold` — the near-duplicate analogue of the 13-gram exact
    overlap check (contaminated_docs), catching lightly-edited
    benchmark copies the exact check misses.

    Composition of the gated dedup primitives: shingle both sides
    (side-tagged keys so sides never collide), OPH MinHash signatures,
    LSH band-bucket join restricted
    to CROSS-side pairs, exact-Jaccard verification of the candidates.
    Same scale shape as dedup_minhash: signatures are one xxhash64 per
    shingle, the only quadratic work happens inside capped LSH buckets.
    Default banding (32x2) makes candidate recall ≥0.9998 at s=0.5, so
    on fixture-sized corpora the result EQUALS exact cross-side
    Jaccard — the oracle the driver gate uses.

    `max_bucket` caps LSH bucket size (the quadratic-blowup guard
    inherited from minhash_lsh_pairs), defaulting HIGHER here (500)
    because a benchmark document mass-copied into the corpus puts all
    its copies in ONE bucket in every band — dropping that bucket
    would hide exactly the most-contaminated content. Exact-dedup the
    corpus first (dd_exact) when floods beyond the cap are possible.

    Keys are side-tagged as strings ('c:'/'b:' prefixes — works for ANY
    key type: numeric, sha-hex, url) and the ORIGINAL key values are
    restored by joining back to `docs`, so no cast can silently null or
    overflow them.

    Returns DataFrame(key, max_jaccard) — one row per contaminated
    corpus document (key column named after key_col, original type)."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline import dedup

    tag = lambda side, df: df.select(  # noqa: E731
        F.concat(F.lit(side), F.col(key_col).cast("string"))
        .alias(key_col), text_col)
    both = tag("c:", docs).unionByName(tag("b:", bench))
    sh = dedup.shingles(both, text_col, key_col, n=n)
    sig = dedup.minhash_signatures(sh, num_hashes=num_hashes)
    pairs = dedup.minhash_lsh_pairs(sig, bands=bands,
                                    rows_per_band=rows_per_band,
                                    max_bucket=max_bucket)
    cross = pairs.filter(F.substring("key_a", 1, 2) !=
                         F.substring("key_b", 1, 2))
    verified = dedup.jaccard_verify(sh, cross, threshold=threshold)
    corp_key = F.when(F.col("key_a").startswith("c:"),
                      F.col("key_a")).otherwise(F.col("key_b"))
    flagged = (verified
               .select(corp_key.alias("__ck"), "jaccard")
               .select(F.expr("substring(__ck, 3)").alias("__key_str"),
                       "jaccard")
               .groupBy("__key_str")
               .agg(F.max("jaccard").alias("max_jaccard")))
    # restore the caller's native key type/values via a join on the
    # string form (distinct keys — one row out per flagged doc)
    keys = docs.select(key_col).distinct().withColumn(
        "__key_str", F.col(key_col).cast("string"))
    return (keys.join(flagged, "__key_str")
            .select(F.col(key_col).alias("key"), "max_jaccard"))


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, text_col: str, key_col: str,
    n: int = 13, min_hits: int = 1,
) -> DataFrame:
    """The filter form: corpus minus contaminated docs (left anti join)."""
    bad = contaminated_docs(corpus, benchmark, text_col, key_col, n, min_hits)
    return corpus.join(
        bad.select(F.col("key").alias(key_col)), key_col, "left_anti")
