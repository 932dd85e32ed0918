"""CCNet-style corpus curation (Wenzek et al. 2020, "CCNet: Extracting
high-quality monolingual datasets from web crawl data") — the canonical
web-crawl training-data pipeline, composed from this repo's own
primitives rather than re-implemented:

  1. exact dedup          -> dedup.dedup_keep_first   (sha256 groups,
                             lowest key survives)
  2. language ID          -> textstats.detect_language (script tier +
                             stopword profiles, pure JVM expressions)
  3. LM quality split     -> lm.train_bigram_lm + lm.score_perplexity,
                             then HEAD / MIDDLE / TAIL by per-LANGUAGE
                             perplexity terciles (CCNet's head/middle/
                             tail buckets; the paper uses fixed per-lang
                             thresholds from a Wikipedia-trained
                             KenLM — here the LM is self-trained and the
                             thresholds are the empirical terciles, the
                             sandbox-honest variant, and a `lm_docs`
                             hook accepts a clean reference slice).

Spark shape: every stage is the already-audited plan of its primitive
(one window for dedup, narrow expressions for langid, two count
aggregations + two key joins for the LM); the only additions here are
one tiny per-language percentile aggregate (exact distributed
interpolation) broadcast back onto the scored rows. Perplexities are
rounded to `round_to` before the tercile computation and the bucket
comparison so the split is replayable bit-for-bit by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.dedup import dedup_keep_first
from lucene_spark.pipeline.lm import score_perplexity, train_bigram_lm
from lucene_spark.pipeline.textstats import detect_language

__all__ = ["ccnet_curate"]

_T1, _T2 = 1.0 / 3.0, 2.0 / 3.0


def ccnet_curate(
    docs: DataFrame,
    text_col: str,
    key_col: str,
    min_count: int = 1,
    alpha: float = 0.1,
    round_to: int = 4,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Returns one row per SURVIVING (post-dedup) document:
    (key, detected_lang, n_bigrams, ppl_r, bucket) with bucket in
    head / middle / tail — head = the lowest-perplexity third WITHIN the
    document's detected language. Docs with no bigrams (< 2 tokens) go
    to head (no evidence against them — the perplexity_filter
    convention) and are excluded from the tercile estimation."""
    dd = dedup_keep_first(docs, text_col, key_col)
    lid = detect_language(dd, text_col).select(
        F.col(key_col).alias("key"), "detected_lang")
    bi, ctx, v = train_bigram_lm(lm_docs if lm_docs is not None else dd,
                                 text_col, min_count=min_count)
    scored = (score_perplexity(dd, text_col, key_col, bi, ctx, v,
                               alpha=alpha)
              .withColumnRenamed(key_col, "key")
              .withColumn("ppl_r", F.round("perplexity", round_to)))
    j = lid.join(scored.select("key", "n_bigrams", "ppl_r"), "key")
    # per-language terciles: an exact interpolated percentile is ONE
    # tiny aggregate (rows = distinct languages), broadcast back
    # thresholds are ROUNDED to round_to as well: Spark's percentile and
    # a SQL oracle's quantile_cont use algebraically-equal-but-different
    # interpolation expressions (lower*(1-g)+higher*g vs
    # lower+(higher-lower)*g) whose last-ulp difference could otherwise
    # flip a doc sitting exactly on a bucket boundary
    th = (j.filter(F.col("n_bigrams") > 0)
          .groupBy("detected_lang")
          .agg(F.expr(
              f"transform(percentile(ppl_r, array({_T1!r}, {_T2!r})),"
              f" t -> round(t, {int(round_to)}))").alias("__t")))
    out = j.join(F.broadcast(th), "detected_lang", "left")
    bucket = (F.when(F.col("n_bigrams") == 0, F.lit("head"))
              .when(F.col("ppl_r") <= F.col("__t")[0], F.lit("head"))
              .when(F.col("ppl_r") <= F.col("__t")[1], F.lit("middle"))
              .otherwise(F.lit("tail")))
    return out.select("key", "detected_lang", "n_bigrams", "ppl_r",
                      bucket.alias("bucket"))
