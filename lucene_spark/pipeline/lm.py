"""Distributed n-gram language-model perplexity filtering — the
CCNet/Gopher-style "train a cheap LM on the corpus, drop documents the
model finds surprising" quality pass of a training-data pipeline.

Role analogue: the quality-filter stage that sits next to the repo's
Gopher repetition / stopword-ratio features (`pipeline/textstats.py`);
the reference engine has no LM filter (it is an IR engine), so this is
one of the beyond-the-reference training-pipeline operators.

Spark-first shape, sized for 100 TB:

- **Tokenize narrow** (`split` on whitespace, JVM codegen) and build
  bigrams with `transform` over the token array — zero shuffle before
  the count aggregation.
- **Train = two groupBy counts** (bigram counts; context counts derived
  by a second map-side-combined groupBy on the bigram counts, NOT a
  second scan). The model tables are corpus-derived and bounded by the
  observed vocabulary, so they live as DataFrames and join by key —
  never collected to the driver, never broadcast unconditionally
  (a web-scale vocab does not fit the 8 GB broadcast cap).
- **Score = one explode + two key joins** (bigram table on (w1,w2),
  context table on w1) + one re-aggregation keyed by the doc id. All
  shuffles are on term keys with map-side combine; AQE handles skew on
  stop-bigrams.
- `min_count` prunes the bigram table (the scale knob: the long tail of
  hapax bigrams is most of the table and contributes ~ln(alpha/…) ≈ the
  unseen penalty anyway); pruned/unseen bigrams fall back to the
  add-alpha floor via the outer joins, so scoring is total.

Model: add-alpha bigram LM.

    P(w2 | w1) = (c(w1,w2) + alpha) / (ctx(w1) + alpha * V)

with ctx(w1) = Σ_w2 c(w1,w2) (left-context occurrences, so the model is
self-consistent under pruning) and V = |observed vocabulary|.  Per-doc
cross-entropy is the mean -ln P over the doc's bigrams; perplexity is
its exp. Documents with fewer than 2 tokens have no bigrams and score
NULL (callers decide; `perplexity_filter` keeps them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_bigram_lm", "score_perplexity", "perplexity_filter"]

#: tokens = split on whitespace runs; empties filtered (leading blanks)
_WS = r"\s+"


def _with_bigrams(df: DataFrame, text_col: str) -> DataFrame:
    """Project a `__bigrams` array<struct<w1,w2>> column — narrow (no
    shuffle), whole-stage-codegen JVM expressions only."""
    toks = F.filter(F.split(F.trim(F.col(text_col)), _WS),
                    lambda x: F.length(x) > 0)
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.expr("transform(slice(__toks, 1, size(__toks) - 1),"
               " (x, i) -> struct(x AS w1, __toks[i + 1] AS w2))"),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (df.withColumn("__toks", toks)
            .withColumn("__bigrams", bigrams).drop("__toks"))


def train_bigram_lm(
    docs: DataFrame, text_col: str, min_count: int = 1
) -> tuple[DataFrame, DataFrame, int]:
    """Count-train the LM. Returns (bigram_counts, context_counts, V):
    ``bigram_counts(w1, w2, c)`` pruned to c >= min_count,
    ``context_counts(w1, ctx)`` summed over the UNPRUNED bigrams (so
    probabilities stay calibrated when the tail is dropped), and the
    observed vocabulary size V (distinct whitespace tokens)."""
    bg = (_with_bigrams(docs, text_col)
          .select(F.explode("__bigrams").alias("b"))
          .select("b.w1", "b.w2"))
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = counts.groupBy("w1").agg(F.sum("c").alias("ctx"))
    bigram_counts = counts.filter(F.col("c") >= min_count)
    vocab = (docs.select(F.explode(
        F.filter(F.split(F.trim(F.col(text_col)), _WS),
                 lambda x: F.length(x) > 0)).alias("w"))
        .agg(F.countDistinct("w").alias("v")).collect()[0]["v"])
    return bigram_counts, ctx, int(vocab)


def score_perplexity(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document bigram cross-entropy (nats) and perplexity under the
    trained LM. Output: (id_col, n_bigrams, cross_entropy, perplexity);
    docs with < 2 tokens get n_bigrams = 0 and NULL scores."""
    exploded = (_with_bigrams(docs, text_col)
                .select(F.col(id_col),
                        F.explode_outer("__bigrams").alias("b"))
                .select(id_col, "b.w1", "b.w2"))
    joined = (exploded
              .join(bigram_counts, ["w1", "w2"], "left")
              .join(context_counts, ["w1"], "left"))
    av = float(alpha) * float(vocab_size)
    logp = F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(alpha)))
                 / (F.coalesce(F.col("ctx"), F.lit(0)) + F.lit(av)))
    per_doc = (joined
               .withColumn("__lp", F.when(F.col("w1").isNotNull(), logp))
               .groupBy(id_col)
               .agg(F.count("__lp").alias("n_bigrams"),
                    F.sum("__lp").alias("__sum")))
    ce = F.when(F.col("n_bigrams") > 0,
                -F.col("__sum") / F.col("n_bigrams"))
    return (per_doc
            .withColumn("cross_entropy", ce)
            .withColumn("perplexity", F.exp(F.col("cross_entropy")))
            .drop("__sum"))


def perplexity_filter(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_perplexity: float,
    min_count: int = 1,
    alpha: float = 0.1,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Keep documents whose self-LM perplexity is <= max_perplexity
    (train on ``lm_docs`` if given — e.g. a clean reference slice — else
    on ``docs`` themselves, the CCNet pattern). Docs too short to have
    bigrams are kept (no evidence against them)."""
    bi, ctx, v = train_bigram_lm(lm_docs if lm_docs is not None else docs,
                                 text_col, min_count=min_count)
    scored = score_perplexity(docs, text_col, id_col, bi, ctx, v,
                              alpha=alpha)
    keep = scored.filter(
        (F.col("n_bigrams") == 0)
        | (F.col("perplexity") <= F.lit(float(max_perplexity))))
    return docs.join(keep.select(id_col), id_col, "left_semi")
