"""Index-stats text classification — the lucene/classification module
restated (SimpleNaiveBayesClassifier.java; BM25NBClassifier.java uses the
same structure with BM25-weighted term stats).

Multinomial naive Bayes over whitespace tokens, trained and scored as
pure DataFrame plans (two aggregations to train; one broadcast join +
one aggregation to predict — no Python anywhere):

    score(c | d) = ln P(c) + Σ_t∈d ln P(t | c)
    P(c)     = docs_c / N
    P(t | c) = (count(t, c) + 1) / (tokens_c + V)     (add-one smoothing,
               exactly SimpleNaiveBayesClassifier's laplace smoothing)

Terms unseen in a class fall back to the smoothing floor 1/(tokens_c+V).
Prediction = argmax over classes, ties broken by class name asc
(deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    return (
        df.select(F.col(key_col).alias("key"),
                  F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
    )


def train_naive_bayes(df: DataFrame, text_col: str, label_col: str,
                      key_col: str) -> dict:
    """Returns the model as small DataFrames: {'cond': (label, term,
    logp), 'classes': (label, logprior, logfloor), 'vocab_size': V}.
    Everything stays distributed; the per-(label, term) table is the only
    non-tiny artifact and is broadcast at predict time (bounded by
    V × #classes)."""
    tok = _tokens(df, text_col, key_col)
    lab = df.select(F.col(key_col).alias("key"), F.col(label_col).alias("label"))
    tl = tok.join(lab, "key")
    vocab_size = tok.select("term").distinct().count()
    n_docs = df.count()
    classes = (
        lab.groupBy("label").agg(F.count("*").alias("docs"))
        .join(tl.groupBy("label").agg(F.count("*").alias("tokens")), "label")
        .select(
            "label",
            F.log(F.col("docs") / F.lit(float(n_docs))).alias("logprior"),
            F.log(F.lit(1.0) / (F.col("tokens") + F.lit(float(vocab_size))))
            .alias("logfloor"),
            (F.col("tokens") + F.lit(float(vocab_size))).alias("denom"),
        )
    )
    cond = (
        tl.groupBy("label", "term").agg(F.count("*").alias("cnt"))
        .join(classes.select("label", "denom"), "label")
        .select("label", "term",
                F.log((F.col("cnt") + 1.0) / F.col("denom")).alias("logp"))
    )
    return {"cond": cond, "classes": classes.drop("denom"),
            "vocab_size": vocab_size}


def predict_naive_bayes(model: dict, df: DataFrame, text_col: str,
                        key_col: str) -> DataFrame:
    """(key, predicted) — argmax_c [logprior_c + Σ_t logp(t|c)], unseen
    (term, class) pairs contributing the class's smoothing floor."""
    tok = _tokens(df, text_col, key_col)
    classes = model["classes"]
    cond = model["cond"]
    # every (token occurrence × class), then the seen/unseen log-prob
    scored = (
        tok.crossJoin(F.broadcast(classes.select("label", "logfloor")))
        .join(F.broadcast(cond), ["label", "term"], "left")
        .withColumn("lp", F.coalesce(F.col("logp"), F.col("logfloor")))
        .groupBy("key", "label").agg(F.sum("lp").alias("loglik"))
        .join(F.broadcast(classes.select("label", "logprior")), "label")
        .withColumn("score", F.col("loglik") + F.col("logprior"))
    )
    w = Window.partitionBy("key").orderBy(F.col("score").desc(), F.col("label").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("key", F.col("label").alias("predicted")))


def knn_classify(train_df: DataFrame, test_df: DataFrame, vec_col: str,
                 key_col: str, label_col: str, k: int = 5) -> DataFrame:
    """k-nearest-neighbor classification over an embedding column — the
    KNearestNeighborClassifier role (lucene/classification/src/java/org/
    apache/lucene/classification/KNearestNeighborClassifier.java:40-52:
    a MoreLikeThis query retrieves the k nearest indexed docs and the
    class is assigned by vote; classifyFromTopDocs counts classes and
    breaks ties by the SUM of neighbor scores). Here the neighbor
    retrieval is the exact chunked-broadcast GEMM knn_join and the vote
    is a pure DataFrame aggregation: count desc, then summed cosine
    desc, then label asc — deterministic.

    Returns (key, label, votes, score) — one row per test_df row that
    has at least one neighbor."""
    from lucene_spark.pipeline.similarity import knn_join

    nbrs = knn_join(test_df, train_df, vec_col, key_col, k=k)
    lab = train_df.select(F.col(key_col).alias("key"),
                          F.col(label_col).alias("label"))
    votes = (
        nbrs.join(F.broadcast(lab), "key")
        .groupBy(F.col("query_key").alias("key"), "label")
        .agg(F.count("*").alias("votes"), F.sum("cosine").alias("score"))
    )
    w = Window.partitionBy("key").orderBy(
        F.col("votes").desc(), F.col("score").desc(), F.col("label").asc())
    return (votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
