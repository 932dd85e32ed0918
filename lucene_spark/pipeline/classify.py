"""Index-stats text classification — the lucene/classification module
restated (SimpleNaiveBayesClassifier.java, BM25NBClassifier.java,
BooleanPerceptronClassifier.java, KNearestNeighborClassifier.java).

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

import math

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    return (
        df.select(F.col(key_col).alias("key"),
                  F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
    )


def _corpus_stats(train_df: DataFrame, text_col: str, key_col: str):
    """Shared BM25 corpus prelude: per-doc term frequencies, doc
    lengths, and the scalar (n_text, avgdl, n_docs) triple. avgdl's
    denominator is the number of docs WITH tokens (n_text), matching
    Lucene's sumTotalTermFreq/docCount convention."""
    tok = _tokens(train_df, text_col, key_col)
    tf = tok.groupBy("key", "term").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("key").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_text"),
                   F.sum("dl").alias("toks")).head()
    n_text = stats["n_text"]
    avgdl = float(stats["toks"]) / max(n_text, 1)
    n_docs = train_df.count()
    return tf, dl, n_text, avgdl, n_docs


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


def perceptron_train(df: DataFrame, text_col: str, label_col: str,
                     key_col: str, bias: float | None = None,
                     batch_size: int = 32, num_partitions: int = 1
                     ) -> tuple[DataFrame, float]:
    """Boolean perceptron over term frequencies —
    BooleanPerceptronClassifier (lucene/classification/src/java/org/
    apache/lucene/classification/BooleanPerceptronClassifier.java:80-204):
    weights start at each term's TOTAL term frequency, one sequential
    pass over the training docs in key order; a misclassified doc moves
    each of its terms by modifier×tf clamped at 0, reading the PREVIOUS
    value from the batched FST snapshot (refreshed only when the
    misclassify lands on a batchSize boundary — updateWeights:166-204,
    the staleness is part of the contract). bias defaults to the average
    total term freq per doc (:100-104).

    The algorithm is inherently sequential (like TextLogitStream):
    num_partitions=1 replays the reference exactly; >1 runs the fold per
    partition (key-ordered within) and AVERAGES the partition weight
    tables — the standard parallel-perceptron shard merge. Weight values
    stay integral (the reference stores longs in an FST).

    Scale bound: the weight table (one float per vocab term) lives on
    the driver during the fold — the same in-RAM bound as the
    reference's FST (:80-104). For corpora whose vocabulary exceeds
    driver memory, truncate the feature space first (e.g. igain_terms /
    top-df terms), as every in-memory perceptron must.

    Returns (weights DataFrame(term, weight), bias)."""
    tok = _tokens(df, text_col, key_col)
    init_rows = tok.groupBy("term").agg(F.count("*").alias("ttf")).collect()
    init = {r["term"]: float(r["ttf"]) for r in init_rows}
    n_docs = df.count()
    if bias is None or bias == 0.0:
        bias = sum(init.values()) / max(n_docs, 1)
    b_val = float(bias)
    lab = df.select(F.col(key_col).alias("key"),
                    F.col(label_col).cast("boolean").alias("y"))
    vec = (
        tok.groupBy("key", "term").agg(F.count("*").alias("tf"))
        .groupBy("key")
        .agg(F.collect_list("term").alias("t_terms"),
             F.collect_list("tf").alias("t_freqs"))
        .join(lab, "key")
        .repartition(num_partitions, F.col("key"))
        .sortWithinPartitions("key")
    )
    bsz = int(batch_size)

    def fold(pdf_iter):
        import pandas as pd

        fst = dict(init)
        weights = dict(init)
        batch = 0
        any_rows = False
        for pdf in pdf_iter:
            order = pdf.sort_values("key")
            for y, tt, ff in zip(order["y"].values, order["t_terms"].values,
                                 order["t_freqs"].values):
                any_rows = True
                out = 0.0
                for t, f_ in zip(tt, ff):
                    w = fst.get(t)
                    if w is not None:
                        out += w * float(f_)
                assigned = out >= b_val
                correct = bool(y)
                modifier = (1 if correct and not assigned
                            else -1 if assigned and not correct else 0)
                if modifier != 0:
                    for t, f_ in zip(tt, ff):
                        prev = fst.get(t)
                        weights[t] = (0.0 if prev is None
                                      else max(0.0, prev + modifier * float(f_)))
                    if batch % bsz == 0:
                        fst = dict(weights)
                batch += 1
        if any_rows:
            yield pd.DataFrame({"term": list(weights.keys()),
                                "weight": list(weights.values())})

    parts = vec.mapInPandas(fold, schema="term string, weight double")
    weights_df = (parts.groupBy("term")
                  .agg(F.avg("weight").alias("weight")))
    return weights_df, b_val


def perceptron_classify(weights: DataFrame, test_df: DataFrame,
                        text_col: str, key_col: str, bias: float) -> DataFrame:
    """assignClass (BooleanPerceptronClassifier.java:218-236): output =
    Σ weight over token occurrences (absent terms contribute nothing),
    class = output ≥ bias, score = 1 − e^(−|bias−output|/bias).
    Returns (key, assigned, score); docs with zero known tokens score
    output=0 (kept — the reference classifies them False)."""
    tok = _tokens(test_df, text_col, key_col)
    keys = test_df.select(F.col(key_col).alias("key")).distinct()
    sums = (
        tok.join(F.broadcast(weights), "term", "left")
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("out"))
    )
    out = (keys.join(sums, "key", "left")
           .withColumn("out", F.coalesce(F.col("out"), F.lit(0.0))))
    return out.select(
        "key",
        (F.col("out") >= F.lit(bias)).alias("assigned"),
        (F.lit(1.0) - F.exp(-F.abs(F.lit(bias) - F.col("out")) / F.lit(bias))
         ).alias("score"),
    )


def knn_fuzzy_classify(train_df: DataFrame, test_df: DataFrame,
                       text_col: str, label_col: str, key_col: str,
                       k: int = 3, k1: float = 1.2, b: float = 0.75,
                       max_variants_per_term: int = 50,
                       max_num_terms: int = 300,
                       round_to: int | None = None) -> DataFrame:
    """KNearestFuzzyClassifier (lucene/classification/.../
    KNearestFuzzyClassifier.java + utils/NearestFuzzyQuery.java) as one
    distributed plan:

    1. Each distinct analyzed test term expands to vocabulary terms
       sharing its min(2, len)-char prefix within edit distance 1
       (PREFIX_LENGTH=2, MIN_SIMILARITY=1 — NearestFuzzyQuery.java:53-54);
       variant boost = 1 for exact, else 1 − ed/min(len) (FuzzyTermsEnum
       .java:249-255). Top MAX_VARIANTS_PER_TERM=50 per term by boost.
    2. Variant score = boost² × (ln((N+1)/(df+1))+1) with df = the exact
       term's df, or the integer mean of variant dfs when the exact term
       is unindexed (addTerms:172-190). Top MAX_NUM_TERMS=300 per test
       doc overall (ties keep the lexicographically smaller term, per
       ScoreTermQueue.lessThan).
    3. Docs score Σ variant_score × BM25(tf, dl) with df FORCED to 1
       (newTermQuery:202-216 builds TermStates with df=ttf=1) and real
       field avgdl; top-k docs per test doc (ties: lower key).
    4. Class vote (buildListFromTopDocs:150-196): per class,
       boostSum = Σ score/maxScore; class score = boostSum/k, scaled by
       k/sumdoc when fewer than k docs returned → boostSum/min(k, hits).

    Prefix join is an equi-join on (plen, prefix) — vocabulary exploded
    by its 1- and 2-char prefixes — so the expansion never cross-joins.
    Returns (key, predicted, score) for the winning class per test doc
    (ties → label asc; the reference's HashMap iteration is unspecified).
    Test docs with no variant at all produce no row (assignClass returns
    null on an empty TopDocs). `round_to` rounds the summed per-doc
    score before the top-k cut (and the class score after) so summation
    order can't flip rank ties across engines — the oracle-gate
    convention. The per-variant scores need no rounding: they are pure
    per-row expressions, bit-identical on any IEEE engine."""
    tf, dl, n_text, avgdl, n_docs = _corpus_stats(train_df, text_col, key_col)
    vocab = tf.groupBy("term").agg(F.count("*").alias("df"))
    # vocabulary exploded by prefix keys (plen 1 and 2); a 1-char term's
    # 2-char substr is itself, which correctly only meets 1-char queries
    cand = vocab.select(
        F.col("term").alias("cand"), "df",
        F.explode(F.array(
            F.struct(F.lit(1).alias("plen"), F.substring("term", 1, 1).alias("pfx")),
            F.struct(F.lit(2).alias("plen"), F.substring("term", 1, 2).alias("pfx")),
        )).alias("pk"),
    ).select("cand", "df", F.col("pk.plen").alias("plen"), F.col("pk.pfx").alias("pfx"))
    qt = (_tokens(test_df, text_col, key_col)
          .select(F.col("key").alias("tkey"), F.col("term").alias("qterm"))
          .distinct()
          .withColumn("plen", F.least(F.lit(2), F.length("qterm")))
          .withColumn("pfx", F.expr("substring(qterm, 1, plen)")))
    ed = F.levenshtein(F.col("qterm"), F.col("cand"))
    variants = (
        qt.join(cand, ["plen", "pfx"])
        .withColumn("ed", ed).filter(F.col("ed") <= 1)
        .withColumn("boost", F.when(F.col("ed") == 0, F.lit(1.0)).otherwise(
            F.lit(1.0) - F.lit(1.0) / F.least(F.length("qterm"), F.length("cand"))))
    )
    wv = Window.partitionBy("tkey", "qterm").orderBy(
        F.col("boost").desc(), F.col("cand").asc())
    variants = (variants.withColumn("rn", F.row_number().over(wv))
                .filter(F.col("rn") <= max_variants_per_term).drop("rn"))
    # per (tkey, qterm): exact df, else integer mean of variant dfs
    wq = Window.partitionBy("tkey", "qterm")
    variants = (variants
                .withColumn("exact_df", F.max(
                    F.when(F.col("ed") == 0, F.col("df"))).over(wq))
                # Java int division floors (positive operands); floor()
                # explicitly — a double→long CAST rounds on some engines
                .withColumn("avg_df", F.floor(F.sum("df").over(wq)
                                              / F.count("*").over(wq)))
                .withColumn("idf_df", F.coalesce("exact_df", "avg_df"))
                .withColumn("st_score", F.col("boost") * F.col("boost") * (
                    F.log(F.lit(float(n_docs + 1)) / (F.col("idf_df") + 1.0))
                    + F.lit(1.0))))
    wt = Window.partitionBy("tkey").orderBy(
        F.col("st_score").desc(), F.col("cand").asc())
    variants = (variants.withColumn("rn", F.row_number().over(wt))
                .filter(F.col("rn") <= max_num_terms)
                .select("tkey", "cand", "st_score"))
    idf1 = math.log(1.0 + (n_text - 1 + 0.5) / 1.5)
    docscore = (
        variants.join(tf.withColumnRenamed("term", "cand"), "cand")
        .join(dl, "key")
        .withColumn("leg", F.col("st_score") * F.lit(idf1) * F.col("tf") / (
            F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(avgdl))))
        .groupBy("tkey", "key").agg(F.sum("leg").alias("score"))
    )
    if round_to is not None:
        docscore = docscore.withColumn("score", F.round("score", round_to))
    wd = Window.partitionBy("tkey").orderBy(F.col("score").desc(), F.col("key").asc())
    top = (docscore.withColumn("rn", F.row_number().over(wd))
           .filter(F.col("rn") <= k).drop("rn"))
    lab = train_df.select(F.col(key_col).alias("key"),
                          F.col(label_col).alias("label"))
    wmax = Window.partitionBy("tkey")
    voted = (
        top.join(F.broadcast(lab), "key")
        .withColumn("maxscore", F.max("score").over(wmax))
        .withColumn("hits", F.count("*").over(wmax))
        .groupBy("tkey", "label")
        .agg(F.sum(F.col("score") / F.col("maxscore")).alias("boostsum"),
             F.first("hits").alias("hits"))
        .withColumn("cscore", F.col("boostsum")
                    / F.least(F.lit(k), F.col("hits")))
    )
    if round_to is not None:
        voted = voted.withColumn("cscore", F.round("cscore", round_to))
    ww = Window.partitionBy("tkey").orderBy(
        F.col("cscore").desc(), F.col("label").asc())
    return (voted.withColumn("rn", F.row_number().over(ww))
            .filter(F.col("rn") == 1)
            .select(F.col("tkey").alias("key"),
                    F.col("label").alias("predicted"),
                    F.col("cscore").alias("score")))


def bm25_nb_classify(train_df: DataFrame, test_df: DataFrame, text_col: str,
                     label_col: str, key_col: str,
                     k1: float = 1.2, b: float = 0.75,
                     round_to: int | None = None) -> DataFrame:
    """Naive Bayes approximated by pure BM25 queries — BM25NBClassifier
    (lucene/classification/src/java/org/apache/lucene/classification/
    BM25NBClassifier.java:120-231) restated as ONE distributed plan
    instead of C×(T+1) driver-side searches per input:

      P(w|c)   = top-1 score of BooleanQuery(MUST class:c, SHOULD text:w)
               = classScore(c) + max_{d∈c} bm25(w, d)   (0 when absent)
      prior(c) = ln(top-1 score of TermQuery(class:c)) = ln(classScore(c))
      score(text, c) = prior(c) + Σ_tokens ln P(token|c)
      → softmax-normalized (normClassificationResults:146-168), argmax.

    The class field is a single-token StringField (tf=1, dl=1, avgdl=1),
    so every doc of a class carries the identical class-leg score
    idf(df_c)/(1+k1) — which is why the per-(class, word) max reduces to
    one groupBy over the class⋈postings join. Math in float64 (the
    declarative-twin convention; Lucene sums float32).
    Returns (key, predicted, prob) — prob is the normalized winner.
    Ties broken by label asc (the reference's HashMap order is
    unspecified; we pin it). `round_to` rounds the per-class log score
    before the argmax (and prob after) so float summation order can
    never flip a near-tie across engines — the oracle-gate convention."""
    tf, dl, n_text, avgdl, n_docs = _corpus_stats(train_df, text_col, key_col)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_text)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    text_score = idf * F.col("tf") / (
        F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(avgdl)))
    lab = train_df.select(F.col(key_col).alias("key"),
                          F.col(label_col).alias("label"))
    classes = (
        lab.groupBy("label").agg(F.count("*").alias("df_c"))
        .withColumn(
            "class_score",
            F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_c") + 0.5)
                  / (F.col("df_c") + 0.5)) / F.lit(1.0 + k1))
        .withColumn("prior", F.log("class_score"))
        .select("label", "class_score", "prior")
    )
    # best text-leg score of word w within class c (the top-1 doc of the
    # MUST class / SHOULD word boolean maximizes the constant class leg
    # plus the word leg)
    cw = (
        tf.join(dl, "key").join(F.broadcast(df_), "term")
        .withColumn("ts", text_score)
        .join(lab, "key")
        .groupBy("label", "term").agg(F.max("ts").alias("best"))
    )
    ttok = _tokens(test_df, text_col, key_col)
    scored = (
        ttok.crossJoin(F.broadcast(classes.select("label", "class_score")))
        .join(F.broadcast(cw), ["label", "term"], "left")
        .withColumn("lp", F.log(F.col("class_score")
                                + F.coalesce(F.col("best"), F.lit(0.0))))
        .groupBy("key", "label").agg(F.sum("lp").alias("loglik"))
        .join(F.broadcast(classes.select("label", "prior")), "label")
        .withColumn("s", F.col("loglik") + F.col("prior"))
    )
    if round_to is not None:
        scored = scored.withColumn("s", F.round("s", round_to))
    # log-sum-exp softmax per key (normClassificationResults), winner out
    wmax = Window.partitionBy("key")
    scored = (scored
              .withColumn("smax", F.max("s").over(wmax))
              .withColumn("lse", F.col("smax") + F.log(
                  F.sum(F.exp(F.col("s") - F.col("smax"))).over(wmax)))
              .withColumn("prob", F.exp(F.col("s") - F.col("lse"))))
    if round_to is not None:
        scored = scored.withColumn("prob", F.round("prob", round_to))
    w = Window.partitionBy("key").orderBy(F.col("s").desc(), F.col("label").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("key", F.col("label").alias("predicted"), "prob"))


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
