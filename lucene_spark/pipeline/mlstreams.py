"""ML streaming expressions — featuresSelection + textLogit (Solr roles).

Role analogues (SURVEY.md §2.8 "ML extras", previously out of scope):
- FeaturesSelectionStream (solr/solrj/src/java/org/apache/solr/client/
  solrj/io/stream/FeaturesSelectionStream.java:300-380) backed by
  IGainTermsQParserPlugin (solr/core/src/java/org/apache/solr/search/
  IGainTermsQParserPlugin.java finish()): per-term information gain of a
  binary outcome over the training doc set, top-N terms with
  idf = ln(numDocs / (docFreq + 1)) (FeaturesSelectionStream.java:377).
- TextLogitStream (solr/solrj/.../io/stream/TextLogitStream.java:453-509)
  backed by TextLogisticRegressionQParserPlugin (solr/core/.../search/
  TextLogisticRegressionQParserPlugin.java finish()): per-shard
  sequential SGD over tf-idf doc vectors, shard weights AVERAGED per
  iteration (TextLogitStream.averageWeights), error = Σ shard errors.

Spark shapes:
- igain_terms: explode(array_distinct(tokens)) → ONE groupBy(term) with
  map-side combine → JVM-side entropy math → top-N. No UDF anywhere; the
  formula replicates the reference bit-for-bit, including its
  `numDocs - docFreq + 1` denominator quirk.
- text_logit: doc vectors built once (one groupBy + broadcast semi-join
  on the feature terms), cached; each iteration is one applyInPandas
  pass per deterministic partition doing the reference's sequential
  per-doc update, then a driver-side average of the per-partition
  weights — exactly the reference's shard/merge topology (shards ↦
  partitions). The weights vector (num_terms+1 doubles) is the only
  driver-side state, so iteration cost is O(docs·dims) with no shuffle
  after the one-time vectorization.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

TOKEN_PATTERN = "[^a-z0-9]+"


def _tokens(text_col):
    toks = F.split(F.lower(text_col), TOKEN_PATTERN)
    return F.filter(toks, lambda x: x != "")


def _binary_entropy(prob):
    """IGainTermsQParserPlugin.binaryEntropy: 0 at prob∈{0,1} else
    -p·ln(p) - (1-p)·ln(1-p)."""
    p = prob
    return F.when((p <= 0.0) | (p >= 1.0), F.lit(0.0)).otherwise(
        -p * F.log(p) - (1.0 - p) * F.log(1.0 - p))


def igain_terms(docs: DataFrame, text_col: str, label_col: str,
                positive_label, num_terms: int = 20) -> DataFrame:
    """Information-gain feature selection (FeaturesSelectionStream /
    IGainTermsQParserPlugin). Returns the top `num_terms` terms by score
    desc (term asc on ties) with columns (term, score, docfreq, idf).

    docFreq counts docs CONTAINING the term (presence, not tf); xc is the
    positive subset. score = H(p_c) - (df/N)·H(xc/df)
    - (1 - df/N)·H((numPos - xc)/(N - df + 1))   [reference's exact form,
    IGainTermsQParserPlugin.java:finish]. idf = ln(N/(df+1))
    (FeaturesSelectionStream.java:377).
    """
    is_pos = (F.col(label_col) == F.lit(positive_label)).cast("long")
    base = docs.select(
        is_pos.alias("__pos"),
        F.array_distinct(_tokens(F.col(text_col))).alias("__toks"),
    ).persist()  # tokenization is the dominant cost — ONE pass feeds both
    try:
        totals = base.agg(
            F.count(F.lit(1)).alias("n"), F.sum("__pos").alias("npos")).collect()[0]
        n, npos = int(totals["n"]), int(totals["npos"] or 0)
        if n == 0:
            raise ValueError("igain_terms: empty training set")
        out = _igain_from_base(base, n, npos, num_terms)
        # materialize the ≤num_terms rows BEFORE dropping the cache so the
        # caller's consumption doesn't re-tokenize the corpus
        rows = out.collect()
        return base.sparkSession.createDataFrame(rows, out.schema)
    finally:
        base.unpersist()


def _igain_from_base(base: DataFrame, n: int, npos: int,
                     num_terms: int) -> DataFrame:
    per_term = (
        base.select("__pos", F.explode("__toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("docfreq"), F.sum("__pos").alias("xc"))
    )
    entropy_c = F.lit(float(_py_binary_entropy(npos / n)))
    df_d = F.col("docfreq").cast("double")
    xc_d = F.col("xc").cast("double")
    h_contains = _binary_entropy(xc_d / df_d)
    h_not = _binary_entropy((F.lit(float(npos)) - xc_d)
                            / (F.lit(float(n)) - df_d + 1.0))
    score = (entropy_c
             - ((df_d / n) * h_contains + (1.0 - df_d / n) * h_not))
    return (
        per_term
        .withColumn("score", score)
        .withColumn("idf", F.log(F.lit(float(n)) / (df_d + 1.0)))
        .select("term", "score", "docfreq", "idf")
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(num_terms)
    )


def _py_binary_entropy(p: float) -> float:
    if p <= 0.0 or p >= 1.0:
        return 0.0
    return -p * math.log(p) - (1.0 - p) * math.log(1.0 - p)


def apply_logit(docs: DataFrame, text_col: str, terms: list[str],
                idfs: list[float], weights: list[float],
                threshold: float = 0.5,
                prob_col: str = "probability") -> DataFrame:
    """Inference twin of :func:`text_logit` — score every doc with a
    trained model so the classifier can FILTER a corpus at scale (the
    quality-classifier stage of a training pipeline).

    Uses exactly the training vectorization
    (TextLogisticRegressionQParserPlugin.java:175-190):
    x = [1, idf_i·(1 + ln tf_i), ...], prob = sigmoid(x·w), predicted =
    prob ≥ threshold.  Docs containing none of the feature terms score
    sigmoid(w_0) (bias only) — training skips them, inference must still
    label them.  Everything stays JVM-side: per-term tf is
    size(filter(tokens, = term)) (bounded by len(terms) expressions, no
    UDF, no shuffle)."""
    if len(weights) != len(terms) + 1:
        raise ValueError("weights must be len(terms)+1 (bias first)")
    if len(idfs) != len(terms):
        raise ValueError("idfs length must match terms length")
    toks = _tokens(F.col(text_col))
    score = F.lit(float(weights[0]))

    def _eq(term):  # NOT a default-arg lambda: a 2-arg lambda would make
        return lambda x: x == F.lit(term)  # pyspark bind the ELEMENT INDEX

    for i, t in enumerate(terms):
        tf = F.size(F.filter(toks, _eq(t)))
        feat = F.when(
            tf > 0,
            F.lit(float(idfs[i])) * (1.0 + F.log(tf.cast("double")))
        ).otherwise(F.lit(0.0))
        score = score + F.lit(float(weights[i + 1])) * feat
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    return (docs.withColumn(prob_col, prob)
            .withColumn("predicted",
                        (F.col(prob_col) >= threshold).cast("int")))


_LOGIT_SCHEMA = T.StructType([
    T.StructField("weights", T.ArrayType(T.DoubleType())),
    T.StructField("error", T.DoubleType()),
    T.StructField("true_positive", T.LongType()),
    T.StructField("true_negative", T.LongType()),
    T.StructField("false_positive", T.LongType()),
    T.StructField("false_negative", T.LongType()),
])


def text_logit(docs: DataFrame, text_col: str, label_col: str,
               positive_label, terms: list[str],
               idfs: list[float] | None = None,
               max_iterations: int = 10, alpha: float = 0.01,
               threshold: float = 0.5, num_partitions: int = 4,
               id_col: str | None = None) -> DataFrame:
    """Distributed logistic regression over tf-idf text features
    (TextLogitStream / TextLogisticRegressionQParserPlugin).

    Feature vector per doc: [1.0, idf_i·(1 + ln tf_i), ...] (zero when the
    term is absent — TextLogisticRegressionQParserPlugin.java:175-190).
    Weights start ALL-ONES, bias included (the plugin's default when the
    stream ships none, TextLogisticRegressionQParserPlugin.java:95-99).
    Each iteration runs the reference's sequential per-doc update within
    every partition (error = sigmoid(x·w_prev-pass) − y, w -= α·error·x,
    evaluated error/confusion against the ITERATION-START weights), then
    averages the partition weight vectors (TextLogitStream.java:473
    averageWeights) and sums errors. The learning rate adapts per
    iteration after the first (TextLogitStream.java:491-497): ×0.5 when
    the summed error did not improve, ×1.05 when it did; each output row
    carries the rate its own SGD pass used (the reference's alpha_d). Partitions play the shard role; the
    split is deterministic (doc hash mod num_partitions, doc-id order
    within) so results are reproducible run-to-run.

    Returns one row per iteration: (iteration, error, true_positive,
    true_negative, false_positive, false_negative, alpha, weights).
    """
    if idfs is None:
        n = docs.count()
        df_rows = (
            docs.select(F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("term"))
            .filter(F.col("term").isin(list(terms)))
            .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
            .collect())
        df_map = {r["term"]: int(r["df"]) for r in df_rows}
        idfs = [math.log(n / (df_map.get(t, 0) + 1)) for t in terms]
    if len(idfs) != len(terms):
        raise ValueError("idfs length must match terms length")

    term_idx = {t: i for i, t in enumerate(terms)}
    dims = len(terms) + 1

    # one-time vectorization: tf of feature terms per doc, as sparse
    # parallel arrays (arrays survive Arrow → pandas untouched; MapType
    # representations vary). id_col (when the input has a stable key)
    # makes partition membership — and therefore the averaged weights —
    # deterministic run-to-run; the fallback monotonic id is stable only
    # within one input partitioning.
    row_key = F.col(id_col) if id_col else F.monotonically_increasing_id()
    toks = docs.select(
        row_key.alias("__row"),
        # null-safe: docs outside the positive set (incl. NULL labels) are
        # the negative class, as in the reference's positive/negative DocSets
        F.col(label_col).eqNullSafe(F.lit(positive_label)).cast("int").alias("__y"),
        _tokens(F.col(text_col)).alias("__toks"),
    )
    tf = (
        toks.select("__row", "__y", F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy("__row", "__y", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("__row", "__y")
        .agg(F.collect_list("term").alias("t_terms"),
             F.collect_list("tf").alias("t_freqs"))
    )
    # docs with none of the feature terms never enter docVectors in the
    # reference (vector stays absent) — replicate by inner semantics of
    # the tf groupBy (rows without matches drop out)
    vec = tf.repartition(num_partitions, F.col("__row")).sortWithinPartitions("__row")
    vec = vec.persist()
    vec.count()

    import numpy as np

    idf_arr = list(map(float, idfs))
    # all-ones start, bias included (TextLogisticRegressionQParserPlugin
    # .java:95-99 — the default when the stream ships no weights)
    weights = [1.0] * dims
    # adaptive learning rate (TextLogitStream.java:491-497): halve when an
    # iteration's error did not improve, grow 5% when it did; the rate in
    # each output row is the one THAT iteration's SGD used
    rate = float(alpha)
    last_error: float | None = None
    out_rows = []
    try:
        for it in range(1, max_iterations + 1):
            w0 = list(weights)

            def run_pass(pdf_iter, w_start=w0, alpha=rate):
                w_prev = np.asarray(w_start, dtype="float64")
                w = w_prev.copy()
                err = 0.0
                tp = tn = fp = fn = 0
                idf_np = np.asarray(idf_arr, dtype="float64")
                any_rows = False
                for pdf in pdf_iter:
                    for y, tt, ff in zip(pdf["__y"].values,
                                         pdf["t_terms"].values,
                                         pdf["t_freqs"].values):
                        any_rows = True
                        x = np.zeros(len(idf_np) + 1)
                        x[0] = 1.0
                        for t, f_ in zip(tt, ff):
                            i = term_idx.get(t)
                            if i is not None:
                                x[i + 1] = idf_np[i] * (1.0 + math.log(f_))
                        sig = 1.0 / (1.0 + math.exp(-float(x @ w)))
                        last_sig = 1.0 / (1.0 + math.exp(-float(x @ w_prev)))
                        err += abs(last_sig - int(y))
                        pred = 1 if last_sig >= threshold else 0
                        if y == 1 and pred == 1:
                            tp += 1
                        elif y == 0 and pred == 0:
                            tn += 1
                        elif y == 0 and pred == 1:
                            fp += 1
                        else:
                            fn += 1
                        w -= alpha * (sig - int(y)) * x
                if any_rows:
                    yield pd.DataFrame({
                        "weights": [list(map(float, w))], "error": [err],
                        "true_positive": [tp], "true_negative": [tn],
                        "false_positive": [fp], "false_negative": [fn]})

            parts = vec.mapInPandas(run_pass, schema=_LOGIT_SCHEMA).collect()
            if not parts:
                raise ValueError("text_logit: no docs contain any feature term")
            weights = [sum(r["weights"][i] for r in parts) / len(parts)
                       for i in range(dims)]
            error = float(sum(r["error"] for r in parts))
            out_rows.append((
                it,
                error,
                int(sum(r["true_positive"] for r in parts)),
                int(sum(r["true_negative"] for r in parts)),
                int(sum(r["false_positive"] for r in parts)),
                int(sum(r["false_negative"] for r in parts)),
                float(rate),
                list(weights),
            ))
            if it != 1:
                # TextLogitStream.java:491-497 — adapt AFTER emitting
                rate = rate * 0.5 if last_error <= error else rate * 1.05
            last_error = error
    finally:
        vec.unpersist()

    spark = docs.sparkSession
    schema = T.StructType([
        T.StructField("iteration", T.IntegerType()),
        T.StructField("error", T.DoubleType()),
        T.StructField("true_positive", T.LongType()),
        T.StructField("true_negative", T.LongType()),
        T.StructField("false_positive", T.LongType()),
        T.StructField("false_negative", T.LongType()),
        T.StructField("alpha", T.DoubleType()),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ])
    return spark.createDataFrame(out_rows, schema)
