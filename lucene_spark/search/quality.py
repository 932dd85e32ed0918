"""IR-quality metrics — the reference's quality harness restated.

Role analogue: lucene/benchmark/src/java/org/apache/lucene/benchmark/
quality/QualityStats.java:27-36 (recall, precision@k `pAt`, MAP as
average precision over relevant ranks, MRR) driven by TREC-style
topics/qrels (benchmark/quality/trec/).

Spark-first: judgments and results are DataFrames; the whole query set is
executed in one job via searcher.search_many and metrics reduce with one
aggregation — evaluating 10^5 queries against a 100 TB index is the same
plan as 10 queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def evaluate(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query IR metrics.

    results: (query_id, doc_id, rank)  — e.g. search_many output
    qrels:   (query_id, doc_id)        — relevant pairs
    Returns (query_id, n_rel, n_ret, hits, precision_at_k, recall_at_k,
    average_precision, reciprocal_rank)."""
    from pyspark.sql import Window

    # duplicate (query_id, doc_id) judgment pairs (multi-assessor TREC
    # qrels) would multiply joined rows and push precision past 1.0
    qrels = qrels.select("query_id", "doc_id").distinct()
    rel_counts = qrels.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    joined = (
        results.filter(F.col("rank") <= k)
        .join(qrels.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    )
    # cumulative relevant count at each rank → precision at relevant ranks
    # → AP (QualityStats.addResult math)
    win = (Window.partitionBy("query_id").orderBy("rank")
           .rowsBetween(Window.unboundedPreceding, 0))
    joined = joined.withColumn("cum_rel", F.sum("rel").over(win))
    per = (
        joined.groupBy("query_id")
        .agg(
            F.count("*").alias("n_ret"),
            F.sum("rel").alias("hits"),
            (F.sum("rel") / F.lit(float(k))).alias("precision_at_k"),
            F.sum(
                F.when(F.col("rel") == 1, F.col("cum_rel") / F.col("rank"))
                .otherwise(F.lit(0.0))
            ).alias("ap_sum"),
            F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel_rank"),
        )
    )
    # RIGHT-outer against the judged query set: a query whose search
    # produced no rows at all (search_many emits nothing for no-match
    # queries) must still contribute AP=0 / RR=0 / recall=0 to the
    # macro averages (QualityStats scores it 0) instead of vanishing
    out = (
        per.join(rel_counts, "query_id", "full")
        .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0)))
        .withColumn("n_ret", F.coalesce(F.col("n_ret"), F.lit(0)))
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)))
        .withColumn("precision_at_k",
                    F.coalesce(F.col("precision_at_k"), F.lit(0.0)))
        .withColumn("ap_sum", F.coalesce(F.col("ap_sum"), F.lit(0.0)))
        .withColumn("recall_at_k",
                    F.when(F.col("n_rel") > 0, F.col("hits") / F.col("n_rel"))
                    .otherwise(F.lit(0.0)))
        .withColumn("average_precision",
                    F.when(F.col("n_rel") > 0, F.col("ap_sum") / F.col("n_rel"))
                    .otherwise(F.lit(0.0)))
        .withColumn("reciprocal_rank",
                    F.when(F.col("first_rel_rank").isNotNull(),
                           F.lit(1.0) / F.col("first_rel_rank"))
                    .otherwise(F.lit(0.0)))
        .select("query_id", "n_rel", "n_ret", "hits", "precision_at_k",
                "recall_at_k", "average_precision", "reciprocal_rank")
    )
    return out


def summarize(per_query: DataFrame) -> dict:
    """Macro-averaged summary: MAP, MRR, mean P@k / recall@k."""
    row = per_query.agg(
        F.avg("average_precision").alias("map"),
        F.avg("reciprocal_rank").alias("mrr"),
        F.avg("precision_at_k").alias("mean_p_at_k"),
        F.avg("recall_at_k").alias("mean_recall_at_k"),
        F.count("*").alias("n_queries"),
    ).collect()[0]
    return {k: (float(v) if v is not None else 0.0) for k, v in row.asDict().items()}
