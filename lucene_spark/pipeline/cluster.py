"""Distributed k-means clustering — the Solr math-expression `kmeans`
evaluator role (solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
KmeansEvaluator.java, which wraps a k-means++ clusterer) re-expressed as
Lloyd iterations over DataFrames, and the corpus-curation primitive
(cluster-then-sample / cluster-based dedup) of a training-data pipeline.

Spark-first, sized for row counts that never fit one machine:

- Each Lloyd iteration is ONE narrow assignment pass (centroids are k
  small arrays, shipped as literals inside a single JVM expression — no
  crossJoin, no UDF) followed by ONE groupBy mean (map-side combined).
  Total work per iteration: one scan + one k-way shuffle of partial
  sums.
- The only driver state is the k×dim centroid matrix (tiny by
  construction); points never leave the cluster.
- Deterministic by design: init = the k rows with the lowest ids
  (k-means++ random seeding trades determinism for quality; callers
  wanting it can pass their own `init`), fixed iteration count,
  ties broken by lowest centroid id. Determinism is what makes the
  result re-derivable by the DuckDB oracle and stable across re-runs —
  the property corpus-curation pipelines need (same clusters on resume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["kmeans"]


def _assign_expr(vec_col: str, centroids: list[list[float]]):
    """argmin_c Σ_d (x_d - c_d)^2 as one JVM expression; ties → lowest
    centroid id (strict < on a left-to-right scan)."""
    dists = [
        F.aggregate(
            F.zip_with(F.col(vec_col), F.array(*[F.lit(float(v)) for v in c]),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, d: acc + d)
        for c in centroids
    ]
    best_i, best_d = F.lit(0), dists[0]
    for i, d in enumerate(dists[1:], start=1):
        cond = d < best_d
        best_i = F.when(cond, F.lit(i)).otherwise(best_i)
        best_d = F.when(cond, d).otherwise(best_d)
    return best_i


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iterations: int = 5,
    init: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's algorithm. Returns (assignments, centroids): assignments
    = (id_col, cluster) after the final update; centroids = the k final
    mean vectors (python lists of float, driver-side — k×dim is tiny).
    Empty clusters keep their previous centroid (the standard Lloyd
    fallback, also what keeps the oracle replayable)."""
    if init is None:
        rows = (df.select(id_col, vec_col).orderBy(id_col).limit(k)
                .collect())
        init = [[float(v) for v in r[vec_col]] for r in rows]
    if len(init) != k:
        raise ValueError(f"init has {len(init)} centroids, expected {k}")
    cents = [list(map(float, c)) for c in init]
    dim = len(cents[0])
    base = df.select(F.col(id_col), F.col(vec_col).cast("array<double>")
                     .alias("__v"))
    # every Lloyd iteration is a full pass: cache the projected points
    # once instead of re-scanning the source `iterations` times
    base = base.persist()
    try:
        for _ in range(iterations):
            assigned = base.withColumn("__c", _assign_expr("__v", cents))
            sums = (assigned.groupBy("__c")
                    .agg(*[F.sum(F.col("__v")[d]).alias(f"s{d}")
                           for d in range(dim)],
                         F.count("*").alias("n"))
                    .collect())
            new = {r["__c"]: [r[f"s{d}"] / r["n"] for d in range(dim)]
                   for r in sums}
            cents = [new.get(i, cents[i]) for i in range(k)]
        out = (base.withColumn("cluster", _assign_expr("__v", cents))
               .select(id_col, "cluster"))
        return out, cents
    finally:
        # lazy `out` recomputes from lineage if evaluated later — only
        # the storage pin is released here
        base.unpersist(blocking=False)
