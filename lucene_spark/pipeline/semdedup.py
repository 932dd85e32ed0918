"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"; no reference analogue — a
training-data-pipeline first-class op per SURVEY §6).

Algorithm (the paper's, made deterministic):
  1. k-means cluster the embeddings (reusing `cluster.kmeans`'s
     deterministic Lloyd: lowest-id init, ties to lowest centroid).
  2. Within each cluster, order members by distance to their centroid
     DESCENDING (the paper keeps the examples farthest from the
     centroid) with key ascending as the tie-break.
  3. A member is REMOVED iff some member EARLIER in that order has
     cosine similarity >= threshold with it. (This is exactly the
     released implementation's triu-max rule — not a transitive
     union-find: each doc is judged against all earlier docs whether or
     not those were themselves removed.)

Spark shape, sized for 100 TB:
  - Cluster assignment is one narrow JVM expression pass (no UDF, no
    crossJoin) — `cluster._assign_expr`.
  - The O(c^2) pairwise work happens strictly WITHIN a cluster, one
    task per cluster via applyInPandas (a single normalized GEMM per
    cluster). At scale, k grows with n to keep the average cluster
    size bounded (the paper runs 50k clusters); `max_cluster_size`
    fails fast with that advice instead of letting one skewed cluster
    OOM a task. The default cap of 10k keeps the per-task c×c float64
    similarity matrix at ~0.8 GB (rounded in place, compared row-by-row
    — no second matrix-sized allocation), which fits a 4 GB task slot;
    raise it only with matching executor memory.
  - Floats: distances and similarities are rounded to `round_to`
    decimals before every comparison, so the order and the
    threshold test are reproducible bit-for-bit by a SQL oracle
    (the repo's oracle-gate convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.cluster import _assign_expr, kmeans

__all__ = ["semdedup"]


def semdedup(
    df: DataFrame,
    vec_col: str,
    key_col: str,
    k: int = 16,
    threshold: float = 0.95,
    centroids: list[list[float]] | None = None,
    iterations: int = 5,
    round_to: int = 6,
    max_cluster_size: int = 10_000,
) -> DataFrame:
    """Returns (key, cluster, removed) — one row per input row. Callers
    keep `removed = false`. Pass `centroids` to skip the k-means fit
    (e.g. a pre-trained codebook, or a deterministic slice for oracle
    replay); otherwise Lloyd runs with the deterministic lowest-id
    init."""
    if centroids is None:
        _, centroids = kmeans(df, vec_col, key_col, k=k,
                              iterations=iterations)
    cents = np.asarray([[float(v) for v in c] for c in centroids],
                       dtype=np.float64)
    thr = float(threshold)
    rt = int(round_to)
    cap = int(max_cluster_size)

    assigned = df.select(
        F.col(key_col).alias("key"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("cluster", _assign_expr("__v", centroids))

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"cluster {int(pdf['cluster'].iloc[0])} has {len(pdf)} "
                f"members > max_cluster_size={cap}; raise k so the "
                f"per-cluster pairwise GEMM stays bounded")
        v = np.asarray(list(pdf["__v"]), dtype=np.float64)
        cid = int(pdf["cluster"].iloc[0])
        cdist = np.round(np.sqrt(((v - cents[cid]) ** 2).sum(axis=1)), rt)
        order = np.lexsort((pdf["key"].to_numpy(), -cdist))
        v = v[order]
        keys = pdf["key"].to_numpy()[order]
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0.0] = 1.0
        vn = v / norms[:, None]
        sims = vn @ vn.T
        np.round(sims, rt, out=sims)  # in place: no 2nd c×c allocation
        # each row judged against strictly EARLIER rows in the order;
        # row slices (not a full tril mask) so peak memory stays at one
        # c×c matrix, and a threshold <= 0 still compares real sims
        n_rows = sims.shape[0]
        removed = np.zeros(n_rows, dtype=bool)
        for i in range(1, n_rows):
            removed[i] = bool((sims[i, :i] >= thr).any())
        return pd.DataFrame({"key": keys, "cluster": cid,
                             "removed": removed})

    return assigned.groupBy("cluster").applyInPandas(
        dedup_cluster, "key long, cluster int, removed boolean")
