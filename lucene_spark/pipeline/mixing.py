"""Domain mixing — deterministic rebalancing of a training corpus to
target domain proportions (the "data mixture" stage of LLM pipelines:
The Pile / DoReMi-style domain reweighting, C4's per-source caps).

No reference-repo analogue (Lucene/Solr stop at retrieval); this is part
of the training-data operator set the engine ships alongside dedup /
decontamination / quality filtering.

Semantics — exact and deterministic (no RNG, rerun-stable, and identical
under any input partitioning):
- per-domain target n_d = floor(total · w_d / Σw), weights renormalized;
  domains absent from ``weights`` are dropped (weight 0).
- docs in each domain are ranked by ``id_col`` ascending (stable key).
- n_d ≤ count_d (downsample): keep ranks 1..n_d, one epoch each.
- n_d > count_d (upsample): every doc repeats floor(n_d/count_d) times
  and the first (n_d mod count_d) ranks repeat once more, so the output
  size is EXACTLY n_d per domain; the ``epoch`` column (1..k) marks the
  repeat index so downstream shuffles/packing can decorrelate copies.

Spark shape: one tiny groupBy for domain counts (broadcast back), one
window rank partitioned by domain (the only shuffle — keyed exactly on
the rebalancing unit), then an explode of ``sequence(1, repeats)``.
Row-scale domains keep the window shuffle-bounded per domain; for
approximate mixes at extreme scale, hash-threshold sampling (keep iff
``xxhash64(id, salt) % K < K·n_d/count_d``) avoids the rank entirely —
not provided here because exactness is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def mix_domains(docs: DataFrame, domain_col: str,
                weights: dict[str, float], total: int,
                id_col: str = "doc_id") -> DataFrame:
    """Rebalance ``docs`` so domain ``d`` contributes exactly
    floor(total·w_d/Σw) rows (repeats counted).  Returns the input
    columns plus ``epoch`` (1-based repeat index, int)."""
    if total < 0:
        raise ValueError("total must be >= 0")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    spark = docs.sparkSession
    targets = spark.createDataFrame(
        [(d, int(total * (w / wsum))) for d, w in weights.items()],
        f"{domain_col} string, __target long")
    counts = (docs.filter(F.col(domain_col).isNotNull())
              .groupBy(domain_col).agg(F.count(F.lit(1)).alias("__cnt")))
    plan = targets.join(counts, domain_col)  # absent domains contribute 0
    w = Window.partitionBy(domain_col).orderBy(F.col(id_col).asc())
    ranked = (docs.join(F.broadcast(plan), domain_col)
              .withColumn("__rank", F.row_number().over(w)))
    base = (F.col("__target") / F.col("__cnt")).cast("long")
    extra = F.col("__target") % F.col("__cnt")
    repeats = base + F.when(F.col("__rank") <= extra, 1).otherwise(0)
    return (ranked.withColumn("__rep", repeats)
            .filter(F.col("__rep") > 0)
            .withColumn("epoch", F.explode(F.sequence(F.lit(1),
                                                      F.col("__rep"))))
            .drop("__target", "__cnt", "__rank", "__rep"))
