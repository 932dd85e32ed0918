"""Learning-to-rank reranking — solr/contrib/ltr restated.

Role analogues:
- `solr/contrib/ltr/src/java/org/apache/solr/ltr/model/LinearModel.java`:
  score = Σ weight_i · feature_i (dot product over extracted features).
- `.../ltr/model/MultipleAdditiveTreesModel.java`: sum of regression
  trees, each a chain of (feature ≤ threshold) branches.
- `.../ltr/feature/OriginalScoreFeature.java` / `FieldValueFeature.java`
  / `ValueFeature.java`: the feature vocabulary — original query score,
  stored-field values, constants.
- `.../ltr/norm/MinMaxNormalizer.java` / `StandardNormalizer.java`.
- `LTRScoringQuery.java` + Solr's `rq={!ltr reRankDocs=N}`: only the top
  reRankDocs of the base ranking are rescored; the rest keep their order
  below the reranked window (ReRankCollector semantics).

Spark shape: features are COLUMNS on the hit frame (joined from
docstats/signals projections — broadcast, since the reranked window is
≤ reRankDocs rows), the model is a single Catalyst column expression, so
the whole rerank stays in whole-stage codegen. No per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, Window, functions as F


def minmax_normalizer(col: Column, lo: float, hi: float) -> Column:
    """MinMaxNormalizer.java: (v − min) / (max − min)."""
    return (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi) - float(lo))


def standard_normalizer(col: Column, avg: float, std: float) -> Column:
    """StandardNormalizer.java: (v − avg) / std."""
    return (col.cast("double") - F.lit(float(avg))) / F.lit(float(std))


@dataclass(frozen=True)
class LinearModel:
    """LinearModel.java: explicit dot product over named feature columns."""

    weights: dict[str, float]
    intercept: float = 0.0

    def expr(self) -> Column:
        out = F.lit(float(self.intercept))
        for name in sorted(self.weights):
            out = out + F.lit(float(self.weights[name])) * F.col(name).cast("double")
        return out


@dataclass(frozen=True)
class TreeNode:
    """One node of a MultipleAdditiveTreesModel regression tree: either a
    leaf (value set) or a branch on (feature ≤ threshold)."""

    value: float | None = None
    feature: str | None = None
    threshold: float | None = None
    left: "TreeNode | None" = None   # taken when feature ≤ threshold
    right: "TreeNode | None" = None

    def expr(self) -> Column:
        if self.value is not None:
            return F.lit(float(self.value))
        return F.when(
            F.col(self.feature).cast("double") <= F.lit(float(self.threshold)),
            self.left.expr(),
        ).otherwise(self.right.expr())


@dataclass(frozen=True)
class AdditiveTreesModel:
    """MultipleAdditiveTreesModel.java: Σ tree_weight · tree(features),
    compiled to nested CASE WHEN — still one codegen'd expression."""

    trees: list[tuple[float, TreeNode]] = dc_field(default_factory=list)

    def expr(self) -> Column:
        out = F.lit(0.0)
        for w, t in self.trees:
            out = out + F.lit(float(w)) * t.expr()
        return out


def rerank(
    hits: DataFrame,
    features: DataFrame | None,
    model,
    k: int = 10,
    rerank_docs: int = 100,
    key: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Rerank the top `rerank_docs` of `hits` (by (score desc, key asc) —
    the engine's tie order) with `model`, then return the overall top `k`
    with ReRankCollector semantics: reranked window first (ltr_score
    desc, key asc), hits BELOW the window keep their base order after it
    with their original score (Solr rq={!ltr reRankDocs=N} with rows>N).
    `features` (keyed by `key`) is broadcast onto the window; missing
    feature rows default to 0 (FieldValueFeature's default), never null.
    The model may also reference `score_col` itself
    (OriginalScoreFeature).

    Scale shape: only the top rerank_docs+k rows are materialized — a
    distributed TakeOrderedAndProject, never a full-corpus single-
    partition window; the row_number windows below run over that ≤N+k-row
    slice."""
    n_slice = int(rerank_docs) + int(k)
    slice_df = hits.orderBy(F.col(score_col).desc(), F.col(key).asc()).limit(n_slice)
    w = Window.orderBy(F.col(score_col).desc(), F.col(key).asc())
    ranked = slice_df.withColumn("__base_rank", F.row_number().over(w))
    window = ranked.filter(F.col("__base_rank") <= int(rerank_docs))
    tail = ranked.filter(F.col("__base_rank") > int(rerank_docs))
    if features is not None:
        # cast every feature column to double BEFORE filling: fillna(0.0)
        # only touches numeric columns, so a boolean/string feature of a
        # doc missing from `features` would stay null and null out the
        # whole model score
        feat_cols = [c for c in features.columns if c != key]
        feats = features.select(
            key, *[F.col(c).cast("double").alias(c) for c in feat_cols])
        window = (window.join(F.broadcast(feats), key, "left")
                  .fillna(0.0, subset=feat_cols))
    scored = window.withColumn("ltr_score", model.expr().cast("double"))
    # window rows order by the model; tail rows keep base order below them
    merged = scored.select(
        key, "ltr_score", F.lit(0).alias("__tier"), "__base_rank",
    ).unionByName(tail.select(
        key, F.col(score_col).cast("double").alias("ltr_score"),
        F.lit(1).alias("__tier"), "__base_rank",
    ))
    # tier 0 orders by (ltr_score desc, key asc) — the model contract;
    # tier 1's ltr_score IS the base score, so the same sort key yields
    # exactly the base order (score desc, key asc) below the window
    w2 = Window.orderBy(F.col("__tier").asc(), F.col("ltr_score").desc(),
                        F.col(key).asc())
    return (
        merged.withColumn("ltr_rank", F.row_number().over(w2))
        .filter(F.col("ltr_rank") <= int(k))
        .drop("__tier", "__base_rank")
    )
