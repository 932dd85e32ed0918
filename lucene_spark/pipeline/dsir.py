"""Importance resampling for training-data selection (DSIR-style).

Role analogue: none in the reference (it is an IR engine) — this is one
of the beyond-the-reference training-pipeline operators, implementing
the published Data Selection with Importance Resampling recipe (Xie et
al., 2023, arXiv:2302.03169): estimate cheap n-gram feature
distributions over a TARGET corpus (what you want more of) and the RAW
corpus (what you have), weight every raw document by its log importance
ratio, then Gumbel-top-k resample — documents that look like the target
are exponentially more likely to be kept.

Spark-first shape, sized for 100 TB:

- Features are word n-grams projected with JVM `split`/`transform`
  expressions — narrow, no Python, no shuffle before the count aggs.
- Fitting = one map-side-combined groupBy per corpus + a full outer
  join; the feature table stays a DataFrame keyed by feature (a
  web-scale vocabulary does not fit the broadcast cap). `min_count`
  prunes the hapax tail; pruned/unseen features fall back to the
  closed-form smoothed constant (both distributions back off to
  alpha-only mass), so scoring is total without a second pass.
- `hash_buckets=B` switches features to `xxhash64(gram) % B` — the
  paper's hashed generative model, which bounds the table at B rows
  regardless of corpus size (the 100 TB path). The exact-gram default
  keeps the statistic reproducible by any SQL engine.
- Resampling never sorts the corpus globally: the Gumbel perturbation
  is a deterministic per-row expression and top-k is the usual
  partition-local + merge pattern via row_number over the bounded
  candidate set (callers at real scale should pre-filter with
  `weight > threshold` — also per the paper, which resamples from the
  top slice).

Determinism: Gumbel noise derives from a Lehmer LCG over the document
id — u = ((id * 48271 + seed) mod 2147483647 + 0.5) / 2147483647,
g = -ln(-ln(u)) — integer arithmetic any engine reproduces exactly
(no engine-specific RNG in the contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["fit_importance_model", "importance_weights",
           "importance_resample"]

_WS = r"\s+"
_LEHMER_M = 2147483647  # 2^31 − 1 (Park–Miller modulus)
_LEHMER_A = 48271


def _gram_col(ns: tuple[int, ...]) -> Column:
    """array<string> of word n-grams (space-joined) for every n in `ns`
    over a pre-projected `__toks` array column — pure codegen
    expressions, narrow."""
    parts = []
    for n in ns:
        if n == 1:
            parts.append(F.col("__toks"))
        else:
            parts.append(F.when(
                F.size("__toks") >= n,
                F.expr(
                    f"transform(slice(__toks, 1, size(__toks) - {n - 1}),"
                    f" (x, i) -> concat_ws(' ', slice(__toks, i + 1, {n})))"
                )).otherwise(F.array().cast("array<string>")))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def _features(docs: DataFrame, text_col: str, ns: tuple[int, ...],
              hash_buckets: int | None, keep: tuple[str, ...] = ()) -> DataFrame:
    base = (docs.withColumn("__toks", F.filter(
        F.split(F.trim(F.col(text_col)), _WS), lambda x: F.length(x) > 0))
        .withColumn("__grams", _gram_col(ns))
        .select(*keep, F.explode("__grams").alias("feature")))
    if hash_buckets is not None:
        base = base.withColumn(
            "feature",
            F.pmod(F.xxhash64("feature"), F.lit(int(hash_buckets)))
            .cast("string"))
    return base


def fit_importance_model(
    target: DataFrame, raw: DataFrame, text_col: str,
    ns: tuple[int, ...] = (1, 2), alpha: float = 0.5,
    min_count: int = 1, hash_buckets: int | None = None,
) -> tuple[DataFrame, float]:
    """Fit the two smoothed feature distributions and return
    (logratio_df(feature, log_ratio), unseen_log_ratio).

    p(f) = (c_T(f) + alpha) / (T + alpha·V), q(f) likewise over raw;
    V = |union feature vocabulary| (pre-pruning, so mass stays
    calibrated), T/R = total feature occurrences. A feature absent from
    the table (pruned or never seen) has the closed-form ratio
    ln((R + alpha·V) / (T + alpha·V)) — returned as the constant."""
    ft = _features(target, text_col, ns, hash_buckets)
    fr = _features(raw, text_col, ns, hash_buckets)
    ct = ft.groupBy("feature").agg(F.count("*").alias("ct"))
    cr = fr.groupBy("feature").agg(F.count("*").alias("cr"))
    joined = ct.join(cr, "feature", "full_outer").select(
        "feature",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cr", F.lit(0)).alias("cr"))
    # the totals collect() below and the returned log-ratio table both
    # consume `joined` — persist so the tokenize/count/outer-join phase
    # (the expensive half of the fit) runs once, not twice
    from pyspark.storagelevel import StorageLevel

    joined = joined.persist(StorageLevel.MEMORY_AND_DISK)
    tot = joined.agg(
        F.sum("ct").alias("t"), F.sum("cr").alias("r"),
        F.count("*").alias("v")).collect()[0]
    t, r, v = int(tot["t"] or 0), int(tot["r"] or 0), int(tot["v"] or 0)
    denom_t = float(t) + alpha * v
    denom_r = float(r) + alpha * v
    import math

    unseen = math.log(denom_r / denom_t) if denom_t > 0 and denom_r > 0 else 0.0
    lr = joined.filter(
        (F.col("ct") + F.col("cr")) >= int(min_count)).select(
        "feature",
        (F.log((F.col("ct") + F.lit(float(alpha))) / F.lit(denom_t))
         - F.log((F.col("cr") + F.lit(float(alpha))) / F.lit(denom_r))
         ).alias("log_ratio"))
    return lr, unseen


def importance_weights(
    docs: DataFrame, text_col: str, id_col: str,
    logratio: DataFrame, unseen_log_ratio: float,
    ns: tuple[int, ...] = (1, 2), hash_buckets: int | None = None,
) -> DataFrame:
    """Per-document log importance weight: Σ over the doc's feature
    occurrences of log p(f)/q(f) (unseen features contribute the
    smoothed constant). Output: (id_col, n_features, weight). Documents
    with zero features weigh 0 (kept — callers decide)."""
    feats = _features(docs, text_col, ns, hash_buckets, keep=(id_col,))
    scored = feats.join(logratio, "feature", "left").select(
        id_col,
        F.coalesce("log_ratio", F.lit(float(unseen_log_ratio))).alias("lr"))
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_features"), F.sum("lr").alias("weight"))
    return (docs.select(id_col).distinct()
            .join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_features", F.lit(0)).alias("n_features"),
                    F.coalesce("weight", F.lit(0.0)).alias("weight")))


def gumbel_key(id_col: str, weight_col: str, seed: int = 0,
               temperature: float = 1.0) -> Column:
    """weight/temperature + Gumbel(0,1) noise from the deterministic
    Lehmer stream — the Gumbel-top-k trick: taking the k largest keys
    samples k docs without replacement with P(doc) ∝ exp(w/T)."""
    u = ((F.col(id_col).cast("long") * F.lit(_LEHMER_A) + F.lit(int(seed)))
         % F.lit(_LEHMER_M) + F.lit(_LEHMER_M)) % F.lit(_LEHMER_M)
    uu = (u.cast("double") + F.lit(0.5)) / F.lit(float(_LEHMER_M))
    g = -F.log(-F.log(uu))
    return F.col(weight_col).cast("double") / F.lit(float(temperature)) + g


def importance_resample(
    weights: DataFrame, id_col: str, n_select: int,
    seed: int = 0, temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k resample: the n_select docs with the largest
    perturbed keys. Output adds (gumbel_key, rank); deterministic for a
    given seed. At real scale pre-filter the weight table to a
    top-slice so the global sort stays bounded."""
    from pyspark.sql import Window

    keyed = weights.withColumn(
        "gumbel_key", gumbel_key(id_col, "weight", seed, temperature))
    w = Window.orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
    return (keyed.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(n_select)))
