"""Deterministic train/holdout splitting — the benchmark-hygiene
primitive of a training-data pipeline (decontamination's sibling: the
split must be a pure function of the document key so that re-runs,
incremental builds, and different cluster sizes all agree on which side
every document lands).

Spark-first and scale-free: the split is one narrow JVM expression
(sha2 + substring + string compare) — no shuffle, no sampling pass, no
driver state.  `df.randomSplit` is NOT suitable for corpus work: it is
seed-and-partitioning dependent, so the assignment changes when the
input is repartitioned or grows.

Mechanism: ``sha256(key || salt)`` is uniform on hex strings, and
lowercase-hex order equals numeric order, so

    holdout  :=  substr(sha256(key || salt), 1, 8) < hex(floor(p · 16^8))

keeps an expected fraction ``p`` with ≤ 2^-32 bias. The comparison is a
plain string compare, reproducible bit-for-bit in any engine with
sha256 (the DuckDB oracle replays it verbatim). Stratification is
inherent: the hash is uniform within every stratum, so each stratum is
held out at rate p without a per-stratum pass."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["holdout_flag", "train_holdout_split", "stratified_sample"]


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(fraction * (1 << 32))
    if v >= (1 << 32):
        # 'g' sorts after every lowercase-hex string; a 9-char "100000000"
        # would sort BEFORE "ffffffff" lexicographically
        return "g"
    return format(v, "08x")


def holdout_flag(key: Column, fraction: float, salt: str = "") -> Column:
    """Boolean column: True = held out (expected rate ``fraction``).
    ``key`` may be any column; it is cast to string before hashing, so
    use a stable natural key (doc id, url, sha) — not a row number.
    NULL keys are never held out (they are not stable identities to
    hash; coalescing to False keeps the every-row-lands-on-exactly-one-
    side invariant instead of silently dropping them from both sides,
    which is what a NULL comparison would do under two filters)."""
    h = F.substring(
        F.sha2(F.concat(key.cast("string"), F.lit(salt)), 256), 1, 8)
    return F.coalesce(h < F.lit(_threshold_hex(fraction)), F.lit(False))


def train_holdout_split(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) pair; every row lands on exactly one side, and
    the assignment is stable under repartitioning, appends, and salt
    reuse across runs."""
    flag = holdout_flag(F.col(key_col), fraction, salt)
    return df.filter(~flag), df.filter(flag)


def leakage_safe_split(
    df: DataFrame, pairs: DataFrame, key_col: str, fraction: float,
    salt: str = "", max_iter: int = 25,
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) split that keeps every NEAR-DUPLICATE CLUSTER on
    one side — the train/test-leakage guard a plain per-document hash
    split lacks: with A≈B, hashing doc keys independently can put A in
    train and B in holdout, leaking evaluation content into training
    (the contamination the fuzzy-decontamination and dedup ops exist to
    catch, applied to the split itself).

    Composition of gated primitives: `pairs` (e.g.
    dedup.exact_jaccard_pairs or minhash_lsh_pairs+jaccard_verify) →
    dedup.duplicate_clusters connected components → every doc hashes by
    its CLUSTER REPRESENTATIVE (min key of its component; singletons by
    their own key) through the same sha-based holdout_flag, so the
    assignment stays stable under repartitioning/appends and the whole
    cluster lands together.  One broadcast-friendly left join beyond
    the CC labels; the label table is bounded by the number of
    non-singleton docs."""
    from lucene_spark.pipeline.dedup import duplicate_clusters

    labels = duplicate_clusters(pairs, max_iter=max_iter)
    joined = df.join(
        labels.select(F.col("key").alias(key_col),
                      F.col("cluster").alias("__rep")),
        key_col, "left")
    rep = F.coalesce(F.col("__rep"), F.col(key_col))
    flag = holdout_flag(rep, fraction, salt)
    return (joined.filter(~flag).drop("__rep"),
            joined.filter(flag).drop("__rep"))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash
    rank — the deterministic exact-count sibling of `holdout_flag`'s
    fractional split (corpus curation wants "10k docs per language",
    not "0.1% of each"). Rank = sha256(key||salt) ordered ascending with
    the key as tie-break, so the sample is a pure function of the
    stratum's member keys: stable under repartitioning, and appends only
    displace rows at the rank boundary. One shuffle (the window's
    partitionBy stratum — skewed strata are bounded by the rank cutoff's
    early filter under AQE); fraction-based sampling needs no shuffle at
    all, use `holdout_flag` for that."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got "
                         f"{n_per_stratum}")
    h = F.sha2(F.concat(F.col(key_col).cast("string"), F.lit(salt)), 256)
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(key_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n_per_stratum).drop("__rk"))
