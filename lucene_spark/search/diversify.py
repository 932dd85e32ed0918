"""Diversified top-k — lucene/misc DiversifiedTopDocsCollector.

Role analogue (lucene/misc/src/java/org/apache/lucene/misc/search/
DiversifiedTopDocsCollector.java:67-160): global top-``k`` where every
key (artist / retailer / source) contributes at most ``max_per_key``
hits.  The reference streams docs through a global PQ plus per-key PQs —
a doc is kept iff it is globally competitive AND within the best
``max_per_key`` of its own key, with cascading evictions.  That online
algorithm converges to exactly the closed-form set: rank docs within
each key by (score desc, tie asc), keep ranks ≤ max_per_key, then take
the global top-k of the survivors — which is two window functions in
Spark, one shuffle on the key, one bounded global sort.

The key source is the reference's NumericDocValues per doc
(getKeys(LeafReaderContext)); here any DataFrame mapping doc_id -> key
(a doc-values sidecar column, a hydrated carry column, ...).  Docs whose
key is NULL all compete in ONE shared bucket (Spark windows group nulls
together), mirroring the reference where every advanceExact miss takes
key 0 (DiversifiedTopDocsCollector.java:118-121); unlike the reference's
numeric-DV artifact, the null bucket here stays distinct from a genuine
key of 0, and the key column comes back as NULL, not rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def diversified_topk(scored: DataFrame, keys: DataFrame, k: int,
                     max_per_key: int, score_col: str = "score",
                     id_col: str = "doc_id",
                     key_col: str = "key") -> DataFrame:
    """Diversify ``scored`` (doc_id, score) by ``keys`` (doc_id, key):
    at most ``max_per_key`` docs per key in the global top-``k``.
    Returns (doc_id, score, key, rank) ordered by rank."""
    m = scored.join(keys.select(id_col, key_col), id_col, "left")
    per_key = Window.partitionBy(key_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc())
    survivors = (m.withColumn("__kr", F.row_number().over(per_key))
                 .filter(F.col("__kr") <= max_per_key).drop("__kr"))
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (survivors.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
