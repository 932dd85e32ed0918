"""Query-time join — the lucene/join module's JoinUtil restated.

Role analogue: `lucene/join/src/java/org/apache/lucene/search/join/
JoinUtil.java` (createJoinQuery): run `fromQuery`, collect the values of
`fromField` across its matches, and match every document whose `toField`
holds one of those values. `ScoreMode` {None, Total, Max, Min, Avg}
(join/ScoreMode.java) aggregates the from-side scores per join value and
carries the aggregate to the joined documents.

Spark shape: the from side reduces to one row per DISTINCT join value —
a grouped aggregate with map-side partial combine — which is then
broadcast against the to side's docstats projection. At 100 TB the
broadcast is safe exactly when JoinUtil itself is usable (the collected
term set must fit in memory in the reference too, TermsQuery); for an
unbounded value domain pass broadcast_keys=False and let AQE pick a
shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_AGGS = {
    "total": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
}


def join_query(
    searcher,
    from_query,
    from_field: str,
    to_field: str,
    score_mode: str = "none",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Documents whose `to_field` value occurs among the `from_field`
    values of documents matching `from_query`. Returns
    (doc_id, score) with engine doc ids; score is 1.0 under
    score_mode='none', else the ScoreMode aggregate of from-side scores
    for the doc's join value.

    Both fields must be carried columns on the index's docstats sidecar
    (IndexConfig.carry_cols) — the stored-fields role JoinUtil reads its
    terms from.
    """
    mode = score_mode.lower()
    if mode not in ("none",) and mode not in _AGGS:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    ds = searcher.reader.docstats()
    for col in {from_field, to_field}:
        if col not in ds.columns:
            raise ValueError(f"field {col!r} not carried on docstats")
    hits = searcher.matches(from_query, with_scores=(mode != "none"))
    from_side = hits.join(ds.select("doc_id", from_field), "doc_id")
    if mode == "none":
        keys = (
            from_side.select(F.col(from_field).alias("__jv"))
            .distinct()
            .withColumn("score", F.lit(1.0).cast("float"))
        )
    else:
        keys = from_side.groupBy(F.col(from_field).alias("__jv")).agg(
            _AGGS[mode]("score").cast("float").alias("score")
        )
    if broadcast_keys:
        keys = F.broadcast(keys)
    # mask tombstones on the to side too — JoinUtil's toQuery only ever
    # matches live docs (the from side is masked inside the kernel)
    to_side = searcher._mask_deleted(ds.select("doc_id", to_field))
    return (
        to_side
        .join(keys, F.col(to_field) == F.col("__jv"))
        .select("doc_id", "score")
    )
