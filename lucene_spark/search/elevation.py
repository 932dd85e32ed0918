"""Query elevation — Solr's QueryElevationComponent restated.

Role analogue: solr/core/src/java/org/apache/solr/handler/component/
QueryElevationComponent.java (+ elevate.xml): for a query, a curated
list of document keys is PINNED to the top of the results in the given
order — included even when they don't match the query (the component
ORs the elevated ids into the main query and sorts them first via
ElevationComparatorSource) — and an exclusion list removes documents
from the results entirely (markExcludes=false behavior).

Spark shape: the elevation/exclusion sets are tiny curated lists, so
they ride broadcast joins against the k-row top-k and the docstats
sidecar; the base ranking is the engine's own search() (BM25 top-k),
so elevation is a pure post-ordering — no extra corpus scan beyond the
pinned docs' own score lookup, no shuffle beyond the top-k's own, and
the window that numbers the tail runs over ≤ k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm(key) -> tuple:
    return tuple(key) if isinstance(key, (tuple, list)) else (key,)


def elevate(searcher, query, k: int = 10, elevate_keys: tuple = (),
            exclude_keys: tuple = (), key_cols: tuple[str, ...] | None = None) -> DataFrame:
    """Top-k with curated pins: DataFrame(*key_cols, score float|null,
    elevated bool, rank) — elevated docs first in elevate_keys order
    (score = their real query score when they match, null otherwise,
    Solr's forceElevation=true presentation), then the query's remaining
    top hits by (score desc, doc_id asc), exclusions dropped. Keys are
    the reader's unique key columns (Solr elevates by uniqueKey,
    QueryElevationComponent.loadElevationMap); composite keys pass as
    tuples in the declared column order."""
    r = searcher.reader
    spark = r.spark
    cols = list(key_cols) if key_cols else list(r.key_cols)
    m = len(elevate_keys)
    ds = r.docstats().select("doc_id", *cols)
    types = dict(ds.dtypes)
    key_schema = ", ".join(f"{c} {types[c]}" for c in cols)

    top = searcher.search(query, k=k + m + len(exclude_keys))
    top = top.join(F.broadcast(ds), "doc_id")

    if exclude_keys:
        ex = spark.createDataFrame([_norm(x) for x in exclude_keys], key_schema)
        top = top.join(F.broadcast(ex), cols, "left_anti")

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    if not elevate_keys:
        return (top.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(*cols, "score", F.lit(False).alias("elevated"), "rank"))

    ev = spark.createDataFrame(
        [(*_norm(x), i + 1) for i, x in enumerate(elevate_keys)],
        key_schema + ", rank int")
    # pinned docs surface even when unmatched (the component ORs the
    # elevated ids into the main query): resolve through docstats and
    # left-join their real score from the FULL scored match set — a
    # pinned doc below the top-k cut still shows its true query score
    scored = (searcher.matches(query)
              .join(F.broadcast(ds.join(F.broadcast(ev.select(*cols)), cols)),
                    "doc_id")
              .select(*cols, "score"))
    pinned = (ds.join(F.broadcast(ev), cols)
              .join(F.broadcast(scored), cols, "left")
              .select(*cols, "score", F.lit(True).alias("elevated"), "rank"))
    rest = top.join(F.broadcast(ev.select(*cols)), cols, "left_anti")
    rest = (rest.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k - m)
            .select(*cols, "score", F.lit(False).alias("elevated"),
                    (F.col("rn") + F.lit(m)).alias("rank")))
    return pinned.unionByName(rest).orderBy("rank")
