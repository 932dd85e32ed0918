"""Solr streaming-expression analogues — thin DataFrame combinators.

Role analogue: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
(SURVEY.md §2.8). Every Solr TupleStream decorator is a one-liner over a
DataFrame; these wrappers exist to (a) document the 1:1 mapping with
file-level citations and (b) pin scale-conscious physical choices
(broadcast for FetchStream/HashJoinStream, repartition for ParallelStream).

A DataFrame IS a TupleStream (pull-based iterator of tuples); Catalyst
replaces Solr's Calcite SQL planner (handler/sql/SolrRules.java) wholesale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def select_stream(df: DataFrame, *cols, **renames) -> DataFrame:
    """SelectStream.java — projection + rename."""
    out = df.select(*cols) if cols else df
    for new, old in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def sort_stream(df: DataFrame, *order: Column) -> DataFrame:
    """SortStream.java — full re-sort (range-partitioned shuffle)."""
    return df.orderBy(*order)


def rank_stream(df: DataFrame, n: int, *order: Column) -> DataFrame:
    """RankStream.java — top-N by comparator. Spark pushes the limit into
    per-partition TakeOrderedAndProject: no full sort at scale."""
    return df.orderBy(*order).limit(n)


def unique_stream(df: DataFrame, *key: str) -> DataFrame:
    """UniqueStream.java — dedupe on key."""
    return df.dropDuplicates(list(key))


def merge_stream(*dfs: DataFrame) -> DataFrame:
    """MergeStream.java — ordered union; ordering is re-established by the
    consumer (Spark keeps sort in the plan, not the stream)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def inner_join_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """JoinStream.java/BiJoinStream.java — sort-merge equi-join; Spark
    picks sort-merge for two large sides."""
    return left.join(right, on, "inner")


def left_outer_join_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """LeftOuterJoinStream.java."""
    return left.join(right, on, "left")


def hash_join_stream(left: DataFrame, small_right: DataFrame, on: list[str]) -> DataFrame:
    """HashJoinStream.java — build side in memory ⇒ broadcast hash join
    (the explicit broadcast survives at 100 TB where the dim stays small)."""
    return left.join(F.broadcast(small_right), on, "inner")


def outer_hash_join_stream(left: DataFrame, small_right: DataFrame, on: list[str]) -> DataFrame:
    """OuterHashJoinStream.java."""
    return left.join(F.broadcast(small_right), on, "left")


def intersect_stream(a: DataFrame, b: DataFrame) -> DataFrame:
    """IntersectStream.java — set intersection on full rows."""
    return a.intersect(b)


def complement_stream(a: DataFrame, b: DataFrame) -> DataFrame:
    """ComplementStream.java — a minus b."""
    return a.exceptAll(b)


def cartesian_product_stream(df: DataFrame, array_col: str, out_col: str) -> DataFrame:
    """CartesianProductStream.java — unnest a multivalued field."""
    return df.withColumn(out_col, F.explode(F.col(array_col)))


def rollup_stream(df: DataFrame, keys: list[str], metrics: list[Column]) -> DataFrame:
    """RollupStream.java / HashRollupStream.java — groupBy + metrics
    (io/stream/metrics/: Count/Sum/Min/Max/Mean/Std/Percentile...).
    Spark's 2-phase agg (partial map-side combine) is the distributed
    merge that Solr implements by hand in FacetFieldMerger."""
    return df.groupBy(*keys).agg(*metrics)


def having_stream(df: DataFrame, cond: Column) -> DataFrame:
    """HavingStream.java — post-agg filter."""
    return df.filter(cond)


def fetch_stream(df: DataFrame, lookup: DataFrame, on: list[str], fields: list[str]) -> DataFrame:
    """FetchStream.java — enrich tuples by key lookup (broadcast semi-join
    back to the collection)."""
    return df.join(F.broadcast(lookup.select(*on, *fields)), on, "left")


def parallel_stream(df: DataFrame, n: int, *key: str) -> DataFrame:
    """ParallelStream.java — hash-partition an expression across N workers.
    This is literally Spark's repartition; Solr reimplements the shuffle."""
    return df.repartition(n, *[F.col(k) for k in key])


def shuffle_stream(df: DataFrame, n: int, *key: str) -> DataFrame:
    """ShuffleStream.java — export-sorted redistribution."""
    return df.repartitionByRange(n, *[F.col(k) for k in key])


def reducer_stream(df: DataFrame, keys: list[str], schema: str, fn) -> DataFrame:
    """ReducerStream.java — group-adjacent reduce; Arrow-batched
    applyInPandas replaces the sorted-stream contract."""
    return df.groupBy(*keys).applyInPandas(fn, schema)


def time_series_stream(df: DataFrame, ts_col: str, window: str, metrics: list[Column]) -> DataFrame:
    """TimeSeriesStream.java — windowed time aggregation."""
    return df.groupBy(F.window(F.col(ts_col), window).alias("w")).agg(*metrics)


def expand_component(df: DataFrame, group_col: str, order: Column, n: int) -> DataFrame:
    """Solr ExpandComponent / grouping second pass
    (handler/component/ExpandComponent.java, grouping/FirstPassGroupingCollector.java):
    top-n rows per group via window rank."""
    w = Window.partitionBy(group_col).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
