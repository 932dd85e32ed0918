"""Field collapse / expand — Solr CollapsingQParserPlugin + ExpandComponent.

Role analogue:
- ``{!collapse field=F max=M | min=M | sort=...}`` — keep exactly one
  head document per collapse-field group, chosen by the selector
  (solr/core/src/java/org/apache/solr/search/CollapsingQParserPlugin.java:
  109-117); nullPolicy ignore/expand/collapse (ibid:153-157): ignore
  drops null-group docs, expand passes every null-group doc through
  uncollapsed, collapse treats null as one more group.
- ``ExpandComponent`` (handler/component/ExpandComponent.java:104-173):
  for each group present in the collapsed page, return the next
  ``expand.rows`` documents of that group (the head excluded), ordered
  by ``expand.sort``.

Spark shape: both are one window function over the result set — no
driver state, group-hash partitioning is the shuffle key exactly as the
reference partitions by the collapse field's ord.  Ties break on the
ascending tie column (the reference keeps the first segment-order doc;
callers pass their stable id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _order(sort: list[tuple[str, str]]) -> list[Column]:
    cols = []
    for name, direction in sort:
        c = F.col(name)
        cols.append(c.desc() if direction.lower() == "desc" else c.asc())
    return cols


def collapse(df: DataFrame, field: str, sort: list[tuple[str, str]],
             null_policy: str = "ignore") -> DataFrame:
    """Collapse ``df`` on ``field``: one head row per group, selected by
    ``sort`` (list of (column, asc|desc); append a unique tie column —
    max=M is sort=[(M, desc), (id, asc)], min=M the reverse)."""
    grouped = df.filter(F.col(field).isNotNull())
    w = Window.partitionBy(field).orderBy(*_order(sort))
    heads = (grouped.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1).drop("__rn"))
    nulls = df.filter(F.col(field).isNull())
    p = null_policy.lower()
    if p == "ignore":
        return heads
    if p == "expand":
        return heads.unionByName(nulls)
    if p == "collapse":
        wn = Window.orderBy(*_order(sort))
        null_head = (nulls.withColumn("__rn", F.row_number().over(wn))
                     .filter(F.col("__rn") == 1).drop("__rn"))
        return heads.unionByName(null_head)
    raise ValueError(f"Invalid nullPolicy: {null_policy}")


def expand(df: DataFrame, field: str, collapsed: DataFrame,
           sort: list[tuple[str, str]], rows: int = 5) -> DataFrame:
    """ExpandComponent: for every group value present in ``collapsed``,
    the next ``rows`` docs of that group from ``df`` ordered by ``sort``,
    heads excluded.  ``collapsed`` must carry ``field`` plus the columns
    named in ``sort`` (the head rows as returned by :func:`collapse`)."""
    groups = collapsed.select(field).distinct()
    sort_cols = [name for name, _ in sort]
    heads = collapsed.select(field, *sort_cols)
    members = df.join(F.broadcast(groups), field, "left_semi").alias("__m")
    # exclude the exact head row per group (reference excludes by docid;
    # the (field, sort columns) tuple is unique given a unique tie column).
    # Null-safe equality: a head whose sort column is NULL must still be
    # excluded, and plain '=' never matches NULL.
    h = heads.alias("__h")
    cond = None
    for k in (field, *sort_cols):
        c = F.col(f"__m.{k}").eqNullSafe(F.col(f"__h.{k}"))
        cond = c if cond is None else (cond & c)
    members = members.join(F.broadcast(h), on=cond, how="left_anti")
    w = Window.partitionBy(field).orderBy(*_order(sort))
    return (members.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= rows)
            .withColumnRenamed("__rn", "expand_rank"))
