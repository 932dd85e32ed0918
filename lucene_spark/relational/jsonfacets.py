"""Solr JSON Facet API — nested facet trees with bucket-level aggregations.

Role analogue (SURVEY.md §2.7, Solr `json.facet`):
- FacetField / FacetFieldProcessor* (solr/core/src/java/org/apache/solr/
  search/facet/FacetField.java:27 — DEFAULT_FACET_LIMIT=10, mincount=1):
  terms facet with limit / mincount / prefix / missing / numBuckets /
  allBuckets and nested sub-facets.
- Aggregations (solr/core/src/java/org/apache/solr/search/facet/):
  SumAgg/AvgAgg/MinMaxAgg (SimpleAggValueSource.java), SumsqAgg.java,
  StddevAgg.java, VarianceAgg.java, CountValsAgg.java, MissingAgg.java,
  UniqueAgg.java, HLLAgg.java, PercentileAgg.java, RelatednessAgg.java.
- The distributed partial/merge protocol (FacetFieldMerger.java,
  FacetRangeMerger.java) is Spark's native two-phase aggregation — every
  agg here lowers to ONE fused groupBy per facet node (map-side combine),
  never one job per bucket.
- Bucket sorting (FacetRequestSorted): sort by count / index / any
  sibling agg, with Solr's resort tie-break; nested bucket limits are a
  single window rank partitioned by the parent bucket keys — no driver
  loop over parent buckets, so a 1M-bucket parent level costs one
  shuffle, not 1M jobs.

Spec shape (mirrors Solr's json.facet request JSON):

    {"type": "terms", "field": "lang", "limit": 10, "mincount": 1,
     "sort": "count desc",            # or "index asc" or "<aggname> desc"
     "prefix": "e", "missing": True, "numBuckets": True,
     "facet": {
        "avg_tok":  "avg(tokens)",    # agg string -> bucket column
        "uniq_src": "unique(source)",
        "rel":      "relatedness(is_fg,is_bg)",   # boolean flag columns
        "by_source": {"type": "terms", "field": "source", "limit": 3},
     }}

`json_facets` returns {"": <this node's buckets>, "<name>": <child
buckets with parent key columns>, "<name>.<grandchild>": ...} — a flat
DataFrame per facet node, leaf rows carrying every ancestor bucket value.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

_AGG_RE = re.compile(r"^\s*([a-z][a-z0-9_]*)\s*\((.*)\)\s*$")

#: aggregations whose SQL twin is exact (oracle-safe). `hll` and
#: `percentile` keep Solr's approximate semantics (HLL / t-digest roles)
#: and should not be hash-compared against an exact oracle.
EXACT_AGGS = frozenset(
    {"sum", "avg", "min", "max", "sumsq", "stddev", "variance",
     "countvals", "missing", "unique", "relatedness", "percentile_exact"}
)


def relatedness_expr(fg_count: Column, fg_size: Column,
                     bg_count: Column, bg_size: Column,
                     min_pop: float = 0.0) -> Column:
    """RelatednessAgg.computeRelatedness (RelatednessAgg.java:379-396):
    z-score of the foreground count against the background probability,
    squashed through five offset sigmoids, rounded to 5 digits
    (roundTo5Digits uses Java Math.round = floor(x+0.5), replicated
    exactly so the DuckDB twin can reproduce the bits).

    With min_pop > 0, buckets whose fg or bg popularity (count/bg_size,
    RelatednessAgg.java:175 minCount precalc) falls below it score
    -Infinity (sorts below every valid score, RelatednessAgg.java:228-232).
    """
    bg_prob = bg_count / bg_size
    num = fg_count - fg_size * bg_prob
    denom = F.sqrt(fg_size * bg_prob * (1.0 - bg_prob))
    denom = F.when(denom == 0.0, F.lit(1e-10)).otherwise(denom)
    z = num / denom

    def sig(offset: float, scale: float) -> Column:
        shifted = z + F.lit(float(offset))
        return shifted / (F.lit(float(scale)) + F.abs(shifted))

    raw = 0.2 * sig(-80, 50) + 0.2 * sig(-30, 30) + 0.2 * sig(0, 30) \
        + 0.2 * sig(30, 30) + 0.2 * sig(80, 50)
    rounded = F.floor(raw * 1e5 + F.lit(0.5)) / 1e5
    if min_pop > 0.0:
        min_count = F.ceil(F.lit(float(min_pop)) * bg_size)
        rounded = F.when(
            (fg_count < min_count) | (bg_count < min_count),
            F.lit(float("-inf"))).otherwise(rounded)
    return rounded


def _parse_agg(name: str, spec: str, sizes: dict[str, Column]) -> list[Column]:
    """One agg spec string -> aggregate Column(s) aliased `name` (plus
    relatedness's fg/bg count side-channels used for its sort tie-break,
    RelatednessAgg.java:240-248)."""
    m = _AGG_RE.match(spec)
    if not m:
        raise ValueError(f"unparseable agg spec {spec!r}")
    fn, arg = m.group(1), m.group(2).strip()
    c = F.col(arg) if arg else None
    if fn == "sum":
        return [F.sum(c).alias(name)]
    if fn == "avg":
        return [F.avg(c).alias(name)]
    if fn == "min":
        return [F.min(c).alias(name)]
    if fn == "max":
        return [F.max(c).alias(name)]
    if fn == "sumsq":  # SumsqAgg.java
        return [F.sum(c * c).alias(name)]
    if fn == "stddev":  # StddevAgg.java (sample stddev)
        return [F.stddev_samp(c).alias(name)]
    if fn == "variance":  # VarianceAgg.java
        return [F.var_samp(c).alias(name)]
    if fn == "countvals":  # CountValsAgg.java — non-null values
        return [F.count(c).alias(name)]
    if fn == "missing":  # MissingAgg.java — docs with no value
        return [F.count(F.when(c.isNull(), 1)).alias(name)]
    if fn == "unique":  # UniqueAgg.java — exact distinct
        return [F.countDistinct(c).alias(name)]
    if fn == "hll":  # HLLAgg.java — HyperLogLog approximate distinct
        return [F.approx_count_distinct(c).alias(name)]
    if fn.startswith("percentile"):
        # PercentileAgg.java is t-digest approximate; `percentile_exact`
        # is the exact interpolated variant whose DuckDB twin is
        # quantile_cont (use it in oracle-checked specs).
        col_s, pct_s = (s.strip() for s in arg.split(",", 1))
        frac = float(pct_s) / 100.0
        pc = F.col(col_s)
        if fn == "percentile_exact":
            return [F.expr(f"percentile({col_s}, {frac!r})").alias(name)]
        return [F.percentile_approx(pc, frac).alias(name)]
    if fn == "relatedness":
        parts = [s.strip() for s in arg.split(",")]
        fg_col, bg_col = parts[0], parts[1]
        min_pop = 0.0
        for p in parts[2:]:
            k, _, v = p.partition("=")
            if k.strip() == "min_pop":
                min_pop = float(v)
        # coalesce: a bucket whose flags are all NULL counts 0, not NULL
        # (the reference's DocSet intersection size is never null)
        fg_count = F.coalesce(F.sum(F.col(fg_col).cast("long")), F.lit(0))
        bg_count = F.coalesce(F.sum(F.col(bg_col).cast("long")), F.lit(0))
        return [
            relatedness_expr(fg_count, sizes[fg_col], bg_count,
                             sizes[bg_col], min_pop).alias(name),
            fg_count.alias(f"{name}__fg"),
            bg_count.alias(f"{name}__bg"),
        ]
    raise ValueError(f"unknown agg {fn!r} in {spec!r}")


def _sort_exprs(sort, agg_names: set[str], val_col: str) -> list[Column]:
    """FacetRequestSorted sort: 'count desc' default, 'index asc' = by
    bucket value, or any sibling agg name. Ties resolve by bucket value
    ascending (Solr's index-order resort); a relatedness sort key adds
    the fg/bg count tie-breaks of RelatednessAgg.compare()."""
    if sort is None:
        sort = "count desc"
    if isinstance(sort, dict):
        (key, direction), = sort.items()
    else:
        key, _, direction = str(sort).partition(" ")
        direction = direction.strip() or "desc"
    desc = direction.lower() != "asc"

    def d(col: Column) -> Column:
        return col.desc() if desc else col.asc()

    if key == "index":
        return [F.col(val_col).desc() if desc else F.col(val_col).asc()]
    if key == "count":
        return [d(F.col("count")), F.col(val_col).asc()]
    if key not in agg_names:
        raise ValueError(f"sort key {key!r} is not an agg at this node")
    exprs = [d(F.col(key))]
    if f"{key}__fg" in agg_names:
        # RelatednessAgg.compare (RelatednessAgg.java:240-248): equal
        # relatedness resolves by fg count, then bg count
        exprs += [d(F.col(f"{key}__fg")), d(F.col(f"{key}__bg"))]
    return exprs + [F.col(val_col).asc()]


def _relatedness_sizes(domain: DataFrame, spec: dict) -> dict[str, Column]:
    """Global fg/bg set sizes (RelatednessAgg fgSize/bgSize) for every
    flag column referenced anywhere in the facet tree: ONE aggregate over
    the top-level domain, attached as literal columns via a broadcast
    1-row cross join — never recomputed per bucket or per nesting level."""
    flags: set[str] = set()

    def walk(node: dict) -> None:
        for sub in (node.get("facet") or {}).values():
            if isinstance(sub, str):
                m = _AGG_RE.match(sub)
                if m and m.group(1) == "relatedness":
                    parts = [s.strip() for s in m.group(2).split(",")]
                    flags.update(parts[:2])
            else:
                walk(sub)

    walk(spec)
    if not flags:
        return {}
    row = domain.agg(*[F.sum(F.col(f).cast("long")).alias(f) for f in sorted(flags)]).collect()[0]
    return {f: F.lit(int(row[f] or 0)) for f in flags}


def json_facets(domain: DataFrame, spec: dict,
                name: str = "", parent_keys: tuple[str, ...] = (),
                _sizes: dict[str, Column] | None = None) -> dict[str, DataFrame]:
    """Evaluate a JSON facet tree over the matching doc set `domain`.

    Returns {node_path: buckets DataFrame}. Each node's frame carries its
    ancestors' bucket-value columns, its own value column (named after
    `field`), `count`, and one column per agg. Child domains are the
    parent domain semi-joined to the parent's SURVIVING buckets (Solr
    refinement semantics: sub-facets are computed only inside returned
    buckets), so a deep tree stays a chain of groupBys + one semi-join
    per level — every stage map-side combinable.
    """
    if spec.get("type", "terms") != "terms":
        raise ValueError("json_facets handles terms nodes; use "
                         "range_facets/stats_facet for range/query nodes")
    if _sizes is None:
        _sizes = _relatedness_sizes(domain, spec)

    field = spec["field"]
    limit = int(spec.get("limit", 10))        # FacetField.DEFAULT_FACET_LIMIT
    mincount = int(spec.get("mincount", 1))   # FacetField initializer
    prefix = spec.get("prefix")
    sub = spec.get("facet") or {}

    agg_cols: list[Column] = [F.count(F.lit(1)).alias("count")]
    agg_names: set[str] = set()
    child_specs: dict[str, dict] = {}
    for agg_name, agg_spec in sub.items():
        if isinstance(agg_spec, str):
            agg_cols.extend(_parse_agg(agg_name, agg_spec, _sizes))
            agg_names.add(agg_name)
        else:
            child_specs[agg_name] = agg_spec

    base = domain
    if prefix is not None:
        base = base.filter(F.col(field).startswith(prefix))
    if not spec.get("missing", False):
        base = base.filter(F.col(field).isNotNull())

    keys = [*parent_keys, field]
    buckets = base.groupBy(*keys).agg(*agg_cols)
    if mincount > 1:
        buckets = buckets.filter(F.col("count") >= mincount)

    side_names = {c for c in buckets.columns if c.endswith("__fg") or c.endswith("__bg")}
    order = _sort_exprs(spec.get("sort"), agg_names | side_names, field)
    if limit >= 0:
        if parent_keys:
            w = Window.partitionBy(*parent_keys).orderBy(*order)
            buckets = (buckets.withColumn("__rank", F.row_number().over(w))
                       .filter(F.col("__rank") <= limit).drop("__rank"))
        else:
            # top-level top-N lowers to TakeOrderedAndProject (distributed
            # per-partition top-k + tiny merge), not a single-task window
            buckets = buckets.orderBy(*order).limit(limit)

    drop_side = [c for c in buckets.columns if c.endswith("__fg") or c.endswith("__bg")]
    # buckets come back in Solr's response order: ancestors asc, then this
    # node's bucket sort (the projection after the sort drops the
    # relatedness side-channels without disturbing it)
    final_order = [F.col(k).asc() for k in parent_keys] + list(order)
    out: dict[str, DataFrame] = {name: buckets.orderBy(*final_order).drop(*drop_side)}

    if child_specs:
        # Solr processes sub-facets inside the buckets the parent RETURNS.
        # Null-safe equality so a surviving missing (null) bucket keeps its
        # sub-facet domain (Solr computes sub-facets inside the missing
        # bucket too); the semi-join keeps only left columns, so aliasing
        # both sides avoids self-join lineage ambiguity.
        survivors = buckets.select(*keys).alias("__s")
        d = domain.alias("__d")
        cond = None
        for k in keys:
            c = F.col(f"__d.{k}").eqNullSafe(F.col(f"__s.{k}"))
            cond = c if cond is None else (cond & c)
        child_domain = d.join(F.broadcast(survivors), on=cond, how="left_semi")
        for child_name, child_spec in child_specs.items():
            path = f"{name}.{child_name}" if name else child_name
            out.update(json_facets(child_domain, child_spec, path,
                                   tuple(keys), _sizes))
    return out
