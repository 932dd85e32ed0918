"""Facets / grouping / stats — Lucene facet module + Solr JSON Facets.

Role analogue (SURVEY.md §2.7):
- facet counts (lucene/facet/ FacetsCollector, sortedset/, range/):
  matches.groupBy(dim).count()
- Solr JSON Facet aggregations (solr/core/.../search/facet/: SumAgg,
  AvgAgg, MinMaxAgg, HLLAgg, PercentileAgg, StdAgg, VarianceAgg):
  Spark built-ins incl. approx_count_distinct (HLL) and percentile_approx;
  the distributed partial/merge protocol (FacetFieldMerger.java) is
  Spark's native two-phase aggregation.
- DrillDownQuery/DrillSideways: N groupBys sharing one cached base filter.
- range facets (facet/range/LongRangeFacetCounts): width_bucket-style expr.

All facet inputs are "the matching doc set" — here a DataFrame of matches
(e.g. searcher.matches(query) joined to docstats/corpus columns), so facet
math stays 100% JVM-side.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F


def facet_counts(matches: DataFrame, dim: str, top_n: int = 10) -> DataFrame:
    """Field facet: count per category, ordered by count desc then value
    (Solr's default bucket sort)."""
    return (
        matches.groupBy(dim)
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col(dim).asc())
        .limit(top_n)
    )


def _facet_children(path_col: str, path: tuple[str, ...], delim: str):
    """Shared taxonomy-path decomposition: returns (cond, child) where
    `cond` keeps rows whose path is strictly under `path` and `child` is
    the immediate-child segment column. Single source of truth for
    taxonomy_facets / association_facets (delimiter escaping, depth
    arithmetic live here only)."""
    import re

    parts = F.split(F.col(path_col), re.escape(delim))
    cond = F.size(parts) > len(path)
    for i, seg in enumerate(path):
        cond = cond & (F.element_at(parts, i + 1) == F.lit(seg))
    child = F.element_at(parts, len(path) + 1)
    return cond, child


def taxonomy_facets(matches: DataFrame, path_col: str,
                    path: tuple[str, ...] = (), top_n: int = 10,
                    delim: str = "/") -> DataFrame:
    """Hierarchical taxonomy facet — facet/taxonomy/
    FastTaxonomyFacetCounts.java getTopChildren over FacetsConfig
    hierarchical dims (FacetsConfig.java path encoding): each matching
    doc carries a category path like 'a/b/c'; counts the IMMEDIATE
    children of `path` (the dimension root when empty), each child's
    count covering all of its descendants, ordered count desc then label
    asc. One JVM-side split + groupBy — map-side combinable, no UDF; the
    prefix filter runs in whole-stage codegen above the scan (split() of
    a path column is not a parquet-pushable predicate)."""
    cond, child = _facet_children(path_col, path, delim)
    return (
        matches.filter(cond)
        .groupBy(child.alias("label"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col("label").asc())
        .limit(top_n)
    )


def association_facets(matches: DataFrame, path_col: str, value_col: str,
                       path: tuple[str, ...] = (), top_n: int = 10,
                       delim: str = "/", agg: str = "sum") -> DataFrame:
    """Association facets — facet/taxonomy/TaxonomyFacetSumIntAssociations
    .java / TaxonomyFacetSumFloatAssociations.java: like getTopChildren
    but each doc contributes its per-category ASSOCIATION VALUE instead
    of 1 (confidence weights, prices, click counts...). Same one-shuffle
    child groupBy as taxonomy_facets; `agg` picks sum (the reference
    classes) or max/min/avg (the FloatAssociationFacetField variants
    users layer on). Ordered value desc, label asc."""
    fn = {"sum": F.sum, "max": F.max, "min": F.min, "avg": F.avg}.get(agg)
    if fn is None:
        raise ValueError(f"unknown association agg {agg!r}")
    cond, child = _facet_children(path_col, path, delim)
    return (
        matches.filter(cond)
        .groupBy(child.alias("label"))
        .agg(fn(F.col(value_col)).alias("value"))
        .orderBy(F.col("value").desc(), F.col("label").asc())
        .limit(top_n)
    )


def range_facets(matches: DataFrame, col: str, start: float, end: float, gap: float) -> DataFrame:
    """Numeric range facet (facet/range/LongRangeFacetCounts): fixed-width
    buckets; bucket id computed JVM-side, no UDF."""
    bucket = F.floor((F.col(col) - F.lit(start)) / F.lit(gap)).cast("long")
    # bucket_lo is double regardless of the input column's type: int inputs
    # with int start/gap would otherwise emit BIGINT bounds while range
    # facet consumers (and the SQL twin) expect numeric-range endpoints
    return (
        matches.filter((F.col(col) >= start) & (F.col(col) < end))
        .withColumn("bucket_lo", (F.lit(start) + bucket * F.lit(gap)).cast("double"))
        .groupBy("bucket_lo")
        .agg(F.count("*").alias("count"))
        .orderBy("bucket_lo")
    )


def _conditional_counts(matches: DataFrame,
                        labeled_conds: list[tuple[str, Column]],
                        label_name: str) -> DataFrame:
    """Shared single-pass counting core for query / interval / range
    faceting: EVERY labeled condition becomes a conditional sum in ONE
    aggregate (map-side combinable — no per-label job, no groupBy
    shuffle beyond the scalar agg), then the scalar row unfolds to
    (label, count) rows in the caller's order."""
    if not labeled_conds:
        raise ValueError("at least one facet condition is required")
    counted = matches.agg(*[
        F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
        .alias(f"_c{i}")
        for i, (_, cond) in enumerate(labeled_conds)])
    pairs = F.array(*[
        F.struct(F.lit(label).alias(label_name),
                 F.col(f"_c{i}").cast("long").alias("count"))
        for i, (label, _) in enumerate(labeled_conds)])
    return (counted.select(F.explode(pairs).alias("p"))
            .select(f"p.{label_name}", "p.count"))


def range_facets_with_other(matches: DataFrame, col: str, start: float,
                            end: float, gap: float,
                            hardend: bool = False) -> DataFrame:
    """facet.range with facet.range.other=all (solr/handler/component/
    RangeFacetProcessor.java:150-200 + RangeFacetRequest bucket
    enumeration): the fixed-width buckets PLUS before / between / after,
    default include semantics (lower inclusive, upper exclusive).

    Reference-faithful details: EVERY bucket in [start, end) is emitted,
    zero-count buckets included (Solr returns the complete bucket list);
    with the default hardend=false a (end-start) not divisible by gap
    EXTENDS the last bucket to its full gap width, and `after` counts
    x >= that actual end (hardend=true clips the last bucket at `end`).
    before = x < start; between = [start, actual_end).

    Returns (label, count), bucket labels = the bucket's numeric lower
    bound rendered as a string. One aggregation pass for everything."""
    start, end, gap = float(start), float(end), float(gap)
    if gap <= 0 or end <= start:
        raise ValueError("need gap > 0 and end > start")
    c = F.col(col).cast("double")
    conds: list[tuple[str, Column]] = []
    lo = start
    while lo < end:
        hi = min(lo + gap, end) if hardend else lo + gap
        conds.append((str(lo), (c >= lo) & (c < hi)))
        lo = hi if hardend else lo + gap
    actual_end = lo
    conds.append(("before", c < start))
    conds.append(("after", c >= actual_end))
    conds.append(("between", (c >= start) & (c < actual_end)))
    return _conditional_counts(matches, conds, "label")


def date_range_facets(matches: DataFrame, col: str, start: str, end: str,
                      gap: str, now=None, tz=None, hardend: bool = False,
                      other: bool = False,
                      max_buckets: int = 10_000) -> DataFrame:
    """facet.range over a date field with a date-math gap
    (solr/handler/component/RangeFacetRequest.java DateRangeEndpoint
    calculator + RangeFacetProcessor): start/end are Solr date strings
    (`NOW/YEAR`, `2020-01-01T00:00:00Z`), gap is a date-math expression
    (`+1MONTH`) applied SUCCESSIVELY — each bucket's upper bound is
    parseMath(gap) with "now" = that bucket's lower bound, so
    calendar-length months/years produce variable-width buckets exactly
    as the reference does.

    Same hardend / other semantics as range_facets_with_other: zero-count
    buckets are emitted, hardend=False lets the last bucket extend to its
    full gap width and `after` starts at that ACTUAL end.

    Bucket labels are the ISO-8601 lower bounds (Solr's response shape).
    Everything is ONE map-side-combinable aggregation pass; the bucket
    boundary enumeration is driver-side date math over at most
    `max_buckets` edges (a non-advancing gap or an absurd range raises
    rather than looping)."""
    from .datemath import iso_z, parse_math, parse_math_expr

    lo_dt = parse_math(now, start, tz=tz)
    end_dt = parse_math(now, end, tz=tz)
    if end_dt <= lo_dt:
        raise ValueError("need end > start")
    c = F.col(col)
    conds: list[tuple[str, Column]] = []
    while lo_dt < end_dt:
        hi_dt = parse_math_expr(lo_dt, gap.removeprefix("NOW"), tz=tz)
        if hi_dt <= lo_dt:
            raise ValueError(f"gap {gap!r} does not advance from {lo_dt}")
        if len(conds) >= max_buckets:
            raise ValueError(f"more than {max_buckets} date buckets")
        hi_eff = min(hi_dt, end_dt) if hardend else hi_dt
        conds.append((iso_z(lo_dt),
                      (c >= F.lit(_naive(lo_dt))) & (c < F.lit(_naive(hi_eff)))))
        lo_dt = hi_eff if hardend else hi_dt
    if other:
        start_dt = parse_math(now, start, tz=tz)
        conds.append(("before", c < F.lit(_naive(start_dt))))
        conds.append(("after", c >= F.lit(_naive(lo_dt))))
        conds.append(("between",
                      (c >= F.lit(_naive(start_dt))) & (c < F.lit(_naive(lo_dt)))))
    return _conditional_counts(matches, conds, "label")


def _naive(t):
    """Timestamp literals for comparison against TimestampNTZ-ish parquet
    columns: strip the tzinfo after normalizing to UTC (the corpus stores
    wall-clock UTC instants)."""
    from datetime import timezone as _tz
    return t.astimezone(_tz.utc).replace(tzinfo=None)


def query_facets(matches: DataFrame, facet_queries: dict[str, Column]) -> DataFrame:
    """facet.query (solr/handler/component/FacetComponent.java /
    SimpleFacets.getFacetQueryCount): the count of each arbitrary filter
    over the SAME match set, all in one aggregation pass. Returns
    (facet, count) in the caller's order."""
    return _conditional_counts(
        matches, list(facet_queries.items()), "facet")


def _parse_interval(spec: str) -> tuple[str, str | None, str | None, bool, bool]:
    """Parse one Solr interval-facet string (solr/request/IntervalFacets
    .java:520-700 getInterval): `[`/`(` start `,` end `)`/`]`; `*` =
    unbounded on either side (open/closed equivalent there); `\\` escapes
    `,[]()*`; whitespace around values trimmed; optional local-params
    output key `{!key='X'}[a,b)`. Returns (key, start, end, start_open,
    end_open) with None for an unbounded limit."""
    raw = spec.strip()
    key = None
    if raw.startswith("{!"):
        end_lp = raw.index("}")
        lp = raw[2:end_lp]
        raw = raw[end_lp + 1:].strip()
        # k=v pairs; values may be '…'/"…"-quoted (QueryParsing
        # .getLocalParams role — only the output key is consumed here)
        for m in re.finditer(r"(\w+)=('[^']*'|\"[^\"]*\"|\S+)", lp):
            if m.group(1) == "key":
                v = m.group(2)
                key = v[1:-1] if v[0] in "'\"" else v
    if key is None:
        key = raw
    if len(raw) < 3 or raw[0] not in "([" or raw[-1] not in ")]":
        raise ValueError(f"invalid interval syntax: {spec!r}")
    start_open = raw[0] == "("
    end_open = raw[-1] == ")"
    body, cur, esc = raw[1:-1], [], False
    parts = []
    for ch in body:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == ",":
            # every unescaped comma splits — a third part below means
            # the reference's "Extra unescaped comma" SyntaxError
            # (IntervalFacets.java:~583)
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    if len(parts) != 2:
        raise ValueError(f"interval needs exactly one unescaped comma: {spec!r}")
    start = parts[0].strip()
    end = parts[1].strip()
    if not start or not end:
        raise ValueError(f"interval limits can't be empty: {spec!r}")
    return (key, None if start == "*" else start,
            None if end == "*" else end, start_open, end_open)


def interval_facets(matches: DataFrame, col: str,
                    intervals: list[str], numeric: bool = True) -> DataFrame:
    """Solr interval faceting (facet.interval —
    solr/core/src/java/org/apache/solr/request/IntervalFacets.java).
    Each interval's count equals the count of the equivalent range query
    over the match set (the class's documented contract, :58-64), but
    like the reference all intervals are counted in ONE pass: each is a
    conditional sum in a single aggregate (map-side combinable, no
    per-interval scan). Intervals may overlap and may be unbounded
    (`*`). Returns (interval, count) in the caller's order. String
    intervals compare case-sensitively (numeric=False), the reference's
    only string mode."""
    parsed = [_parse_interval(s) for s in intervals]
    c = F.col(col).cast("double") if numeric else F.col(col)

    def lim(v):
        return F.lit(float(v)) if numeric else F.lit(v)

    conds: list[tuple[str, Column]] = []
    for key, start, end, s_open, e_open in parsed:
        if start is not None and end is not None:
            # the reference rejects inverted limits for EVERY field type
            # (IntervalFacets.java: start.compareTo(end) > 0 → SyntaxError)
            inverted = (float(start) > float(end)) if numeric \
                else (start > end)
            if inverted:
                raise ValueError(f"start > end in interval {key!r}")
        cond = c.isNotNull()
        if start is not None:
            cond = cond & ((c > lim(start)) if s_open else (c >= lim(start)))
        if end is not None:
            cond = cond & ((c < lim(end)) if e_open else (c <= lim(end)))
        conds.append((key, cond))
    return _conditional_counts(matches, conds, "interval")


def stats_facet(matches: DataFrame, col: str) -> DataFrame:
    """Solr StatsComponent / JSON facet aggs over one field."""
    c = F.col(col)
    return matches.agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
        F.var_samp(c).alias("variance"),
        F.approx_count_distinct(c).alias("unique_hll"),       # HLLAgg
        F.percentile_approx(c, [0.5, 0.95, 0.99]).alias("percentiles"),  # PercentileAgg
    )


def docvalues_stats(matches: DataFrame, col: str) -> DataFrame:
    """DocValuesStats collector (lucene/misc/src/java/org/apache/lucene/
    misc/search/DocValuesStats.java): one pass over the matching set
    accumulating count, MISSING (matched docs without the field —
    :64-73), min/max/sum, and Welford mean/variance where variance is
    POPULATION variance (variance/count — :129-137, unlike Solr's
    sample-variance StatsComponent), stdev = sqrt. One aggregation, all
    map-side combinable.

    Empty matching set: count=0 and missing=0 (the collector's
    accumulators start at 0 — :64-73); min/max/sum/mean/variance/stdev
    are NULL (SQL convention, matching any SQL oracle's var_pop over
    zero rows). With count >= 1 var_pop is never NULL, so no coalesce
    is needed there."""
    c = F.col(col)
    return matches.agg(
        F.count(c).alias("count"),
        F.coalesce(F.sum(F.when(c.isNull(), 1).otherwise(0)),
                   F.lit(0)).alias("missing"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("mean"),
        F.var_pop(c).alias("variance"),
        F.stddev_pop(c).alias("stdev"),
    )


def percentiles_facet(matches: DataFrame, col: str, by: str | None = None,
                      ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99),
                      exact: bool = True) -> DataFrame:
    """Solr StatsComponent percentiles (solr/handler/component/
    StatsValuesFactory.java `percentiles` + PercentileAgg in JSON
    facets). The reference computes t-digest approximations because a
    single node cannot hold the field; Spark can do the EXACT
    interpolated percentile distributedly (`percentile`, the reference's
    own definition of the statistic), so exact=True is the default and
    exact=False selects the t-digest-role `percentile_approx` — the
    scale path when the value domain per group is huge. One aggregate
    per group either way (no per-percentile passes)."""
    fn = "percentile" if exact else "percentile_approx"
    arr = ", ".join(repr(float(p)) for p in ps)
    agg = F.expr(f"{fn}({col}, array({arr}))").alias("percentiles")
    if by is None:
        return matches.agg(agg)
    return matches.groupBy(by).agg(agg)


def pivot_facets(matches: DataFrame, dims: list[str]) -> DataFrame:
    """Pivot facets (handler/component/PivotFacetProcessor.java):
    hierarchical multi-field counts via rollup."""
    return (
        matches.rollup(*dims)
        .agg(F.count("*").alias("count"))
        .orderBy(*[F.col(d).asc_nulls_first() for d in dims])
    )


def drill_sideways(base_matches: DataFrame, dims: list[str], top_n: int = 10) -> dict[str, DataFrame]:
    """DrillSideways: one facet table per dimension over the shared base
    match set; caller should .cache() base_matches (the filterCache role,
    solr/search/SolrIndexSearcher.java:94)."""
    return {d: facet_counts(base_matches, d, top_n) for d in dims}


def group_top_docs(matches: DataFrame, group_col: str, order: list[Column], n_per_group: int) -> DataFrame:
    """Two-pass grouping (grouping/FirstPassGroupingCollector.java →
    second pass): top docs per group, one window shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        matches.withColumn("group_rank", F.row_number().over(w))
        .filter(F.col("group_rank") <= n_per_group)
    )


def sampled_facet_counts(
    matches: DataFrame,
    dim: str,
    key_col: str,
    sample_size: int,
    top_n: int = 10,
    salt: str = "",
    universe: DataFrame | None = None,
) -> DataFrame:
    """Sampled facet counts — facet/RandomSamplingFacetsCollector.java:
    facet over a bounded random subset of the matches, then amortize the
    sampled counts back to full-set estimates (amortizeFacetCounts,
    RandomSamplingFacetsCollector.java:218-252).

    Semantics kept from the reference: no sampling at all when
    totalHits <= sample_size (line 130); otherwise rate =
    sample_size/totalHits (line 135), top children are RANKED BY THE
    SAMPLED COUNT (the counting Facets run on the sampled set), and the
    amortized estimate is trunc(sampled/rate) capped at the dimension
    value's true upper bound — the reference caps at docFreq of the
    facet term (line 239); pass `universe` (the full collection) to
    reproduce that cap, computed as ONE map-side-combined groupBy and
    broadcast-joined against the ≤top_n winners.

    Where the reference uses a seeded XORShift per-hit coin flip (only
    reproducible inside one JVM's doc order), the distributed
    restatement samples by key hash — sha256(key||salt) < rate, the
    `holdout_flag` primitive — so the SAME docs are sampled on any
    cluster size, any partitioning, and in the SQL oracle. Scale shape:
    one count job (columnar, cheap) + one narrow filter + one facet
    groupBy; no shuffle beyond the facet's own.

    Returns (dim, sampled_count, count) — `count` is the amortized
    estimate, `sampled_count` the raw evidence."""
    from lucene_spark.pipeline.split import holdout_flag

    if sample_size <= 0:
        raise ValueError(f"sample_size must be positive, got {sample_size}")
    total = matches.count()
    if total <= sample_size:
        rate = 1.0
        sample = matches
    else:
        rate = sample_size / total
        sample = matches.filter(holdout_flag(F.col(key_col), rate, salt))
    out = (sample.groupBy(dim)
           .agg(F.count("*").alias("sampled_count"))
           .withColumn("count",
                       F.floor(F.col("sampled_count") / F.lit(rate))
                       .cast("long"))
           .orderBy(F.col("sampled_count").desc(), F.col(dim).asc())
           .limit(top_n))
    if universe is not None and rate < 1.0:
        caps = universe.groupBy(dim).agg(F.count("*").alias("__cap"))
        out = (out.join(F.broadcast(caps.join(
                   F.broadcast(out.select(dim)), dim, "left_semi")), dim,
                   "left")
               .withColumn("count", F.least(
                   F.col("count"), F.coalesce(F.col("__cap"),
                                              F.col("count"))))
               .drop("__cap")
               .orderBy(F.col("sampled_count").desc(), F.col(dim).asc()))
    return out
