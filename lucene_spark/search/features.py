"""Static ranking signals — FeatureField / FeatureQuery restated.

Role analogue: lucene/core/.../document/FeatureField.java:105 and
FeatureQuery.java: a per-document feature value (pagerank, recency,
url_length...) contributes a monotone score that combines additively with
the text score inside a BooleanQuery. Lucene smuggles the value into a
pseudo-term's term frequency; in Spark the feature is simply a column, so
a feature query is a broadcast join + column expression — Catalyst keeps
it in whole-stage codegen.

Score functions (FeatureField.java):
- log:        weight · ln(a + S)                (LogFunction, :309)
- saturation: weight · (1 − pivot/(S + pivot))  (SaturationFunction, :385)
              = weight · S/(S + pivot)
- sigmoid:    weight · S^a/(S^a + pivot^a)      (SigmoidFunction)

Divergence note (documented): Lucene quantizes S through the float16-ish
term-frequency encoding (decodeFeatureValue); we keep the exact column
value — the lossy-norm-free philosophy of this engine applied to features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def feature_score(col: Column, fn: str = "log", weight: float = 1.0,
                  scaling: float = 1.0, pivot: float = 1.0, a: float = 2.0) -> Column:
    """Column expression computing the feature contribution (float)."""
    s = col.cast("double")
    if fn == "log":
        out = F.lit(float(weight)) * F.log(F.lit(float(scaling)) + s)
    elif fn == "saturation":
        out = F.lit(float(weight)) * (F.lit(1.0) - F.lit(float(pivot)) / (s + F.lit(float(pivot))))
    elif fn == "sigmoid":
        sp = F.pow(s, F.lit(float(a)))
        out = F.lit(float(weight)) * sp / (sp + F.lit(float(pivot) ** float(a)))
    else:
        raise ValueError(f"unknown feature function {fn!r}")
    return out.cast("float")


def rescore_with_feature(
    hits: DataFrame, features: DataFrame, feature_col: str,
    fn: str = "log", weight: float = 1.0, scaling: float = 1.0,
    pivot: float = 1.0, a: float = 2.0, join_key: str = "doc_id",
) -> DataFrame:
    """Combine a (doc_id, score) hit set with a per-doc feature column:
    new score = text score + featureFn(value) — exactly the BooleanQuery
    SHOULD-clause combination FeatureQuery is designed for. The features
    side is broadcast (it is a projection of the docstats/corpus table
    restricted to the hit keys at scale — or the whole small signals dim).
    Returns the input columns with `score` replaced by the boosted one."""
    feat = features.select(
        F.col(join_key),
        feature_score(F.col(feature_col), fn, weight, scaling, pivot, a).alias("__fs"))
    return (
        hits.join(F.broadcast(feat), join_key, "left")
        .withColumn("score",
                    (F.col("score") + F.coalesce(F.col("__fs"), F.lit(0.0))).cast("float"))
        .drop("__fs")
    )


def distance_feature(searcher, column: str, origin: float, pivot: float,
                     boost: float = 1.0) -> DataFrame:
    """LongDistanceFeatureQuery (core/document/LongDistanceFeatureQuery.java:
    46-53, 117: score = boost · pivot / (pivot + |value − origin|)) — the
    recency/proximity boost of LongPoint.newDistanceFeatureQuery. Matches
    exactly the docs that HAVE a value for the column (the query iterates
    the field's doc values); the score decays hyperbolically with distance
    from the origin, = boost/2 at the pivot distance. The column resolves
    through reader.doc_values() (committed DV updates honored); the whole
    query is one docstats/DV scan with the arithmetic in whole-stage
    codegen — no Python, no shuffle."""
    if pivot <= 0:
        raise ValueError(f"pivotDistance must be > 0, got {pivot}")
    dv = searcher.reader.doc_values(column)
    dist = F.abs(F.col("value").cast("double") - F.lit(float(origin)))
    out = dv.filter(F.col("value").isNotNull()).select(
        "doc_id",
        (F.lit(float(boost)) * F.lit(float(pivot))
         / (F.lit(float(pivot)) + dist)).cast("float").alias("score"))
    return searcher._mask_deleted(out)


def distance_feature_geo(searcher, lat_col: str, lon_col: str,
                         origin_lat: float, origin_lon: float,
                         pivot_m: float, boost: float = 1.0) -> DataFrame:
    """LatLonPointDistanceFeatureQuery (core/document/
    LatLonPointDistanceFeatureQuery.java:130-131, 293-295): score =
    boost · pivot / (pivot + haversineMeters(origin, point)). Same
    matching contract as the numeric variant (docs with a point), same
    single-scan JVM-side plan; haversine per relational/geo.py
    (SloppyMath.haversinMeters role)."""
    from lucene_spark.relational.geo import haversine_meters

    if pivot_m <= 0:
        raise ValueError(f"pivotDistance must be > 0, got {pivot_m}")
    lat = searcher.reader.doc_values(lat_col).withColumnRenamed("value", "__lat")
    lon = searcher.reader.doc_values(lon_col).withColumnRenamed("value", "__lon")
    pts = lat.join(lon, "doc_id").filter(
        F.col("__lat").isNotNull() & F.col("__lon").isNotNull())
    dist = haversine_meters(F.col("__lat").cast("double"),
                            F.col("__lon").cast("double"),
                            F.lit(float(origin_lat)), F.lit(float(origin_lon)))
    out = pts.select(
        "doc_id",
        (F.lit(float(boost)) * F.lit(float(pivot_m))
         / (F.lit(float(pivot_m)) + dist)).cast("float").alias("score"))
    return searcher._mask_deleted(out)


def function_score(searcher, query, source: str,
                   columns: tuple[str, ...] = ()) -> DataFrame:
    """FunctionScoreQuery (queries/function/FunctionScoreQuery.java:44-62):
    wrap a query and REPLACE its score with a DoubleValuesSource — here a
    compiled scalar expression (relational/expressions.py, the
    JavascriptCompiler role) over doc-values/docstats columns plus the
    wrapped query's own score bound as `score` (the boostByQuery /
    scoringFunction composition from FunctionScoreQuery's factory
    methods). Docs where the source evaluates to null score 0 (the
    javadoc contract). `columns` names the doc-values columns the
    expression reads; each resolves through reader.doc_values(), so
    committed numeric DV updates are honored. The hit set is unchanged
    — only scores move; the expression stays a Catalyst Column
    (whole-stage codegen, no Python in the loop)."""
    from lucene_spark.relational.expressions import compile_expression

    hits = searcher.matches(query)
    out, cols = _join_doc_values(searcher, hits, columns)
    cols["score"] = F.col("score").cast("double")
    expr = compile_expression(source, cols)
    return (out.withColumn("score",
                           F.coalesce(expr, F.lit(0.0)).cast("float"))
            .select("doc_id", "score"))


def _join_doc_values(searcher, out: DataFrame,
                     columns: tuple[str, ...]) -> tuple[DataFrame, dict]:
    """Left-join each named doc-values column (reader overlay — committed
    DV updates honored) and return (joined_df, bindings) for
    compile_expression. Shared by function_score/match/range."""
    cols: dict = {}
    for i, c in enumerate(columns):
        dv = searcher.reader.doc_values(c).withColumnRenamed(
            "value", f"__fv{i}")
        out = out.join(dv, "doc_id", "left")
        cols[c] = F.col(f"__fv{i}")
    return out, cols


def function_match(searcher, source: str,
                   columns: tuple[str, ...] = (),
                   boost: float = 1.0) -> DataFrame:
    """FunctionMatchQuery (queries/function/FunctionMatchQuery.java:33-60):
    match every live doc where the double values source passes the
    predicate; constant score (the reference scorer emits score() =
    boost — it is a filter wrapped as a query). The predicate IS the
    expression here: comparison/boolean operators compile to 1.0/0.0
    per JavascriptCompiler semantics and nonzero means match, so
    `function_match(s, "n_chars > 400 && n_chars < 600")` is
    FunctionMatchQuery(DoubleValuesSource, v -> inRange). Docs whose
    doc value is missing evaluate null → no match (the reference's
    advanceExact-false case). Columns resolve through
    reader.doc_values() so committed DV updates are honored; a raw
    single-column predicate stays pushdown-eligible."""
    from lucene_spark.relational.expressions import compile_expression

    out, cols = _join_doc_values(
        searcher, searcher.reader.docstats().select("doc_id"), columns)
    expr = compile_expression(source, cols)
    out = (out.filter(expr.cast("double") != F.lit(0.0))
           .select("doc_id", F.lit(float(boost)).cast("float").alias("score")))
    return searcher._mask_deleted(out)


def function_range(searcher, source: str, lower: float | None = None,
                   upper: float | None = None,
                   columns: tuple[str, ...] = (),
                   include_lower: bool = True,
                   include_upper: bool = True) -> DataFrame:
    """FunctionRangeQuery (queries/function/FunctionRangeQuery.java:35-60
    + ValueSourceScorer): every live doc whose compiled-expression value
    falls in the range matches, scored BY that value (ValueSourceScorer
    scores are the function values). Columns resolve like
    function_score; the whole thing is one docstats scan with a pushed
    predicate when the expression is a raw column."""
    from lucene_spark.relational.expressions import compile_expression

    out, cols = _join_doc_values(
        searcher, searcher.reader.docstats().select("doc_id"), columns)
    expr = compile_expression(source, cols)
    # filter in float64 (the expression's native precision) so range
    # boundaries are exact; narrow to float32 only for the emitted score
    out = out.withColumn("__v", expr.cast("double"))
    if lower is not None:
        out = out.filter(F.col("__v") >= lower if include_lower
                         else F.col("__v") > lower)
    if upper is not None:
        out = out.filter(F.col("__v") <= upper if include_upper
                         else F.col("__v") < upper)
    out = out.select("doc_id", F.col("__v").cast("float").alias("score"))
    return searcher._mask_deleted(out)
