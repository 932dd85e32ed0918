"""Function queries — Lucene ValueSource registry restated as Column
builders.

Role analogue: lucene/queries/src/java/org/apache/lucene/queries/function/
valuesource/ (50 files) + Solr's ValueSourceParser registry
(solr/core/src/java/org/apache/solr/search/ValueSourceParser.java).
Every arithmetic/conditional ValueSource is a Spark Column expression
(JVM-side, codegen'd); index-stat accessors (idf/df/maxdoc/numdocs…)
resolve against the term dictionary / fieldstats like Lucene resolves
them against the reader.

Usage: `FUNCTIONS["recip"](col("age"), 1.0, 1000.0, 1000.0)` or
`parse_fn("sum(boost, product(2, score))", cols)` is left to callers —
this is the building-block registry, mirroring how Solr's parser wires
ValueSourceParser entries.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _lit(x) -> Column:
    """Accept a ready Column (e.g. from the expression compiler) or a
    plain number (the direct-call API)."""
    return x if isinstance(x, Column) else F.lit(float(x))


def _linear(x: Column, a, b) -> Column:
    """LinearFloatFunction: a·x + b."""
    return x * _lit(a) + _lit(b)


def _recip(x: Column, m, a, b) -> Column:
    """ReciprocalFloatFunction: a/(m·x + b) — the date-boost workhorse."""
    return _lit(a) / (x * _lit(m) + _lit(b))


def _scale(df, x: Column, lo: float, hi: float) -> Column:
    """ScaleFloatFunction: min-max rescale of x into [lo, hi] over the
    whole result set (needs the global min/max → one tiny agg)."""
    mn, mx = df.agg(F.min(x), F.max(x)).collect()[0]
    rng = (mx - mn) or 1.0
    return (x - F.lit(mn)) / F.lit(rng) * F.lit(float(hi - lo)) + F.lit(float(lo))


def _rangemap(x: Column, lo, hi, target, default) -> Column:
    """RangeMapFloatFunction: x∈[lo,hi] → target else default."""
    return F.when(x.between(lo, hi), _lit(target)).otherwise(_lit(default))


def _if(cond: Column, a: Column, b: Column) -> Column:
    """IfFunction."""
    return F.when(cond, a).otherwise(b)


def _def(x: Column, fallback) -> Column:
    """DefFunction: x unless null/zero → fallback."""
    return F.when(x.isNull() | (x == 0), fallback).otherwise(x)


FUNCTIONS: dict[str, object] = {
    # arithmetic family (SumFloatFunction, ProductFloatFunction, ...)
    "sum": lambda *xs: sum(xs[1:], xs[0]),
    "sub": lambda a, b: a - b,
    "product": lambda *xs: __import__("functools").reduce(lambda p, x: p * x, xs),
    "div": lambda a, b: a / b,
    "pow": lambda a, b: F.pow(a, b),
    "sqrt": F.sqrt,
    "log": F.log10,          # Solr log() is base-10
    "ln": F.log,
    "abs": F.abs,
    "max": lambda *xs: F.greatest(*xs),
    "min": lambda *xs: F.least(*xs),
    "linear": _linear,
    "recip": _recip,
    "map": _rangemap,
    "scale": _scale,         # needs (df, col, lo, hi)
    # conditionals
    "if": _if,
    "def": _def,
    "exists": lambda x: x.isNotNull(),
    # string / misc (strdist ~ Solr ValueSourceParser)
    "strdist": lambda a, b: F.lit(1.0) - F.levenshtein(a, b) / F.greatest(
        F.length(a), F.length(b), F.lit(1)),
    "ms": lambda a, b=None: (F.unix_millis(a) - (F.unix_millis(b) if b is not None else F.lit(0))),
}


def with_ord(df, col: str, out: str = "ord", reverse: bool = False,
             rord_out: str | None = None):
    """ord()/rord() function queries (solr/search/function/
    OrdFieldSource.java:64-120, ReverseOrdFieldSource.java:95-120):
    the document's value's ordinal in the lexicographic (binary-collated,
    BytesRef-order) list of the field's DISTINCT values.

    Matches the code, not the stale javadoc: ord is the raw
    SortedDocValues ordinal (0-based), a missing value is -1;
    rord = valueCount - ord - 1, missing = valueCount.

    `rord_out` additionally emits the reverse ordinal from the SAME
    dictionary pass (asking for both otherwise costs two distinct scans
    and two counts).

    Scale shape: the window runs over the DISTINCT value list only
    (cardinality-bounded — the same top-level ordinal map the reference
    builds), then joins back; AQE picks broadcast for small dictionaries.
    """
    from pyspark.sql import Window

    vals = df.select(col).filter(F.col(col).isNotNull()).distinct()
    ords = vals.withColumn(
        "__ord", F.row_number().over(Window.orderBy(F.col(col))) - 1)
    n = ords.count()  # valueCount — one scalar, the ordinal map's size
    joined = df.join(ords, col, "left")
    fwd = F.coalesce(F.col("__ord"), F.lit(-1))
    rev = F.when(F.col("__ord").isNotNull(),
                 F.lit(n) - F.col("__ord") - 1).otherwise(F.lit(n))
    joined = joined.withColumn(out, (rev if reverse else fwd).cast("int"))
    if rord_out is not None:
        joined = joined.withColumn(rord_out, rev.cast("int"))
    return joined.drop("__ord")


def index_stat_columns(reader):
    """Index-stat ValueSources (TFValueSource/IDFValueSource/
    DocFreqValueSource/NumDocsValueSource...): returned as joinable
    DataFrames / literals against the term dictionary & fieldstats —
    Lucene resolves the same numbers from the reader."""
    import math

    N = reader.doc_count
    return {
        "numdocs": F.lit(N),
        "maxdoc": F.lit(N),
        "sumtotaltermfreq": F.lit(reader.sum_doclen),
        # per-term df/idf come from joining termdict; provide the frame
        "termdict": reader.termdict().select(
            "field", "term", "df", "cf",
            (F.lit(float(math.log(N + 1))) - F.log(F.col("df") + 0.5)).alias("idf_ish"),
        ),
    }
