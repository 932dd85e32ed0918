"""TermsComponent enumeration (solr/core/.../TermsComponent.java) and
DocValuesStats (lucene/misc/.../DocValuesStats.java) — pandas twins over
the session corpus."""
from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F


def _twin(reader) -> pd.DataFrame:
    return reader.termdict().select("term", "df").toPandas()


def test_prefix_mincount_count_order(reader):
    from lucene_spark.search.terms import terms_enum

    got = terms_enum(reader, prefix="s", mincount=2, limit=10,
                     sort="count").toPandas()
    td = _twin(reader)
    want = td[td.term.str.startswith("s") & (td.df >= 2)].sort_values(
        ["df", "term"], ascending=[False, True]).head(10)
    assert list(got.term) == list(want.term)
    assert list(got.df) == list(want.df)


def test_index_order_and_range(reader):
    from lucene_spark.search.terms import terms_enum

    got = terms_enum(reader, lower="m", upper="p", limit=25,
                     sort="index").toPandas()
    td = _twin(reader)
    # TermsParams default: lower inclusive, upper exclusive
    want = td[(td.term >= "m") & (td.term < "p") & (td.df >= 1)].sort_values(
        "term").head(25)
    assert list(got.term) == list(want.term)


def test_range_include_flags(reader):
    from lucene_spark.search.terms import terms_enum

    td = _twin(reader)
    lo = td.term.sort_values().iloc[5]
    hi = td.term.sort_values().iloc[20]
    got = terms_enum(reader, lower=lo, upper=hi, include_lower=False,
                     include_upper=True, limit=1000, sort="index").toPandas()
    want = td[(td.term > lo) & (td.term <= hi)].sort_values("term")
    assert list(got.term) == list(want.term)


def test_regex_and_maxcount(reader):
    from lucene_spark.search.terms import terms_enum

    # Unanchored on purpose: Solr's terms.regex is a FULL match
    # (Pattern.matches), so [a-f]+ must NOT return terms merely
    # containing an a-f run.
    got = terms_enum(reader, regex="[a-f]+", mincount=1, maxcount=5,
                     limit=1000, sort="index").toPandas()
    td = _twin(reader)
    want = td[td.term.str.fullmatch("[a-f]+") & (td.df <= 5)].sort_values(
        "term")
    assert list(got.term) == list(want.term)


def test_terms_enum_distributed_plan(reader):
    """No single-partition global window: count order compiles to
    TakeOrderedAndProject."""
    from lucene_spark.search.terms import terms_enum

    plan = terms_enum(reader, mincount=1, limit=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_docvalues_stats(spark):
    from lucene_spark.relational.facets import docvalues_stats

    vals = [3.0, None, 7.0, 1.0, None, 9.0, 4.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v double")
    row = docvalues_stats(df, "v").head()
    present = [v for v in vals if v is not None]
    n = len(present)
    mean = sum(present) / n
    var_pop = sum((x - mean) ** 2 for x in present) / n  # POPULATION (:129)
    assert row["count"] == n
    assert row["missing"] == len(vals) - n
    assert row["min"] == 1.0 and row["max"] == 9.0
    assert row["sum"] == sum(present)
    assert abs(row["mean"] - mean) < 1e-12
    assert abs(row["variance"] - var_pop) < 1e-12
    assert abs(row["stdev"] - math.sqrt(var_pop)) < 1e-12


def test_docvalues_stats_all_missing(spark):
    from lucene_spark.relational.facets import docvalues_stats

    df = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    row = docvalues_stats(df, "v").head()
    assert row["count"] == 0 and row["missing"] == 2
    # SQL convention (matches var_pop over zero values in any oracle)
    assert row["variance"] is None and row["stdev"] is None


def test_docvalues_stats_empty_match_set(spark):
    """Zero matched docs: count=0 AND missing=0 (the collector's
    accumulators start at 0 — DocValuesStats.java:64-73), aggregates
    NULL — identical to the SQL-oracle shape."""
    from lucene_spark.relational.facets import docvalues_stats

    df = spark.createDataFrame([], "id long, v double")
    row = docvalues_stats(df, "v").head()
    assert row["count"] == 0 and row["missing"] == 0
    assert row["variance"] is None and row["mean"] is None
