"""facet.query and facet.range.other — solr/handler/component/
SimpleFacets + RangeFacetProcessor.java:150-200."""

from pyspark.sql import functions as F

from lucene_spark.relational.facets import (query_facets,
                                            range_facets_with_other)


def test_query_facets_counts(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", i * 10) for i in range(10)],
        "id long, lang string, n long")
    out = {r["facet"]: r["count"] for r in query_facets(df, {
        "en": F.col("lang") == "en",
        "big": F.col("n") >= 50,
        "none": F.col("n") < 0,
    }).collect()}
    assert out == {"en": 5, "big": 5, "none": 0}


def test_query_facets_single_pass(spark):
    df = spark.range(100).selectExpr("id", "id * 2 as n")
    plan = query_facets(df, {
        "a": F.col("n") > 10, "b": F.col("n") < 50,
    })._jdf.queryExecution().executedPlan().toString()
    assert plan.split("\n\n", 1)[0].count("HashAggregate") <= 2


def test_range_other_partition(spark):
    """before + between + after == total; between == sum of buckets;
    bucket counts match the plain range facet."""
    vals = [5, 15, 25, 35, 45, 55, 95, 150, -3]
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "id long, v double")
    out = {r["label"]: r["count"]
           for r in range_facets_with_other(df, "v", 10.0, 50.0, 20.0).collect()}
    assert out["before"] == 2          # 5, -3
    assert out["after"] == 3           # 55, 95, 150
    assert out["between"] == out["10.0"] + out["30.0"]
    assert out["before"] + out["between"] + out["after"] == len(vals)
    assert out["10.0"] == 2            # 15, 25
    assert out["30.0"] == 2            # 35, 45


def test_range_other_emits_zero_count_buckets(spark):
    """Solr returns the COMPLETE bucket list — empty gaps appear with
    count 0 (RangeFacetRequest bucket enumeration)."""
    df = spark.createDataFrame([(1, 100.0)], "id long, v double")
    out = {r["label"]: r["count"]
           for r in range_facets_with_other(df, "v", 10.0, 50.0, 20.0).collect()}
    assert out == {"10.0": 0, "30.0": 0, "after": 1, "before": 0,
                   "between": 0}


def test_range_other_hardend_false_extends_last_bucket(spark):
    """Default hardend=false: (end-start) not divisible by gap extends
    the last bucket to its full width, and `after` starts at the ACTUAL
    end (RangeFacetProcessor default)."""
    df = spark.createDataFrame(
        [(1, 55.0), (2, 61.0)], "id long, v double")
    out = {r["label"]: r["count"]
           for r in range_facets_with_other(df, "v", 0.0, 50.0, 20.0).collect()}
    # buckets 0,20,40 — the last covers [40,60): 55 lands IN it
    assert out["40.0"] == 1 and out["after"] == 1  # 61 >= 60
    assert out["between"] == 1
    # hardend=true clips at end: 55 becomes 'after'
    out_h = {r["label"]: r["count"]
             for r in range_facets_with_other(df, "v", 0.0, 50.0, 20.0,
                                              hardend=True).collect()}
    assert out_h["40.0"] == 0 and out_h["after"] == 2


def test_query_facets_empty_rejected(spark):
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError):
        query_facets(df, {})
