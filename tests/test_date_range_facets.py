"""Date-gap range facets (RangeFacetRequest date endpoints +
RangeFacetProcessor): successive date-math gaps, calendar-width months,
hardend/other semantics, zero-count buckets, single-pass plan."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from lucene_spark.relational.facets import date_range_facets

NOW = datetime(2024, 6, 15, 12, 0, 0)


@pytest.fixture(scope="module")
def days_df(spark):
    # one event per day at 06:00 for Jan..Apr 2024 (leap year: Feb has 29)
    t0 = datetime(2024, 1, 1, 6, 0, 0)
    rows = []
    d = t0
    while d < datetime(2024, 5, 1):
        rows.append((len(rows), d))
        d += timedelta(days=1)
    return spark.createDataFrame(rows, "id long, ts timestamp")


def facet_map(df, **kw):
    out = date_range_facets(df, "ts", **kw)
    return {r["label"]: r["count"] for r in out.collect()}


def test_monthly_calendar_buckets(days_df):
    m = facet_map(days_df, start="2024-01-01T00:00:00Z",
                  end="2024-05-01T00:00:00Z", gap="+1MONTH")
    # variable-width calendar months, leap February included
    assert m == {"2024-01-01T00:00:00Z": 31, "2024-02-01T00:00:00Z": 29,
                 "2024-03-01T00:00:00Z": 31, "2024-04-01T00:00:00Z": 30}


def test_zero_count_buckets_emitted(days_df):
    m = facet_map(days_df, start="2024-04-25T00:00:00Z",
                  end="2024-05-10T00:00:00Z", gap="+5DAYS")
    assert m["2024-05-05T00:00:00Z"] == 0          # past the data: still there
    assert m["2024-04-25T00:00:00Z"] == 5


def test_other_and_soft_end_extension(days_df):
    # range [Jan 10, Jan 24) with +6DAYS: buckets 10,16,22; last extends
    # to Jan 28 (hardend default false) so `after` starts at Jan 28
    m = facet_map(days_df, start="2024-01-10T00:00:00Z",
                  end="2024-01-24T00:00:00Z", gap="+6DAYS", other=True)
    assert m["2024-01-10T00:00:00Z"] == 6
    assert m["2024-01-22T00:00:00Z"] == 6          # extended to full width
    assert m["before"] == 9                        # Jan 1..9
    assert m["between"] == 18                      # Jan 10..27
    assert m["after"] == len(days_df.collect()) - 9 - 18


def test_hardend_clips_last_bucket(days_df):
    m = facet_map(days_df, start="2024-01-10T00:00:00Z",
                  end="2024-01-24T00:00:00Z", gap="+6DAYS", other=True,
                  hardend=True)
    assert m["2024-01-22T00:00:00Z"] == 2          # clipped at Jan 24
    assert m["between"] == 14
    assert m["after"] == len(days_df.collect()) - 9 - 14


def test_now_relative_endpoints(days_df):
    m = facet_map(days_df, start="NOW/YEAR", end="NOW/YEAR+2MONTHS",
                  gap="+1MONTH", now=NOW)
    assert m == {"2024-01-01T00:00:00Z": 31, "2024-02-01T00:00:00Z": 29}


def test_guards(days_df):
    with pytest.raises(ValueError):
        facet_map(days_df, start="2024-02-01T00:00:00Z",
                  end="2024-01-01T00:00:00Z", gap="+1DAY")
    with pytest.raises(ValueError):
        facet_map(days_df, start="2024-01-01T00:00:00Z",
                  end="2024-02-01T00:00:00Z", gap="+0DAYS")
    with pytest.raises(ValueError):
        facet_map(days_df, start="2024-01-01T00:00:00Z",
                  end="2024-02-01T00:00:00Z", gap="+1MILLI", max_buckets=100)


def test_single_pass_plan(days_df):
    plan = date_range_facets(
        days_df, "ts", start="2024-01-01T00:00:00Z",
        end="2024-05-01T00:00:00Z", gap="+1MONTH", other=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2        # partial + final, once
