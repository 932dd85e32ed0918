"""ord()/rord() function queries (OrdFieldSource/ReverseOrdFieldSource):
0-based ordinals over the distinct value list, missing -1 / valueCount."""

from __future__ import annotations

import pytest

from lucene_spark.relational.functions import with_ord


@pytest.fixture(scope="module")
def fruit_df(spark):
    rows = [(0, "pear"), (1, "apple"), (2, "banana"), (3, "apple"),
            (4, None), (5, "banana")]
    return spark.createDataFrame(rows, "id long, v string")


def test_ord_values(fruit_df):
    out = {r["id"]: r["ord"] for r in with_ord(fruit_df, "v").collect()}
    # apple=0, banana=1, pear=2 (raw SortedDocValues ordinal, 0-based)
    assert out == {0: 2, 1: 0, 2: 1, 3: 0, 4: -1, 5: 1}


def test_rord_values(fruit_df):
    out = {r["id"]: r["rord"] for r in
           with_ord(fruit_df, "v", out="rord", reverse=True).collect()}
    # end=3; rord = end - ord - 1; missing = end
    assert out == {0: 0, 1: 2, 2: 1, 3: 2, 4: 3, 5: 1}


def test_binary_collation_order(spark):
    # BytesRef order: uppercase sorts before lowercase ('Z' < 'a')
    df = spark.createDataFrame([(0, "a"), (1, "Z")], "id long, v string")
    out = {r["id"]: r["ord"] for r in with_ord(df, "v").collect()}
    assert out == {0: 1, 1: 0}


def test_ord_rord_sum_invariant(fruit_df):
    a = with_ord(fruit_df, "v")
    b = with_ord(fruit_df, "v", out="rord", reverse=True)
    j = {r["id"]: r for r in a.join(b.select("id", "rord"), "id").collect()}
    for r in j.values():
        if r["ord"] >= 0:
            assert r["ord"] + r["rord"] == 2  # valueCount - 1


def test_combined_ord_rord_single_pass(fruit_df):
    out = {r["id"]: (r["ord"], r["rord"]) for r in
           with_ord(fruit_df, "v", rord_out="rord").collect()}
    assert out == {0: (2, 0), 1: (0, 2), 2: (1, 1), 3: (0, 2),
                   4: (-1, 3), 5: (1, 1)}
