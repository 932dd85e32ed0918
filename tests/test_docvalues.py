"""Numeric doc-values updates: gen-stamped sidecar, newest-wins overlay,
fold-at-merge (IndexWriter.updateNumericDocValue role)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
from lucene_spark.index.docvalues import (
    doc_values, fold_doc_values, update_doc_values,
)


@pytest.fixture()
def dv_index(spark, corpus_pdf, tmp_path):
    d = str(tmp_path / "dvidx")
    cfg = IndexConfig(partitions=2, num_groups=1, num_buckets=4,
                      analyzer="code", carry_cols=("size_bytes",))
    src = spark.createDataFrame(corpus_pdf).withColumn(
        "size_bytes", F.length("content"))
    IndexBuilder(spark, cfg).build(src, d, overwrite=True)
    return d


def test_dv_base_from_carry_col(spark, dv_index):
    r = IndexReader(spark, dv_index)
    base = {x["doc_id"]: x["size_bytes"]
            for x in r.docstats().select("doc_id", "size_bytes").collect()}
    got = {x["doc_id"]: x["value"] for x in r.doc_values("size_bytes").collect()}
    assert got == {k: float(v) for k, v in base.items()}


def test_dv_update_overlay_newest_wins(spark, dv_index):
    r = IndexReader(spark, dv_index)
    ids = sorted(x["doc_id"] for x in r.docstats().select("doc_id").collect())
    a, b = ids[0], ids[1]
    g1 = update_doc_values(spark, dv_index, "size_bytes",
                           spark.createDataFrame([(a, 111.0), (b, 222.0)],
                                                 ["doc_id", "value"]))
    g2 = update_doc_values(spark, dv_index, "size_bytes",
                           spark.createDataFrame([(b, 999.0)],
                                                 ["doc_id", "value"]))
    assert g2 == g1 + 1
    got = {x["doc_id"]: x["value"] for x in r.doc_values("size_bytes").collect()}
    assert got[a] == 111.0          # gen-1 update wins over base
    assert got[b] == 999.0          # gen-2 wins over gen-1
    base = {x["doc_id"]: float(x["size_bytes"])
            for x in r.docstats().select("doc_id", "size_bytes").collect()}
    for d in ids[2:5]:
        assert got[d] == base[d]    # untouched docs keep the base value


def test_dv_field_without_base(spark, dv_index):
    """A field that exists ONLY as updates (pagerank-style signal attached
    after indexing): base is null, updated docs carry values."""
    r = IndexReader(spark, dv_index)
    ids = sorted(x["doc_id"] for x in r.docstats().select("doc_id").collect())
    update_doc_values(spark, dv_index, "pagerank",
                      spark.createDataFrame([(ids[0], 0.5)], ["doc_id", "value"]))
    got = {x["doc_id"]: x["value"] for x in r.doc_values("pagerank").collect()}
    assert got[ids[0]] == 0.5 and got[ids[1]] is None


def test_dv_fold(spark, dv_index):
    r = IndexReader(spark, dv_index)
    ids = sorted(x["doc_id"] for x in r.docstats().select("doc_id").collect())
    for i, v in enumerate([1.0, 2.0, 3.0]):
        update_doc_values(spark, dv_index, "size_bytes",
                          spark.createDataFrame([(ids[i], v), (ids[0], v * 10)],
                                                ["doc_id", "value"]))
    before = sorted((x["doc_id"], x["value"])
                    for x in r.doc_values("size_bytes").collect())
    folded = fold_doc_values(spark, dv_index, "size_bytes")
    assert folded == 3
    after = sorted((x["doc_id"], x["value"])
                   for x in doc_values(IndexReader(spark, dv_index),
                                       "size_bytes").collect())
    assert after == before          # fold is read-invisible
    assert fold_doc_values(spark, dv_index, "size_bytes") == 0  # idempotent


def test_dv_survives_compaction(spark, corpus_pdf, tmp_path):
    """doc_ids are stable across compaction (groups move verbatim), so the
    sidecar keeps applying — Lucene's dv-update gens surviving merges."""
    from lucene_spark.index import compact

    d = str(tmp_path / "dvc")
    cfg = IndexConfig(partitions=4, num_groups=4, num_buckets=4,
                      analyzer="code", carry_cols=("size_bytes",))
    src = spark.createDataFrame(corpus_pdf).withColumn(
        "size_bytes", F.length("content"))
    IndexBuilder(spark, cfg).build(src, d, overwrite=True)
    r = IndexReader(spark, d)
    ids = sorted(x["doc_id"] for x in r.docstats().select("doc_id").collect())
    update_doc_values(spark, d, "size_bytes",
                      spark.createDataFrame([(ids[0], 777.0)], ["doc_id", "value"]))
    before = sorted((x["doc_id"], x["value"])
                    for x in r.doc_values("size_bytes").collect())
    res = compact(spark, d, segs_per_tier=1)
    assert res["merged"]
    after = sorted((x["doc_id"], x["value"])
                   for x in IndexReader(spark, d).doc_values("size_bytes").collect())
    assert after == before


def test_dv_feature_rescore_integration(spark, dv_index):
    """doc_values feeds rescore_with_feature — the FeatureQuery whose
    signal arrives as post-hoc updates."""
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.features import rescore_with_feature

    r = IndexReader(spark, dv_index)
    s = IndexSearcher(r)
    hits = s.search("index", k=5)
    ids = [x["doc_id"] for x in hits.collect()]
    update_doc_values(spark, dv_index, "boost_sig",
                      spark.createDataFrame([(ids[0], 100.0)], ["doc_id", "value"]))
    dv = r.doc_values("boost_sig").withColumnRenamed("value", "boost_sig").fillna(0.0)
    out = rescore_with_feature(hits, dv, "boost_sig", fn="log", weight=1.0,
                               scaling=1.0).collect()
    base = {x["doc_id"]: x["score"] for x in hits.collect()}
    got = {x["doc_id"]: x["score"] for x in out}
    import math
    assert got[ids[0]] == pytest.approx(base[ids[0]] + math.log(1 + 100.0), rel=1e-5)
    for d in ids[1:]:
        assert got[d] == pytest.approx(base[d], rel=1e-6)


def test_dv_bad_inputs(spark, dv_index):
    with pytest.raises(ValueError, match="doc_id"):
        update_doc_values(spark, dv_index, "x",
                          spark.createDataFrame([(1.0,)], ["value"]))
    # ambiguous multi-column frame without an explicit `value` column
    with pytest.raises(ValueError, match="ambiguous"):
        update_doc_values(spark, dv_index, "x",
                          spark.createDataFrame([(1, 2.0, 3.0)],
                                                ["doc_id", "ts", "v"]))
    # but an explicit `value` column among extras is accepted
    g = update_doc_values(spark, dv_index, "explicit_ok",
                          spark.createDataFrame([(1, 2.0, 3.0)],
                                                ["doc_id", "ts", "value"]))
    assert g == 1


def test_dv_fold_ignores_leftover_tmp(spark, dv_index):
    """A crash-leftover _gen_folding.tmp (underscore-prefixed) must not
    break sidecar reads or a re-run of the fold."""
    import os

    from lucene_spark.index import IndexReader

    r = IndexReader(spark, dv_index)
    ids = sorted(x["doc_id"] for x in r.docstats().select("doc_id").collect())
    update_doc_values(spark, dv_index, "crashy",
                      spark.createDataFrame([(ids[0], 1.0)], ["doc_id", "value"]))
    update_doc_values(spark, dv_index, "crashy",
                      spark.createDataFrame([(ids[0], 2.0)], ["doc_id", "value"]))
    # simulate a crash mid-fold: stale tmp with junk parquet inside
    d = os.path.join(dv_index, "dv_updates", "field=crashy")
    spark.createDataFrame([(ids[0], 99.0)], ["doc_id", "value"]) \
        .coalesce(1).write.parquet(os.path.join(d, "_gen_folding.tmp"))
    got = {x["doc_id"]: x["value"]
           for x in r.doc_values("crashy").collect() if x["value"] is not None}
    assert got == {ids[0]: 2.0}          # reads ignore the _ dir
    assert fold_doc_values(spark, dv_index, "crashy") == 2   # fold self-heals
    got2 = {x["doc_id"]: x["value"]
            for x in IndexReader(spark, dv_index).doc_values("crashy").collect()
            if x["value"] is not None}
    assert got2 == {ids[0]: 2.0}


def test_function_score_replaces_score(searcher, reader):
    """FunctionScoreQuery (queries/function/FunctionScoreQuery.java:
    44-62): wrapped query's hit set unchanged, score replaced by the
    compiled expression over `score` and a doc-values column."""
    import math

    from lucene_spark.search.features import function_score

    base = {r["doc_id"]: r["score"] for r in searcher.matches("index").collect()}
    got = {r["doc_id"]: r["score"] for r in
           function_score(searcher, "index", "score * ln(1 + doclen)",
                          columns=("doclen",)).collect()}
    assert set(got) == set(base)
    dl = {r["doc_id"]: r["doclen"] for r in
          reader.docstats().select("doc_id", "doclen").collect()}
    for d, s in base.items():
        assert abs(got[d] - s * math.log(1 + dl[d])) < 1e-3, d


def test_distance_feature_scores(searcher, reader):
    """LongDistanceFeatureQuery (LongDistanceFeatureQuery.java:117):
    score = boost · pivot / (pivot + |value − origin|); matches every
    doc carrying the column."""
    from lucene_spark.search.features import distance_feature

    got = {r["doc_id"]: r["score"] for r in
           distance_feature(searcher, "doclen", origin=200.0, pivot=50.0,
                            boost=2.0).collect()}
    dl = {r["doc_id"]: r["doclen"] for r in
          reader.docstats().select("doc_id", "doclen").collect()}
    assert set(got) == set(dl)
    for d, v in dl.items():
        assert abs(got[d] - 2.0 * 50.0 / (50.0 + abs(v - 200.0))) < 1e-5, d


def test_distance_feature_pivot_contract(searcher):
    from lucene_spark.search.features import distance_feature

    import pytest as _pt
    with _pt.raises(ValueError, match="pivotDistance"):
        distance_feature(searcher, "doclen", origin=0.0, pivot=0.0)


def test_distance_feature_geo(spark, tmp_path):
    """LatLonPointDistanceFeatureQuery (LatLonPointDistanceFeatureQuery
    .java:130-131): haversine-distance decay from the origin point."""
    import math

    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.features import distance_feature_geo

    rows = [(i, f"doc body {i}", -60.0 + 7.0 * i, -150.0 + 31.0 * i)
            for i in range(10)]
    df = spark.createDataFrame(rows, "ext_id long, body string, lat double, lon double")
    idx = str(tmp_path) + "/idx"
    cfg = IndexConfig(key_cols=("ext_id",), content_col="body",
                      partitions=1, num_groups=1, num_buckets=2,
                      termdict_partitions=1, carry_cols=("lat", "lon"))
    IndexBuilder(spark, cfg).build(df, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    got = {r["doc_id"]: r["score"] for r in
           distance_feature_geo(s, "lat", "lon", origin_lat=10.0,
                                origin_lon=20.0, pivot_m=1e6).collect()}
    assert len(got) == 10

    def hav(lat1, lon1, lat2, lon2):
        r = 6371008.7714
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = p2 - p1, math.radians(lon2 - lon1)
        a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * r * math.asin(math.sqrt(a))

    ds = {r["doc_id"]: (r["lat"], r["lon"]) for r in
          s.reader.docstats().select("doc_id", "lat", "lon").collect()}
    for d, (la, lo) in ds.items():
        want = 1e6 / (1e6 + hav(la, lo, 10.0, 20.0))
        assert abs(got[d] - want) / want < 1e-4, d


def test_function_range_matches_and_scores_by_value(searcher, reader):
    """FunctionRangeQuery (queries/function/FunctionRangeQuery.java:35-60):
    match set = range over the expression value; score = the value."""
    import math

    from lucene_spark.search.features import function_range

    got = {r["doc_id"]: r["score"] for r in
           function_range(searcher, "ln(1 + doclen)", lower=5.0, upper=5.8,
                          columns=("doclen",)).collect()}
    dl = {r["doc_id"]: r["doclen"] for r in
          reader.docstats().select("doc_id", "doclen").collect()}
    exp = {d: math.log(1 + v) for d, v in dl.items()
           if 5.0 <= math.log(1 + v) <= 5.8}
    assert set(got) == set(exp) and got
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-4
