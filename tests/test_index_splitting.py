"""Index splitting (PKIndexSplitter role): each side must behave exactly
like a fresh index built from only its documents — BM25 scores included
(df/cf/doc_count/sum_doclen all recomputed for the half)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import (IndexBuilder, IndexConfig, IndexReader,
                                check_index, split_index)
from lucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def split_setup(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus

    base = tmp_path_factory.mktemp("split")
    src_dir = str(base / "src")
    pdf = make_corpus(200, seed=11)
    cfg = IndexConfig(partitions=2, num_groups=2, num_buckets=4,
                      index_positions=True)
    src = spark.createDataFrame(pdf)
    IndexBuilder(spark, cfg).build(src, src_dir, overwrite=True)
    r = IndexReader(spark, src_dir)

    # "query": every doc whose path hash is even (a PK-style predicate)
    matches = (r.docstats()
               .filter(F.abs(F.xxhash64("path")) % 2 == 0)
               .select("doc_id"))
    d1, d2 = str(base / "even"), str(base / "odd")
    res = split_index(spark, src_dir, d1, d2, matches)
    return spark, pdf, cfg, r, matches, d1, d2, res


def test_doc_counts_partition(split_setup):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    assert res["docs1"] + res["docs2"] == r.doc_count == 200
    assert res["docs1"] == matches.count()
    assert IndexReader(spark, d1).doc_count == res["docs1"]
    assert IndexReader(spark, d2).doc_count == res["docs2"]


def test_sides_pass_checkindex_against_their_subsets(split_setup):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    keys = {(row["repo"], row["path"], row["commit"])
            for row in r.docstats().join(matches, "doc_id")
            .select("repo", "path", "commit").collect()}
    sdf = spark.createDataFrame(pdf)
    side1_src = sdf.join(
        spark.createDataFrame(sorted(keys), "repo string, path string, commit string"),
        ["repo", "path", "commit"], "left_semi")
    side2_src = sdf.join(
        spark.createDataFrame(sorted(keys), "repo string, path string, commit string"),
        ["repo", "path", "commit"], "left_anti")
    c1 = check_index(IndexReader(spark, d1), source=side1_src)
    c2 = check_index(IndexReader(spark, d2), source=side2_src)
    assert c1["sha256_ok"] and c2["sha256_ok"]
    assert c1["docs"] + c2["docs"] == 200


def test_bm25_matches_fresh_filtered_build(split_setup, tmp_path_factory):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    s1 = IndexSearcher(IndexReader(spark, d1))
    # fresh build over EXACTLY side1's documents
    keys = spark.createDataFrame(
        sorted({(row["repo"], row["path"], row["commit"]) for row in
                r.docstats().join(matches, "doc_id")
                .select("repo", "path", "commit").collect()}),
        "repo string, path string, commit string")
    twin_dir = str(tmp_path_factory.mktemp("split_twin") / "idx")
    twin_src = spark.createDataFrame(pdf).join(
        keys, ["repo", "path", "commit"], "left_semi")
    IndexBuilder(spark, cfg).build(twin_src, twin_dir, overwrite=True)
    s2 = IndexSearcher(IndexReader(spark, twin_dir))

    for q in ["merge", "index AND writer", "merge OR scan"]:
        a = {(row["repo"], row["path"]): round(row["score"], 5)
             for row in s1.hydrate(s1.matches(q)).collect()}
        b = {(row["repo"], row["path"]): round(row["score"], 5)
             for row in s2.hydrate(s2.matches(q)).collect()}
        assert a == b, q


def test_refuses_overwrite_and_self(split_setup):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    with pytest.raises(FileExistsError):
        split_index(spark, os.path.dirname(d1) + "/src", d1, d2, matches)
    with pytest.raises(ValueError):
        split_index(spark, d1, d1, d2 + "_x", matches, overwrite=True)


def test_multipass_round_robin(split_setup, tmp_path_factory):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    from lucene_spark.index.split import _doc_ordinals, split_index_multi

    base = tmp_path_factory.mktemp("multi")
    outs = [str(base / f"p{i}") for i in range(3)]
    src_dir = r.index_dir
    mres = split_index_multi(spark, src_dir, outs)
    # 200 docs / 3 parts round-robin: ordinals 0,3,.. / 1,4,.. / 2,5,..
    assert mres["docs"] == [67, 67, 66]
    # parts are disjoint and cover everything
    all_ids = set()
    for o in outs:
        ids = {row["doc_id"] for row in
               IndexReader(spark, o).docstats().select("doc_id").collect()}
        assert not (all_ids & ids)
        all_ids |= ids
    assert len(all_ids) == 200
    # round-robin follows doc_id order exactly
    ords = {row["doc_id"]: row["ord"] for row in
            _doc_ordinals(r.docstats().select("doc_id")).collect()}
    p0 = {row["doc_id"] for row in
          IndexReader(spark, outs[0]).docstats().select("doc_id").collect()}
    assert p0 == {d for d, o in ords.items() if o % 3 == 0}


def test_multipass_seq(split_setup, tmp_path_factory):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    from lucene_spark.index.split import _doc_ordinals, split_index_multi

    base = tmp_path_factory.mktemp("multiseq")
    outs = [str(base / f"p{i}") for i in range(3)]
    mres = split_index_multi(spark, r.index_dir, outs, seq=True)
    # partLen = 200//3 = 66; last part collects the remainder
    assert mres["docs"] == [66, 66, 68]
    ords = {row["doc_id"]: row["ord"] for row in
            _doc_ordinals(r.docstats().select("doc_id")).collect()}
    p0 = {row["doc_id"] for row in
          IndexReader(spark, outs[0]).docstats().select("doc_id").collect()}
    assert p0 == {d for d, o in ords.items() if o < 66}


def test_ordinals_are_dense_and_ordered(split_setup):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    from lucene_spark.index.split import _doc_ordinals

    rows = _doc_ordinals(r.docstats().select("doc_id")).collect()
    by_ord = sorted(rows, key=lambda x: x["ord"])
    assert [x["ord"] for x in by_ord] == list(range(200))
    assert [x["doc_id"] for x in by_ord] == sorted(x["doc_id"] for x in rows)


def test_overwrite_clears_stale_target(split_setup, tmp_path_factory):
    """Review regression: a prior index in the target must be CLEARED,
    not merged — stale raw groups would otherwise survive into the
    derived rebuild and inflate the 'split' result."""
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    base = tmp_path_factory.mktemp("stale")
    t1, t2 = str(base / "t1"), str(base / "t2")
    # plant a full unrelated 2-group index at t1
    from lucene_spark.corpus import make_corpus
    IndexBuilder(spark, IndexConfig(partitions=2, num_groups=2,
                                    num_buckets=4)).build(
        spark.createDataFrame(make_corpus(40, seed=99)), t1, overwrite=True)
    out = split_index(spark, r.index_dir, t1, t2, matches, overwrite=True)
    assert out["docs1"] == matches.count()
    assert IndexReader(spark, t1).doc_count == out["docs1"]


def test_duplicate_targets_rejected(split_setup, tmp_path_factory):
    spark, pdf, cfg, r, matches, d1, d2, res = split_setup
    base = tmp_path_factory.mktemp("dup")
    with pytest.raises(ValueError):
        split_index(spark, r.index_dir, str(base / "x"), str(base / "x"),
                    matches)
