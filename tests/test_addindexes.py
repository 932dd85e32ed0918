"""addIndexes (IndexWriter.addIndexes(Directory...) role): merging two
independently-built indexes must behave exactly like one fresh build
over the union corpus — BM25 scores, sha invariants, stats."""

from __future__ import annotations

import pytest

from lucene_spark.index import (IndexBuilder, IndexConfig, IndexReader,
                                check_index)
from lucene_spark.index.addindexes import add_indexes
from lucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus

    base = tmp_path_factory.mktemp("addidx")
    pdf = make_corpus(200, seed=23)
    a_pdf, b_pdf = pdf.iloc[:120], pdf.iloc[120:]
    cfg = IndexConfig(partitions=2, num_groups=2, num_buckets=4,
                      index_positions=True)
    da, db, dall = str(base / "a"), str(base / "b"), str(base / "all")
    IndexBuilder(spark, cfg).build(spark.createDataFrame(a_pdf), da,
                                   overwrite=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(b_pdf), db,
                                   overwrite=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(pdf), dall,
                                   overwrite=True)
    res = add_indexes(spark, da, [db])
    return spark, pdf, da, db, dall, res


def test_doc_count_and_groups(merged):
    spark, pdf, da, db, dall, res = merged
    assert res["doc_count"] == 200
    assert len(res["added_groups"]) == 1
    assert IndexReader(spark, da).doc_count == 200
    # source untouched
    assert IndexReader(spark, db).doc_count == 80


def test_checkindex_against_union_source(merged):
    spark, pdf, da, db, dall, res = merged
    out = check_index(IndexReader(spark, da),
                      source=spark.createDataFrame(pdf))
    assert out["sha256_ok"] and out["docs"] == 200


def test_bm25_matches_fresh_union_build(merged):
    spark, pdf, da, db, dall, res = merged
    s1 = IndexSearcher(IndexReader(spark, da))
    s2 = IndexSearcher(IndexReader(spark, dall))
    for q in ["merge", "index AND writer", "merge OR scan",
              '"licensed under"']:
        a = {(r["repo"], r["path"]): round(r["score"], 5)
             for r in s1.hydrate(s1.matches(q)).collect()}
        b = {(r["repo"], r["path"]): round(r["score"], 5)
             for r in s2.hydrate(s2.matches(q)).collect()}
        assert a == b, q


def test_remapped_ids_disjoint(merged):
    spark, pdf, da, db, dall, res = merged
    r = IndexReader(spark, da)
    ids = [row["doc_id"] for row in r.docstats().select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == 200


def test_incompatible_analyzer_rejected(merged, tmp_path_factory):
    spark, pdf, da, db, dall, res = merged
    from lucene_spark.corpus import make_corpus

    other = str(tmp_path_factory.mktemp("addidx_bad") / "idx")
    cfg = IndexConfig(partitions=1, num_groups=1, num_buckets=4,
                      analyzer="whitespace", index_positions=True)
    IndexBuilder(spark, cfg).build(
        spark.createDataFrame(make_corpus(20, seed=5)), other,
        overwrite=True)
    with pytest.raises(ValueError):
        add_indexes(spark, da, [other])
    with pytest.raises(ValueError):
        add_indexes(spark, da, [da])
