"""Bloom term-existence sidecar (BloomFilteringPostingsFormat role):
no false negatives, tight false-positive rate, zero-job fast-fail in
term_stats, search results unchanged."""

from __future__ import annotations

import pytest

from lucene_spark.index.bloom import build_term_bloom, load_term_bloom


@pytest.fixture(scope="module")
def bloom(reader):
    meta = build_term_bloom(reader)
    b = load_term_bloom(reader)
    assert b is not None
    return reader, meta, b


def test_no_false_negatives(bloom):
    reader, meta, b = bloom
    fld = reader.default_field
    terms = [r["term"] for r in reader.termdict()
             .filter("field = '%s'" % fld).select("term").collect()]
    assert terms
    missing = [t for t in terms if not b.might_contain(fld, t)]
    assert missing == []


def test_false_positive_rate_bounded(bloom):
    reader, meta, b = bloom
    fld = reader.default_field
    probes = [f"zz_absent_term_{i}_qx" for i in range(2000)]
    fp = sum(b.might_contain(fld, t) for t in probes)
    # 16 bits/term → fp ≈ 0.618^16 ≈ 5e-4; allow a generous 1%
    assert fp / len(probes) < 0.01


def test_term_stats_fast_fail_and_parity(spark, index_dir, bloom):
    from lucene_spark.index import IndexReader

    # fresh reader: stats WITHOUT bloom
    r1 = IndexReader(spark, index_dir)
    plain = r1.term_stats(["merge", "zz_definitely_absent_zz"])
    # fresh reader WITH bloom
    r2 = IndexReader(spark, index_dir)
    assert r2.use_term_bloom()
    fld = r2.default_field
    assert not r2._term_bloom.might_contain(fld, "zz_definitely_absent_zz")
    withb = r2.term_stats(["merge", "zz_definitely_absent_zz"])
    assert withb == plain
    # the absent term was answered from the bloom: cached as a miss
    assert r2._stats_cache[(fld, "zz_definitely_absent_zz")] is None


def test_search_results_unchanged(spark, index_dir, searcher, bloom):
    from lucene_spark.index import IndexReader
    from lucene_spark.search import IndexSearcher

    r = IndexReader(spark, index_dir)
    r.use_term_bloom()
    s = IndexSearcher(r)
    for q in ["merge", "merge OR zz_absent_qqq", "index AND writer"]:
        assert s.search(q, k=10).collect() == \
            searcher.search(q, k=10).collect()


def test_unbuilt_sidecar_returns_none(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader

    d = str(tmp_path_factory.mktemp("nobloom") / "idx")
    IndexBuilder(spark, IndexConfig(partitions=1, num_groups=1,
                                    num_buckets=4)).build(
        spark.createDataFrame(make_corpus(30, seed=2)), d, overwrite=True)
    r = IndexReader(spark, d)
    assert load_term_bloom(r) is None
    assert r.use_term_bloom() is False
    # and stats still work with no sidecar
    assert isinstance(r.term_stats(["merge"]), dict)
