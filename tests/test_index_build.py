import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader, check_index
from lucene_spark.oracle import OracleIndex


def test_manifest(reader):
    m = reader.manifest
    assert m["status"] == "done"
    assert m["doc_count"] == 400
    assert len(m["groups"]) == 2
    for g in m["groups"]:
        assert g["status"] == "done"
        assert g["docs"] > 0 and g["postings"] > 0


def test_check_index(spark, reader, corpus_pdf):
    src = spark.createDataFrame(corpus_pdf)
    out = check_index(reader, source=src, content_col="content")
    assert out["docs"] == 400
    assert out["sha256_ok"]


def test_stats_match_oracle(reader, oracle):
    # df/cf parity for a sample of hot, mid and singleton terms
    td = {r["term"]: (r["df"], r["cf"]) for r in reader.termdict().collect()}
    assert set(td) == set(oracle.postings)
    for t in ["license", "index", "writer", "uid42sing", "apache"]:
        assert td[t] == (oracle.df(t), oracle.cf(t)), t
    assert reader.doc_count == oracle.doc_count
    assert reader.sum_doclen == sum(oracle.doclen.values())


def test_hot_and_singleton_terms_exist(reader):
    # FIXTURES.md skew requirements (generator sanity)
    td = reader.termdict()
    n = reader.doc_count
    hot = td.filter(F.col("df") > 0.2 * n).count()
    single = td.filter(F.col("df") == 1).count()
    total = td.count()
    assert hot >= 5
    assert single / total >= 0.30


def test_deterministic_rebuild(spark, corpus_pdf, tmp_path):
    """Two independent builds produce identical doc_id assignment and
    identical termdict (SURVEY.md §5.2 item 4)."""
    cfg = IndexConfig(partitions=4, num_groups=2, num_buckets=8)
    src = spark.createDataFrame(corpus_pdf)
    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    IndexBuilder(spark, cfg).build(src, d1, overwrite=True)
    IndexBuilder(spark, cfg).build(src, d2, overwrite=True)
    r1, r2 = IndexReader(spark, d1), IndexReader(spark, d2)
    a = r1.docstats().select("repo", "path", "commit", "doc_id").toPandas().sort_values("doc_id")
    b = r2.docstats().select("repo", "path", "commit", "doc_id").toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    ta = r1.termdict().toPandas().sort_values("term").reset_index(drop=True)
    tb = r2.termdict().toPandas().sort_values("term").reset_index(drop=True)
    assert ta.equals(tb)


def test_resume_skips_done_groups(spark, corpus_pdf, tmp_path):
    """Kill-after-k-groups resume (SURVEY.md §5.2 item 5): a second build
    over the same snapshot reuses finished group manifests."""
    import json
    import os

    cfg = IndexConfig(partitions=2, num_groups=3, num_buckets=4)
    src = spark.createDataFrame(corpus_pdf)
    d = str(tmp_path / "idx")
    b = IndexBuilder(spark, cfg)
    m1 = b.build(src, d, overwrite=True)
    secs1 = [g["seconds"] for g in m1["groups"]]
    # simulate a partial failure: delete one group manifest → only that
    # group rebuilds
    os.remove(os.path.join(d, "parts", "group-00001.json"))
    m2 = b.build(src, d)
    assert m2["doc_count"] == m1["doc_count"]
    # groups 0 and 2 were NOT rebuilt (same manifest contents reused)
    assert m2["groups"][0]["seconds"] == secs1[0]
    assert m2["groups"][2]["seconds"] == secs1[2]
    r = IndexReader(spark, d)
    assert r.doc_count == 400
    check_index(r)


def test_hot_term_slicing(spark, corpus_pdf, tmp_path):
    """max_postings_per_slice splits hot-term rows into ordered slices and
    queries still see the full list (salting/skew guard)."""
    cfg = IndexConfig(partitions=2, num_groups=1, num_buckets=4, max_postings_per_slice=32)
    src = spark.createDataFrame(corpus_pdf)
    d = str(tmp_path / "sliced")
    IndexBuilder(spark, cfg).build(src, d, overwrite=True)
    r = IndexReader(spark, d)
    post = r.postings()
    sliced = post.filter(F.col("slice") > 0).count()
    assert sliced > 0  # hot terms did split
    # df is preserved across slices
    td = {row["term"]: row["df"] for row in r.termdict().filter(F.col("term") == "license").collect()}
    full = IndexReader(spark, d)
    assert td["license"] > 0.2 * 400
    check_index(r)


def test_i18n_analyzer_end_to_end(spark, tmp_path):
    """A non-English default chain (Russian = Snowball stemmer, the
    reference's ru/RussianAnalyzer.java parity chain) runs through the
    FULL build + search path: the analyzer is resolved by NAME inside
    executor pandas UDFs, so this guards the registry round-trip and the
    query-side/index-side stemming symmetry for the i18n analyzers."""
    rows = [
        (1, "новые книги и журналы лежат на столе"),
        (2, "старая книга читателя"),
        (3, "совсем другой текст про дома"),
    ]
    src = spark.createDataFrame(rows, "doc_key int, text string")
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    cfg = IndexConfig(partitions=2, num_groups=1, num_buckets=4,
                      analyzer="russian", key_cols=("doc_key",),
                      content_col="text")
    idx = str(tmp_path / "ru_idx")
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    # 'книгами' (instrumental plural) must stem to the same term as
    # 'книги'/'книга' and match docs 1 and 2; the stopwords и/на/про drop
    hits = {r.doc_id for r in s.search("книгами", k=10).collect()}
    assert len(hits) == 2
    assert not s.search("и", k=10).collect()      # stopword never indexed


def test_analyzer_chain_drift_warns(spark, tmp_path):
    """Manifest records per-chain fingerprints; a registry change for the
    same analyzer NAME must surface as a warning at open time (silent
    index/query stemming asymmetry otherwise)."""
    import json
    import warnings

    src = spark.createDataFrame([(1, "hello world")],
                                "doc_key int, text string")
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader

    cfg = IndexConfig(partitions=1, num_groups=1, num_buckets=2,
                      key_cols=("doc_key",), content_col="text")
    idx = str(tmp_path / "drift_idx")
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)

    mpath = idx + "/manifest.json"
    with open(mpath) as fh:
        m = json.load(fh)
    assert m["analyzer_chains"], "fingerprints must be recorded"
    # simulate a registry drift: stored fingerprint no longer matches
    m["analyzer_chains"] = {k: "0" * 16 for k in m["analyzer_chains"]}
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        IndexReader(spark, idx)
    assert any("chain has since changed" in str(w.message) for w in caught)
