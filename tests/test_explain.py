"""Explanation trees re-derive exact hit scores (CheckHits.checkExplanations
contract, test-framework/.../CheckHits.java:278-303) + MoreLikeThis."""

from __future__ import annotations

import numpy as np
import pytest

QUERIES = [
    "index",
    "index AND writer",
    "index OR writer OR merge",
    "index AND NOT cache",
    "writer^2 OR reader",
    "+query +term",
    "licensed apache version",
]


def test_explain_matches_scores(searcher):
    for q in QUERIES:
        hits = searcher.search(q, k=5).collect()
        assert hits, q
        for h in hits:
            exp = searcher.explain(q, h["doc_id"])
            assert exp["match"], (q, h)
            assert np.float32(exp["value"]) == np.float32(h["score"]), (q, h, exp["value"])


def test_explain_non_match(searcher, reader):
    all_ids = [r["doc_id"] for r in reader.docstats().select("doc_id").collect()]
    hit_ids = {r["doc_id"] for r in searcher.matches("uid42sing").collect()}
    miss = next(d for d in all_ids if d not in hit_ids)
    exp = searcher.explain("uid42sing", miss)
    assert not exp["match"] and exp["value"] == 0.0


def test_explain_phrase(spark, corpus_pdf, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    d = str(tmp_path_factory.mktemp("exp") / "idx")
    cfg = IndexConfig(partitions=2, num_buckets=4, analyzer="code", index_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(corpus_pdf), d, overwrite=True)
    s = IndexSearcher(IndexReader(spark, d))
    q = '"licensed under the apache"'
    hits = s.search(q, k=3).collect()
    assert hits
    for h in hits:
        exp = s.explain(q, h["doc_id"])
        assert np.float32(exp["value"]) == np.float32(h["score"])


def test_more_like_this(searcher, corpus_pdf):
    text = corpus_pdf.iloc[5]["content"]
    out = searcher.more_like_this(text, k=5)
    rows = out.collect()
    assert len(rows) == 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_explain_sloppy_phrase(spark, corpus_pdf, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    d = str(tmp_path_factory.mktemp("expslop") / "idx")
    cfg = IndexConfig(partitions=2, num_buckets=4, analyzer="code", index_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(corpus_pdf), d, overwrite=True)
    s = IndexSearcher(IndexReader(spark, d))
    q = '"under licensed"~2'
    hits = s.search(q, k=3).collect()
    assert hits
    for h in hits:
        exp = s.explain(q, h["doc_id"])
        assert np.float32(exp["value"]) == np.float32(h["score"])


def test_explain_interval_and_multiphrase(spark, tmp_path_factory):
    import numpy as np

    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher, plan as P

    idx = str(tmp_path_factory.mktemp("exiv")) + "/idx"
    src = spark.createDataFrame(make_corpus(60, seed=13))
    cfg = IndexConfig(partitions=1, num_buckets=2, index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))

    node = P.IntervalNode(terms=("index", "writer"), max_gaps=4)
    hits = s.matches(node).collect()
    assert hits
    ex = s.explain(node, int(hits[0]["doc_id"]))
    assert ex["match"] and np.float32(ex["value"]) == np.float32(hits[0]["score"])

    mp = P.MultiPhraseNode(positions=(("index", "merge"), ("writer",)))
    mh = s.matches(mp).collect()
    if mh:
        ex2 = s.explain(mp, int(mh[0]["doc_id"]))
        assert ex2["match"] and np.float32(ex2["value"]) == np.float32(mh[0]["score"])
    # non-match explains as 0
    miss = s.explain(node, 999999)
    assert not miss["match"] and miss["value"] == 0.0


def test_explain_dfr_ib_matrix_components(spark, corpus_pdf, tmp_path_factory):
    """CheckHits contract for matrix similarities + the component
    sub-explanations DFRSimilarity.explain/IBSimilarity.explain expose
    (DFRSimilarity.java:115-131, IBSimilarity.java:108-124)."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.similarity import DFRSimilarity, IBSimilarity

    d = str(tmp_path_factory.mktemp("explain_matrix") / "idx")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    src = spark.createDataFrame(corpus_pdf)
    IndexBuilder(spark, IndexConfig(partitions=2, num_buckets=8)).build(
        src, d, overwrite=True)
    reader = IndexReader(spark, d)
    for sim in (DFRSimilarity(basic_model="ine", after_effect="b",
                              normalization="h1"),
                DFRSimilarity(basic_model="g", after_effect="b",
                              normalization="z"),
                IBSimilarity(distribution="spl", lam="ttf",
                             normalization="h3")):
        s = IndexSearcher(reader, similarity=sim)
        hits = s.search("index OR writer", k=3).collect()
        assert hits
        for h in hits:
            exp = s.explain("index OR writer", h["doc_id"])
            assert np.float32(exp["value"]) == np.float32(h["score"]), (sim, h)
        leaf = s.explain("index", hits[0]["doc_id"] if hits else 0)
        # find a matching term leaf and check the component details
        def leaves(e):
            if e.get("description", "").startswith("score(term="):
                yield e
            for c in e.get("details", []):
                if isinstance(c, dict):
                    yield from leaves(c)
        term_leaves = [l for l in leaves(leaf) if l.get("match")]
        if term_leaves:
            descs = " ".join(str(dd["description"])
                             for dd in term_leaves[0]["details"])
            assert "tfn" in descs, descs


def test_explain_axiomatic_components(spark, corpus_pdf, tmp_path_factory):
    """CheckHits contract + the five-function breakdown
    Axiomatic.explain exposes (Axiomatic.java:109-131) for every family
    shape (F1=ln, F2=tfln, F3=gamma)."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.similarity import AxiomaticSimilarity

    d = str(tmp_path_factory.mktemp("explain_ax") / "idx")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    src = spark.createDataFrame(corpus_pdf)
    IndexBuilder(spark, IndexConfig(partitions=2, num_buckets=8)).build(
        src, d, overwrite=True)
    reader = IndexReader(spark, d)
    for variant in ("F1EXP", "F2LOG", "F3LOG"):
        s = IndexSearcher(reader, similarity=AxiomaticSimilarity(variant))
        hits = s.search("index OR writer", k=3).collect()
        assert hits, variant
        for h in hits:
            exp = s.explain("index OR writer", h["doc_id"])
            assert np.float32(exp["value"]) == np.float32(h["score"]), \
                (variant, h)

        def leaves(e):
            if e.get("description", "").startswith("score(term="):
                yield e
            for c in e.get("details", []):
                if isinstance(c, dict):
                    yield from leaves(c)

        # explain the top hit of a search for the SAME single term, so
        # the explained doc is guaranteed to contain it
        term_hits = s.search("index", k=1).collect()
        assert term_hits, variant
        leaf = s.explain("index", term_hits[0]["doc_id"])
        tl = [l for l in leaves(leaf) if l.get("match")]
        assert tl, variant
        descs = " ".join(str(dd["description"]) for dd in tl[0]["details"])
        # the generic leaf always has a "tf, term frequency" detail —
        # assert on the Axiomatic-specific wording so this test actually
        # exercises explain_components
        for comp in ("term-frequency function", "length-normalization",
                     "mixed tf/length", "idf,", "gamma,"):
            assert comp in descs, (variant, descs)
