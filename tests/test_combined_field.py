"""CombinedFieldQuery (BM25F) — sandbox/search/CombinedFieldQuery.java.

Brute-force parity mirrors TestCombinedFieldQuery's checkHits strategy:
recompute the pseudo-stats + weighted freq/doclen model in plain
python/numpy (float32, Lucene order of operations) and compare scores.
"""

from __future__ import annotations

import math
import shutil

import numpy as np
import pandas as pd
import pytest

from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
from lucene_spark.index.builder import FieldSpec
from lucene_spark.search import IndexSearcher

K1, B = np.float32(1.2), np.float32(0.75)


DOCS = pd.DataFrame({
    "id": range(10),
    "title": ["apache lucene search", "spark engine", "lucene index",
              "other title", "apache apache", "search engine lucene",
              "", "title only", "lucene apache lucene", "index merge"],
    "body": ["the lucene index is fast", "spark is a cluster engine",
             "a b c d e", "lucene lucene lucene body", "nothing here",
             "search the index", "apache body text", "plain body",
             "merge policy tier", "apache lucene project text"],
})


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cfq") / "idx")
    cfg = IndexConfig(
        key_cols=("id",), content_col="title", partitions=2, num_buckets=4,
        fields=(FieldSpec(name="title", analyzer="whitespace"),
                FieldSpec(name="body", analyzer="whitespace")))
    IndexBuilder(spark, cfg).build(spark.createDataFrame(DOCS), d,
                                   overwrite=True)
    return d


def _brute_bm25f(terms, weights):
    """Float32 BM25F over DOCS per CombinedFieldQuery.java:286-334 with the
    exact-doclen deviation documented in lucene_spark/search/combined.py."""
    toks = {f: [t.split() for t in DOCS[f]] for f in weights}
    df_p = max(sum(1 for tt in toks[f] if t in tt)
               for f in weights for t in terms)
    doc_count = max(sum(1 for tt in toks[f] if tt) for f in weights)
    sum_ttf = sum(weights[f] * sum(len(tt) for tt in toks[f]) for f in weights)
    avgdl = np.float32(sum_ttf / doc_count)
    idf = np.float32(math.log(1.0 + (doc_count - df_p + 0.5) / (df_p + 0.5)))
    out = {}
    for i in range(len(DOCS)):
        fr = sum(weights[f] * toks[f][i].count(t)
                 for f in weights for t in terms)
        if fr <= 0:
            continue
        dl = np.float32(sum(weights[f] * len(toks[f][i]) for f in weights))
        ni = np.float32(1.0) / (K1 * ((np.float32(1.0) - B) + B * dl / avgdl))
        out[i] = float(idf - idf / (np.float32(1.0) + np.float32(fr) * ni))
    return out


def _by_ext(reader, rows):
    ds = {r["doc_id"]: r["id"] for r in
          reader.docstats().select("doc_id", "id").collect()}
    return {ds[r["doc_id"]]: r["score"] for r in rows}


def test_field_lens_sidecar(spark, mf_index):
    """Per-field norms column: cfg-field-order lengths, Σ == doclen."""
    r = IndexReader(spark, mf_index)
    rows = r.docstats().select("id", "doclen", "field_lens").collect()
    assert len(rows) == len(DOCS)
    for row in rows:
        title_len = len(DOCS["title"][row["id"]].split())
        body_len = len(DOCS["body"][row["id"]].split())
        assert list(row["field_lens"]) == [title_len, body_len]
        assert row["doclen"] == title_len + body_len


def test_combined_field_vs_bruteforce(spark, mf_index):
    r = IndexReader(spark, mf_index)
    s = IndexSearcher(r)
    for terms, weights in [
        (["lucene"], {"title": 1.0, "body": 1.0}),
        (["lucene", "apache"], {"title": 2.0, "body": 1.0}),
        (["index"], {"body": 3.0}),               # single field of a multi-field index
        (["engine", "merge", "zzz_absent"], {"title": 1.0, "body": 1.5}),
    ]:
        got = _by_ext(r, s.combined_field(terms, weights).collect())
        exp = _brute_bm25f(terms, weights)
        assert set(got) == set(exp), (terms, weights)
        for i in exp:
            assert abs(got[i] - exp[i]) < 1e-5, (terms, weights, i)


def test_combined_field_edge_semantics(spark, mf_index):
    r = IndexReader(spark, mf_index)
    s = IndexSearcher(r)
    # absent term everywhere -> no scorer -> empty (CombinedFieldWeight
    # builds no simWeight when total docFreq == 0)
    assert s.combined_field(["zzz_absent"], {"title": 1.0}).count() == 0
    with pytest.raises(ValueError):
        s.combined_field(["lucene"], {"title": 0.5})   # weight < 1
    with pytest.raises(ValueError):
        s.combined_field(["lucene"], {"nope": 1.0})    # unknown field
    # deletes are respected
    ds = {row["id"]: row["doc_id"] for row in
          r.docstats().select("doc_id", "id").collect()}
    s_del = s.with_deletes([ds[0], ds[3]])
    got = _by_ext(r, s_del.combined_field(
        ["lucene"], {"title": 1.0, "body": 1.0}).collect())
    exp = {i: v for i, v in
           _brute_bm25f(["lucene"], {"title": 1.0, "body": 1.0}).items()
           if i not in (0, 3)}
    assert set(got) == set(exp)


def test_single_field_degenerates_to_term_query(searcher, reader):
    """Combined over ONE field at weight 1 == plain TermQuery scores (the
    pseudo stats collapse to the field's own stats; scorer() returns a
    plain TermScorer in the reference too, CombinedFieldQuery.java:391-396)."""
    term = "index"
    fld = reader.default_field
    plain = {r["doc_id"]: r["score"]
             for r in searcher.matches(term).collect()}
    comb = {r["doc_id"]: r["score"]
            for r in searcher.combined_field([term], {fld: 1.0}).collect()}
    assert set(plain) == set(comb)
    for d in plain:
        assert abs(plain[d] - comb[d]) < 1e-5


def test_combined_field_other_similarity(spark, mf_index):
    """Any SimilarityBase-style similarity is accepted (the reference
    supports BM25/DFR/IB — CombinedFieldQuery.java:80-86)."""
    r = IndexReader(spark, mf_index)
    s = IndexSearcher(r, similarity="dfr_inl2")
    rows = s.combined_field(["lucene", "apache"],
                            {"title": 1.0, "body": 1.0}).collect()
    assert rows and all(np.isfinite(row["score"]) for row in rows)


def test_field_lens_survive_compaction(spark, tmp_path_factory):
    from lucene_spark.index import compact

    d = str(tmp_path_factory.mktemp("cfq_compact") / "idx")
    cfg = IndexConfig(
        key_cols=("id",), content_col="title", partitions=2, num_groups=2,
        num_buckets=4,
        fields=(FieldSpec(name="title", analyzer="whitespace"),
                FieldSpec(name="body", analyzer="whitespace")))
    IndexBuilder(spark, cfg).build(spark.createDataFrame(DOCS), d,
                                   overwrite=True)
    before = IndexSearcher(IndexReader(spark, d)).combined_field(
        ["lucene", "apache"], {"title": 2.0, "body": 1.0}).collect()
    compact(spark, d, cfg, segs_per_tier=1)
    after = IndexSearcher(IndexReader(spark, d)).combined_field(
        ["lucene", "apache"], {"title": 2.0, "body": 1.0}).collect()
    key = lambda rows: sorted((r["doc_id"], round(r["score"], 6)) for r in rows)
    assert key(before) == key(after) and before
