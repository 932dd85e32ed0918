"""CoveringQuery + DocValuesTerms/NumbersQuery (sandbox/search/).

Brute-force twins mirror TestCoveringQuery's random-index strategy:
recompute clause matches in python over the corpus and compare sets.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import lucene_spark.search.plan as P


def _ext_rows(reader, df):
    ds = {r["doc_id"]: (r["repo"], r["path"]) for r in
          reader.docstats().select("doc_id", "repo", "path").collect()}
    return {r["doc_id"]: r for r in df.collect()}, ds


def test_covering_dynamic_min_match(searcher, reader, corpus_pdf):
    """Per-doc min-match from a column expression (LongValuesSource role):
    docs match iff #matching clauses >= max(1, doc value)."""
    clauses = ["index", "merge", "scan"]
    # min_match = 1 + doc_id % 3 — deterministic, covers 1..3
    mm_col = (F.pmod(F.col("doc_id"), F.lit(3)) + F.lit(1))
    got = {r["doc_id"]: r["score"]
           for r in searcher.covering(clauses, mm_col).collect()}

    per_clause = [
        {r["doc_id"]: r["score"] for r in searcher.matches(c).collect()}
        for c in clauses
    ]
    exp = {}
    all_docs = set().union(*per_clause)
    for d in all_docs:
        hits = [pc[d] for pc in per_clause if d in pc]
        need = max(1, int(d % 3) + 1)
        if len(hits) >= need:
            exp[d] = sum(hits)
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-4, d


def test_covering_min_below_one_and_duplicates(searcher):
    """Values < 1 behave as 1 (CoveringQuery ctor javadoc); duplicate
    clauses each count toward the minimum (Multiset semantics)."""
    zero = F.lit(0)
    got1 = {r["doc_id"] for r in searcher.covering(["index"], zero).collect()}
    base = {r["doc_id"] for r in searcher.matches("index").collect()}
    assert got1 == base
    # duplicated clause reaches min=2 wherever the single clause matches
    two = F.lit(2)
    dup = {r["doc_id"] for r in
           searcher.covering(["index", "index"], two).collect()}
    assert dup == base
    single = {r["doc_id"] for r in searcher.covering(["index"], two).collect()}
    assert single == set()


def test_covering_empty_and_docs_without_value(searcher):
    assert searcher.covering([], F.lit(1)).count() == 0
    # null min-match value -> doc never matches (javadoc: "Documents that
    # do not have a value for minimumNumberMatch do not match")
    null_mm = F.when(F.lit(False), F.lit(1)).otherwise(F.lit(None))
    assert searcher.covering(["index"], null_mm).count() == 0


def test_doc_values_terms_filter(searcher, reader):
    """DocValuesTermsQuery as a FILTER clause: constant-score set
    membership over a stored column, composed with a scored MUST."""
    repos = [r["repo"] for r in
             reader.docstats().select("repo").distinct().limit(2).collect()]
    node = P.BooleanNode(clauses=(
        P.Clause(P.Occur.MUST, P.TermNode(term="index")),
        P.Clause(P.Occur.FILTER,
                 P.DocValuesTermsNode(column="repo", values=tuple(repos))),
    ))
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    base = {r["doc_id"]: r["score"] for r in searcher.matches("index").collect()}
    in_set = {r["doc_id"] for r in
              reader.docstats().filter(F.col("repo").isin(repos))
              .select("doc_id").collect()}
    exp = {d: s for d, s in base.items() if d in in_set}
    assert got == pytest.approx(exp)
    assert 0 < len(got) < len(base)


def test_doc_values_terms_alone_and_occur_guard(searcher, reader):
    """Alone: constant-score over the whole set (ConstantScore path);
    non-FILTER occur raises at plan time (never scored, like the
    range node)."""
    repo = reader.docstats().select("repo").first()["repo"]
    alone = searcher.matches(
        P.DocValuesTermsNode(column="repo", values=(repo,)))
    exp = {r["doc_id"] for r in
           reader.docstats().filter(F.col("repo") == repo)
           .select("doc_id").collect()}
    rows = alone.collect()
    assert {r["doc_id"] for r in rows} == exp
    assert all(r["score"] == 1.0 for r in rows)
    with pytest.raises(ValueError):
        searcher.matches(P.BooleanNode(clauses=(
            P.Clause(P.Occur.MUST, P.TermNode(term="index")),
            P.Clause(P.Occur.SHOULD,
                     P.DocValuesTermsNode(column="repo", values=(repo,))),
        )))


def test_doc_values_multi_range(searcher, reader):
    """MultiRangeQuery: union of closed ranges over one numeric column
    (sandbox/search/MultiRangeQuery.java:47-75), FILTER-composed with a
    scored clause; overlapping ranges behave as the plain union."""
    node = P.BooleanNode(clauses=(
        P.Clause(P.Occur.MUST, P.TermNode(term="index")),
        P.Clause(P.Occur.FILTER, P.DocValuesMultiRangeNode(
            column="doclen", ranges=((None, 120), (200, 260), (250, 300)))),
    ))
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    base = {r["doc_id"]: r["score"] for r in searcher.matches("index").collect()}
    dl = {r["doc_id"]: r["doclen"] for r in
          reader.docstats().select("doc_id", "doclen").collect()}
    keep = {d for d, v in dl.items()
            if v <= 120 or 200 <= v <= 260 or 250 <= v <= 300}
    exp = {d: s for d, s in base.items() if d in keep}
    assert got == pytest.approx(exp)
    assert 0 < len(got) < len(base)
    # empty range set matches nothing
    empty = searcher.matches(
        P.DocValuesMultiRangeNode(column="doclen", ranges=()))
    assert empty.count() == 0
