"""Interval containment/overlap algebra (Intervals.java:300-404 —
containing / notContaining / containedBy / notContainedBy / overlapping
/ nonOverlapping / within / notWithin): filter_spans vs a brute-force
span-pair oracle, plus end-to-end through the index vs per-doc
recomputation (the TestIntervals.java strategy)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.search import intervals as IV, plan as P
from lucene_spark.search.kernel import filter_spans, interval_spans

OPS = ["containing", "not_containing", "contained_by", "not_contained_by",
       "overlapping", "non_overlapping"]


def brute_filter(src, ref, op, ext=0):
    ref = [(max(0, s - ext), e + ext) for s, e in ref]
    out = []
    for a in src:
        cont = [b for b in ref if a[0] <= b[0] and b[1] <= a[1]]
        inside = [b for b in ref if b[0] <= a[0] and a[1] <= b[1]]
        over = [b for b in ref if a[0] <= b[1] and b[0] <= a[1]]
        keep = {
            "containing": bool(cont),
            "not_containing": not cont,
            "contained_by": bool(inside),
            "not_contained_by": not inside,
            "overlapping": bool(over),
            "non_overlapping": not over,
        }[op]
        if keep:
            out.append(a)
    return out


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_filter_spans_vs_bruteforce(data):
    spans = st.tuples(st.integers(0, 20), st.integers(0, 10)).map(
        lambda t: (t[0], t[0] + t[1]))
    src = data.draw(st.lists(spans, min_size=0, max_size=6))
    ref = data.draw(st.lists(spans, min_size=0, max_size=6))
    op = data.draw(st.sampled_from(OPS))
    ext = data.draw(st.integers(0, 3))
    assert filter_spans(src, ref, op, ext) == brute_filter(src, ref, op, ext)


@pytest.fixture(scope="module")
def positioned(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path_factory.mktemp("ivf")) + "/index"
    src = spark.createDataFrame(make_corpus(120, seed=9))
    cfg = IndexConfig(partitions=2, num_buckets=4, index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    return IndexSearcher(IndexReader(spark, idx)), src


def _doc_spans(toks, terms, max_gaps, ordered):
    pls = []
    for t in terms:
        pl = np.array([i for i, x in enumerate(toks) if x == t], dtype=np.int64)
        if pl.size == 0:
            return None
        pls.append(pl)
    return interval_spans(pls, max_gaps, ordered)


@pytest.mark.parametrize("op,ext", [
    ("containing", 0), ("not_containing", 0), ("contained_by", 0),
    ("not_contained_by", 0), ("overlapping", 0), ("non_overlapping", 0),
    ("contained_by", 3), ("non_overlapping", 3),   # within / notWithin
])
def test_interval_filter_end_to_end(positioned, op, ext):
    """Engine result vs per-doc recomputation from the raw text for
    source = unordered('index','writer')@maxgaps=8,
    reference = unordered('merge','segment')@maxgaps=8."""
    searcher, src = positioned
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("code")
    s_terms, r_terms = ("index", "writer"), ("merge", "segment")
    node = P.IntervalFilterNode(
        source=IV.unordered(*s_terms, max_gaps=8),
        reference=IV.unordered(*r_terms, max_gaps=8),
        op=op, ref_extend=ext)
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}

    ds = searcher.hydrate(searcher.matches(P.MatchAllNode(), with_scores=False))
    key_rows = {(r["repo"], r["path"], r["commit"]): r["content"]
                for r in src.collect()}
    negative = op.startswith("not_") or op == "non_overlapping"
    want = set()
    for row in ds.collect():
        toks = list(an.tokenize_series(pd.Series(
            [key_rows[(row["repo"], row["path"], row["commit"])]])).iloc[0])
        s_spans = _doc_spans(toks, s_terms, 8, False)
        if not s_spans:
            continue
        r_spans = _doc_spans(toks, r_terms, 8, False) or []
        if not r_spans:
            if negative:
                want.add(row["doc_id"])
            continue
        if brute_filter(s_spans, r_spans, op, ext):
            want.add(row["doc_id"])
    assert got == want, op


def test_intervals_constructor_surface(positioned):
    """The Intervals.java-style factory functions compose and run; the
    within/notWithin identities hold vs their expansion."""
    searcher, _ = positioned
    a = IV.within(IV.term("index"), 2, IV.term("writer"))
    b = P.IntervalFilterNode(source=IV.term("index"),
                             reference=IV.term("writer"),
                             op="contained_by", ref_extend=2)
    ra = {r["doc_id"] for r in searcher.matches(a, with_scores=False).collect()}
    rb = {r["doc_id"] for r in searcher.matches(b, with_scores=False).collect()}
    assert ra == rb
    nw = IV.not_within(IV.term("index"), 1, IV.term("index"))
    # a term is always within 1 of itself → not_within must be empty
    assert searcher.matches(nw, with_scores=False).count() == 0
    ov = IV.overlapping(IV.ordered("index", "writer", max_gaps=6),
                        IV.term("merge"))
    assert searcher.matches(ov, with_scores=False).count() >= 0  # runs


def test_interval_filter_explain(positioned):
    searcher, _ = positioned
    node = IV.containing(IV.unordered("index", "writer", max_gaps=8),
                         IV.term("merge"))
    hits = searcher.matches(node, with_scores=False).limit(1).collect()
    if hits:
        ex = searcher.explain(node, hits[0]["doc_id"])
        assert ex["match"] is True
        assert "IntervalFilter(containing" in str(ex)


def test_minimal_spans_containing_counterexample():
    """'table big table hash': the ordered enumeration's per-anchor
    chains are (0,3) and (2,3); Lucene's iterators only surface the
    containment antichain {(2,3)}, so containing(table..hash, 'big')
    must NOT match (big@1 lies only inside the dominated (0,3))."""
    from lucene_spark.search.kernel import minimal_spans

    pls = [np.array([0, 2]), np.array([3])]   # table, hash
    spans = interval_spans(pls, 8, True)
    assert spans == [(2, 3)]
    assert minimal_spans([(0, 3), (2, 3)]) == [(2, 3)]
    assert minimal_spans([(0, 3), (2, 3), (2, 5)]) == [(2, 3)]
    assert minimal_spans([(0, 1), (2, 3)]) == [(0, 1), (2, 3)]
    # big@1 inside the dominated span only → no match on minimal stream
    assert not filter_spans(spans, [(1, 1)], "containing")
    # unordered sweep minimizes too
    assert interval_spans([np.array([0, 2]), np.array([3])], 8, False) \
        == [(2, 3)]
