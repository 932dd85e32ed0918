"""Completion of the Intervals.java factory surface (Intervals.java:
78-131 phrase/or, 222-257 maxwidth/extend, 406-430 atLeast/before/after,
plus ordered/unordered over COMPOSED sub-sources — OrderedIntervalsSource
/ MinimumShouldMatchIntervalsSource / DisjunctionIntervalsSource /
ExtendedIntervalsSource / FilteredIntervalsSource). Span-math property
tests vs brute-force twins, then end-to-end through the index vs per-doc
recomputation from the raw text (the TestIntervals.java strategy)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.search import intervals as IV, plan as P
from lucene_spark.search.kernel import (_at_least_spans, _seq_spans,
                                        interval_spans, minimal_spans)

spans_st = st.tuples(st.integers(0, 20), st.integers(0, 6)).map(
    lambda t: (t[0], t[0] + t[1]))


def antichains(draw, n, max_size=5):
    """n random minimal-span streams (sorted containment antichains)."""
    out = []
    for _ in range(n):
        raw = draw(st.lists(spans_st, min_size=0, max_size=max_size))
        out.append(minimal_spans(raw))
    return out


def brute_at_least(per_source, m):
    present = [sp for sp in per_source if sp]
    if m <= 0 or len(present) < m:
        return []
    starts = sorted({s for sp in present for s, _ in sp})
    ends = sorted({e for sp in present for _, e in sp})
    wins = []
    for S in starts:
        for E in ends:
            if E < S:
                continue
            cov = sum(1 for sp in present
                      if any(S <= s and e <= E for s, e in sp))
            if cov >= m:
                wins.append((S, E))
    return minimal_spans(wins)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_at_least_spans_vs_bruteforce(data):
    n = data.draw(st.integers(1, 4))
    per = antichains(data.draw, n)
    m = data.draw(st.integers(1, n))
    assert _at_least_spans(per, m) == brute_at_least(per, m)


def brute_seq_ordered(per_child, max_gaps):
    """Greedy earliest-admissible chaining per child-0 anchor — the
    OrderedIntervalIterator minimizing enumeration (its maxgaps filter
    sees exactly the greedy chain's slop)."""
    if any(not sp for sp in per_child):
        return []
    if len(per_child) == 1:
        return per_child[0]
    out = []
    for s0, e0 in per_child[0]:
        e, widths, ok = e0, e0 - s0 + 1, True
        for ch in per_child[1:]:
            nxt = next(((cs, ce) for cs, ce in ch if cs > e), None)
            if nxt is None:
                ok = False
                break
            widths += nxt[1] - nxt[0] + 1
            e = nxt[1]
        if ok and (e - s0 + 1) - widths <= max_gaps:
            out.append((s0, e))
    return minimal_spans(out)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_seq_spans_ordered_vs_bruteforce(data):
    n = data.draw(st.integers(1, 4))
    per = antichains(data.draw, n)
    mg = data.draw(st.sampled_from([0, 1, 3, 2 ** 31 - 1]))
    assert _seq_spans(per, mg, True) == brute_seq_ordered(per, mg)


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_seq_spans_unordered_is_at_least_n(data):
    """Unbounded unordered over n sub-sources = atLeast(n of n)."""
    n = data.draw(st.integers(1, 4))
    per = antichains(data.draw, n)
    assert _seq_spans(per, 2 ** 31 - 1, False) == (
        per[0] if n == 1 else _at_least_spans(per, n))


def test_at_least_distinct_sources_only():
    # two spans in ONE source never satisfy m=2
    assert _at_least_spans([[(0, 0), (5, 5)]], 2) == []
    # one span from each of two sources does
    assert _at_least_spans([[(0, 0)], [(5, 5)]], 2) == [(0, 5)]
    # m=1 is the disjunction antichain
    assert _at_least_spans([[(0, 3)], [(1, 2)]], 1) == [(1, 2)]


def test_extend_clamps_and_keeps_nesting():
    """ExtendedIntervalIterator clamps start at 0 (java:62) and the
    stream is NOT re-minimized — nested windows survive."""
    node = IV.extend(IV.term("x"), 5, 0)
    # via the explain-model twin (no index needed): simulate directly
    from lucene_spark.search.explain import _iv_doc_spans

    doc = {("", "x"): (2, 10, np.array([1, 3]))}
    assert _iv_doc_spans(node, doc) == [(0, 1 + 0), (0, 3)]


# ---------------------------------------------------------------- e2e

@pytest.fixture(scope="module")
def positioned(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path_factory.mktemp("iva")) + "/index"
    src = spark.createDataFrame(make_corpus(120, seed=9))
    cfg = IndexConfig(partitions=2, num_buckets=4, index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    return IndexSearcher(IndexReader(spark, idx)), src


def _tok_lists(searcher, src):
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("code")
    ds = searcher.hydrate(searcher.matches(P.MatchAllNode(), with_scores=False))
    key_rows = {(r["repo"], r["path"], r["commit"]): r["content"]
                for r in src.collect()}
    out = {}
    for row in ds.collect():
        out[row["doc_id"]] = list(an.tokenize_series(pd.Series(
            [key_rows[(row["repo"], row["path"], row["commit"])]])).iloc[0])
    return out


def _pls(toks, terms):
    pls = []
    for t in terms:
        pl = np.array([i for i, x in enumerate(toks) if x == t], dtype=np.int64)
        if pl.size == 0:
            return None
        pls.append(pl)
    return pls


@pytest.mark.parametrize("factory,expect", [
    # or_: union-antichain of the sub-streams
    (lambda: IV.or_(IV.term("index"), IV.term("merge")),
     lambda toks: minimal_spans(
         [(p, p) for t in ("index", "merge")
          for p in (_pls(toks, (t,)) or [np.empty(0, np.int64)])[0].tolist()])),
    # atLeast(2 of 3)
    (lambda: IV.at_least(2, IV.term("index"), IV.term("merge"),
                         IV.term("segment")),
     lambda toks: _at_least_spans(
         [[(p, p) for p in (_pls(toks, (t,)) or [np.empty(0, np.int64)])[0].tolist()]
          for t in ("index", "merge", "segment")], 2)),
    # maxwidth over an unordered pair
    (lambda: IV.maxwidth(4, IV.unordered("index", "writer")),
     lambda toks: [(s, e) for s, e in
                   (interval_spans(_pls(toks, ("index", "writer")), 2 ** 31 - 1,
                                   False) if _pls(toks, ("index", "writer"))
                    else []) if e - s + 1 <= 4]),
    # before / after
    (lambda: IV.before(IV.term("index"), IV.term("merge")),
     lambda toks: [
         (p, p) for p in (_pls(toks, ("index",)) or [np.empty(0, np.int64)])[0].tolist()
         if any(p <= max(0, q - 1) for q in
                (_pls(toks, ("merge",)) or [np.empty(0, np.int64)])[0].tolist())]),
    (lambda: IV.after(IV.term("index"), IV.term("merge")),
     lambda toks: [
         (p, p) for p in (_pls(toks, ("index",)) or [np.empty(0, np.int64)])[0].tolist()
         if any(p >= q + 1 for q in
                (_pls(toks, ("merge",)) or [np.empty(0, np.int64)])[0].tolist())]),
    # ordered over composed sources: phrase then term
    (lambda: IV.ordered(IV.phrase("index", "writer"), IV.term("merge")),
     lambda toks: _seq_spans(
         [interval_spans(_pls(toks, ("index", "writer")), 0, True)
          if _pls(toks, ("index", "writer")) else [],
          [(p, p) for p in (_pls(toks, ("merge",)) or [np.empty(0, np.int64)])[0].tolist()]],
         2 ** 31 - 1, True)),
])
def test_algebra_end_to_end(positioned, factory, expect):
    """Engine doc set vs per-doc recomputation from the raw text."""
    searcher, src = positioned
    node = factory()
    got = {r["doc_id"] for r in
           searcher.matches(node, with_scores=False).collect()}
    toks_by_doc = _tok_lists(searcher, src)
    want = {doc_id for doc_id, toks in toks_by_doc.items() if expect(toks)}
    assert got == want
    assert got, "case must be non-trivial on this corpus (seed 9, 120 docs)"


def test_prefix_wildcard_interval_sources(positioned):
    """Intervals.prefix / Intervals.wildcard expand against the
    dictionary like the query surface's PrefixNode/RegexpNode."""
    searcher, _ = positioned
    a = {r["doc_id"] for r in searcher.matches(
        IV.ordered(IV.prefix("merg"), IV.term("policy"), max_gaps=8),
        with_scores=False).collect()}
    # prefix must cover at least the exact-term expansion
    b = {r["doc_id"] for r in searcher.matches(
        IV.ordered("merge", "policy", max_gaps=8),
        with_scores=False).collect()}
    assert b <= a
    w = searcher.matches(IV.wildcard("mer*e"), with_scores=False)
    assert {r["doc_id"] for r in w.collect()} >= {
        r["doc_id"] for r in searcher.matches(
            IV.term("merge"), with_scores=False).collect()}


def test_phrase_is_ordered_maxgaps0(positioned):
    searcher, src = positioned
    # derive an adjacent bigram actually present in the corpus
    toks = next(iter(_tok_lists(searcher, src).values()))
    t1, t2 = next((a, b) for a, b in zip(toks, toks[1:]) if a != b)
    a = {r["doc_id"] for r in searcher.matches(
        IV.phrase(t1, t2), with_scores=False).collect()}
    b = {r["doc_id"] for r in searcher.matches(
        IV.ordered(t1, t2, max_gaps=0), with_scores=False).collect()}
    assert a == b and a     # non-empty by construction


def test_at_least_expansion_contracts(positioned):
    searcher, _ = positioned
    # m > live sources → MatchNone at plan time
    assert searcher.matches(
        IV.at_least(2, IV.term("index"), IV.term("zzz_not_a_term")),
        with_scores=False).count() == 0
    # m of n with a dead source: survivors can still satisfy m
    some = searcher.matches(
        IV.at_least(1, IV.term("index"), IV.term("zzz_not_a_term")),
        with_scores=False).count()
    only = searcher.matches(IV.term("index"), with_scores=False).count()
    assert some == only
    with pytest.raises(ValueError, match="minShouldMatch"):
        IV.at_least(0, IV.term("x"))


def test_seq_field_override_propagates():
    """An explicit field= on ordered/unordered must reach every leaf of
    the composed-sources path (parity with the slots fast path, whose
    eval reads the node's field for all slots) — and survive the
    searcher's default-field pass."""
    node = IV.ordered(IV.or_(IV.term("a"), IV.term("b")), IV.term("c"),
                      field="title")
    resolved = P.apply_field(node, "body", only_default=True)
    fields: list[str] = []

    def walk(n):
        if isinstance(n, P.IntervalSlotsNode):
            fields.append(n.field)
        for s in getattr(n, "sources", ()) or ():
            walk(s)
        if getattr(n, "source", None) is not None:
            walk(n.source)

    walk(resolved)
    assert len(fields) == 3 and all(f == "title" for f in fields)


def test_algebra_explain(positioned):
    searcher, _ = positioned
    node = IV.at_least(2, IV.term("index"), IV.term("merge"),
                       IV.term("segment"))
    hits = searcher.matches(node, with_scores=False).limit(1).collect()
    assert hits, "corpus should have a 2-of-3 doc"
    ex = searcher.explain(node, hits[0]["doc_id"])
    assert ex["match"] is True and "atLeast" in str(ex)
    node2 = IV.ordered(IV.phrase("index", "writer"), IV.term("merge"))
    hits2 = searcher.matches(node2, with_scores=False).limit(1).collect()
    if hits2:
        ex2 = searcher.explain(node2, hits2[0]["doc_id"])
        assert ex2["match"] is True
