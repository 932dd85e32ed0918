"""Interval query parity: the kernel's minimal-interval matcher vs a
brute-force enumeration oracle (all position choices), plus end-to-end
through the index — the TestIntervals strategy
(reference: lucene/queries/src/test/.../intervals/TestIntervals.java)
restated as property tests."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.search import plan as P
from lucene_spark.search.kernel import interval_match


def brute_force(pos_lists: list[np.ndarray], max_gaps: int, ordered: bool) -> bool:
    k = len(pos_lists)
    for combo in itertools.product(*[p.tolist() for p in pos_lists]):
        if ordered:
            if not all(combo[i] < combo[i + 1] for i in range(k - 1)):
                continue
            span = combo[-1] - combo[0]
        else:
            span = max(combo) - min(combo)
        if (span + 1) - k <= max_gaps:
            return True
    return False


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_interval_match_vs_bruteforce(data):
    k = data.draw(st.integers(min_value=2, max_value=4))
    pos_lists = [
        np.array(sorted(data.draw(st.sets(st.integers(0, 25), min_size=1, max_size=5))),
                 dtype=np.int64)
        for _ in range(k)
    ]
    max_gaps = data.draw(st.integers(min_value=0, max_value=8))
    ordered = data.draw(st.booleans())
    got = interval_match(pos_lists, max_gaps, ordered)
    want = brute_force(pos_lists, max_gaps, ordered)
    assert got == want, (pos_lists, max_gaps, ordered)


@pytest.fixture(scope="module")
def positioned(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path_factory.mktemp("ivx")) + "/index"
    src = spark.createDataFrame(make_corpus(120, seed=3))
    cfg = IndexConfig(partitions=2, num_buckets=4, index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    return IndexSearcher(IndexReader(spark, idx)), src


def _python_positions(src, analyzer_name="code"):
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer(analyzer_name)
    rows = src.orderBy("repo", "path", "commit").collect()
    # doc order inside the engine differs; match by content via doc keys
    return rows, an


def test_interval_end_to_end(positioned, spark):
    """unordered/ordered near over the real index vs recomputing from the
    hydrated text of every candidate doc."""
    searcher, src = positioned
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("code")
    for ordered in (False, True):
        node = P.IntervalNode(terms=("index", "writer"), max_gaps=4, ordered=ordered)
        got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
        # oracle: tokenize every doc, check positions directly
        ds = searcher.hydrate(searcher.matches(P.MatchAllNode(), with_scores=False))
        texts = {r["doc_id"]: r for r in ds.collect()}
        # join back to source content via key cols
        key_rows = {(r["repo"], r["path"], r["commit"]): r["content"]
                    for r in src.collect()}
        import pandas as pd

        want = set()
        for did, row in texts.items():
            content = key_rows[(row["repo"], row["path"], row["commit"])]
            toks = list(an.tokenize_series(pd.Series([content])).iloc[0])
            pls = []
            okall = True
            for t in ("index", "writer"):
                pl = np.array([i for i, x in enumerate(toks) if x == t], dtype=np.int64)
                if pl.size == 0:
                    okall = False
                    break
                pls.append(pl)
            if okall and brute_force(pls, 4, ordered):
                want.add(did)
        assert got == want, f"ordered={ordered}"


def test_interval_requires_positions(spark, tmp_path):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path) + "/nopos"
    src = spark.createDataFrame(make_corpus(30, seed=4))
    IndexBuilder(spark, IndexConfig(partitions=1, num_buckets=2)).build(
        src, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    with pytest.raises(ValueError):
        s.matches(P.IntervalNode(terms=("index", "writer"), max_gaps=2))


def brute_minimal_spans(pos_lists, max_gaps, ordered):
    """Oracle for interval_spans: all minimal valid windows by brute
    force — a valid combo's window is MINIMAL if no other valid combo's
    window is a strict sub-range of it."""
    import itertools as it

    wins = set()
    for combo in it.product(*[p.tolist() for p in pos_lists]):
        k = len(combo)
        if ordered:
            if not all(combo[i] < combo[i + 1] for i in range(k - 1)):
                continue
            s, e = combo[0], combo[-1]
        else:
            s, e = min(combo), max(combo)
        if (e - s + 1) - k <= max_gaps:
            wins.add((s, e))
    return {w for w in wins
            if not any(x != w and x[0] >= w[0] and x[1] <= w[1] for x in wins)}


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_interval_spans_vs_bruteforce(data):
    """interval_spans must contain every minimal window (completeness)
    and only valid windows (soundness); overlap questions (SpanNot) only
    need that property."""
    from lucene_spark.search.kernel import interval_spans

    k = data.draw(st.integers(min_value=1, max_value=3))
    pos_lists = [
        np.array(sorted(data.draw(st.sets(st.integers(0, 18), min_size=1, max_size=4))),
                 dtype=np.int64)
        for _ in range(k)
    ]
    max_gaps = data.draw(st.integers(min_value=0, max_value=6))
    ordered = data.draw(st.booleans())
    got = set(interval_spans(pos_lists, max_gaps, ordered))
    minimal = brute_minimal_spans(pos_lists, max_gaps, ordered)
    # soundness: every emitted span is a valid window
    for s, e in got:
        assert (e - s + 1) - k <= max_gaps
        assert any(True for _ in [0])  # spans come from real positions by construction
    # completeness: every minimal window is emitted
    assert minimal <= got, (pos_lists, max_gaps, ordered, minimal - got)
    # agreement with the boolean matcher
    assert bool(got) == interval_match(pos_lists, max_gaps, ordered)
