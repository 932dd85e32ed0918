"""Payload channel: DelimitedPayloadTokenFilter analogue
(analysis/payloads/DelimitedPayloadTokenFilter.java + FloatEncoder) and
PayloadScoreQuery (queries/payloads/PayloadScoreQuery.java with
{Min,Max,Sum,Average}PayloadFunction, includeSpanScore=false)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.search import plan as P


def test_delimited_payload_tokenization():
    an = get_analyzer("whitespace_payload")
    t, p, y = an.tokenize_with_positions_payloads(
        pd.Series(["alpha|1.5 beta gamma|2 x|bad d|0.25"]))
    assert list(t.iloc[0]) == ["alpha", "beta", "gamma", "x|bad", "d"]
    ys = y.iloc[0]
    assert ys[0] == 1.5 and ys[2] == 2.0 and ys[4] == 0.25
    assert math.isnan(ys[1])               # no delimiter → no payload
    assert math.isnan(ys[3])               # unparseable payload → kept whole


@pytest.fixture(scope="module")
def pay_searcher(spark, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    rows = [
        (1, "merge|3 scan merge|1 table|9"),
        (2, "merge|5 merge|5 fast|2"),
        (3, "merge scan|4"),               # payload-less merge occurrence
        (4, "scan|7 table"),               # no merge at all
        (5, "merge|0 merge|6"),
    ]
    df = spark.createDataFrame(rows, "ext_id long, body string")
    idx = str(tmp_path_factory.mktemp("pay")) + "/idx"
    cfg = IndexConfig(key_cols=("ext_id",), content_col="body",
                      analyzer="whitespace_payload", partitions=1,
                      num_groups=1, num_buckets=2, termdict_partitions=1)
    IndexBuilder(spark, cfg).build(df, idx, overwrite=True)
    return IndexSearcher(IndexReader(spark, idx))


EXPECT = {
    # doc: payloads at 'merge' positions
    1: [3.0, 1.0],
    2: [5.0, 5.0],
    3: [],        # merge occurs but carries no payload
    5: [0.0, 6.0],
}


@pytest.mark.parametrize("func,agg", [
    ("max", lambda v: max(v) if v else 1.0),
    ("min", lambda v: min(v) if v else 1.0),
    ("sum", lambda v: sum(v) if v else 1.0),
    ("avg", lambda v: sum(v) / len(v) if v else 1.0),
])
def test_payload_functions(pay_searcher, func, agg):
    node = P.PayloadScoreNode(term="merge", func=func)
    got = {}
    for r in pay_searcher.hydrate(pay_searcher.matches(node)).collect():
        got[r["ext_id"]] = round(float(r["score"]), 4)
    want = {d: round(agg(v), 4) for d, v in EXPECT.items()}
    assert got == want, func


def test_payload_boost_and_deletes(pay_searcher):
    node = P.PayloadScoreNode(term="merge", func="max", boost=2.0)
    got = {r["ext_id"]: float(r["score"])
           for r in pay_searcher.hydrate(pay_searcher.matches(node)).collect()}
    assert got[1] == 6.0 and got[2] == 10.0
    dead = [r["doc_id"] for r in pay_searcher.matches(
        P.TermNode(term="fast"), with_scores=False).collect()]
    s2 = pay_searcher.with_deletes(dead)
    got2 = {r["ext_id"] for r in s2.hydrate(s2.matches(node)).collect()}
    assert got2 == {1, 3, 5}


def _check_docs(s, terms, payloads):
    node = P.SpanPayloadCheckNode(terms=terms, payloads=payloads)
    return {r["ext_id"] for r in s.hydrate(s.matches(node)).collect()}


def test_span_payload_check_single_term(pay_searcher):
    """SpanPayloadCheckQuery over a SpanTermQuery
    (payloads/SpanPayloadCheckQuery.java:155-185): occurrence survives
    iff its payload equals the expected one; None expects no payload."""
    assert _check_docs(pay_searcher, ("merge",), (5.0,)) == {2}
    assert _check_docs(pay_searcher, ("merge",), (3.0,)) == {1}
    assert _check_docs(pay_searcher, ("merge",), (None,)) == {3}
    assert _check_docs(pay_searcher, ("scan",), (7.0,)) == {4}
    assert _check_docs(pay_searcher, ("merge",), (99.0,)) == set()


def test_span_payload_check_sequence(pay_searcher):
    """Adjacent two-term span: the payload SEQUENCE must match in order
    and exactly cover the span (matches && upto == size)."""
    # doc1: merge|3 scan — merge payload 3, scan payload-less
    assert _check_docs(pay_searcher, ("merge", "scan"), (3.0, None)) == {1}
    # doc3: merge scan|4 — payload-less merge then scan payload 4
    assert _check_docs(pay_searcher, ("merge", "scan"), (None, 4.0)) == {3}
    # wrong payload on either position: no match
    assert _check_docs(pay_searcher, ("merge", "scan"), (1.0, None)) == set()
    assert _check_docs(pay_searcher, ("merge", "scan"), (3.0, 9.0)) == set()
    # doc2: merge|5 merge|5
    assert _check_docs(pay_searcher, ("merge", "merge"), (5.0, 5.0)) == {2}
    # doc5: merge|0 merge|6
    assert _check_docs(pay_searcher, ("merge", "merge"), (0.0, 6.0)) == {5}


def test_span_payload_check_scores_like_phrase(pay_searcher):
    """Scored like the wrapped span: identical to the exact PhraseNode
    score on a doc where every occurrence passes the check."""
    node = P.SpanPayloadCheckNode(terms=("merge", "merge"), payloads=(5.0, 5.0))
    got = {r["ext_id"]: r["score"]
           for r in pay_searcher.hydrate(pay_searcher.matches(node)).collect()}
    ph = {r["ext_id"]: r["score"] for r in pay_searcher.hydrate(
        pay_searcher.matches(P.PhraseNode(terms=("merge", "merge")))).collect()}
    assert set(got) == {2} and got[2] == ph[2]


def test_span_payload_check_requires_payload_channel(spark, tmp_path):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    df = spark.createDataFrame([(1, "merge scan")], "ext_id long, body string")
    idx = str(tmp_path) + "/idx"
    cfg = IndexConfig(key_cols=("ext_id",), content_col="body",
                      analyzer="whitespace", partitions=1, num_groups=1,
                      num_buckets=2, termdict_partitions=1,
                      index_positions=True)
    IndexBuilder(spark, cfg).build(df, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    with pytest.raises(Exception, match="payload"):
        s.matches(P.SpanPayloadCheckNode(terms=("merge",),
                                         payloads=(1.0,))).collect()


def test_payloads_survive_compaction_with_deletes(spark, tmp_path):
    """Delete-folding rewrites the positions channel; payloads must be
    masked identically (position-parallel) and survive the fold."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.index.compaction import compact
    from lucene_spark.search import IndexSearcher

    rows = [(i, f"merge|{i % 7} filler{i} merge|{(i * 3) % 7}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "ext_id long, body string")
    idx = str(tmp_path) + "/idx"
    cfg = IndexConfig(key_cols=("ext_id",), content_col="body",
                      analyzer="whitespace_payload", partitions=2,
                      num_groups=3, num_buckets=2)
    IndexBuilder(spark, cfg).build(df, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    node = P.PayloadScoreNode(term="merge", func="sum")
    before = {r["ext_id"]: round(float(r["score"]), 4)
              for r in s.hydrate(s.matches(node)).collect()}
    dead = [r["doc_id"] for r in s.matches(
        P.TermNode(term="filler7"), with_scores=False).collect()]
    assert dead
    res = compact(spark, idx, segs_per_tier=1, max_merge_at_once=10,
                  deletes=dead)
    assert res["merged"]
    s2 = IndexSearcher(IndexReader(spark, idx))
    after = {r["ext_id"]: round(float(r["score"]), 4)
             for r in s2.hydrate(s2.matches(node)).collect()}
    want = {k: v for k, v in before.items() if k != 7}
    assert after == want
