"""Property-based parity: random query trees evaluated by the vectorized
kernel (no Spark — TermPostings built directly) must match the pure-Python
oracle doc-for-doc and float32-score-for-score.

This is the reference's randomized-testing strategy restated
(LuceneTestCase randomized runs; BaseSimilarityTestCase.testRandomScoring
asserts score properties over random corpora — here we assert full
equality against an independent implementation instead).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.codec.blocks import BLOCK_SIZE, build_block_meta
from lucene_spark.corpus import make_corpus
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import plan as P
from lucene_spark.search.kernel import EvalContext, eval_node, topk_local
from lucene_spark.search.similarity import BM25Similarity


@pytest.fixture(scope="module")
def world():
    pdf = make_corpus(200, seed=99)
    ora = OracleIndex(analyzer="code")
    for i, row in enumerate(pdf.itertuples(index=False)):
        ora.add(i, row.content)

    sim = BM25Similarity()
    postings = {}
    from lucene_spark.search.kernel import TermPostings

    for term, docs_tf in ora.postings.items():
        docs = np.array(sorted(docs_tf), dtype=np.int64)
        tfs = np.array([docs_tf[d] for d in docs], dtype=np.int64)
        dls = np.array([ora.doclen[d] for d in docs], dtype=np.int64)
        bl, bmt, bmd = build_block_meta(docs, tfs, dls, BLOCK_SIZE)
        postings[term] = TermPostings(docs, tfs, dls, bl, bmt, bmd)

    vocab = sorted(ora.postings, key=lambda t: -ora.df(t))
    sample = vocab[:20] + vocab[len(vocab) // 2:len(vocab) // 2 + 10] + ["zzabsent"]
    return ora, postings, sim, sample


def make_ctx(world, node, k=10):
    ora, postings, sim, _ = world
    terms: set[str] = set()

    def collect(n):
        if isinstance(n, P.TermNode):
            terms.add(n.term)
        elif isinstance(n, (P.TermInSetNode, P.SynonymNode)):
            terms.update(n.terms)
        elif isinstance(n, P.BooleanNode):
            for c in n.clauses:
                collect(c.node)
        elif isinstance(n, P.DisjunctionMaxNode):
            for c in n.children:
                collect(c)
        elif isinstance(n, P.ConstantScoreNode) and n.child is not None:
            collect(n.child)

    collect(node)
    N = ora.doc_count
    sum_ttf = sum(ora.doclen.values())
    weights = {}
    syn = {}

    def wwalk(n):
        if isinstance(n, P.TermNode) and ora.df(n.term):
            weights[((n.field, n.term), n.boost)] = sim.weight(ora.df(n.term), N, n.boost)
        elif isinstance(n, P.SynonymNode):
            df = max((ora.df(t) for t in n.terms), default=0)
            if df:
                syn[((n.field, n.terms), n.boost)] = sim.weight(df, N, n.boost)
        elif isinstance(n, P.BooleanNode):
            for c in n.clauses:
                wwalk(c.node)
        elif isinstance(n, P.DisjunctionMaxNode):
            for c in n.children:
                wwalk(c)
        elif isinstance(n, P.ConstantScoreNode) and n.child is not None:
            wwalk(n.child)

    wwalk(node)
    avgdl = sim.avgdl(sum_ttf, N)
    # nodes default to field='' — register postings/avgdl under that key
    return EvalContext(postings={("", t): postings[t] for t in terms if t in postings},
                       weights=weights, syn_weights=syn, avgdl={"": avgdl},
                       sim=sim, k=k)


def term_strategy(sample):
    return st.sampled_from(sample)


def node_strategy(sample, depth=2):
    leaf = st.one_of(
        term_strategy(sample).map(lambda t: P.TermNode(term=t)),
        term_strategy(sample).map(lambda t: P.TermNode(term=t, boost=2.0)),
        st.lists(term_strategy(sample), min_size=1, max_size=3, unique=True)
        .map(lambda ts: P.TermInSetNode(terms=tuple(sorted(ts)))),
        st.lists(term_strategy(sample), min_size=2, max_size=3, unique=True)
        .map(lambda ts: P.SynonymNode(terms=tuple(sorted(ts)))),
    )
    if depth == 0:
        return leaf

    sub = node_strategy(sample, depth - 1)
    occur = st.sampled_from([P.Occur.MUST, P.Occur.SHOULD, P.Occur.FILTER, P.Occur.MUST_NOT])
    boolean = st.tuples(
        st.lists(st.tuples(occur, sub), min_size=1, max_size=4),
        st.integers(min_value=0, max_value=2),
    ).map(lambda t: P.BooleanNode(
        clauses=tuple(P.Clause(o, n) for o, n in t[0]),
        minimum_should_match=t[1]))
    dismax = st.lists(sub, min_size=1, max_size=3).map(
        lambda ns: P.DisjunctionMaxNode(children=tuple(ns), tie_breaker=0.3))
    const = sub.map(lambda n: P.ConstantScoreNode(child=n, boost=1.5))
    return st.one_of(leaf, boolean, dismax, const)


def _runnable(node) -> bool:
    """Skip trees that rewrite to nothing-executable (pure negation etc.
    is covered explicitly below)."""
    return True


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_random_trees_match_oracle(world, data):
    ora, _, _, sample = world
    node = data.draw(node_strategy(sample, depth=2))
    node = P.rewrite(node)
    if isinstance(node, (P.MatchNoneNode, P.MatchAllNode)):
        return
    ctx = make_ctx(world, node)
    try:
        docs, scores = eval_node(node, ctx, need_scores=True)
    except TypeError:
        return  # node type not executable without an index (none expected)
    want = ora.eval(node)
    got = dict(zip(docs.tolist(), scores.tolist()))
    assert set(got) == set(want), f"doc sets differ for {node}"
    for d, s in got.items():
        assert np.float32(s) == np.float32(want[d]), (node, d, s, want[d])
    # top-k ordering with the Lucene tie-break
    kdocs, kscores = topk_local(docs, scores, 10)
    want_rank = ora.search(node, k=10)
    assert [int(d) for d in kdocs] == [d for d, _ in want_rank]


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_random_trees_filter_context(world, data):
    """need_scores=False must yield the same doc sets."""
    ora, _, _, sample = world
    node = data.draw(node_strategy(sample, depth=2))
    node = P.rewrite(node)
    if isinstance(node, (P.MatchNoneNode, P.MatchAllNode)):
        return
    ctx = make_ctx(world, node)
    docs, _ = eval_node(node, ctx, need_scores=False)
    want = ora.eval(node, scored=False)
    assert set(docs.tolist()) == set(want)


@settings(max_examples=300, deadline=None)
@given(q=st.text(alphabet=st.sampled_from(list(
    'abcXYZ019 ()"~^*?+-[]{}&|!:\t\\')), max_size=40))
def test_qparser_never_crashes(q):
    """Garbage in → a Node out (or MatchNone); never an exception.
    (classic QueryParser throws ParseException; our planner treats
    unparseable input as MatchNoDocs, a deliberate, documented choice.)"""
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.search.qparser import parse_query

    node = parse_query(q, get_analyzer("code"))
    assert isinstance(node, P.Node)


def test_pure_negation_matches_nothing(world):
    node = P.BooleanNode(clauses=(P.Clause(P.Occur.MUST_NOT, P.TermNode(term="index")),))
    ctx = make_ctx(world, node)
    docs, _ = eval_node(node, ctx, need_scores=True)
    assert docs.size == 0


def test_part_shift_matches_builder():
    """kernel._PART_SHIFT re-states the doc-id layout locally (the kernel
    must stay importable without pyspark); this pin guards against drift."""
    from lucene_spark.index.builder import PART_ID_SHIFT
    from lucene_spark.search import kernel as K

    assert int(K._PART_SHIFT) == PART_ID_SHIFT
    assert int(K._LOCAL_MASK) == (1 << PART_ID_SHIFT) - 1


def test_dense_union_multipart_matches_sparse():
    """The dense-domain disjunction must be doc- and bit-identical to the
    sorted-union fallback on multi-part doc ids (part_id << 40 | local)."""
    from lucene_spark.search import kernel as K

    rng = np.random.default_rng(7)

    def tp(docs):
        docs = np.asarray(sorted(docs), dtype=np.int64)
        tfs = rng.integers(1, 5, docs.size).astype(np.int64)
        dls = np.full(docs.size, 40, np.int64)
        bl, bmt, bmd = build_block_meta(docs, tfs, dls, BLOCK_SIZE)
        return K.TermPostings(docs, tfs, dls, bl, bmt, bmd)

    def docs_of(parts_locals):
        return [(np.int64(p) << K._PART_SHIFT) | np.int64(l)
                for p, l in parts_locals]

    a = docs_of([(0, i) for i in range(0, 80, 2)] + [(5, i) for i in range(40)])
    b = docs_of([(0, i) for i in range(0, 80, 3)] + [(9, i) for i in range(0, 90, 2)])
    postings = {("content", "a"): tp(a), ("content", "b"): tp(b)}
    w = {(("content", "a"), 1.0): np.float32(1.7),
         (("content", "b"), 1.0): np.float32(3.1)}
    node = P.BooleanNode(clauses=(
        P.Clause(P.Occur.SHOULD, P.TermNode(field="content", term="a")),
        P.Clause(P.Occur.SHOULD, P.TermNode(field="content", term="b"))))

    def ctx():
        return EvalContext(postings=postings, weights=w, syn_weights={},
                           avgdl={"content": np.float32(40.0)},
                           sim=BM25Similarity(), k=10, score_memo={})

    c1 = ctx()
    d_dense, s_dense = eval_node(node, c1, need_scores=True)
    assert c1.dense_dom is not None and c1.dense_dom[0] is not None
    c2 = ctx()
    c2.dense_dom = [None]  # force the sorted-union fallback
    d_sparse, s_sparse = eval_node(node, c2, need_scores=True)
    assert np.array_equal(d_dense, d_sparse)
    assert np.array_equal(s_dense, s_sparse)  # bit-identical float32
    assert np.all(np.diff(d_dense) > 0)  # ascending doc order

    # msm=2 → intersection only
    node2 = P.BooleanNode(clauses=node.clauses, minimum_should_match=2)
    d2, _ = eval_node(node2, ctx())
    c3 = ctx(); c3.dense_dom = [None]
    d2s, _ = eval_node(node2, c3)
    assert np.array_equal(d2, d2s)
