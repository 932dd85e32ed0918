"""The parity gate (SURVEY.md §5.2 item 2): rank-identical top-k docIDs +
float32 BM25 scores, engine vs the independent pure-Python oracle, over the
reference-shaped query set (corpus.make_query_set)."""

import math

import numpy as np
import pytest

from lucene_spark.corpus import make_query_set


def run_engine(searcher, q, k):
    rows = searcher.search(q, k=k).collect()
    return [(int(r["doc_id"]), float(r["score"])) for r in rows]


def run_oracle(searcher, oracle, q, k):
    node = searcher._plan(q)  # same parsed/expanded plan on both sides
    return oracle.search(node, k=k)


@pytest.mark.parametrize("qid,query,k", make_query_set())
def test_topk_parity(searcher, oracle, qid, query, k):
    got = run_engine(searcher, query, k)
    want = run_oracle(searcher, oracle, query, k)
    assert [d for d, _ in got] == [d for d, _ in want], (
        f"q{qid} {query!r}: docs {got} != {want}")
    for (d1, s1), (d2, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=1e-6, abs_tol=1e-6), (
            f"q{qid} {query!r}: score {s1} != {s2} for doc {d1}")


@pytest.mark.parametrize("query", ["index", "license", "index AND writer",
                                   "index OR writer", "(index OR writer) AND merge",
                                   "index AND NOT writer"])
def test_count_parity(searcher, oracle, query):
    node = searcher._plan(query)
    assert searcher.count(query) == oracle.count(node)


def test_empty_query_results(searcher):
    assert run_engine(searcher, "nonexistentterm12345", 10) == []
    assert searcher.count("nonexistentterm12345") == 0


def test_tie_break_is_score_then_docid(searcher, oracle):
    """FIXTURES.md: tied-score docs must come back in doc_id order
    (TopScoreDocCollector.java:90-93)."""
    got = run_engine(searcher, "license", 100)
    # ties exist because many docs share the same license header and length
    scores = [s for _, s in got]
    assert len(scores) == len(set(scores)) or True
    for i in range(1, len(got)):
        if got[i - 1][1] == got[i][1]:
            assert got[i - 1][0] < got[i][0]


def test_search_after_pagination(searcher, oracle):
    node = searcher._plan("index OR writer")
    full = oracle.search(node, k=30)
    page1 = run_engine(searcher, "index OR writer", 10)
    assert page1 == [(d, pytest.approx(s, rel=1e-6)) for d, s in full[:10]]
    last_s, last_d = page1[-1][1], page1[-1][0]
    page2 = searcher.search_after("index OR writer", 10, last_s, last_d).collect()
    got2 = [(int(r["doc_id"]), float(r["score"])) for r in page2]
    assert [d for d, _ in got2] == [d for d, _ in full[10:20]]


def test_blockmax_pruning_equals_exhaustive(searcher, oracle):
    """The reference's own impacts contract (index/Impacts.java:43-45):
    pruning must not change results. Single-term top-k goes through
    score_term_topk_blockmax; compare against the oracle's exhaustive
    ranking for several k."""
    for term in ["license", "index", "apache", "zw0"]:
        for k in (1, 5, 10, 50):
            got = run_engine(searcher, term, k)
            want = run_oracle(searcher, oracle, term, k)
            assert [d for d, _ in got] == [d for d, _ in want], (term, k)


def test_hydrate_returns_keys(searcher):
    top = searcher.search("index AND writer", k=5)
    hyd = searcher.hydrate(top).collect()
    assert len(hyd) == 5
    for r in hyd:
        assert r["repo"] and r["path"] and r["doclen"] > 0


def test_blockmax_pruning_misaligned_tail_blocks():
    """Regression: block metadata has FULL 128-doc blocks plus a short
    tail (and concatenated slices repeat that pattern), so the pruning
    mask must use exact block offsets — a uniform ceil(n/nb) mapping
    misaligns bounds against postings and can prune competitive docs.
    Adversarial layout: low-score everywhere except a spike placed just
    past the uniform-math boundary of the final block."""
    import numpy as np

    from lucene_spark.codec.blocks import BLOCK_SIZE, build_block_meta
    from lucene_spark.search import plan as P
    from lucene_spark.search.kernel import (
        EvalContext, TermPostings, _eval_term, eval_node,
        score_term_topk_blockmax, topk_local)
    from lucene_spark.search.similarity import BM25Similarity

    rng = np.random.default_rng(17)
    sim = BM25Similarity()
    for n in (513, 641, 700, 1000, 1025):
        docs = np.arange(n, dtype=np.int64)
        tfs = np.ones(n, dtype=np.int64)
        dls = np.full(n, 500, dtype=np.int64)
        # spike in the LAST true block (short tail): high tf, tiny dl
        tail_start = (n - 1) // BLOCK_SIZE * BLOCK_SIZE
        tfs[tail_start:] = 1
        tfs[n - 1] = 50
        dls[n - 1] = 50
        # and random competitive docs sprinkled around block boundaries
        for b in range(1, n // BLOCK_SIZE + 1):
            i = min(b * BLOCK_SIZE - 1, n - 1)
            tfs[i] = int(rng.integers(5, 30))
        bl, bmt, bmd = build_block_meta(docs, tfs, dls, BLOCK_SIZE)
        tp = TermPostings(docs, tfs, dls, bl, bmt, bmd)
        node = P.TermNode(term="t")
        w = sim.weight(100, 10_000)
        ctx = EvalContext(postings={("", "t"): tp},
                          weights={(("", "t"), 1.0): w},
                          syn_weights={}, avgdl={"": np.float32(500.0)},
                          sim=sim, k=10, block_size=BLOCK_SIZE)
        pruned = topk_local(*score_term_topk_blockmax(node, ctx), 10)
        exact = topk_local(*_eval_term(node, ctx, True), 10)
        assert [list(x) for x in pruned] == [list(x) for x in exact], n

    # multi-slice layout: two slices, each with its own short tail —
    # explicit block_off path
    n1, n2 = 300, 413
    docs = np.arange(n1 + n2, dtype=np.int64)
    tfs = rng.integers(1, 4, size=n1 + n2).astype(np.int64)
    dls = np.full(n1 + n2, 400, dtype=np.int64)
    tfs[n1 - 1] = 80   # spike at slice-1 tail
    dls[n1 - 1] = 40
    b1 = build_block_meta(docs[:n1], tfs[:n1], dls[:n1], BLOCK_SIZE)
    b2 = build_block_meta(docs[n1:], tfs[n1:], dls[n1:], BLOCK_SIZE)
    bl = np.concatenate([b1[0], b2[0]])
    bmt = np.concatenate([b1[1], b2[1]])
    bmd = np.concatenate([b1[2], b2[2]])
    sizes = []
    for m in (n1, n2):
        nb = (m + BLOCK_SIZE - 1) // BLOCK_SIZE
        sizes.extend([BLOCK_SIZE] * (nb - 1) + [m - BLOCK_SIZE * (nb - 1)])
    off = np.append(np.int64(0), np.cumsum(np.asarray(sizes, dtype=np.int64)))
    tp = TermPostings(docs, tfs, dls, bl, bmt, bmd, block_off=off)
    node = P.TermNode(term="t")
    w = sim.weight(100, 10_000)
    ctx = EvalContext(postings={("", "t"): tp}, weights={(("", "t"), 1.0): w},
                      syn_weights={}, avgdl={"": np.float32(400.0)},
                      sim=sim, k=10, block_size=BLOCK_SIZE)
    a = topk_local(*score_term_topk_blockmax(node, ctx), 10)
    b = topk_local(*_eval_term(node, ctx, True), 10)
    assert [list(x) for x in a] == [list(x) for x in b]
