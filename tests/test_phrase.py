"""Phrase queries: positions codec roundtrip, analyzer position gaps,
engine↔oracle rank/score parity on a positions-enabled index.

Reference semantics under test:
- ExactPhraseMatcher (search/ExactPhraseMatcher.java): freq = number of
  positions p where term_j sits at p+j for all j
- StopFilter position gaps (analysis/FilteringTokenFilter.java:49-63):
  "a THE b" does NOT match phrase "a b"
- blended weight = boost · Σ idf (BM25Similarity.java:191-199)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def pos_index(spark, corpus_pdf, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader

    d = str(tmp_path_factory.mktemp("pidx") / "index")
    cfg = IndexConfig(partitions=4, num_groups=2, num_buckets=8,
                      analyzer="code", index_positions=True)
    src = spark.createDataFrame(corpus_pdf)
    IndexBuilder(spark, cfg).build(src, d, overwrite=True)
    return IndexReader(spark, d)


@pytest.fixture(scope="module")
def pos_searcher(pos_index):
    from lucene_spark.search import IndexSearcher

    return IndexSearcher(pos_index)


@pytest.fixture(scope="module")
def pos_oracle(pos_index, corpus_pdf):
    from lucene_spark.oracle import OracleIndex

    ds = pos_index.docstats().select("repo", "path", "commit", "doc_id").toPandas()
    key = ds.set_index(["repo", "path", "commit"])["doc_id"]
    ora = OracleIndex(analyzer="code")
    for row in corpus_pdf.itertuples(index=False):
        ora.add(int(key.loc[(row.repo, row.path, row.commit)]), row.content)
    return ora


PHRASE_QUERIES = [
    '"licensed under the apache"',
    '"apache license version"',
    '"index writer"',
    '"distributed with this work"',
    '"notice file distributed"',
    '"zzz never present"',
    '"uid42sing"',                      # single-term phrase → TermQuery
    '"index writer" OR merge',          # phrase inside boolean
    'merge AND "licensed under"',
]


def test_phrase_parity(pos_searcher, pos_oracle):
    for q in PHRASE_QUERIES:
        node = pos_searcher.parse(q)
        eng = [(r["doc_id"], r["score"]) for r in pos_searcher.search(node, k=10).collect()]
        orc = [(d, s) for d, s in pos_oracle.search(node, k=10)]
        assert [d for d, _ in eng] == [d for d, _ in orc], q
        for (d1, s1), (d2, s2) in zip(eng, orc):
            assert np.float32(s1) == np.float32(s2), (q, d1, s1, s2)


def test_phrase_count_parity(pos_searcher, pos_oracle):
    for q in ['"licensed under the apache"', '"index writer"']:
        node = pos_searcher.parse(q)
        assert pos_searcher.count(node) == pos_oracle.count(node), q


def test_stop_gap_blocks_phrase(spark, tmp_path_factory):
    """Standard analyzer drops 'the' leaving a position gap: the phrase
    'quick fox' must NOT match 'quick the fox'."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    pdf = pd.DataFrame({
        "repo": ["r", "r", "r"],
        "path": ["a", "b", "c"],
        "commit": ["1", "1", "1"],
        "lang": ["en"] * 3,
        "content": ["quick the fox", "quick fox jumps", "fox quick"],
    })
    d = str(tmp_path_factory.mktemp("gap") / "index")
    cfg = IndexConfig(partitions=1, num_buckets=2, analyzer="standard",
                      index_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(pdf), d, overwrite=True)
    s = IndexSearcher(IndexReader(spark, d))
    hits = s.search('"quick fox"', k=10).collect()
    ds = s.hydrate(s.search('"quick fox"', k=10)).select("path").collect()
    assert [r["path"] for r in ds] == ["b"]
    assert len(hits) == 1


def test_phrase_requires_positions(searcher):
    """DOCS_AND_FREQS index → phrase query is a planning-time error."""
    with pytest.raises(ValueError, match="index_positions"):
        searcher.search('"licensed under"', k=5).collect()


def test_tokenize_with_positions_gaps():
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("standard")
    toks, poss = an.tokenize_with_positions(pd.Series(["quick the fox", ""]))
    assert list(toks.iloc[0]) == ["quick", "fox"]
    assert list(poss.iloc[0]) == [0, 2]          # gap at dropped stopword
    assert list(toks.iloc[1]) == [] and list(poss.iloc[1]) == []

    code = get_analyzer("code")
    toks, poss = code.tokenize_with_positions(pd.Series(["fooBar baz_qux"]))
    assert list(toks.iloc[0]) == ["foo", "bar", "baz", "qux"]
    assert list(poss.iloc[0]) == [0, 1, 2, 3]


def test_positions_codec_roundtrip():
    """Build-side delta encode ↔ search-side reconstruct, via a tiny
    single-partition invert."""
    from lucene_spark.codec.vbyte import vbyte_decode
    from lucene_spark.index.builder import IndexConfig, _invert_partition

    pdf = pd.DataFrame({
        "repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["x"],
        "content": ["w a w b w c w"],
        "__sha256": ["h"],
    })
    cfg = IndexConfig(analyzer="whitespace", index_positions=True)
    frames = list(_invert_partition(iter([pdf]), cfg, 0, 1, ["repo", "path", "commit"]))
    post = pd.concat(frames)
    row = post[(post["kind"] == "posting") & (post["term"] == "w")].iloc[0]
    tfs = vbyte_decode(row["tf_blob"])
    pos_delta = vbyte_decode(row["pos_blob"])
    # reconstruct (same math as searcher)
    starts = np.cumsum(tfs) - tfs
    cs = np.cumsum(pos_delta)
    base_corr = cs[starts] - pos_delta[starts]
    pos = cs - np.repeat(base_corr, tfs)
    assert list(pos) == [0, 2, 4, 6]
    assert list(tfs) == [4]


def test_sloppy_phrase_hand_cases(spark, tmp_path_factory):
    """Documented sloppy semantics on hand-built docs."""
    import pandas as pd

    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    docs = [
        ("d0", "a b"),          # exact
        ("d1", "a x b"),        # one gap  → span 1
        ("d2", "b a"),          # swapped  → span 2
        ("d3", "a x x x b"),    # span 3
        ("d4", "b x x a"),      # swapped far → span 4
        ("d5", "a c d"),        # no b
    ]
    pdf = pd.DataFrame({
        "repo": ["r"] * len(docs), "path": [d[0] for d in docs],
        "commit": ["1"] * len(docs), "lang": ["x"] * len(docs),
        "content": [d[1] for d in docs],
    })
    d = str(tmp_path_factory.mktemp("slop") / "idx")
    cfg = IndexConfig(partitions=1, num_buckets=2, analyzer="whitespace",
                      index_positions=True)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(pdf), d, overwrite=True)
    s = IndexSearcher(IndexReader(spark, d))

    def paths(q):
        return sorted(r["path"] for r in s.hydrate(s.search(q, k=10)).collect())

    assert paths('"a b"') == ["d0"]
    assert paths('"a b"~1') == ["d0", "d1"]
    assert paths('"a b"~2') == ["d0", "d1", "d2"]
    assert paths('"a b"~3') == ["d0", "d1", "d2", "d3"]
    assert paths('"a b"~4') == ["d0", "d1", "d2", "d3", "d4"]
    # tighter matches score higher at equal stats (sloppyFreq 1/(1+span))
    rows = {r["path"]: r["score"] for r in s.hydrate(s.search('"a b"~4', k=10)).collect()}
    assert rows["d0"] > rows["d1"] > rows["d2"] > rows["d3"] > rows["d4"]


def test_sloppy_phrase_engine_oracle_parity(pos_searcher, pos_oracle):
    for q in ['"licensed under"~2', '"apache version"~1', '"under licensed"~2',
              '"notice distributed"~3', '"index merge"~5']:
        node = pos_searcher.parse(q)
        eng = [(r["doc_id"], r["score"]) for r in pos_searcher.search(node, k=10).collect()]
        orc = [(d, s) for d, s in pos_oracle.search(node, k=10)]
        assert [d for d, _ in eng] == [d for d, _ in orc], q
        import numpy as np

        for (d1, s1), (d2, s2) in zip(eng, orc):
            assert np.float32(s1) == np.float32(s2), (q, d1)


def test_sloppy_freq_kernel_vs_oracle_random():
    """The two independent implementations of the documented window
    algorithm agree on random position lists."""
    import numpy as np

    from lucene_spark.oracle import OracleIndex
    from lucene_spark.search.kernel import sloppy_phrase_freq

    rng = np.random.default_rng(17)
    for _ in range(300):
        k = int(rng.integers(2, 4))
        lists = []
        for j in range(k):
            n = int(rng.integers(1, 8))
            vals = np.unique(rng.integers(0, 30, size=n)).astype(np.int64)
            lists.append(vals)
        slop = int(rng.integers(0, 6))
        a = sloppy_phrase_freq(lists, slop)
        b = OracleIndex._sloppy_freq([list(map(int, l)) for l in lists], slop)
        assert abs(a - b) < 1e-12, (lists, slop, a, b)


def test_sloppy_repeated_terms(spark, tmp_path_factory):
    """Repeated-term sloppy phrases (the SloppyPhraseMatcher repeats case):
    one token occurrence can never fill two query slots of the same term."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    rows = [
        ("r", "p0", "c", "alpha beta alpha"),    # matches "alpha alpha"~2
        ("r", "p1", "c", "alpha beta gamma"),    # single alpha -> no match
        ("r", "p2", "c", "alpha alpha beta"),    # adjacent repeat: exact too
        ("r", "p3", "c", "beta gamma delta"),
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string")
    idx = str(tmp_path_factory.mktemp("rep")) + "/idx"
    cfg = IndexConfig(partitions=1, num_buckets=2, index_positions=True,
                      analyzer="whitespace")
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))

    def paths(q):
        hits = s.hydrate(s.matches(q, with_scores=False))
        return {r["path"] for r in hits.collect()}

    assert paths('"alpha alpha"~2') == {"p0", "p2"}
    assert paths('"alpha alpha"') == {"p2"}          # exact adjacency
    assert paths('"alpha beta alpha"~1') == {"p0"}


def test_sloppy_repeats_engine_oracle_parity(pos_searcher, pos_oracle):
    """3-way style: engine kernel vs the independent python oracle on
    repeated-term sloppy phrases over the random corpus."""
    import numpy as np

    for q in ['"index index"~3', '"the the"~4', '"writer index writer"~5']:
        node = pos_searcher.parse(q)
        got = {r["doc_id"]: r["score"]
               for r in pos_searcher.matches(node).collect()}
        want = pos_oracle.eval(pos_searcher._plan(q))
        assert set(got) == set(want), q
        for d, sc in got.items():
            assert np.float32(sc) == np.float32(want[d]), (q, d)


def test_multiphrase(spark, tmp_path_factory):
    """MultiPhraseQuery (search/MultiPhraseQuery.java:53): per-slot
    alternative terms; exact and sloppy; single-alternative degenerates to
    PhraseQuery with identical scores."""
    import numpy as np

    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search import plan as P

    rows = [
        ("r", "p0", "c", "big table scan now"),
        ("r", "p1", "c", "large table scan now"),
        ("r", "p2", "c", "small table scan now"),
        ("r", "p3", "c", "big index scan now"),
        ("r", "p4", "c", "table big scan now"),
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string")
    idx = str(tmp_path_factory.mktemp("mp")) + "/idx"
    cfg = IndexConfig(partitions=1, num_buckets=2, index_positions=True,
                      analyzer="whitespace")
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))

    node = P.MultiPhraseNode(positions=(("big", "large"), ("table",)))
    hits = s.hydrate(s.matches(node, with_scores=False))
    assert {r["path"] for r in hits.collect()} == {"p0", "p1"}

    # sloppy multiphrase: "(big|large) scan"~1 also catches the gap doc
    node2 = P.MultiPhraseNode(positions=(("big", "large"), ("scan",)), slop=1)
    hits2 = s.hydrate(s.matches(node2, with_scores=False))
    assert {r["path"] for r in hits2.collect()} == {"p0", "p1", "p3", "p4"}

    # degenerate single-alternative == PhraseNode, score-identical
    mp = s.matches(P.MultiPhraseNode(positions=(("table",), ("scan",)))).collect()
    ph = s.matches(P.PhraseNode(terms=("table", "scan"))).collect()
    a = {r["doc_id"]: np.float32(r["score"]) for r in mp}
    b = {r["doc_id"]: np.float32(r["score"]) for r in ph}
    assert a == b and a
