"""ComplexPhrase parser tests — structure mapping vs the reference's
rewrite (queryparser/complexPhrase/ComplexPhraseQueryParser.java:258-338;
test model TestComplexPhraseQuery.java) and end-to-end matching parity
against a brute-force positional oracle."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.search import plan as P
from lucene_spark.search.complexphrase import (
    ComplexPhraseError,
    parse_complex_phrase,
)


@pytest.fixture()
def an():
    from lucene_spark.analysis import get_analyzer

    return get_analyzer("whitespace")


def test_group_plus_wildcard(an):
    n = parse_complex_phrase('"(john jon) smyth*"~2', an)
    assert isinstance(n, P.IntervalSlotsNode)
    assert n.max_gaps == 2 and n.ordered
    assert isinstance(n.slots[0], P.TermInSetNode)
    assert set(n.slots[0].terms) == {"john", "jon"}
    assert isinstance(n.slots[1], P.PrefixNode) and n.slots[1].prefix == "smyth"


def test_plain_phrase_and_unordered(an):
    n = parse_complex_phrase('"fred smith"', an)
    assert isinstance(n, P.IntervalSlotsNode) and n.max_gaps == 0 and n.ordered
    n = parse_complex_phrase('"fred smith"~3', an, in_order=False)
    assert n.max_gaps == 3 and not n.ordered


def test_single_clause_returns_contents(an):
    # single-term / single-multi-term phrase → the clause itself
    # (ComplexPhraseQuery.rewrite:261-266)
    assert isinstance(parse_complex_phrase('"fred"', an), P.TermNode)
    assert isinstance(parse_complex_phrase('"fre*"', an), P.PrefixNode)
    assert isinstance(parse_complex_phrase('"fr?d"', an), P.RegexpNode)


def test_field_scoping(an):
    n = parse_complex_phrase('name:"big scan*"', an)
    assert n.field == "name"
    assert all(s.field == "name" for s in n.slots)


def test_fuzzy_and_range_slots(an):
    n = parse_complex_phrase('"smth~1 jones"', an)
    assert isinstance(n.slots[0], P.FuzzyNode)
    n = parse_complex_phrase('"[aa TO af] jones"', an)
    assert isinstance(n.slots[0], P.TermRangeNode)


def test_outside_phrase_classic_still_works(an):
    n = parse_complex_phrase('"big scan" AND batch OR merge', an)
    assert isinstance(n, P.BooleanNode)


def test_rejections(an):
    with pytest.raises(ComplexPhraseError):
        parse_complex_phrase('t:"a other:b"', an)  # cross-field clause
    with pytest.raises(ComplexPhraseError):
        parse_complex_phrase('"(a b*) c"', an)     # mixed group


# ------------------------------------------------------------- end-to-end

@pytest.fixture(scope="module")
def positioned(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path_factory.mktemp("cpx")) + "/index"
    src = spark.createDataFrame(make_corpus(120, seed=11))
    cfg = IndexConfig(partitions=2, num_buckets=4, index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    return IndexSearcher(IndexReader(spark, idx)), src


def _doc_tokens(searcher, src):
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("code")
    ds = searcher.hydrate(searcher.matches(P.MatchAllNode(), with_scores=False))
    keyed = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in ds.collect()}
    out = {}
    for r in src.collect():
        did = keyed[(r["repo"], r["path"], r["commit"])]
        out[did] = list(an.tokenize_series(pd.Series([r["content"]])).iloc[0])
    return out


def _ordered_hit(slot_preds, toks, max_gaps):
    pls = []
    for pred in slot_preds:
        pl = [i for i, t in enumerate(toks) if pred(t)]
        if not pl:
            return False
        pls.append(np.array(pl, dtype=np.int64))
    from tests.test_intervals import brute_force

    # one position per slot, ordered
    import itertools

    for combo in itertools.product(*[p.tolist() for p in pls]):
        if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
            if (combo[-1] - combo[0] + 1) - len(combo) <= max_gaps:
                return True
    return False


def test_complexphrase_end_to_end(positioned):
    from lucene_spark.analysis import get_analyzer

    searcher, src = positioned
    an = get_analyzer("code")
    node = parse_complex_phrase('"(index merge) writ*"~2', an)
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    toks = _doc_tokens(searcher, src)
    want = {
        did for did, tk in toks.items()
        if _ordered_hit([lambda t: t in ("index", "merge"),
                         lambda t: t.startswith("writ")], tk, 2)
    }
    assert got == want


def test_stopwords_inside_phrase_dropped(an):
    """A stopword atom inside a phrase is dropped, not an error (the
    reference analyzes phrase contents, so stop tokens just vanish)."""
    from lucene_spark.analysis import get_analyzer

    en = get_analyzer("english")
    n = parse_complex_phrase('"the merging dog*"', en)
    assert isinstance(n, P.IntervalSlotsNode) and len(n.slots) == 2
    assert n.slots[0].term == "merg"          # stemmed by the chain
    # all-stopword phrase → matches nothing
    assert isinstance(parse_complex_phrase('"the of"', en), P.MatchNoneNode)
    # stopword-only group = dummy never-matching slot → whole phrase dead
    assert isinstance(parse_complex_phrase('"(the of) dog"', en), P.MatchNoneNode)


def test_negation_compiles_spannot(an):
    n = parse_complex_phrase('"big -slow scan"~1', an)
    assert isinstance(n, P.SpanNotNode)
    inc, exc = n.include, n.exclude
    assert [s.term for s in inc.slots] == ["big", "scan"]
    assert inc.max_gaps == 1 + 1            # slop + numNegatives
    assert [s.term for s in exc.slots] == ["big", "slow", "scan"]
    assert exc.max_gaps == 1
    with pytest.raises(ComplexPhraseError):
        parse_complex_phrase('"-a -b"', an)  # all-negative phrase


def test_spannot_end_to_end(positioned):
    """'"index -segment writer"' ≡ index..writer spans (gaps ≤ 1 from
    the removed negative) with no index-segment-writer sequence
    overlapping — verified against a brute-force span oracle."""
    import itertools

    from lucene_spark.analysis import get_analyzer
    from lucene_spark.search.kernel import interval_spans

    searcher, src = positioned
    an = get_analyzer("code")
    node = parse_complex_phrase('"index -segment writer"', an)
    assert isinstance(node, P.SpanNotNode)
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    toks = _doc_tokens(searcher, src)
    want = set()
    for did, tk in toks.items():
        def pls(terms):
            out = []
            for t in terms:
                pl = np.array([i for i, x in enumerate(tk) if x == t], dtype=np.int64)
                if pl.size == 0:
                    return None
                out.append(pl)
            return out
        ip = pls(["index", "writer"])
        if ip is None:
            continue
        inc_spans = interval_spans(ip, 1, True)   # slop 0 + 1 negative
        ep = pls(["index", "segment", "writer"])
        exc_spans = interval_spans(ep, 0, True) if ep is not None else []
        if any(all(not (xs <= e and xe >= s) for xs, xe in exc_spans)
               for s, e in inc_spans):
            want.add(did)
    assert got == want
