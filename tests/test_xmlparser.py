"""XML query parser (CoreParser dialect) tests — element→node mapping
per xml/builders/*.java and end-to-end parity through the index
(the TestCoreParser.java strategy: canned XML queries, assert hits)."""

from __future__ import annotations

import pytest

from lucene_spark.search import plan as P
from lucene_spark.search.xmlparser import XmlParserError, parse_xml_query


@pytest.fixture()
def an():
    from lucene_spark.analysis import get_analyzer

    return get_analyzer("whitespace")


def test_term_query(an):
    n = parse_xml_query('<TermQuery fieldName="t" boost="2">Merge</TermQuery>', an)
    assert n == P.TermNode(term="Merge", field="t", boost=2.0)  # raw, unanalyzed


def test_terms_query_analyzed_msm(an):
    n = parse_xml_query(
        '<TermsQuery fieldName="t" minimumNumberShouldMatch="2">Big FAST scan</TermsQuery>',
        an)
    assert isinstance(n, P.BooleanNode) and n.minimum_should_match == 2
    # whitespace analyzer is split-only: case preserved, like the
    # reference's WhitespaceAnalyzer
    assert [c.node.term for c in n.clauses] == ["Big", "FAST", "scan"]


def test_boolean_occurs_and_field_inheritance(an):
    q = """<BooleanQuery fieldName="contents">
      <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>b</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery fieldName="other">c</TermQuery></Clause>
    </BooleanQuery>"""
    n = parse_xml_query(q, an)
    occ = [c.occur for c in n.clauses]
    assert occ == [P.Occur.MUST, P.Occur.MUST_NOT, P.Occur.FILTER]
    assert n.clauses[0].node.field == "contents"   # inherited
    assert n.clauses[2].node.field == "other"      # explicit wins


def test_range_and_dismax_and_constantscore(an):
    n = parse_xml_query(
        '<RangeQuery fieldName="t" lowerTerm="aa" upperTerm="bb" includeUpper="false"/>', an)
    assert n == P.TermRangeNode(lower="aa", upper="bb", include_lower=True,
                                include_upper=False, field="t")
    n = parse_xml_query(
        '<DisjunctionMaxQuery tieBreaker="0.3">'
        '<TermQuery fieldName="a">x</TermQuery>'
        '<TermQuery fieldName="b">y</TermQuery></DisjunctionMaxQuery>', an)
    assert isinstance(n, P.DisjunctionMaxNode) and n.tie_breaker == 0.3
    n = parse_xml_query(
        '<ConstantScoreQuery boost="5"><TermQuery fieldName="t">x</TermQuery>'
        '</ConstantScoreQuery>', an)
    assert isinstance(n, P.ConstantScoreNode) and n.boost == 5.0


def test_user_query(an):
    n = parse_xml_query('<UserQuery fieldName="t">big AND scan*</UserQuery>', an)
    assert isinstance(n, P.BooleanNode)
    kinds = {type(c.node) for c in n.clauses}
    assert kinds == {P.TermNode, P.PrefixNode}
    assert all(c.node.field == "t" for c in n.clauses)


def test_span_near(an):
    q = """<SpanNear slop="3" inOrder="true" fieldName="text">
      <SpanOrTerms>big fast</SpanOrTerms>
      <SpanTerm>scan</SpanTerm>
    </SpanNear>"""
    n = parse_xml_query(q, an)
    assert isinstance(n, P.IntervalSlotsNode)
    assert n.max_gaps == 3 and n.ordered and n.field == "text"
    assert set(n.slots[0].terms) == {"big", "fast"}
    # inOrder defaults FALSE (SpanNearBuilder.java)
    n = parse_xml_query(
        '<SpanNear slop="1" fieldName="t"><SpanTerm>a</SpanTerm>'
        '<SpanTerm>b</SpanTerm></SpanNear>', an)
    assert not n.ordered


def test_span_or_nested(an):
    q = """<SpanOr fieldName="t">
      <SpanTerm>a</SpanTerm>
      <SpanOrTerms>b c</SpanOrTerms>
    </SpanOr>"""
    n = parse_xml_query(q, an)
    assert isinstance(n, P.TermInSetNode)
    assert set(n.terms) == {"a", "b", "c"}


def test_rejections(an):
    for bad in (
        '<SpanNot/>', '<Unknown/>',
        '<PointRangeQuery fieldName="n" type="decimal"/>',
        '<PointRangeQuery fieldName="n" lowerTerm="abc"/>',
        '<SpanNear fieldName="t"><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>',
        '<BooleanQuery><Clause occurs="weird"><TermQuery fieldName="t">a</TermQuery></Clause></BooleanQuery>',
        'not xml at all <',
    ):
        with pytest.raises(XmlParserError):
            parse_xml_query(bad, an)


@pytest.fixture(scope="module")
def positioned(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path_factory.mktemp("xmx")) + "/index"
    src = spark.createDataFrame(make_corpus(120, seed=13))
    cfg = IndexConfig(partitions=2, num_buckets=4, index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    return IndexSearcher(IndexReader(spark, idx)), src


def test_end_to_end(positioned, an):
    """XML SpanNear vs the already-tested IntervalNode path on the same
    index — both compile to the same interval semantics."""
    searcher, _ = positioned
    fld = searcher.reader.default_field
    q = (f'<SpanNear slop="4" inOrder="true" fieldName="{fld}">'
         '<SpanTerm>index</SpanTerm><SpanTerm>writer</SpanTerm></SpanNear>')
    node = parse_xml_query(q, an)
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    want_node = P.IntervalNode(terms=("index", "writer"), max_gaps=4,
                               ordered=True, field=fld)
    want = {r["doc_id"] for r in searcher.matches(want_node, with_scores=False).collect()}
    assert got == want and got


def test_spannear_empty_clause_matches_nothing():
    """SpanOrTerms that analyzes to zero terms (all stopwords) makes the
    enclosing SpanNear match nothing instead of raising."""
    from lucene_spark.analysis import get_analyzer

    en = get_analyzer("english")
    q = ('<SpanNear fieldName="t" slop="2" inOrder="false">'
         '<SpanOrTerms>the of</SpanOrTerms><SpanTerm>scan</SpanTerm></SpanNear>')
    assert isinstance(parse_xml_query(q, en), P.MatchNoneNode)


def test_span_first_and_position_range(an):
    n = parse_xml_query(
        '<SpanFirst end="5"><SpanTerm fieldName="t">big</SpanTerm></SpanFirst>', an)
    assert isinstance(n, P.IntervalSlotsNode)
    assert n.max_end == 5 and n.min_start == 0 and len(n.slots) == 1
    n = parse_xml_query(
        '<SpanPositionRange start="2" end="9">'
        '<SpanNear slop="1" inOrder="true" fieldName="t">'
        '<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>'
        '</SpanPositionRange>', an)
    assert n.min_start == 2 and n.max_end == 9 and len(n.slots) == 2


def test_span_first_end_to_end(positioned, an):
    """SpanFirst vs a hydrate-and-retokenize oracle: term within the
    first N positions only."""
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    searcher, src = positioned
    fld = searcher.reader.default_field
    end = 40
    q = (f'<SpanFirst end="{end}"><SpanTerm fieldName="{fld}">index'
         '</SpanTerm></SpanFirst>')
    node = parse_xml_query(q, an)
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    code = get_analyzer("code")
    ds = searcher.hydrate(searcher.matches(P.MatchAllNode(), with_scores=False))
    keyed = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in ds.collect()}
    want = set()
    for r in src.collect():
        toks = list(code.tokenize_series(pd.Series([r["content"]])).iloc[0])
        if "index" in toks[:end]:
            want.add(keyed[(r["repo"], r["path"], r["commit"])])
    assert got == want and got
    # sanity: the bound actually prunes vs the unbounded term match
    all_docs = {r["doc_id"] for r in searcher.matches(
        P.TermNode(term="index", field=fld), with_scores=False).collect()}
    assert got < all_docs


def test_span_not_element(an):
    q = ('<SpanNot><Include><SpanNear slop="2" inOrder="true" fieldName="t">'
         '<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear></Include>'
         '<Exclude><SpanTerm fieldName="t">c</SpanTerm></Exclude></SpanNot>')
    n = parse_xml_query(q, an)
    assert isinstance(n, P.SpanNotNode)
    assert isinstance(n.include, P.IntervalSlotsNode)
    assert isinstance(n.exclude, P.IntervalSlotsNode)
    assert len(n.exclude.slots) == 1
    with pytest.raises(XmlParserError):
        parse_xml_query('<SpanNot><Include><SpanTerm fieldName="t">a</SpanTerm>'
                        '</Include></SpanNot>', an)   # missing Exclude


def test_point_range_query(an):
    n = parse_xml_query(
        '<PointRangeQuery fieldName="n_chars" lowerTerm="100" upperTerm="300"/>', an)
    assert n == P.DocValuesRangeNode(column="n_chars", lower=100, upper=300)
    n = parse_xml_query('<PointRangeQuery fieldName="x" type="double" lowerTerm="1.5"/>', an)
    assert n.lower == 1.5 and n.upper is None


def test_point_range_end_to_end(positioned, an):
    """Term query + PointRangeQuery FILTER over the doclen doc-values
    column == manual range intersection; misplaced occur raises."""
    import pytest as _pytest

    searcher, _ = positioned
    fld = searcher.reader.default_field
    ds = searcher.reader.docstats()
    from pyspark.sql import functions as SF

    lo, hi = 40, 200
    q = (f'<BooleanQuery fieldName="{fld}">'
         '<Clause occurs="must"><TermQuery>index</TermQuery></Clause>'
         '<Clause occurs="filter">'
         f'<PointRangeQuery fieldName="doclen" lowerTerm="{lo}" upperTerm="{hi}"/>'
         '</Clause></BooleanQuery>')
    node = parse_xml_query(q, an)
    got = {r["doc_id"] for r in searcher.matches(node, with_scores=False).collect()}
    base = {r["doc_id"] for r in searcher.matches(
        P.TermNode(term="index", field=fld), with_scores=False).collect()}
    in_range = {r["doc_id"] for r in ds.filter(
        (SF.col("doclen") >= lo) & (SF.col("doclen") <= hi)).select("doc_id").collect()}
    assert got == (base & in_range) and got and got != base
    # top-k search path agrees with matches + manual sort
    top = searcher.search(node, k=5).collect()
    assert all(r["doc_id"] in got for r in top)
    # scoring occur is rejected
    bad = parse_xml_query(
        f'<BooleanQuery fieldName="{fld}">'
        '<Clause occurs="must"><TermQuery>index</TermQuery></Clause>'
        '<Clause occurs="must"><PointRangeQuery fieldName="doclen" lowerTerm="1"/></Clause>'
        '</BooleanQuery>', an)
    with _pytest.raises(ValueError):
        searcher.matches(bad)
    with _pytest.raises(ValueError):
        searcher.matches(parse_xml_query(
            '<PointRangeQuery fieldName="nope" lowerTerm="1"/>', an))
