from lucene_spark.analysis import get_analyzer
from lucene_spark.search import plan as P
from lucene_spark.search.qparser import parse_query


AN = get_analyzer("code")


def parse(q):
    return parse_query(q, AN)


def test_single_term():
    assert parse("index") == P.TermNode(term="index")


def test_default_operator_is_or():
    # QueryParserBase.java:59-64 — bare juxtaposition = OR
    n = parse("score boost")
    assert isinstance(n, P.BooleanNode)
    assert all(c.occur is P.Occur.SHOULD for c in n.clauses)
    assert {c.node.term for c in n.clauses} == {"score", "boost"}


def test_and():
    n = parse("index AND writer")
    assert isinstance(n, P.BooleanNode)
    assert all(c.occur is P.Occur.MUST for c in n.clauses)


def test_nested():
    n = parse("(index OR writer) AND merge")
    assert isinstance(n, P.BooleanNode)
    occurs = [c.occur for c in n.clauses]
    assert occurs.count(P.Occur.MUST) == 2
    inner = [c.node for c in n.clauses if isinstance(c.node, P.BooleanNode)]
    assert len(inner) == 1
    assert all(c.occur is P.Occur.SHOULD for c in inner[0].clauses)


def test_plus_modifier_survives_juxtaposition():
    # QueryParserBase.addClause MOD_REQ: '+a b c' = MUST(a) SHOULD(b) SHOULD(c)
    n = parse("+score boost merge")
    assert isinstance(n, P.BooleanNode)
    occ = {c.node.term: c.occur for c in n.clauses}
    assert occ == {"score": P.Occur.MUST, "boost": P.Occur.SHOULD,
                   "merge": P.Occur.SHOULD}


def test_parenthesized_required_group_stays_optional():
    # '(+a) b': the + applies INSIDE the group; the group itself is an
    # ordinary SHOULD clause (and a one-MUST boolean rewrites to its
    # child, per BooleanQuery.rewrite) — a doc with only 'b' matches
    n = parse("(+score) boost")
    assert isinstance(n, P.BooleanNode)
    assert all(c.occur is P.Occur.SHOULD for c in n.clauses)
    assert {c.node.term for c in n.clauses} == {"score", "boost"}


def test_plus_minus_compose():
    # '+-a b': negation is terminal
    n = parse("+-score boost")
    occ = {c.node.term: c.occur for c in n.clauses}
    assert occ["score"] is P.Occur.MUST_NOT


def test_not_and_minus():
    for q in ("index AND NOT writer", "index AND -writer"):
        n = parse(q)
        assert isinstance(n, P.BooleanNode)
        occurs = {c.occur for c in n.clauses}
        assert P.Occur.MUST_NOT in occurs


def test_boost_prefix_fuzzy_wildcard_range():
    assert parse("writer^2") == P.TermNode(term="writer", boost=2.0)
    assert parse("index*") == P.PrefixNode(prefix="index")
    assert parse("term~1") == P.FuzzyNode(term="term", max_edits=1)
    n = parse("quer?")
    assert isinstance(n, P.RegexpNode)
    r = parse("[index TO merge]")
    assert r == P.TermRangeNode(lower="index", upper="merge")


def test_camel_atom_splits_to_or():
    n = parse("indexWriter")
    assert isinstance(n, P.BooleanNode)
    assert {c.node.term for c in n.clauses} == {"index", "writer"}


def test_rewrite_simplifications():
    # duplicate-clause AND x AND x keeps scoring duplicates (Lucene sums
    # them); single clause unwraps
    assert parse("(index)") == P.TermNode(term="index")
    # MUST x ∧ MUST_NOT x → MatchNone
    n = P.rewrite(P.BooleanNode(clauses=(
        P.Clause(P.Occur.MUST, P.TermNode(term="a")),
        P.Clause(P.Occur.MUST_NOT, P.TermNode(term="a")),
    )))
    assert isinstance(n, P.MatchNoneNode)
    # pure negative → MatchNone
    n = P.rewrite(P.BooleanNode(clauses=(P.Clause(P.Occur.MUST_NOT, P.TermNode(term="a")),)))
    assert isinstance(n, P.MatchNoneNode)


def test_stopword_only_query_standard():
    std = get_analyzer("standard")
    n = parse_query("the of and", std)
    assert isinstance(n, P.MatchNoneNode)


def test_field_prefix_kept():
    """`field:term` keeps the field on the leaf node (classic QP field
    override, QueryParserBase.java:112-116); the searcher later resolves
    '' to the default field and unknown fields match nothing."""
    an = get_analyzer("code")
    n = parse_query("content:index", an)
    assert isinstance(n, P.TermNode) and n.term == "index" and n.field == "content"
    n = parse_query("body:ind*", an)
    assert isinstance(n, P.PrefixNode) and n.prefix == "ind" and n.field == "body"
    n = parse_query("f:term~1", an)
    assert isinstance(n, P.FuzzyNode) and n.term == "term" and n.field == "f"


def test_field_phrase_and_group():
    an = get_analyzer("code")
    n = parse_query('title:"index writer"', an)
    assert isinstance(n, P.PhraseNode) and n.field == "title" \
        and n.terms == ("index", "writer")
    n = parse_query("title:(index AND writer)", an)
    assert isinstance(n, P.BooleanNode)
    assert all(c.node.field == "title" for c in n.clauses)
    # explicit inner override wins over the group field
    n = parse_query("title:(index body:writer)", an)
    fields = {c.node.field for c in n.clauses}
    assert fields == {"title", "body"}


def test_field_analyzer_resolution():
    # per-field analyzer: 'raw' keeps case, default 'code' lowercases
    from lucene_spark.analysis import Analyzer

    raw = Analyzer(name="rawtest", token_pattern=r"\S+", lowercase=False)
    n = parse_query("raw:FooBar", get_analyzer("code"),
                    field_analyzers={"raw": raw})
    assert isinstance(n, P.TermNode) and n.term == "FooBar" and n.field == "raw"
    n = parse_query("FooBar", get_analyzer("code"),
                    field_analyzers={"raw": raw})
    assert {c.node.term for c in n.clauses} == {"foo", "bar"}


def test_near_syntax():
    n = parse("NEAR(index, writer, 3)")
    assert isinstance(n, P.IntervalNode) and not n.ordered and n.max_gaps == 3 \
        and n.terms == ("index", "writer")
    n = parse("ONEAR(index, writer)")
    assert isinstance(n, P.IntervalNode) and n.ordered and n.max_gaps == 0
    n = parse("merge AND NEAR(index, writer, 2)")
    assert isinstance(n, P.BooleanNode)
    kinds = {type(c.node) for c in n.clauses}
    assert P.IntervalNode in kinds and P.TermNode in kinds
    assert isinstance(parse("NEAR(solo)"), P.MatchNoneNode)
