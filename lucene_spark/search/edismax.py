"""eDisMax query parser — Solr's default search parser, restated.

Role analogue: solr/core/src/java/org/apache/solr/search/
ExtendedDismaxQParser.java (and DisMaxQParser.java for the shared
mm/tie/pf machinery). The reference's trick is structural, not
grammatical: the user query is parsed by the ORDINARY Lucene grammar
with an impossible default field, and every default-field leaf is then
ALIASED to a tie-broken DisjunctionMaxQuery over the `qf` fields
(ExtendedDismaxQParser.java:151 `up.addAlias(IMPOSSIBLE_FIELD_NAME,
config.tiebreaker, config.queryFields)`). We reproduce exactly that
shape over the plan tree: parse with the classic parser (default field
''), then rewrite each still-unfielded leaf into a DisjunctionMaxNode
whose children are per-field copies carrying the qf boosts.

Feature map (reference → here):
- qf          per-field boosts on the dismax children (addAlias)
- tie         DisjunctionMaxNode.tie_breaker
- mm          SolrPluginUtils.calculateMinShouldMatch:670-711 —
              absolute / negative / percent / conditional `n<spec`
              chains, applied to the top boolean's SHOULD count
              (setMinShouldMatch:616-642)
- pf/pf2/pf3  addShingledPhraseQueries:605-650 — whole-query phrase,
              bigram and trigram shingles over the *normal* (bare-term,
              non-negated) clause sequence, each shingle a dismax over
              its field group, added as SHOULD siblings of the main
              query (the main query becomes a MUST clause)
- ps/ps2/ps3  per-gram-size phrase slop (ps2/ps3 default to ps,
              ExtendedDismaxQParser.java:307-313)
- bq          additive SHOULD boost queries (:566-570)
- bf/boost    additive / multiplicative function boosts are the
              searcher-level `function_score` composition
              (search/features.py) — out of the parser's scope here,
              exactly as the reference delegates them to FunctionQParser

Divergence (documented): the reference re-analyzes the raw term text
per target field; the classic parse here analyzes once with the default
analyzer, so qf fields are assumed to share the analysis chain (the
overwhelmingly common Solr setup). Explicitly fielded syntax
(`lang:en`) still resolves per-field analyzers through the classic
parser's field_analyzers registry.
"""

from __future__ import annotations

import re
from dataclasses import replace

from lucene_spark.analysis import Analyzer
from lucene_spark.search.plan import (
    BooleanNode,
    Clause,
    ConstantScoreNode,
    DisjunctionMaxNode,
    FieldedNode,
    MatchNoneNode,
    Node,
    Occur,
    PhraseNode,
    TermNode,
    rewrite,
)
from lucene_spark.search.qparser import parse_query

_COND_RE = re.compile(r"\s*<\s*")


def calculate_min_should_match(optional_clause_count: int, spec: str) -> int:
    """SolrPluginUtils.calculateMinShouldMatch:670-711, exactly:
    conditional chains `ub<spec ub<spec ...` pick the spec of the first
    bound the clause count exceeds; `-n` / `-p%` subtract from the
    count; results clamp to [0, optional_clause_count]."""
    result = optional_clause_count
    spec = spec.strip()
    if "<" in spec:
        spec = _COND_RE.sub("<", spec)
        for s in spec.split():
            parts = s.split("<")
            if len(parts) < 2 or not parts[0] or not parts[1]:
                raise ValueError(f"invalid mm spec {s!r}: need values before and after '<'")
            upper_bound = int(parts[0])
            if optional_clause_count <= upper_bound:
                return result
            result = calculate_min_should_match(optional_clause_count, parts[1])
        return result
    if "%" in spec:
        percent = int(spec[: spec.rindex("%")])
        calc = (result * percent) / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    if optional_clause_count < result:
        return optional_clause_count
    return 0 if result < 0 else result


def _alias(node: Node, qf: dict[str, float], tie: float) -> Node:
    """addAlias expansion over the plan tree: each unfielded leaf becomes
    dismax(per-field copies × qf boosts). Single-field qf skips the
    dismax wrapper (the reference's DisjunctionMaxQuery of one clause is
    score-identical; the plan stays smaller)."""
    if isinstance(node, BooleanNode):
        return replace(node, clauses=tuple(
            Clause(c.occur, _alias(c.node, qf, tie)) for c in node.clauses))
    if isinstance(node, DisjunctionMaxNode):
        return replace(node, children=tuple(
            _alias(c, qf, tie) for c in node.children))
    if isinstance(node, ConstantScoreNode) and node.child is not None:
        return replace(node, child=_alias(node.child, qf, tie))
    if isinstance(node, FieldedNode) and not node.field:
        items = list(qf.items())
        if len(items) == 1:
            f, b = items[0]
            return replace(node, field=f, boost=node.boost * b)
        return DisjunctionMaxNode(
            children=tuple(replace(node, field=f, boost=b) for f, b in items),
            tie_breaker=tie, boost=node.boost)
    return node


def _normal_terms(node: Node) -> list[str]:
    """The pf term sequence: bare (unfielded, un-negated, non-phrase)
    term texts of the parsed user query in order —
    ExtendedDismaxQParser.getNormalClauses restated on the plan tree.
    A single-term query parses to a bare TermNode; multi-term to a
    BooleanNode whose clauses we scan one level deep."""
    if isinstance(node, TermNode) and not node.field:
        return [node.term]
    out: list[str] = []
    if isinstance(node, BooleanNode):
        for c in node.clauses:
            if c.occur is Occur.MUST_NOT:
                continue
            if isinstance(c.node, TermNode) and not c.node.field:
                out.append(c.node.term)
    return out


def _shingle_phrases(terms: list[str], fields: dict[str, float], size: int,
                     slop: int, tie: float) -> list[Node]:
    """addShingledPhraseQueries:605-650 — one phrase per consecutive
    `size`-gram, each a dismax over the field group. size=0 means the
    whole query as one phrase (the pf behavior)."""
    if size == 0:
        grams = [terms] if len(terms) > 1 else []
    else:
        grams = [terms[i:i + size] for i in range(len(terms) - size + 1)
                 ] if len(terms) > size - 1 and size > 1 else []
        grams = [g for g in grams if len(g) == size]
    out: list[Node] = []
    for g in grams:
        legs = tuple(
            PhraseNode(terms=tuple(g), slop=slop, field=f, boost=b)
            for f, b in fields.items())
        if len(legs) == 1:
            out.append(legs[0])
        else:
            out.append(DisjunctionMaxNode(children=legs, tie_breaker=tie))
    return out


def parse_edismax(
    q: str,
    qf: dict[str, float],
    analyzer: Analyzer,
    *,
    field_analyzers: dict[str, Analyzer] | None = None,
    mm: str | None = None,
    tie: float = 0.0,
    pf: dict[str, float] | None = None,
    pf2: dict[str, float] | None = None,
    pf3: dict[str, float] | None = None,
    ps: int = 0,
    ps2: int | None = None,
    ps3: int | None = None,
    bq: tuple[Node, ...] = (),
) -> Node:
    """Parse an eDisMax request into a plan Node.

    q is classic-parser syntax (terms, quoted phrases, +/-, AND/OR/NOT,
    parens, fielded overrides); qf maps field → boost. Returns the tree
    the reference builds in ExtendedDismaxQParser.parse():142-180 +
    addPhraseFieldQueries: the aliased user query (with mm applied to
    its top-level SHOULD count), wrapped — when pf/bq clauses exist —
    in BooleanQuery{MUST(user), SHOULD(phrase/bq...)}."""
    if not qf:
        raise ValueError("edismax requires at least one qf field")
    parsed = parse_query(q, analyzer, field_analyzers)
    if isinstance(parsed, MatchNoneNode):
        return parsed

    pf_terms = _normal_terms(parsed)
    main = _alias(parsed, qf, tie)

    if mm is not None and isinstance(main, BooleanNode):
        optional = sum(1 for c in main.clauses if c.occur is Occur.SHOULD)
        msm = calculate_min_should_match(optional, mm)
        if msm > 0:
            main = replace(main, minimum_should_match=msm)

    extras: list[Node] = []
    if pf:
        extras += _shingle_phrases(pf_terms, pf, 0, ps, tie)
    if pf2:
        extras += _shingle_phrases(pf_terms, pf2, 2, ps if ps2 is None else ps2, tie)
    if pf3:
        extras += _shingle_phrases(pf_terms, pf3, 3, ps if ps3 is None else ps3, tie)
    extras += list(bq)

    if extras:
        main = BooleanNode(clauses=(
            Clause(Occur.MUST, main),
            *(Clause(Occur.SHOULD, e) for e in extras)))
    return rewrite(main)
