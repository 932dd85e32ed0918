"""ComplexPhrase query-parser dialect — wildcards/fuzzy/groups INSIDE
quoted phrases.

Role analogue: lucene/queryparser/complexPhrase/ComplexPhraseQueryParser.java.
The reference subclasses the classic parser, records each quoted phrase on
the first pass (getFieldQuery override, :88-96), then re-parses each
phrase's CONTENTS as a mini-query scoped to the phrase's field
(:239-252) and rewrites the resulting BooleanQuery clause-by-clause into
a SpanNearQuery (:258-337): every top-level clause of the inner parse is
one span POSITION; term leaves become SpanTermQuery, multi-term leaves
(wildcard/prefix/fuzzy/range) and `(a b)` groups become SpanOr over
their expansions; the whole sequence becomes
`SpanNearQuery(slop=slopFactor, inOrder)` (:335-338, inOrder default
true, ComplexPhraseQueryParser.java:69).

Mapping here: the phrase becomes an IntervalSlotsNode — one slot per
inner clause, slot = the leaf node itself (the searcher's planner
dictionary-expands multi-term slots into TermInSetNode, the SpanOr
role), max_gaps = slopFactor, ordered = in_order. A single-clause
phrase returns the clause directly, as the reference's rewrite does
(:261-266). Like the engine's other interval queries, matches are
constant-score (the reference scores SpanNear through sloppyFreq; our
intervals are documented match-only).

Negated clauses inside a phrase ('"a -b c"') compile the reference's
SpanNot arm (:335-365): include = the positive slots at
slop + numNegatives, exclude = the full sequence at the original slop,
wrapped in SpanNotNode.

v1 restrictions (explicit errors, not silent drops):
- a phrase whose clauses are ALL negated matches nothing and is
  rejected.
- groups inside a phrase may contain only plain terms OR exactly one
  multi-term leaf (`"(a b) c*"` yes; `"(a b*) c"` no — mixed groups
  would need SpanOr over heterogeneous sub-expansions).
- a field override inside a phrase must match the phrase's field
  (checkPhraseClauseIsForSameField, :155-166 — same error here).
"""

from __future__ import annotations

from lucene_spark.analysis import Analyzer
from lucene_spark.search import plan as P
from lucene_spark.search.qparser import _Lexer, _parse_or, parse_query


class ComplexPhraseError(ValueError):
    pass


_SLOT_LEAVES = (P.TermNode, P.PrefixNode, P.RegexpNode, P.FuzzyNode,
                P.TermRangeNode, P.TermInSetNode)


def parse_complex_phrase(text: str, analyzer: Analyzer,
                         field_analyzers: dict[str, Analyzer] | None = None,
                         in_order: bool = True) -> P.Node:
    """Parse classic syntax where quoted phrases may embed wildcard /
    fuzzy / range / grouped clauses, e.g. '"(john jon) smyth*"~2'."""

    def factory(content: str, slop: int, fld: str, an: Analyzer) -> P.Node:
        return _phrase_node(content, slop, fld, an, in_order,
                            field_analyzers or {})

    return parse_query(text, analyzer, field_analyzers,
                       phrase_factory=factory)


def _phrase_node(content: str, slop: int, fld: str, an: Analyzer,
                 in_order: bool, fa: dict[str, Analyzer]) -> P.Node:
    # parse WITHOUT the engine's boolean-flattening rewrite: each
    # top-level clause (including a `(a b)` group) is one span position,
    # so group structure must survive (the reference walks the raw
    # BooleanQuery clause list, ComplexPhraseQueryParser.java:282-288)
    inner = _parse_or(_Lexer(content), an, fa)
    if inner is None:
        return P.MatchNoneNode()
    # scope unfielded leaves to the phrase's field; then verify nothing
    # escaped to another field (checkPhraseClauseIsForSameField)
    if fld:
        inner = P.apply_field(inner, fld, only_default=True)
    _check_fields(inner, fld)
    if isinstance(inner, P.MatchNoneNode):
        return inner
    if isinstance(inner, _SLOT_LEAVES) or isinstance(inner, P.PhraseNode):
        # single clause — the reference returns the contents directly
        return inner
    if not isinstance(inner, P.BooleanNode):
        raise ComplexPhraseError(
            f"unsupported query type inside phrase {content!r}: {inner!r}")
    slots: list[tuple[bool, P.Node]] = []   # (negated?, slot)
    for c in inner.clauses:
        if isinstance(c.node, P.MatchNoneNode):
            # a zero-token atom (stopword under this analyzer) — dropped,
            # exactly as the reference's inner parse drops stop tokens
            continue
        slot = _slotify(c.node, content)
        if isinstance(slot, P.MatchNoneNode):
            # a group that analyzed to nothing: the reference inserts a
            # dummy never-matching SpanTerm (rewrite():316-321) — the
            # whole phrase matches nothing
            return P.MatchNoneNode()
        slots.append((c.occur is P.Occur.MUST_NOT, slot))
    if not slots:
        return P.MatchNoneNode()
    positives = [s for neg, s in slots if not neg]
    n_neg = len(slots) - len(positives)
    if n_neg == 0:
        if len(positives) == 1:
            return positives[0]
        return P.IntervalSlotsNode(slots=tuple(positives), max_gaps=slop,
                                   ordered=in_order, field=fld)
    # mixed positives/negatives → SpanNot (ComplexPhraseQuery.rewrite:
    # 335-365): include = positives at slop + numNegatives (gaps left by
    # the removed negatives), exclude = the FULL sequence at the original
    # slop; a match is an include span not overlapping the full sequence.
    if not positives:
        raise ComplexPhraseError(
            f"phrase with only negated clauses matches nothing: {content!r}")
    if len(positives) == 1:
        inc = P.IntervalSlotsNode(slots=(positives[0],), max_gaps=0,
                                  ordered=True, field=fld)
    else:
        inc = P.IntervalSlotsNode(slots=tuple(positives),
                                  max_gaps=slop + n_neg,
                                  ordered=in_order, field=fld)
    exc = P.IntervalSlotsNode(slots=tuple(s for _, s in slots),
                              max_gaps=slop, ordered=in_order, field=fld)
    return P.SpanNotNode(include=inc, exclude=exc)


def _slotify(n: P.Node, content: str) -> P.Node:
    if isinstance(n, _SLOT_LEAVES):
        return n
    if isinstance(n, P.BooleanNode):
        leaves = [c.node for c in n.clauses
                  if not isinstance(c.node, P.MatchNoneNode)]   # stopwords
        if any(c.occur is P.Occur.MUST_NOT for c in n.clauses):
            raise ComplexPhraseError(
                f"negation inside a phrase group is not supported: {content!r}")
        if not leaves:
            return P.MatchNoneNode()
        if all(isinstance(x, P.TermNode) for x in leaves):
            fields = {x.field for x in leaves}
            if len(fields) > 1:
                raise ComplexPhraseError(
                    f"phrase group mixes fields: {content!r}")
            return P.TermInSetNode(terms=tuple(x.term for x in leaves),
                                   field=fields.pop())
        if len(leaves) == 1 and isinstance(leaves[0], _SLOT_LEAVES):
            return leaves[0]
        raise ComplexPhraseError(
            "phrase group must hold plain terms or a single multi-term "
            f"clause: {content!r}")
    raise ComplexPhraseError(
        f"unsupported clause inside phrase {content!r}: {n!r}")


def _check_fields(n: P.Node, fld: str) -> None:
    if isinstance(n, P.BooleanNode):
        for c in n.clauses:
            _check_fields(c.node, fld)
        return
    f = getattr(n, "field", None)
    if f is not None and f != fld:
        raise ComplexPhraseError(
            f'cannot have clause for field "{f}" nested in phrase for '
            f'field "{fld or "<default>"}"')
