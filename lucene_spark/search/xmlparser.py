"""XML query parser — CoreParser element set → plan tree.

Role analogue: lucene/queryparser/xml/CoreParser.java (builder registry
at :72-116) and xml/builders/*.java. Queries arrive as an XML document
whose element names select query types and whose attributes carry
parameters; `fieldName` is inherited from ancestor elements
(DOMUtils.getAttributeWithInheritance), `boost` defaults to 1.0.

Supported elements (builder file → mapping):
- TermQuery          (TermQueryBuilder.java)        → TermNode (raw text,
  NOT analyzed — the reference takes the element text verbatim)
- TermsQuery         (TermsQueryBuilder.java)       → analyzed text →
  SHOULD-of-terms BooleanNode with minimumNumberShouldMatch
- MatchAllDocsQuery  (MatchAllDocsQueryBuilder.java)→ MatchAllNode
- BooleanQuery       (BooleanQueryBuilder.java)     → BooleanNode;
  <Clause occurs="should|must|mustNot|filter"> children
- RangeQuery         (RangeQueryBuilder.java)       → TermRangeNode
  (lowerTerm/upperTerm attrs, includeLower/includeUpper default true;
  empty attr = open end, as TermRangeQuery.newStringRange with null)
- DisjunctionMaxQuery(DisjunctionMaxQueryBuilder.java)→ DisjunctionMaxNode
  (tieBreaker attr, default 0)
- ConstantScoreQuery (ConstantScoreQueryBuilder.java)→ ConstantScoreNode
- UserQuery          (UserInputQueryBuilder.java)   → classic-parser parse
  of the element text (fieldName attr overrides the default field)
- SpanTerm           (SpanTermBuilder.java)         → TermNode
- SpanOr / SpanOrTerms (SpanOrBuilder/SpanOrTermsBuilder.java) →
  TermInSetNode (SpanOr over term-level clauses; analyzed for SpanOrTerms)
- SpanNear           (SpanNearBuilder.java)         → IntervalSlotsNode
  (slop attr → max_gaps, inOrder attr default FALSE → ordered)
- SpanFirst / SpanPositionRange (SpanFirstBuilder.java,
  SpanPositionRangeBuilder.java) → IntervalSlotsNode min_start/max_end
- SpanNot            (SpanNotBuilder.java)          → SpanNotNode
- PointRangeQuery    (PointRangeQueryBuilder.java)  → DocValuesRangeNode

Rejected with ParserException-style errors (documented v1 bounds):
BoostingTermQuery (payload scoring — payloads are not indexed here),
FuzzyLikeThisQuery / LikeThisQuery (use MoreLikeThis on the searcher
instead). Unknown element names raise, matching
QueryBuilderFactory.getQueryBuilder's failure mode.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_spark.analysis import Analyzer
from lucene_spark.search import plan as P
from lucene_spark.search.qparser import _analyze_one, parse_query


class XmlParserError(ValueError):
    """ParserException analogue (xml/ParserException.java)."""


_REJECTED = {
    "BoostingTermQuery": "payload scoring is not supported (no payloads indexed)",
    "FuzzyLikeThisQuery": "use searcher fuzzy queries / MoreLikeThis",
    "LikeThisQuery": "use IndexSearcher.more_like_this",
}


def parse_xml_query(xml_text: str, analyzer: Analyzer,
                    field_analyzers: dict[str, Analyzer] | None = None,
                    default_field: str = "") -> P.Node:
    """Parse a CoreParser-dialect XML query string into a plan tree."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise XmlParserError(f"malformed query XML: {e}") from e
    ctx = _Ctx(analyzer, field_analyzers or {}, default_field)
    return P.rewrite(_build(root, ctx, inherited_field=""))


class _Ctx:
    def __init__(self, an: Analyzer, fa: dict[str, Analyzer], default_field: str):
        self.an = an
        self.fa = fa
        self.default_field = default_field

    def analyzer_for(self, field: str) -> Analyzer:
        return self.fa.get(field, self.an)


def _num(e: ET.Element, attr: str, default: str, conv=float):
    """Numeric attribute with the ParserException-analogue error contract:
    a malformed value raises XmlParserError, never a bare ValueError
    (CoreParser wraps NumberFormatException the same way)."""
    raw = e.get(attr, default)
    try:
        return conv(raw)
    except ValueError as exc:
        raise XmlParserError(
            f"Error: {e.tag} attribute {attr!r} is not a number: {raw!r}"
        ) from exc


def _boost(e: ET.Element) -> float:
    return _num(e, "boost", "1.0")


def _field(e: ET.Element, inherited: str, required: bool = True) -> str:
    f = e.get("fieldName", inherited)
    if not f and required:
        raise XmlParserError(
            f"Error: {e.tag} missing \"fieldName\" property")
    return f


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise XmlParserError(f"Error: {e.tag} has no text")
    return t


def _children(e: ET.Element) -> list[ET.Element]:
    return list(e)


def _build(e: ET.Element, ctx: _Ctx, inherited_field: str) -> P.Node:
    tag = e.tag
    if tag in _REJECTED:
        raise XmlParserError(f"{tag} is not supported: {_REJECTED[tag]}")
    fld_attr = e.get("fieldName")
    inherited = fld_attr if fld_attr is not None else inherited_field

    if tag == "TermQuery":
        return P.TermNode(term=_text(e), field=_field(e, inherited_field),
                          boost=_boost(e))
    if tag == "TermsQuery":
        fld = _field(e, inherited_field)
        toks = _analyze_one(_text(e), ctx.analyzer_for(fld))
        if not toks:
            return P.MatchNoneNode()
        msm = _num(e, "minimumNumberShouldMatch", "0", int)
        return P.BooleanNode(
            clauses=tuple(P.Clause(P.Occur.SHOULD, P.TermNode(term=t, field=fld))
                          for t in toks),
            minimum_should_match=msm, boost=_boost(e))
    if tag == "MatchAllDocsQuery":
        return P.MatchAllNode()
    if tag == "BooleanQuery":
        clauses: list[P.Clause] = []
        for kid in _children(e):
            if kid.tag != "Clause":
                continue
            occ = _occurs(kid)
            sub = _children(kid)
            if not sub:
                raise XmlParserError("Clause element with no child query")
            clauses.append(P.Clause(occ, _build(sub[0], ctx, inherited)))
        msm = _num(e, "minimumNumberShouldMatch", "0", int)
        return P.BooleanNode(clauses=tuple(clauses),
                             minimum_should_match=msm, boost=_boost(e))
    if tag == "RangeQuery":
        fld = _field(e, inherited_field)
        lo = e.get("lowerTerm") or None
        hi = e.get("upperTerm") or None
        return P.TermRangeNode(
            lower=lo, upper=hi,
            include_lower=e.get("includeLower", "true").lower() == "true",
            include_upper=e.get("includeUpper", "true").lower() == "true",
            field=fld, boost=_boost(e))
    if tag == "DisjunctionMaxQuery":
        kids = tuple(_build(k, ctx, inherited) for k in _children(e))
        return P.DisjunctionMaxNode(
            children=kids, tie_breaker=_num(e, "tieBreaker", "0.0"),
            boost=_boost(e))
    if tag == "ConstantScoreQuery":
        kids = _children(e)
        if not kids:
            raise XmlParserError("ConstantScoreQuery with no child query")
        return P.ConstantScoreNode(child=_build(kids[0], ctx, inherited),
                                   boost=_boost(e))
    if tag == "UserQuery":
        fld = e.get("fieldName", ctx.default_field)
        node = parse_query((e.text or "").strip(), ctx.analyzer_for(fld), ctx.fa)
        if fld:
            node = P.apply_field(node, fld, only_default=True)
        b = _boost(e)
        if b != 1.0:
            from dataclasses import replace

            node = replace(node, boost=node.boost * b)
        return node
    if tag == "SpanTerm":
        return P.TermNode(term=_text(e), field=_field(e, inherited_field),
                          boost=_boost(e))
    if tag == "SpanOr":
        terms, fields = [], set()
        for kid in _children(e):
            sub = _build_span_leaf(kid, ctx, inherited)
            terms.extend(sub[0])
            fields.add(sub[1])
        fields.discard("")
        if len(fields) > 1:
            raise XmlParserError("SpanOr clauses mix fields")
        return P.TermInSetNode(terms=tuple(terms),
                               field=fields.pop() if fields else inherited,
                               boost=_boost(e))
    if tag == "SpanOrTerms":
        fld = _field(e, inherited_field)
        toks = _analyze_one(_text(e), ctx.analyzer_for(fld))
        if not toks:
            return P.MatchNoneNode()
        return P.TermInSetNode(terms=tuple(dict.fromkeys(toks)), field=fld,
                               boost=_boost(e))
    if tag == "SpanNear":
        slop = e.get("slop")
        if slop is None:
            raise XmlParserError("Error: SpanNear missing \"slop\" property")
        ordered = e.get("inOrder", "false").lower() == "true"
        slots: list[P.Node] = []
        fields: set[str] = set()
        for kid in _children(e):
            node = _build(kid, ctx, inherited)
            if isinstance(node, P.MatchNoneNode):
                # a span clause matching nothing (e.g. SpanOrTerms whose
                # text analyzed to zero terms) makes the whole SpanNear
                # match nothing
                return P.MatchNoneNode()
            if isinstance(node, (P.TermNode, P.TermInSetNode)):
                slots.append(node)
                if node.field:
                    fields.add(node.field)
            else:
                raise XmlParserError(
                    f"SpanNear clause must be SpanTerm/SpanOr/SpanOrTerms "
                    f"in this engine, got <{kid.tag}>")
        if len(fields) > 1:
            raise XmlParserError("SpanNear clauses mix fields")
        fld = fields.pop() if fields else inherited
        if len(slots) < 2:
            raise XmlParserError("SpanNear needs >= 2 clauses")
        return P.IntervalSlotsNode(slots=tuple(slots), max_gaps=_num(e, "slop", slop, int),
                                   ordered=ordered, field=fld,
                                   boost=_boost(e))
    if tag in ("SpanFirst", "SpanPositionRange"):
        # SpanFirstBuilder.java / SpanPositionRangeBuilder.java: bound the
        # matched span's position window — SpanFirst(q, end) is the
        # start=0 case. Compiled to IntervalSlotsNode min_start/max_end.
        start = _num(e, "start", "0", int) if tag == "SpanPositionRange" else 0
        end = _num(e, "end", "1", int)
        kids = _children(e)
        if not kids:
            raise XmlParserError(f"{tag} with no child span")
        child = _build(kids[0], ctx, inherited)
        if isinstance(child, P.MatchNoneNode):
            return child
        if isinstance(child, (P.TermNode, P.TermInSetNode)):
            child = P.IntervalSlotsNode(
                slots=(child,), max_gaps=0, ordered=True,
                field=child.field)
        if not isinstance(child, P.IntervalSlotsNode):
            raise XmlParserError(
                f"{tag} child must be a span query, got <{kids[0].tag}>")
        from dataclasses import replace

        new_end = end if child.max_end is None else min(end, child.max_end)
        return replace(child, min_start=max(start, child.min_start),
                       max_end=new_end, boost=_boost(e))
    if tag == "PointRangeQuery":
        # PointRangeQueryBuilder.java:75-105: fieldName + lowerTerm/
        # upperTerm (absent = open end) + type ∈ {int,long,float,double}.
        # Maps to DocValuesRangeNode over the docstats column of that
        # name (the searcher lowers it to a pushed-down parquet range
        # predicate — the BKD-tree role); usable alone or as a FILTER
        # clause of the top boolean.
        fld = _field(e, inherited_field)
        typ = e.get("type", "int").lower()
        if typ not in ("int", "long", "float", "double"):
            raise XmlParserError(
                "type attribute must be one of: [long, int, double, float]")
        conv = int if typ in ("int", "long") else float
        try:
            lo = conv(e.get("lowerTerm")) if e.get("lowerTerm") else None
            hi = conv(e.get("upperTerm")) if e.get("upperTerm") else None
        except ValueError as exc:
            raise XmlParserError(
                "Could not parse lowerTerm or upperTerm into a number") from exc
        return P.DocValuesRangeNode(column=fld, lower=lo, upper=hi,
                                    boost=_boost(e))
    if tag == "KnnVectorQuery":
        # vector-field top-k (KnnVectorQuery role; no reference XML
        # builder exists — attribute shape mirrors PointRangeQuery's):
        # <KnnVectorQuery fieldName="emb" k="10" ef="64">0.1 0.2 ...
        # </KnnVectorQuery>; ef absent = exact (beam saturates)
        fld = _field(e, inherited_field)
        try:
            vec = tuple(float(x) for x in _text(e).split())
        except ValueError as exc:
            raise XmlParserError(
                "KnnVectorQuery text must be whitespace-separated floats"
            ) from exc
        if not vec:
            raise XmlParserError("KnnVectorQuery requires a query vector")
        k = _num(e, "k", "10", int)
        ef = _num(e, "ef", "0", int) or None
        return P.KnnVectorNode(field=fld, vector=vec, k=k, ef=ef,
                               boost=_boost(e))
    if tag == "SpanNot":
        # SpanNotBuilder.java: <Include>/<Exclude> child elements, each
        # wrapping one span query → SpanNotQuery(include, exclude)
        inc_e = _named_child(e, "Include")
        exc_e = _named_child(e, "Exclude")
        inc = _as_span(_build(_first(inc_e, "Include"), ctx, inherited),
                       "Include")
        if isinstance(inc, P.MatchNoneNode):
            return inc
        exc = _as_span(_build(_first(exc_e, "Exclude"), ctx, inherited),
                       "Exclude")
        return P.SpanNotNode(include=inc, exclude=exc, boost=_boost(e))
    raise XmlParserError(f"No QueryObjectBuilder defined for node {tag}")


def _named_child(e: ET.Element, name: str) -> ET.Element:
    for kid in _children(e):
        if kid.tag == name:
            return kid
    raise XmlParserError(f"SpanNot missing <{name}> element")


def _first(e: ET.Element, name: str) -> ET.Element:
    kids = _children(e)
    if not kids:
        raise XmlParserError(f"<{name}> element with no child query")
    return kids[0]


def _as_span(node: P.Node, role: str) -> P.Node:
    """Coerce a built child into span form (single terms wrap into a
    one-slot interval, as SpanFirst does). A MatchNoneNode child passes
    through; SpanNot's caller treats a MatchNone INCLUDE as match-none
    and a MatchNone EXCLUDE as excluding nothing."""
    if isinstance(node, P.MatchNoneNode):
        return node
    if isinstance(node, (P.TermNode, P.TermInSetNode)):
        return P.IntervalSlotsNode(slots=(node,), max_gaps=0, ordered=True,
                                   field=node.field)
    if isinstance(node, (P.IntervalSlotsNode, P.SpanNotNode)):
        if isinstance(node, P.SpanNotNode):
            raise XmlParserError(f"nested SpanNot under {role} is not supported")
        return node
    raise XmlParserError(f"{role} child must be a span query")


def _build_span_leaf(e: ET.Element, ctx: _Ctx,
                     inherited: str) -> tuple[list[str], str]:
    """A SpanOr child → (terms, field). Only term-level spans supported."""
    node = _build(e, ctx, inherited)
    if isinstance(node, P.TermNode):
        return [node.term], node.field
    if isinstance(node, P.TermInSetNode):
        return list(node.terms), node.field
    raise XmlParserError(
        f"SpanOr clause must be term-level in this engine, got <{e.tag}>")


def _occurs(clause: ET.Element) -> P.Occur:
    occs = clause.get("occurs", "should")
    low = occs.lower()
    if low == "should":
        return P.Occur.SHOULD
    if low == "must":
        return P.Occur.MUST
    if low == "mustnot":
        return P.Occur.MUST_NOT
    if low == "filter":
        return P.Occur.FILTER
    raise XmlParserError(
        f"Invalid value for \"occurs\" attribute of clause: {occs}")
