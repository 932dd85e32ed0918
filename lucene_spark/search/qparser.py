"""Classic query parser (subset) — string → plan tree.

Role analogue: lucene/queryparser classic grammar (QueryParser.jj,
QueryParserBase.java). Supported subset: bare terms, AND/OR/NOT (and
&&/||/!), +term / -term, parentheses, boost `term^2`, prefix `term*`,
wildcard `te?m`/`t*m`, fuzzy `term~1`, range `[a TO b]` / `{a TO b}`,
term sets via `IN(a,b,c)` (engine extension), and FIELD-QUALIFIED queries:
`field:term`, `field:"a phrase"`, `field:(a AND b)` — the classic parser's
field override (QueryParserBase.java:112-116); the field name stays on the
produced leaf nodes (field='' = default field, resolved by the searcher)
and query text is analyzed with THAT field's analyzer when a
`field_analyzers` registry is supplied (PerFieldAnalyzerWrapper role).

Parity notes:
- the DEFAULT OPERATOR IS OR: `a b` parses as `a OR b`
  (queryparser/classic/QueryParserBase.java:59-64)
- query text runs through the same analyzer as the index
- NOT binds tighter than AND/OR; AND binds tighter than OR.
  DOCUMENTED DIVERGENCE: this is the PrecedenceQueryParser behavior
  (queryparser/flexible/precedence/PrecedenceQueryParser.java — "AND
  has higher precedence than OR"), chosen deliberately over the classic
  parser's flat left-to-right clause building, where `a AND b OR c`
  yields the single BooleanQuery `+a +b c` (b both MUST'ed by the AND
  and followed by a SHOULD c — widely considered a trap; the flexible
  parser exists to fix it). Here `a AND b OR c` = `(+a +b) c`, i.e. a
  doc matching only c qualifies. Every SQL oracle mirrors this
  precedence reading.
"""

from __future__ import annotations

import re

from lucene_spark.analysis import Analyzer
from lucene_spark.search.plan import (
    AND,
    BooleanNode,
    Clause,
    FuzzyNode,
    MatchNoneNode,
    Node,
    Occur,
    PhraseNode,
    PrefixNode,
    RegexpNode,
    TermInSetNode,
    TermNode,
    TermRangeNode,
    rewrite,
)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<and>AND\b|&&)
      | (?P<or>OR\b|\|\|)
      | (?P<not>NOT\b|!)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<range>[\[{][^\]}]+\s+TO\s+[^\]}]+[\]}])
      | (?P<inset>IN\([^)]*\))
      | (?P<near>O?NEAR\([^)]*\))
      | (?P<quoted>"[^"]*")
      | (?P<atom>[^\s()!+\-"][^\s()"]*)
    )""",
    re.VERBOSE,
)


class _Lexer:
    def __init__(self, text: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                break
            pos = m.end()
            for kind, val in m.groupdict().items():
                if val is not None:
                    self.tokens.append((kind, val))
                    break
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> tuple[str, str] | None:
        t = self.peek()
        if t is not None:
            self.i += 1
        return t


def _analyze_one(text: str, analyzer: Analyzer) -> list[str]:
    # scalar chain: per-term parsing cost matters — a 24k-query serving
    # batch analyzes ~50k terms per cold pass, and the pandas Series
    # route costs ~3 ms per call (driver-serial; measured 60 s/pass)
    return analyzer.tokenize_one(text)


def parse_query(text: str, analyzer: Analyzer,
                field_analyzers: dict[str, Analyzer] | None = None,
                phrase_factory=None) -> Node:
    """Parse classic syntax into a rewritten plan tree.

    phrase_factory: optional hook `(content, slop, field, analyzer) -> Node`
    replacing the default quoted-phrase handling — the getFieldQuery
    override point dialect parsers use (ComplexPhraseQueryParser
    subclasses the classic parser exactly this way,
    queryparser/complexPhrase/ComplexPhraseQueryParser.java:88-96)."""
    lx = _Lexer(text)
    node = _parse_or(lx, analyzer, field_analyzers or {}, phrase_factory)
    return rewrite(node if node is not None else MatchNoneNode())


def _parse_or(lx: _Lexer, an: Analyzer, fa: dict[str, Analyzer] = {},
              pf=None) -> Node | None:
    left, lmod = _parse_and(lx, an, fa, pf)
    clauses: list[Clause] = []
    while True:
        t = lx.peek()
        if t is None or t[0] == "rparen":
            break
        if t[0] == "or":
            lx.next()
        # else: juxtaposition — default operator OR (QueryParserBase.java:59-64)
        right, rmod = _parse_and(lx, an, fa, pf)
        if right is None:
            break
        if not clauses:
            if left is None:
                left, lmod = right, rmod
                continue
            clauses = _mod_clauses(left, lmod, Occur.SHOULD)
        clauses.extend(_mod_clauses(right, rmod, Occur.SHOULD))
    if clauses:
        return BooleanNode(clauses=tuple(clauses))
    if left is not None and lmod is not None:
        # a lone modified item ('+a' / '-a') keeps its modifier through a
        # wrapper boolean (QueryParserBase.addClause); rewrite unwraps a
        # single-MUST wrapper exactly like BooleanQuery.rewrite does
        return BooleanNode(clauses=(Clause(lmod, left),))
    return left


def _mod_clauses(node: Node, mod: Occur | None, default: Occur) -> list[Clause]:
    """Clause list for one parsed item at a boolean level: an explicit
    +/-/NOT modifier seen AT PARSE TIME wins over the level's default
    operator (QueryParserBase.addClause MOD_REQ/MOD_NOT — the classic
    '+a b c' = MUST(a) SHOULD(b) SHOULD(c)). A parenthesized group has
    no modifier — '(+a) b' keeps the group as an ordinary SHOULD clause,
    unlike '+a b' — so the modifier is tracked beside the node rather
    than pattern-matched from the built tree."""
    if mod is not None:
        return [Clause(mod, node)]
    return _as_clauses(node, default)


def _as_clauses(node: Node, occur: Occur) -> list[Clause]:
    if isinstance(node, BooleanNode) and node.boost == 1.0 and all(
        c.occur in (Occur.MUST_NOT,) for c in node.clauses
    ):
        # bare negation at this level keeps its MUST_NOT clauses
        return list(node.clauses)
    return [Clause(occur, node)]


def _parse_and(lx: _Lexer, an: Analyzer, fa: dict[str, Analyzer] = {},
               pf=None) -> tuple[Node | None, Occur | None]:
    left, lmod = _parse_unary(lx, an, fa, pf)
    clauses: list[Clause] = []
    while True:
        t = lx.peek()
        if t is None or t[0] != "and":
            break
        lx.next()
        right, rmod = _parse_unary(lx, an, fa, pf)
        if right is None:
            break
        if not clauses:
            if left is None:
                left, lmod = right, rmod
                continue
            clauses = _mod_clauses(left, lmod, Occur.MUST)
        clauses.extend(_mod_clauses(right, rmod, Occur.MUST))
    if clauses:
        # promote bare SHOULDs that came from _as_clauses of negations
        fixed = [Clause(Occur.MUST, c.node) if c.occur is Occur.SHOULD else c for c in clauses]
        return BooleanNode(clauses=tuple(fixed)), None
    return left, lmod


def _parse_unary(lx: _Lexer, an: Analyzer, fa: dict[str, Analyzer] = {},
                 pf=None) -> tuple[Node | None, Occur | None]:
    t = lx.peek()
    if t is None:
        return None, None
    kind, _ = t
    if kind in ("not", "minus"):
        lx.next()
        child, _ = _parse_unary(lx, an, fa, pf)
        if child is None:
            return None, None
        return child, Occur.MUST_NOT
    if kind == "plus":
        lx.next()
        child, inner = _parse_unary(lx, an, fa, pf)
        if child is None:
            return None, None
        # '+-a': the negation wins (MOD_NOT is terminal in the classic lexer)
        return child, (Occur.MUST_NOT if inner is Occur.MUST_NOT else Occur.MUST)
    return _parse_primary(lx, an, fa, pf), None


_BOOST_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"^(.*?)~(\d*)$")


def _parse_quoted(lx: _Lexer, val: str, an: Analyzer, fld: str = "",
                  pf=None) -> Node:
    """"..." → PhraseQuery (QueryParserBase.getFieldQuery with quoted=true);
    optional ~slop suffix → sloppy matching. Single-term phrase rewrites to
    TermQuery (PhraseQuery rewrite)."""
    slop = 0
    nxt = lx.peek()
    if nxt is not None and nxt[0] == "atom" and nxt[1].startswith("~"):
        digits = nxt[1][1:]
        if digits.isdigit():
            slop = int(digits)
            lx.next()
    if pf is not None:
        return pf(val[1:-1], slop, fld, an)
    toks = _analyze_one(val[1:-1], an)
    if not toks:
        return MatchNoneNode()
    if len(toks) == 1:
        return TermNode(term=toks[0], field=fld)
    return PhraseNode(terms=tuple(toks), slop=slop, field=fld)


_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$")


def _parse_primary(lx: _Lexer, an: Analyzer, fa: dict[str, Analyzer] = {},
                   pf=None) -> Node | None:
    t = lx.next()
    if t is None:
        return None
    kind, val = t
    if kind == "lparen":
        inner = _parse_or(lx, an, fa, pf)
        nxt = lx.peek()
        if nxt is not None and nxt[0] == "rparen":
            lx.next()
        node = inner if inner is not None else MatchNoneNode()
        return node
    if kind == "rparen":
        return None
    if kind == "range":
        inc_lo = val[0] == "["
        inc_hi = val[-1] == "]"
        lo, hi = re.split(r"\s+TO\s+", val[1:-1].strip())
        lo_t = None if lo == "*" else (_analyze_one(lo, an) or [lo])[0]
        hi_t = None if hi == "*" else (_analyze_one(hi, an) or [hi])[0]
        return TermRangeNode(lower=lo_t, upper=hi_t, include_lower=inc_lo, include_upper=inc_hi)
    if kind == "inset":
        raw = [s.strip() for s in val[3:-1].split(",") if s.strip()]
        terms: list[str] = []
        for r in raw:
            terms.extend(_analyze_one(r, an) or [])
        return TermInSetNode(terms=tuple(sorted(set(terms))))
    if kind == "near":
        # NEAR(a, b[, maxgaps]) / ONEAR(...) — interval-query surface
        # (queries/intervals Intervals.unordered / Intervals.ordered with
        # maxgaps; engine extension syntax, there is no classic-QP form)
        ordered = val.startswith("O")
        body = val[val.index("(") + 1:-1]
        parts = [x.strip() for x in body.split(",") if x.strip()]
        max_gaps = 0
        if parts and parts[-1].lstrip("-").isdigit():
            max_gaps = int(parts[-1])
            parts = parts[:-1]
        terms: list[str] = []
        for x in parts:
            terms.extend(_analyze_one(x, an) or [])
        if len(terms) < 2:
            return MatchNoneNode()
        from lucene_spark.search.plan import IntervalNode

        return IntervalNode(terms=tuple(terms), max_gaps=max_gaps, ordered=ordered)
    if kind == "quoted":
        return _parse_quoted(lx, val, an, pf=pf)
    # atom: field override / boost / fuzzy / wildcard / prefix / plain term.
    # `field:term` (classic QP field override, QueryParserBase.java:112-116):
    # the field name is kept on the leaf node and the term analyzed with
    # that field's analyzer; `field:"phrase"` and `field:(group)` scope the
    # following quoted/parenthesized expression to the field.
    fld = ""
    m = _FIELD_RE.match(val)
    if m:
        fld, rest = m.group(1), m.group(2)
        if rest == "":
            nxt = lx.peek()
            if nxt is not None and nxt[0] == "quoted":
                lx.next()
                return _parse_quoted(lx, nxt[1], fa.get(fld, an), fld, pf=pf)
            if nxt is not None and nxt[0] == "lparen":
                lx.next()
                inner = _parse_or(lx, fa.get(fld, an), fa, pf)
                nn = lx.peek()
                if nn is not None and nn[0] == "rparen":
                    lx.next()
                if inner is None:
                    return MatchNoneNode()
                # scope every still-unfielded leaf of the group to fld
                # (explicit inner overrides win — QP field scoping)
                from lucene_spark.search.plan import apply_field

                return apply_field(inner, fld, only_default=True)
            return MatchNoneNode()
        val = rest
    a = fa.get(fld, an) if fld else an
    boost = 1.0
    m = _BOOST_RE.match(val)
    if m:
        val, boost = m.group(1), float(m.group(2))
    m = _FUZZY_RE.match(val)
    if m and "~" in val:
        base = m.group(1)
        edits = int(m.group(2)) if m.group(2) else 2
        toks = _analyze_one(base, a)
        term = toks[0] if toks else base.lower()
        return FuzzyNode(term=term, max_edits=edits, boost=boost, field=fld)
    if val.endswith("*") and "*" not in val[:-1] and "?" not in val:
        base = val[:-1]
        toks = _analyze_one(base, a) if base else []
        prefix = toks[0] if toks else base.lower()
        return PrefixNode(prefix=prefix, boost=boost, field=fld)
    if "*" in val or "?" in val:
        # wildcard → anchored regex over the dictionary (WildcardQuery.java)
        from lucene_spark.search.plan import wildcard_regexp

        return RegexpNode(pattern=wildcard_regexp(val), boost=boost, field=fld)
    toks = _analyze_one(val, a)
    if not toks:
        return MatchNoneNode()
    if len(toks) == 1:
        return TermNode(term=toks[0], boost=boost, field=fld)
    # analyzer split one atom into several terms (e.g. camelCase) → OR them,
    # matching classic QP's default-OR for multi-token text
    inner = tuple(Clause(Occur.SHOULD, TermNode(term=tk, field=fld)) for tk in toks)
    return BooleanNode(clauses=inner, boost=boost)
