"""Surround query-language parser — span/proximity algebra dialect.

Role analogue: lucene/queryparser/surround/parser/QueryParser.jj and
queryparser/surround/query/ (SrndQuery, DistanceQuery, SrndTruncQuery,
SrndBooleanQuery). The surround language exposes Lucene's span algebra
as text: infix `a W b` (ordered adjacency), `a N b` (unordered),
prefix `3W(a, b, c)` / `4N(a, b)` with an explicit distance, plus
AND / OR / NOT boolean combinators (both infix and the n-ary prefix
forms `AND(a,b,...)` / `OR(a,b,...)`), `*`/`?` truncation, `^boost`,
parentheses and `field:` prefixes.

Precedence (tightest first), as in the reference grammar
(surround/parser/QueryParser.jj production chain
FieldsQuery → OrQuery → AndQuery → NotQuery → NQuery → WQuery →
PrimaryQuery): W, N, NOT, AND, OR. Operator keywords are
case-insensitive (the reference compiles them case-insensitively).

Semantics mapping (DistanceQuery.java → SpanNearQuery: slop =
opDistance − 1, inOrder = operator is W):
    `n W (...)` → IntervalSlotsNode(ordered=True,  max_gaps=n−1)
    `n N (...)` → IntervalSlotsNode(ordered=False, max_gaps=n−1)
Infix W/N use distance 1 (adjacent), like the reference's infix
operators. Truncated distance operands (`jav*`) become dictionary-
expanded slots (SrndTruncQuery's SpanOr role). A distance operand may
also be a parenthesized OR of plain terms — `3W((a OR b), c)` — which
becomes a multi-term slot; nested distance/boolean operands beyond
that are rejected with a clear error (the v1 surface, documented).

Like the reference, this dialect does NOT run an analyzer: terms are
matched against the dictionary as typed, lowercased (the reference
leaves case folding to the truncation factory; our corpora index
lowercased terms, so lowercasing here is the useful default —
disable with lowercase_terms=False).

Boolean scoring: AND/OR/NOT produce ordinary scored BooleanNodes
(MUST/SHOULD/MUST_NOT) over BM25-scored term leaves; distance ops are
match-only constant score (IntervalSlotsNode), mirroring the
constant-score role intervals already have in this engine.
"""

from __future__ import annotations

import re

from lucene_spark.search.plan import (
    BooleanNode,
    Clause,
    IntervalSlotsNode,
    MatchNoneNode,
    Node,
    Occur,
    PrefixNode,
    RegexpNode,
    TermInSetNode,
    TermNode,
    apply_field,
)

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<distop>(?P<dist>\d+)?(?P<dw>[wWnN])(?=\s*\())   # prefix nW( / nN(
      | (?P<term>[^\s(),^]+)
    )""",
    re.VERBOSE,
)

_BOOST = re.compile(r"\s*\^(\d+(?:\.\d+)?)")
_FIELD = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$", re.DOTALL)


class SurroundSyntaxError(ValueError):
    pass


def _lex(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    text = text.rstrip()
    while i < len(text):
        m = _BOOST.match(text, i)
        if m:
            out.append(("boost", m.group(1)))
            i = m.end()
            continue
        m = _TOKEN.match(text, i)
        if not m or m.end() == i:
            raise SurroundSyntaxError(f"cannot lex surround query at: {text[i:]!r}")
        i = m.end()
        for kind in ("lparen", "rparen", "comma", "term"):
            if m.group(kind) is not None:
                val = m.group(kind)
                if kind == "term":
                    up = val.upper()
                    if up in ("AND", "OR", "NOT"):
                        out.append((up.lower(), val))
                        break
                    if up in ("W", "N"):
                        out.append(("infix_dist", up))
                        break
                out.append((kind, val))
                break
        else:
            out.append(("distop", f"{m.group('dist') or 1}{m.group('dw').upper()}"))
    return out


class _P:
    def __init__(self, toks: list[tuple[str, str]], lowercase: bool):
        self.toks = toks
        self.i = 0
        self.lc = lowercase

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is not None:
            self.i += 1
        return t

    def expect(self, kind: str):
        t = self.next()
        if t is None or t[0] != kind:
            raise SurroundSyntaxError(f"expected {kind}, got {t!r}")
        return t


def parse_surround(text: str, default_field: str = "",
                   lowercase_terms: bool = True) -> Node:
    """Parse a surround-dialect query into the shared plan tree."""
    if not text or not text.strip():
        return MatchNoneNode()
    p = _P(_lex(text), lowercase_terms)
    node = _or(p)
    if p.peek() is not None:
        raise SurroundSyntaxError(f"trailing input: {p.toks[p.i:]!r}")
    if node is None:
        return MatchNoneNode()
    if default_field:
        node = apply_field(node, default_field, only_default=True)
    return node


def _or(p: _P) -> Node | None:
    left = _and(p)
    cl = [left] if left is not None else []
    while p.peek() is not None and p.peek()[0] == "or":
        p.next()
        r = _and(p)
        if r is None:
            raise SurroundSyntaxError("dangling OR operator")
        cl.append(r)
    if len(cl) <= 1:
        return cl[0] if cl else None
    return BooleanNode(clauses=tuple(Clause(Occur.SHOULD, n) for n in cl))


def _and(p: _P) -> Node | None:
    left = _not(p)
    cl = [left] if left is not None else []
    while p.peek() is not None and p.peek()[0] == "and":
        p.next()
        r = _not(p)
        if r is None:
            raise SurroundSyntaxError("dangling AND operator")
        cl.append(r)
    if len(cl) <= 1:
        return cl[0] if cl else None
    return BooleanNode(clauses=tuple(Clause(Occur.MUST, n) for n in cl))


def _not(p: _P) -> Node | None:
    left = _dist(p)
    negs: list[Node] = []
    while p.peek() is not None and p.peek()[0] == "not":
        p.next()
        r = _dist(p)
        if r is None:
            raise SurroundSyntaxError("dangling NOT operator")
        negs.append(r)
    if not negs:
        return left
    if left is None:
        raise SurroundSyntaxError("NOT requires a left operand")
    return BooleanNode(clauses=(Clause(Occur.MUST, left),
                                *(Clause(Occur.MUST_NOT, n) for n in negs)))


def _dist(p: _P) -> Node | None:
    """Infix distance chains, two grammar levels exactly as the
    reference (NQuery := WQuery (N WQuery)*; WQuery := Primary
    (W Primary)*): `a W b W c` is ONE ordered distance query over all
    three operands at distance 1. Mixing infix W under N would nest
    distance queries, which this dialect rejects with a clear error
    (use the flat prefix forms instead)."""
    return _dist_level(p, "N", lambda q: _dist_level(q, "W", _primary))


def _dist_level(p: _P, kind: str, sub) -> Node | None:
    left = sub(p)
    ops: list[Node] = [left] if left is not None else []
    seen = False
    while p.peek() is not None and p.peek()[0] == "infix_dist" and p.peek()[1] == kind:
        p.next()
        seen = True
        r = sub(p)
        if r is None:
            raise SurroundSyntaxError(f"dangling {kind} operator")
        ops.append(r)
    if not seen:
        return left
    return _make_distance(ops, 1, kind)


def _slotify(n: Node) -> Node:
    """Validate/convert one distance operand into a slot node."""
    if isinstance(n, (TermNode, PrefixNode, RegexpNode, TermInSetNode)):
        return n
    if isinstance(n, BooleanNode) and n.clauses and all(
        c.occur is Occur.SHOULD and isinstance(c.node, TermNode)
        for c in n.clauses
    ):
        # (a OR b) operand → multi-term slot; fields must agree
        fields = {c.node.field for c in n.clauses}
        if len(fields) > 1:
            raise SurroundSyntaxError(
                "distance operand mixes fields: a slot matches one field")
        return TermInSetNode(terms=tuple(c.node.term for c in n.clauses),
                             field=fields.pop())
    if isinstance(n, IntervalSlotsNode):
        raise SurroundSyntaxError(
            "nested distance subqueries are not supported in this dialect "
            "(flatten: `3W(a, b, c)` instead of `3W(a, 2W(b, c))`)")
    raise SurroundSyntaxError(
        f"distance operand must be a term, truncation, or OR of terms: {n!r}")


def _make_distance(ops: list[Node], distance: int, kind: str) -> Node:
    if distance < 1:
        raise SurroundSyntaxError(f"distance must be ≥ 1, got {distance}")
    slots = tuple(_slotify(n) for n in ops)
    if len(slots) < 2:
        raise SurroundSyntaxError("distance operator needs ≥ 2 operands")
    fields = {getattr(s, "field", "") for s in slots}
    fld = fields.pop() if len(fields) == 1 else ""
    if fields:
        raise SurroundSyntaxError("distance operands mix fields")
    return IntervalSlotsNode(slots=slots, max_gaps=distance - 1,
                             ordered=(kind == "W"), field=fld)


def _primary(p: _P) -> Node | None:
    t = p.peek()
    if t is None or t[0] in ("rparen", "comma"):
        return None
    if t[0] == "distop":
        p.next()
        dist, kind = int(t[1][:-1]), t[1][-1]
        args = _arg_list(p)
        return _with_boost(p, _make_distance(args, dist, kind))
    if t[0] in ("and", "or") and p.toks[p.i + 1: p.i + 2] and p.toks[p.i + 1][0] == "lparen":
        # prefix n-ary boolean: AND(a, b, ...) / OR(a, b, ...)
        p.next()
        occ = Occur.MUST if t[0] == "and" else Occur.SHOULD
        args = _arg_list(p)
        if not args:
            return MatchNoneNode()
        return _with_boost(
            p, BooleanNode(clauses=tuple(Clause(occ, a) for a in args)))
    if t[0] == "lparen":
        p.next()
        inner = _or(p)
        p.expect("rparen")
        if inner is None:
            return None
        return _with_boost(p, inner)
    if t[0] == "term":
        p.next()
        return _with_boost(p, _leaf(t[1], p.lc))
    raise SurroundSyntaxError(f"unexpected token {t!r}")


def _arg_list(p: _P) -> list[Node]:
    p.expect("lparen")
    args: list[Node] = []
    while True:
        t = p.peek()
        if t is None:
            raise SurroundSyntaxError("unclosed argument list")
        if t[0] == "rparen":
            p.next()
            return args
        if t[0] == "comma":
            p.next()
            continue
        # one argument = a full OR-level expression bounded by ',' / ')'
        # (the reference's FieldsQueryList)
        a = _or(p)
        if a is not None:
            args.append(a)


def _with_boost(p: _P, node: Node) -> Node:
    t = p.peek()
    if t is not None and t[0] == "boost":
        p.next()
        from dataclasses import replace

        # MULTIPLY into any existing boost: `(a^2)^3` nests to 6.0
        # (the paren branch unwraps to the inner node, so overwriting
        # would silently drop the inner weight)
        return replace(node, boost=node.boost * float(t[1]))
    return node


def _leaf(val: str, lowercase: bool) -> Node:
    fld = ""
    m = _FIELD.match(val)
    if m and m.group(2):
        fld, val = m.group(1), m.group(2)
    if lowercase:
        val = val.lower()
    if val.endswith("*") and "*" not in val[:-1] and "?" not in val:
        return PrefixNode(prefix=val[:-1], field=fld)
    if "*" in val or "?" in val:
        pat = "".join(".*" if c == "*" else "." if c == "?" else re.escape(c)
                      for c in val)
        return RegexpNode(pattern=pat, field=fld)
    return TermNode(term=val, field=fld)
