"""Simple query parser — the lenient end-user dialect.

Role analogue: `lucene/queryparser/src/java/org/apache/lucene/
queryparser/simple/SimpleQueryParser.java`: the parser Lucene ships for
raw end-user input boxes. Syntax: `+` AND, `|` OR, `-` negation,
`"..."` phrase (with `"..."~N` slop), trailing `*` prefix, `term~N`
fuzzy, `(...)` grouping. Its defining property is LENIENCE
(SimpleQueryParser.java:41-47: "will never throw an exception"):
unmatched parens/quotes, dangling operators and stray punctuation all
degrade to the nearest sensible query instead of erroring — garbage in,
best-effort query out.

Clauses combine LEFT-TO-RIGHT with the operator BETWEEN each pair, the
reference's buildQueryTree behavior: `foo bar + baz` is
((foo OR bar) AND baz) and `a + b | c` is ((a AND b) OR c) — the
accumulated left side becomes one operand of the next operator. Bare
whitespace applies the default operator (SHOULD/OR, the reference
default — SimpleQueryParser.java:62). Output is the same plan tree the
classic parser produces, so everything downstream (searcher, kernel,
explain) is shared.
"""

from __future__ import annotations

import re

from lucene_spark.analysis import Analyzer
from lucene_spark.search.plan import (
    BooleanNode,
    Clause,
    MatchNoneNode,
    Node,
    Occur,
    PhraseNode,
    PrefixNode,
    FuzzyNode,
    TermNode,
    rewrite,
)

_SIMPLE_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<and>\+)
      | (?P<or>\|)
      | (?P<minus>-)
      | (?P<quoted>"[^"]*"(~\d+)?)
      | (?P<openquote>"[^"]*$)
      | (?P<atom>[^\s()|+\-"][^\s()|+\-"]*)
    )""",
    re.VERBOSE,
)


from lucene_spark.search.qparser import _analyze_one as _analyze


def parse_simple(text: str, analyzer: Analyzer,
                 default_operator: str = "or") -> Node:
    """Parse the simple dialect into a rewritten plan tree. Never raises
    on malformed input — the reference's no-exception contract. A stray
    top-level ')' is ignored (depth-aware), so the rest of the query
    still parses instead of being silently dropped."""
    node, _ = _parse(_lex(text), 0, analyzer,
                     Occur.SHOULD if default_operator == "or" else Occur.MUST)
    return rewrite(node if node is not None else MatchNoneNode())


def _lex(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _SIMPLE_TOKEN.match(text, pos)
        if not m or m.end() == pos:
            pos += 1          # lenience: skip a character we can't lex
            continue
        pos = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
                break
    return out


def _leaf(val: str, an: Analyzer) -> Node | None:
    """One self-contained clause: phrase / prefix / fuzzy / term(s)."""
    if val.startswith('"'):
        body, slop = val[1:], 0
        tilde = re.search(r'"~(\d+)$', val)
        if tilde:
            body, slop = val[1:tilde.start()], int(tilde.group(1))
        elif body.endswith('"'):
            body = body[:-1]
        terms = _analyze(body, an)
        if not terms:
            return None
        if len(terms) == 1:
            return TermNode(term=terms[0])
        return PhraseNode(terms=tuple(terms), slop=slop)
    fuzzy = re.match(r"(.+?)~(\d?)$", val)
    if fuzzy and not val.endswith("*"):
        toks = _analyze(fuzzy.group(1), an)
        if toks:
            return FuzzyNode(term=toks[0], max_edits=int(fuzzy.group(2) or 2))
    if val.endswith("*") and len(val) > 1:
        toks = _analyze(val[:-1], an)
        if toks:
            return PrefixNode(prefix=toks[0])
    terms = _analyze(val.rstrip("*~"), an)
    if not terms:
        return None
    if len(terms) == 1:
        return TermNode(term=terms[0])
    # analyzer split one atom into several terms (camelCase etc.) — the
    # reference emits them under the default operator
    return BooleanNode(clauses=tuple(Clause(Occur.SHOULD, TermNode(term=t)) for t in terms))


def _combine(left: Node | None, right: Node | None, occ: Occur,
             negated: bool) -> Node | None:
    """Left-fold one step: `left <occ> right`, with `right` optionally
    negated. Consecutive same-operator operands flatten into one
    BooleanNode (the reference accumulates them in one BooleanQuery);
    an operator change nests the accumulated left side as a single
    operand — yielding ((a OR b) AND c) for `a b + c`."""
    if right is None:
        return left
    rc = Clause(Occur.MUST_NOT if negated else occ, right)
    if left is None:
        if negated:        # pure negation: matches nothing on its own,
            return BooleanNode(clauses=(rc,))   # kernel guards this
        return right
    if (isinstance(left, BooleanNode) and left.boost == 1.0
            and all(c.occur in (occ, Occur.MUST_NOT) for c in left.clauses)):
        return BooleanNode(clauses=left.clauses + (rc,))
    return BooleanNode(clauses=(Clause(occ, left), rc))


def _parse(tokens: list[tuple[str, str]], i: int, an: Analyzer,
           default_occur: Occur, depth: int = 0) -> tuple[Node | None, int]:
    node: Node | None = None
    op_occur = default_occur        # operator applying to the NEXT clause
    negate_next = False

    def push(rhs: Node | None):
        nonlocal node, op_occur, negate_next
        node = _combine(node, rhs, op_occur, negate_next)
        op_occur, negate_next = default_occur, False

    while i < len(tokens):
        kind, val = tokens[i]
        i += 1
        if kind == "lparen":
            sub, i = _parse(tokens, i, an, default_occur, depth + 1)
            push(sub)
        elif kind == "rparen":
            if depth > 0:
                break           # end of group
            continue            # lenient: stray top-level ')' ignored
        elif kind == "and":
            op_occur = Occur.MUST
        elif kind == "or":
            op_occur = Occur.SHOULD
        elif kind == "minus":
            negate_next = True
        elif kind in ("quoted", "openquote", "atom"):
            if kind == "openquote":
                val = val + '"'     # lenience: close the dangling quote
            push(_leaf(val, an))
    return node, i
