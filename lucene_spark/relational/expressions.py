"""Compiled scoring expressions — the lucene/expressions module restated.

Role analogue: lucene/expressions/src/java/org/apache/lucene/expressions/
js/JavascriptCompiler.java (compiles an expression string over variables
and functions into a per-document DoubleValuesSource) and Solr's function
query string syntax parsed by FunctionQParser
(solr/core/src/java/org/apache/solr/search/FunctionQParser.java).

Spark-first: the compiled target is a Catalyst Column — whole-stage
codegen'd JVM arithmetic, exactly the role the ASM-compiled bytecode
plays in Lucene. The parser is driver-side only (runs once per query,
like JavascriptCompiler.compile); no Python executes per row.

Grammar (a practical subset of both syntaxes; precedence per
JavascriptCompiler's C-style table, Javascript.g:56-118):

    cond   := or ('?' cond ':' cond)?
    or     := and ('||' and)*
    and    := eq ('&&' eq)*
    eq     := cmp (('=='|'!=') cmp)*
    cmp    := expr (('<'|'<='|'>'|'>=') expr)*
    expr   := term (('+'|'-') term)*
    term   := factor (('*'|'/') factor)*
    factor := NUMBER | IDENT | IDENT '(' args ')' | '(' cond ')'
            | '-' factor | '!' factor
    args   := cond (',' cond)*

Boolean semantics follow the reference exactly (JavascriptCompiler
evaluates everything as double): comparisons and &&/||/! yield 1.0 or
0.0, a ternary condition is true iff it is nonzero. A null operand
(missing doc value) makes a comparison false, so it selects the
ternary's else branch — Catalyst's three-valued logic collapsed to
the reference's two-valued doubles.

IDENT alone resolves to a DataFrame column; IDENT(...) resolves through
the ValueSource registry (relational/functions.py FUNCTIONS) first, then
falls back to any pyspark.sql.functions name (ln, exp, sin, ...), so the
full built-in surface is expressible.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

from lucene_spark.relational.functions import FUNCTIONS

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op><=|>=|==|!=|&&|\|\||[-+*/(),<>?:!]))")


class ExpressionError(ValueError):
    pass


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise ExpressionError(f"bad character at {pos}: {s[pos:pos+10]!r}")
        pos = m.end()
        for kind in ("num", "ident", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("end", ""))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], cols: dict[str, Column]):
        self.toks = tokens
        self.i = 0
        self.cols = cols

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def eat(self, kind: str, val: str | None = None) -> str:
        k, v = self.toks[self.i]
        if k != kind or (val is not None and v != val):
            raise ExpressionError(f"expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def cond(self) -> Column:
        c = self.or_()
        if self.peek() == ("op", "?"):
            self.eat("op", "?")
            t = self.cond()
            self.eat("op", ":")
            f = self.cond()
            return F.when(c.cast("double") != F.lit(0.0), t).otherwise(f)
        return c

    def or_(self) -> Column:
        node = self.and_()
        while self.peek() == ("op", "||"):
            self.eat("op", "||")
            rhs = self.and_()
            node = F.when(
                (node.cast("double") != F.lit(0.0))
                | (rhs.cast("double") != F.lit(0.0)),
                F.lit(1.0)).otherwise(F.lit(0.0))
        return node

    def and_(self) -> Column:
        node = self.eq()
        while self.peek() == ("op", "&&"):
            self.eat("op", "&&")
            rhs = self.eq()
            node = F.when(
                (node.cast("double") != F.lit(0.0))
                & (rhs.cast("double") != F.lit(0.0)),
                F.lit(1.0)).otherwise(F.lit(0.0))
        return node

    def eq(self) -> Column:
        # equality binds looser than relational (Javascript.g C-style
        # table): 'a == b < c' is a == (b < c)
        node = self.cmp()
        while self.peek()[0] == "op" and self.peek()[1] in ("==", "!="):
            op = self.eat("op")
            rhs = self.cmp()
            c = node == rhs if op == "==" else node != rhs
            node = F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))
        return node

    def cmp(self) -> Column:
        node = self.expr()
        while self.peek()[0] == "op" and self.peek()[1] in (
                "<", "<=", ">", ">="):
            op = self.eat("op")
            rhs = self.expr()
            c = {"<": node < rhs, "<=": node <= rhs, ">": node > rhs,
                 ">=": node >= rhs}[op]
            node = F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))
        return node

    def expr(self) -> Column:
        node = self.term()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            op = self.eat("op")
            rhs = self.term()
            node = node + rhs if op == "+" else node - rhs
        return node

    def term(self) -> Column:
        node = self.factor()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            op = self.eat("op")
            rhs = self.factor()
            node = node * rhs if op == "*" else node / rhs
        return node

    def factor(self) -> Column:
        k, v = self.peek()
        if (k, v) == ("op", "-"):
            self.eat("op", "-")
            return -self.factor()
        if (k, v) == ("op", "!"):
            self.eat("op", "!")
            x = self.factor()
            return F.when(x.cast("double") != F.lit(0.0),
                          F.lit(0.0)).otherwise(F.lit(1.0))
        if (k, v) == ("op", "("):
            self.eat("op", "(")
            node = self.cond()
            self.eat("op", ")")
            return node
        if k == "num":
            self.eat("num")
            return F.lit(float(v))
        if k == "ident":
            self.eat("ident")
            if self.peek() == ("op", "("):
                return self.call(v)
            if v in self.cols:
                return self.cols[v]
            return F.col(v)
        raise ExpressionError(f"unexpected {v!r}")

    def call(self, name: str) -> Column:
        self.eat("op", "(")
        args: list[Column] = []
        if self.peek() != ("op", ")"):
            args.append(self.cond())
            while self.peek() == ("op", ","):
                self.eat("op", ",")
                args.append(self.cond())
        self.eat("op", ")")
        fn = FUNCTIONS.get(name)
        if fn is None:
            fn = getattr(F, name, None)
            if fn is None or name.startswith("_"):
                raise ExpressionError(f"unknown function {name!r}")
        try:
            return fn(*args)
        except TypeError as e:
            raise ExpressionError(f"{name}: {e}") from None


def compile_expression(source: str, cols: dict[str, Column] | None = None) -> Column:
    """JavascriptCompiler.compile analogue: expression string → one
    Catalyst Column. `cols` optionally maps variable names to Columns
    (Bindings in Lucene terms); unmapped identifiers become F.col(name)."""
    p = _Parser(_tokenize(source), cols or {})
    out = p.cond()
    if p.peek()[0] != "end":
        raise ExpressionError(f"trailing input at token {p.i}: {p.peek()[1]!r}")
    return out
