"""Reference-faithful in-memory oracle engine (pure Python + stdlib math).

This is a deliberately naive, independent implementation of the reference
scoring semantics used as the parity gate (SURVEY.md §5.2 item 2). It
shares NO code with the distributed kernel: tokenization is re-derived
from the same spec, postings are plain dicts, scoring follows
search/similarities/BM25Similarity.java:104-258 literally:

  idf    = ln(1 + (N − df + 0.5)/(df + 0.5))          (:104-107)
  avgdl  = sumTotalTermFreq / N                        (:114-117)
  score  = w − w/(1 + tf · 1/(k1((1−b) + b·dl/avgdl))) (:246-258), float32
  w      = boost · idf (float32)
  clause sums accumulate in double, cast to float32 at the node boundary
  tie-break: (score desc, doc_id asc)                  (TopScoreDocCollector.java:90-93)

Docs are identified by caller-provided doc_ids so the oracle ranks the
exact same id space as the engine.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np

from lucene_spark.search import plan as P

_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z]+)([A-Z][a-z])")


def oracle_tokenize(text: str, analyzer: str = "code") -> list[str]:
    """Independent restatement of the analyzer spec (tests cross-check it
    against the vectorized pandas implementation)."""
    if analyzer == "code":
        text = _CAMEL_1.sub(r"\1 \2", text)
        text = _CAMEL_2.sub(r"\1 \2", text)
        toks = re.findall(r"[A-Za-z0-9]+", text.lower())
        return [t for t in toks if len(t) <= 255]
    if analyzer == "standard":
        from lucene_spark.analysis import ENGLISH_STOP_WORDS

        toks = re.findall(r"[A-Za-z0-9_]+", text.lower())
        return [t for t in toks if len(t) <= 255 and t not in ENGLISH_STOP_WORDS]
    if analyzer == "whitespace":
        return text.split()
    if analyzer == "simple":
        return re.findall(r"[a-z0-9]+", text.lower())
    raise ValueError(analyzer)


def oracle_tokenize_all(text: str, analyzer: str = "code") -> list[str | None]:
    """Pre-filter token stream with dropped tokens as None (position gaps)."""
    if analyzer == "code":
        text = _CAMEL_1.sub(r"\1 \2", text)
        text = _CAMEL_2.sub(r"\1 \2", text)
        toks = re.findall(r"[A-Za-z0-9]+", text.lower())
        return [t if len(t) <= 255 else None for t in toks]
    if analyzer == "standard":
        from lucene_spark.analysis import ENGLISH_STOP_WORDS

        toks = re.findall(r"[A-Za-z0-9_]+", text.lower())
        return [t if len(t) <= 255 and t not in ENGLISH_STOP_WORDS else None for t in toks]
    if analyzer == "whitespace":
        return list(text.split())
    if analyzer == "simple":
        return list(re.findall(r"[a-z0-9]+", text.lower()))
    raise ValueError(analyzer)


class OracleIndex:
    def __init__(self, analyzer: str = "code", k1: float = 1.2, b: float = 0.75):
        self.analyzer = analyzer
        self.k1 = k1
        self.b = b
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)  # term -> {doc: tf}
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doclen: dict[int, int] = {}

    def add(self, doc_id: int, content: str) -> None:
        toks = oracle_tokenize(content, self.analyzer)
        self.doclen[doc_id] = len(toks)
        for t, tf in Counter(toks).items():
            self.postings[t][doc_id] = tf
        # positions in the pre-stop-filter stream (gaps preserved), matching
        # FilteringTokenFilter.java:49-63 accumulated position increments
        for p, t in enumerate(oracle_tokenize_all(content, self.analyzer)):
            if t is not None:
                self.positions[t].setdefault(doc_id, []).append(p)

    # ---- stats ----
    @property
    def doc_count(self) -> int:
        return len(self.doclen)

    @property
    def avgdl(self) -> float:
        return np.float32(sum(self.doclen.values()) / self.doc_count)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    # ---- scoring ----
    def _weight(self, term: str, boost: float = 1.0) -> np.float32:
        df = self.df(term)
        idf = np.float32(math.log(1.0 + (self.doc_count - df + 0.5) / (df + 0.5)))
        return np.float32(np.float32(boost) * idf)

    def _score_one(self, w: np.float32, tf: int, dl: int) -> np.float32:
        k1 = np.float32(self.k1)
        b = np.float32(self.b)
        one = np.float32(1.0)
        norm_inv = one / (k1 * ((one - b) + b * np.float32(dl) / self.avgdl))
        return np.float32(w - w / (one + np.float32(tf) * norm_inv))

    @staticmethod
    def _sloppy_freq(adj_lists: list[list[int]], slop: int,
                     offsets: list[int] | None = None) -> float:
        """Plain-python twin of the documented sloppy semantics (no code
        shared with kernel.sloppy_phrase_freq): enumerate windows by
        repeatedly advancing the list holding the current minimum; count
        a window when span ≤ slop and it reuses no element of the last
        counted window; weight 1/(1+span). With offsets (repeated-term
        phrases), a window also requires pairwise-distinct raw positions
        (adj + offset)."""
        k = len(adj_lists)
        ptrs = [0] * k
        last = [-1] * k
        freq = 0.0
        while True:
            vals = [adj_lists[i][ptrs[i]] for i in range(k)]
            width = max(vals) - min(vals)
            if width <= slop and all(ptrs[i] > last[i] for i in range(k)):
                distinct = True
                if offsets is not None:
                    raws = {vals[i] + offsets[i] for i in range(k)}
                    distinct = len(raws) == k
                if distinct:
                    freq += 1.0 / (1.0 + width)
                    last = list(ptrs)
            imin = min(range(k), key=lambda i: (vals[i], i))
            ptrs[imin] += 1
            if ptrs[imin] >= len(adj_lists[imin]):
                return freq

    # ---- boolean evaluation: doc -> float32 score ----
    def eval(self, node: P.Node, scored: bool = True) -> dict[int, np.float32]:
        if isinstance(node, P.TermNode):
            w = self._weight(node.term, node.boost)
            return {d: self._score_one(w, tf, self.doclen[d]) if scored else np.float32(0)
                    for d, tf in self.postings.get(node.term, {}).items()}
        if isinstance(node, P.TermInSetNode):
            docs: set[int] = set()
            for t in node.terms:
                docs.update(self.postings.get(t, {}))
            return {d: np.float32(node.boost) for d in docs}
        if isinstance(node, P.SynonymNode):
            df = max((self.df(t) for t in node.terms), default=0)
            idf = np.float32(math.log(1.0 + (self.doc_count - df + 0.5) / (df + 0.5)))
            w = np.float32(np.float32(node.boost) * idf)
            tf_sum: dict[int, int] = defaultdict(int)
            for t in node.terms:
                for d, tf in self.postings.get(t, {}).items():
                    tf_sum[d] += tf
            return {d: self._score_one(w, tf, self.doclen[d]) if scored else np.float32(0)
                    for d, tf in tf_sum.items()}
        if isinstance(node, P.PhraseNode):
            # slop=0: ExactPhraseMatcher — freq = #positions p where
            # term_j sits at p+j for all j. slop>0 (distinct terms):
            # sloppy min-window semantics — independent reimplementation
            # of the documented algorithm (greedy non-overlapping
            # smallest-range matches, weight 1/(1+span)).
            common: set[int] | None = None
            for t in node.terms:
                docs_t = set(self.positions.get(t, {}))
                common = docs_t if common is None else (common & docs_t)
                if not common:
                    return {}
            idf_sum = sum(
                float(np.float32(math.log(
                    1.0 + (self.doc_count - self.df(t) + 0.5) / (self.df(t) + 0.5))))
                for t in node.terms)
            w = np.float32(np.float32(node.boost) * np.float32(idf_sum))
            sloppy = node.slop > 0
            repeats = len(set(node.terms)) != len(node.terms)
            offsets = list(range(len(node.terms))) if repeats else None
            out: dict[int, np.float32] = {}
            for d in common:
                if sloppy:
                    freq = self._sloppy_freq(
                        [sorted(p - j for p in self.positions[t][d])
                         for j, t in enumerate(node.terms)], node.slop,
                        offsets=offsets)
                else:
                    cur = set(self.positions[node.terms[0]][d])
                    for j, t in enumerate(node.terms[1:], start=1):
                        cur &= {p - j for p in self.positions[t][d]}
                        if not cur:
                            break
                    freq = float(len(cur))
                if freq > 0:
                    out[d] = self._score_one(w, freq, self.doclen[d]) if scored else np.float32(0)
            return out
        if isinstance(node, P.ConstantScoreNode):
            child = self.eval(node.child, scored=False)
            return {d: np.float32(node.boost) for d in child}
        if isinstance(node, P.MatchNoneNode):
            return {}
        if isinstance(node, P.MatchAllNode):
            return {d: np.float32(node.boost) for d in self.doclen}
        if isinstance(node, P.BooleanNode):
            return self._eval_bool(node, scored)
        if isinstance(node, P.DisjunctionMaxNode):
            per = [self.eval(c, scored) for c in node.children]
            docs = set().union(*[set(p) for p in per]) if per else set()
            out: dict[int, np.float32] = {}
            for d in docs:
                vals = [float(p[d]) for p in per if d in p]
                mx = max(vals)
                out[d] = np.float32((mx + node.tie_breaker * (sum(vals) - mx)) * node.boost)
            return out
        raise TypeError(node)

    def _eval_bool(self, node: P.BooleanNode, scored: bool) -> dict[int, np.float32]:
        musts = [c.node for c in node.clauses if c.occur is P.Occur.MUST]
        shoulds = [c.node for c in node.clauses if c.occur is P.Occur.SHOULD]
        filters = [c.node for c in node.clauses if c.occur is P.Occur.FILTER]
        nots = [c.node for c in node.clauses if c.occur is P.Occur.MUST_NOT]

        acc: dict[int, float] = {}
        base: set[int] | None = None
        for m in musts:
            sc = self.eval(m, scored)
            if base is None:
                base = set(sc)
                for d in sc:
                    acc[d] = float(sc[d])
            else:
                base &= set(sc)
                for d in list(acc):
                    if d not in base:
                        del acc[d]
                for d in base:
                    acc[d] += float(sc[d])
        for f in filters:
            sc = self.eval(f, scored=False)
            if base is None:
                base = set(sc)
                acc = {d: 0.0 for d in base}
            else:
                base &= set(sc)
                acc = {d: acc[d] for d in base}
        if base is None:
            # pure disjunction
            cnt: dict[int, int] = defaultdict(int)
            for s in shoulds:
                sc = self.eval(s, scored)
                for d, v in sc.items():
                    acc[d] = acc.get(d, 0.0) + float(v)
                    cnt[d] += 1
            if node.minimum_should_match > 1:
                acc = {d: v for d, v in acc.items() if cnt[d] >= node.minimum_should_match}
        else:
            cnt = defaultdict(int)
            for s in shoulds:
                sc = self.eval(s, scored)
                for d in base:
                    if d in sc:
                        acc[d] += float(sc[d])
                        cnt[d] += 1
            if node.minimum_should_match > 0:
                acc = {d: v for d, v in acc.items() if cnt[d] >= node.minimum_should_match}
        for n in nots:
            sc = self.eval(n, scored=False)
            for d in sc:
                acc.pop(d, None)
        return {d: np.float32(v * node.boost) for d, v in acc.items()}

    def search(self, node: P.Node, k: int = 10) -> list[tuple[int, float]]:
        scores = self.eval(node)
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

    def count(self, node: P.Node) -> int:
        return len(self.eval(node, scored=False))
