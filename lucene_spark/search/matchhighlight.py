"""Match-region highlighting — the lucene/highlighter matchhighlight
package (MatchRegionRetriever + PassageSelector + MatchHighlighter).
Closes the last row of VERDICT r4 "What's missing".

Reference mapping:
- MatchRegionRetriever.java: per top-k document, the QUERY'S OWN match
  structure yields offset regions — a phrase/interval hit is ONE region
  spanning its whole match, not per-term hits (the Matches API
  contract). Here `_node_regions` evaluates the plan node against the
  document's offset-bearing token stream (re-analysis — the
  OffsetsFromPositions.java strategy: positions → offsets via the
  analyzer; fvh.tokens_with_offsets is the shared offsets tokenizer).
- PassageSelector.java pickBest (:78-226): markers sorted by (from,
  to); each in-window marker centers a candidate passage of width
  `max_passage_window`, clamped to the permitted range; every marker
  fully inside joins the passage; a bounded priority queue keeps the
  best `max_passages` under DEFAULT_SCORER (marker count, then total
  highlighted length, then LATER start wins); overlapping/adjacent
  passages are dropped best-first; survivors return in offset order.
- MatchHighlighter/PassageFormatter: passages joined by an ellipsis,
  markers wrapped pre/post.

Spark shape: runs AFTER the top-k reduce over ≤k hydrated rows — one
Arrow batch through a single pandas UDF (the highlight.py serving
pattern); never a scale concern. Node coverage: Term, TermInSet,
Synonym, Prefix, Regexp/Wildcard, Fuzzy, Phrase (exact + gapped
positions), Boolean (union over positive clauses), DisMax; unsupported
nodes contribute no regions (documented subset — interval trees keep
their own offset machinery in search/intervals.py)."""

from __future__ import annotations

import heapq
import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from lucene_spark.analysis import Analyzer, get_analyzer
from lucene_spark.search import plan as P
from lucene_spark.search.fvh import tokens_with_offsets


def _node_regions(toks: list[tuple[str, int, int]],
                  node: P.Node) -> list[tuple[int, int]]:
    """Offset regions of `node`'s matches over one doc's (term, start,
    end) stream — MatchesIterator flattened."""
    out: list[tuple[int, int]] = []
    if isinstance(node, P.TermNode):
        out = [(s, e) for t, s, e in toks if t == node.term]
    elif isinstance(node, (P.TermInSetNode, P.SynonymNode)):
        ts = set(node.terms)
        out = [(s, e) for t, s, e in toks if t in ts]
    elif isinstance(node, P.PrefixNode):
        out = [(s, e) for t, s, e in toks if t.startswith(node.prefix)]
    elif isinstance(node, P.RegexpNode):
        rx = re.compile(f"^(?:{node.pattern})$", re.ASCII)
        out = [(s, e) for t, s, e in toks if rx.match(t)]
    elif isinstance(node, P.FuzzyNode):
        from lucene_spark.search.stringdist import damerau_distance

        out = [(s, e) for t, s, e in toks
               if damerau_distance(t, node.term) <= node.max_edits]
    elif isinstance(node, P.PhraseNode):
        qpos = (list(node.positions)
                if node.positions else list(range(len(node.terms))))
        width = max(qpos) + 1 if qpos else 0
        n = len(toks)
        for i in range(n - width + 1):
            if all(i + p < n and toks[i + p][0] == term
                   for term, p in zip(node.terms, qpos)):
                out.append((toks[i][1], toks[i + width - 1][2]))
    elif isinstance(node, P.BooleanNode):
        for cl in node.clauses:
            occ = getattr(cl.occur, "value", cl.occur)
            if occ in ("MUST", "SHOULD", "FILTER"):
                out.extend(_node_regions(toks, cl.node))
    elif isinstance(node, P.DisjunctionMaxNode):
        for ch in node.children:
            out.extend(_node_regions(toks, ch))
    return out


def _merge_markers(regions: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort by (from, to) and merge exact duplicates/contained repeats
    into distinct markers (the Matches API can emit overlaps; the
    selector handles overlap, only exact dupes are dropped)."""
    return sorted(set(regions))


def pick_best_passages(value: str, markers: list[tuple[int, int]],
                       max_passage_window: int, max_passages: int
                       ) -> list[tuple[int, int, list[tuple[int, int]]]]:
    """PassageSelector.pickBest port (see module docstring). Returns
    [(from, to, inside_markers)] in offset order."""
    if not value or max_passage_window == 0:
        return []
    n = len(value)
    ms = [(max(0, f), min(t, n)) for f, t in _merge_markers(markers)
          if f < n and t > f]
    ms = [(f, min(t, f + max_passage_window)) for f, t in ms]

    def score(p):
        frm, to, inside = p
        return (len(inside), sum(t - f for f, t in inside), frm)

    # bounded best-k queue: DEFAULT_SCORER orders by (count, covered
    # length, later-start); heapq keeps the k largest under that key
    cand: list[tuple[tuple, int, tuple]] = []
    seq = 0
    for mi, (mf, mt) in enumerate(ms):
        if mt - mf > max_passage_window:
            continue
        frm = (mf + mt - max_passage_window) // 2
        to = (mf + mt + max_passage_window) // 2
        if frm < 0:
            to += -frm
            frm = 0
        if to > n:
            frm -= to - n
            to = n
            if frm < 0:
                frm = 0
        if not (frm < to <= n):
            continue
        inside = [(f, t) for f, t in ms if f >= frm and t <= to]
        if not inside:
            continue
        p = (frm, to, inside)
        heapq.heappush(cand, (score(p), seq, p))
        seq += 1
        if len(cand) > max_passages:
            heapq.heappop(cand)
    passages = [p for _, _, p in sorted(cand, key=lambda x: x[0],
                                        reverse=True)]
    # overlap resolution: better score wins, adjacent/overlapping drop
    kept: list[tuple[int, int, list]] = []
    for p in passages:
        if all(p[1] < q[0] or p[0] > q[1] for q in kept):
            kept.append(p)
    kept.sort(key=lambda p: p[0])
    return kept


def _format_passages(value: str, passages, pre: str, post: str,
                     ellipsis: str) -> str:
    """DefaultPassageFormatter role: wrap markers, join passages."""
    parts = []
    for frm, to, inside in passages:
        buf = []
        cur = frm
        for f, t in sorted(inside):
            if f < cur:
                continue
            buf.append(value[cur:f])
            buf.append(pre + value[f:t] + post)
            cur = t
        buf.append(value[cur:to])
        parts.append("".join(buf))
    return ellipsis.join(parts)


def match_highlight(topk_with_text: DataFrame, text_col: str,
                    query: "str | P.Node", analyzer: str = "whitespace",
                    max_passage_window: int = 80, max_passages: int = 2,
                    pre: str = "<b>", post: str = "</b>",
                    ellipsis: str = "...") -> DataFrame:
    """Adds `match_snippet` (formatted best passages) and
    `match_regions` (array<struct<from,to>> of raw match offsets) —
    the MatchHighlighter output over the query's own match regions."""
    an: Analyzer = get_analyzer(analyzer)
    if isinstance(query, str):
        from lucene_spark.search.qparser import parse_query

        node = parse_query(query, an)
    else:
        node = query

    out_t = T.StructType([
        T.StructField("match_snippet", T.StringType()),
        T.StructField("match_regions", T.ArrayType(T.StructType([
            T.StructField("from", T.IntegerType()),
            T.StructField("to", T.IntegerType())]))),
    ])

    @F.pandas_udf(out_t)
    def _mh(texts: pd.Series) -> pd.DataFrame:
        snips, regs = [], []
        for text in texts:
            text = text or ""
            toks = tokens_with_offsets(text, an)
            regions = _merge_markers(_node_regions(toks, node))
            passages = pick_best_passages(
                text, regions, max_passage_window, max_passages)
            snips.append(_format_passages(text, passages, pre, post,
                                          ellipsis))
            regs.append([{"from": f, "to": t} for f, t in regions])
        return pd.DataFrame({"match_snippet": snips,
                             "match_regions": regs})

    col = _mh(F.col(text_col))
    return (topk_with_text
            .withColumn("__mh", col)
            .withColumn("match_snippet", F.col("__mh.match_snippet"))
            .withColumn("match_regions", F.col("__mh.match_regions"))
            .drop("__mh"))
