"""Snippet highlighting — the lucene/highlighter module restated.

Role analogue: lucene/highlighter/src/java/org/apache/lucene/search/
uhighlight/ (UnifiedHighlighter): re-analyze the stored text of the top-k
hits, find the window with the most query-term matches, and surround the
matched terms with pre/post tags.

Spark-first: highlighting runs AFTER the top-k reduce, over exactly k
hydrated rows (the GET_FIELDS phase of distributed search), as one
vectorized pandas UDF — the per-hit work is tiny and the candidate set is
bounded by k, so this is never a scale concern.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from lucene_spark.analysis import Analyzer, get_analyzer


def highlight(
    topk_with_text: DataFrame,
    text_col: str,
    query_terms: list[str],
    analyzer: str = "standard",
    window: int = 12,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """Add a `snippet` column: the `window`-token stretch containing the
    most query-term hits, matched terms wrapped in pre/post tags."""
    an: Analyzer = get_analyzer(analyzer)
    # query terms run through the SAME analyzer chain as the text
    # (UnifiedHighlighter analyzes the query): under a stemming or
    # non-lowercasing chain a raw .lower() would never match tokens
    terms = {
        t
        for toks in an.tokenize_series(pd.Series(list(query_terms),
                                                 dtype=object))
        for t in toks
    } if query_terms else set()

    @F.pandas_udf(T.StringType())
    def _snip(texts: pd.Series) -> pd.Series:
        toks_s = an.tokenize_series(texts)
        out = []
        for toks in toks_s:
            if not toks:
                out.append("")
                continue
            hits = [i for i, t in enumerate(toks) if t in terms]
            if not hits:
                out.append(" ".join(toks[:window]))
                continue
            # best window = max hits within `window` tokens (two pointers)
            best_lo, best_n = hits[0], 1
            lo = 0
            for hi in range(len(hits)):
                while hits[hi] - hits[lo] >= window:
                    lo += 1
                if hi - lo + 1 > best_n:
                    best_n, best_lo = hi - lo + 1, hits[lo]
            # lead-in of up to 2 tokens; the window still ENDS at
            # best_lo + window so the trailing hits it was chosen for
            # stay inside the fragment
            start = max(0, best_lo - 2)
            frag = toks[start: best_lo + window]
            out.append(" ".join(
                f"{pre}{t}{post}" if t in terms else t for t in frag))
        return pd.Series(out)

    return topk_with_text.withColumn("snippet", _snip(F.col(text_col)))


def highlight_regex(
    topk_with_text: DataFrame,
    text_col: str,
    query_terms: list[str],
    context_chars: int = 60,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """JVM-only variant (no Python): first match ± context via regexp —
    the fast path when per-token windows aren't needed."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty (an empty "
                         "alternation would tag every char position)")
    alt = "|".join(re.escape(t) for t in sorted(query_terms, key=len, reverse=True))
    frag = F.regexp_extract(
        F.col(text_col), f"(?i).{{0,{context_chars}}}(?:{alt}).{{0,{context_chars}}}", 0)
    tagged = F.regexp_replace(frag, f"(?i)({alt})", f"{pre}$1{post}")
    return topk_with_text.withColumn("snippet", tagged)
