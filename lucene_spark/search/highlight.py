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

import math
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


#: sentence-unit pattern (BreakIterator.getSentenceInstance role): a run
#: of non-terminators followed by terminator(s) and trailing whitespace,
#: or a final unterminated run.  No lookaround, so an RE2-based oracle
#: (DuckDB regexp_extract_all) reproduces the exact same segmentation.
SENTENCE_RE = r"[^.!?]*[.!?]+\s*|[^.!?]+$"


def highlight_passages(
    topk_with_text: DataFrame,
    text_col: str,
    query_terms: list[str],
    analyzer: str = "whitespace",
    max_passages: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    pivot: float = 87.0,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """UnifiedHighlighter passage formation + PassageScorer ranking
    (uhighlight/PassageScorer.java:40-140, FieldHighlighter passage
    loop): split content into sentence passages, score each

        score = norm(start) · Σ_unique-terms tf(freq_p, len_p) · weight(len_doc, ttf)
        weight(L, ttf) = (k1+1) · ln(1 + (1 + L/pivot + 0.5)/(ttf + 0.5))
        tf(f, l)       = f / (f + k1·(1 − b + b·l/pivot))
        norm(s)        = 1 + 1/ln(pivot + s)

    (all lengths in CHARACTERS; ttf = term occurrences in the whole doc;
    double precision here vs the reference's float32 — structure exact),
    keep the top ``max_passages`` by (score desc, start asc), emit them
    in document order joined by "... " with matches tagged
    (DefaultPassageFormatter).  Adds ``snippet`` and ``passage_score``
    (best passage's score).  Match tagging is offset-free and therefore
    only applied under the whitespace analyzer (tokens == split);
    stemming/lowercasing chains still score and select passages but emit
    them untagged.  Runs after the top-k reduce over ≤k rows — one Arrow
    batch, never a scale concern."""
    an: Analyzer = get_analyzer(analyzer)
    terms = {
        t
        for toks in an.tokenize_series(pd.Series(list(query_terms),
                                                 dtype=object))
        for t in toks
    } if query_terms else set()

    sent_re = re.compile(SENTENCE_RE)

    @F.pandas_udf(T.StructType([
        T.StructField("snippet", T.StringType()),
        T.StructField("passage_score", T.DoubleType()),
    ]))
    def _passages(texts: pd.Series) -> pd.DataFrame:
        snips, scores = [], []
        for text in texts:
            text = text or ""
            pieces = sent_re.findall(text)
            spans = []
            off = 0
            for pc in pieces:
                body = pc.rstrip()
                if body:
                    spans.append((off, body))
                off += len(pc)
            content_len = len(text)
            ttf: dict[str, int] = {}
            per_span = []
            for start, body in spans:
                # scalar twin of tokenize_series (output-identical,
                # property-tested): skips per-span pandas Series
                # construction in this per-sentence hot loop
                toks = an.tokenize_one(body)
                freqs: dict[str, int] = {}
                for t in toks:
                    if t in terms:
                        freqs[t] = freqs.get(t, 0) + 1
                        ttf[t] = ttf.get(t, 0) + 1
                per_span.append((start, body, freqs))
            scored = []
            for start, body, freqs in per_span:
                if not freqs:
                    continue
                plen = len(body)
                s = 0.0
                for t, f in freqs.items():
                    w = (k1 + 1.0) * math.log(
                        1.0 + (1.0 + content_len / pivot + 0.5)
                        / (ttf[t] + 0.5))
                    tfn = f / (f + k1 * ((1.0 - b) + b * (plen / pivot)))
                    s += tfn * w
                s *= 1.0 + 1.0 / math.log(pivot + start)
                scored.append((s, start, body))
            if not scored:
                # no match anywhere: first passage, score 0 (the
                # reference's no-highlight fallback summary)
                snips.append(spans[0][1] if spans else "")
                scores.append(0.0)
                continue
            scored.sort(key=lambda x: (-x[0], x[1]))
            chosen = sorted(scored[:max_passages], key=lambda x: x[1])
            frags = []
            for _, _, body in chosen:
                toks = body.split() if analyzer == "whitespace" else None
                if toks is not None:
                    frags.append(" ".join(
                        f"{pre}{t}{post}" if t in terms else t for t in toks))
                else:
                    frags.append(body)
            snips.append("... ".join(frags))
            scores.append(scored[0][0])
        return pd.DataFrame({"snippet": snips, "passage_score": scores})

    out = topk_with_text.withColumn("__hl", _passages(F.col(text_col)))
    return (out.withColumn("snippet", F.col("__hl.snippet"))
            .withColumn("passage_score", F.col("__hl.passage_score"))
            .drop("__hl"))


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
