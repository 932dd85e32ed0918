"""FastVectorHighlighter — offset-exact, phrase-aware highlighting.

Role analogue: lucene/highlighter/src/java/org/apache/lucene/search/
vectorhighlight/ — FastVectorHighlighter.java builds fragments from the
term vectors' stored POSITIONS AND OFFSETS (FieldTermStack reads
TermVectorsReader, no re-analysis of the stored text), and
FieldPhraseList.java matches PHRASES against consecutive vector
positions so "quick brown" only highlights where the words are
adjacent — the two properties that distinguish FVH from the plain
highlighter.

Spark restatement: a mapInPandas pass tokenizes with offsets (the
re.finditer twin of the index chain's pattern tokenizer — character
offsets index the ORIGINAL text, with per-token lowercasing exactly
like Tokenizer → LowerCaseFilter), builds the per-document term stack,
walks phrase matches position-consecutively, and emits one fragment
around the first phrase hit with EVERY in-fragment occurrence wrapped.
Zero shuffles — highlighting is embarrassingly per-row.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from lucene_spark.analysis import get_analyzer

__all__ = ["fvh_highlight", "tokens_with_offsets"]


def tokens_with_offsets(text: str, an) -> list[tuple[str, int, int]]:
    """(term, start, end) triples over the ORIGINAL text — the
    storeTermVectorOffsets channel.  Pattern-tokenizer chains only
    (custom/WDGF tokenizers own their offsets and are out of scope
    here, like FVH requires offsets to have been stored)."""
    if an.custom_tokenizer or an.word_delimiter or an.split_camel:
        raise ValueError(
            f"analyzer {an.name!r} does not produce character offsets")
    if an.stemmer or an.normalizer or an.common_grams or an.shingle_size > 1:
        # these stages change the TERMS (stem/normalize) or add tokens
        # with no character span of their own (grams/shingles) — the
        # offset stream would silently disagree with tokenize_one's
        # terms and every phrase lookup would miss. FVH requires offsets
        # for the exact indexed terms; reject rather than return nothing.
        raise ValueError(
            f"analyzer {an.name!r} rewrites terms after tokenization "
            "(stemmer/normalizer/common_grams/shingles) — offsets would "
            "not align with its term stream")
    # the chain case-folds the string BEFORE pattern matching
    # (tokenize_pandas); matching the lowered twin keeps the emitted
    # terms chain-identical while offsets index the original text
    # (str.lower is length-preserving for the BMP text this serves;
    # length-changing folds would need true offset correction à la
    # Lucene's offset attributes)
    hay = text.lower() if an.lowercase else text
    out = []
    for m in re.finditer(an.token_pattern, hay):
        t = m.group(0)
        if len(t) > an.max_token_length or t in an.stopwords:
            continue
        out.append((t, m.start(), m.end()))
    return out


def _phrase_spans(toks: list[tuple[str, int, int]],
                  phrase: list[str]) -> list[tuple[int, int]]:
    """Character spans where `phrase` occurs with CONSECUTIVE tokens —
    FieldPhraseList's adjacency walk."""
    n, k = len(toks), len(phrase)
    return [
        (toks[i][1], toks[i + k - 1][2])
        for i in range(n - k + 1)
        if all(toks[i + j][0] == phrase[j] for j in range(k))
    ]


def fvh_highlight(docs: DataFrame, text_col: str, key_col: str,
                  phrases: list[str], analyzer: str = "whitespace",
                  margin: int = 40, pre: str = "<b>",
                  post: str = "</b>", max_fragments: int = 1) -> DataFrame:
    """(key, fragment, snippet) rows for documents matching ANY of
    `phrases` (each a space-separated word sequence, analyzed with the
    field's chain).  Fragments are built greedily in document order
    (SimpleFragListBuilder's forward walk): each starts at
    [hit_start - margin, hit_end + margin], swallows every later hit
    that fits, and the next fragment starts at the first hit beyond it;
    up to `max_fragments` per document (hl.snippets), numbered 0..n in
    document order.  Every phrase occurrence inside a fragment is
    wrapped.  Documents with no phrase-adjacent hit produce NO row
    (FVH returns null fragments for them)."""
    an = get_analyzer(analyzer)
    qseqs = []
    for p in phrases:
        seq = an.tokenize_one(p)
        if seq:
            qseqs.append(seq)
    if not qseqs:
        raise ValueError("no analyzable phrase")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, frags, snips = [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                if not isinstance(text, str) or not text:
                    continue
                toks = tokens_with_offsets(text, an)
                for fi, snip in _build_fragments(
                        text, toks, qseqs, margin, pre, post, max_fragments):
                    keys.append(key)
                    frags.append(fi)
                    snips.append(snip)
            yield pd.DataFrame({"key": keys, "fragment": frags,
                                "snippet": snips})

    key_type = docs.schema[key_col].dataType.simpleString()
    return docs.select(key_col, text_col).mapInPandas(
        run, f"key {key_type}, fragment int, snippet string")


def _build_fragments(text: str, toks, qseqs, margin: int, pre: str,
                     post: str, max_fragments: int) -> list[tuple[int, str]]:
    """Greedy document-order fragment walk (SimpleFragListBuilder) —
    shared by the re-tokenizing and stored-vector paths."""
    spans = sorted(s for q in qseqs for s in _phrase_spans(toks, q))
    out: list[tuple[int, str]] = []
    fi = 0
    si = 0
    while si < len(spans) and fi < max_fragments:
        lo = max(0, spans[si][0] - margin)
        hi = min(len(text), spans[si][1] + margin)
        inside = [(s, e) for s, e in spans[si:] if s >= lo and e <= hi]
        parts, cur = [], lo
        for s, e in inside:
            if s < cur:          # overlapping phrase hits: keep first
                continue
            parts.append(text[cur:s])
            parts.append(pre + text[s:e] + post)
            cur = e
        parts.append(text[cur:hi])
        out.append((fi, "".join(parts)))
        fi += 1
        # next fragment starts at the first hit NOT fully consumed by
        # this window — a straddler must open the next fragment
        si = next((k for k in range(si, len(spans))
                   if not (spans[k][0] >= lo and spans[k][1] <= hi)),
                  len(spans))
    return out


def fvh_highlight_from_vectors(docs: DataFrame, text_col: str,
                               key_col: str, terms_col: str,
                               starts_col: str, ends_col: str,
                               phrases: list[str],
                               analyzer: str = "whitespace",
                               margin: int = 40, pre: str = "<b>",
                               post: str = "</b>",
                               max_fragments: int = 1) -> DataFrame:
    """FVH from STORED term vectors — the actual FieldTermStack contract
    (vectorhighlight/FieldTermStack.java reads TermVectorsReader's
    positions+offsets; the text is never re-analyzed at query time).
    `docs` carries the stored field (`text_col`) plus the offset-bearing
    vector columns (`terms_col`/`starts_col`/`ends_col` — produced at
    index time by index/termvectors.term_vectors_with_offsets). Only the
    QUERY phrases run the analyzer; each document's term stack comes
    straight from its stored arrays. Output and semantics are identical
    to fvh_highlight (tested), which remains the re-analysis fallback
    for fields indexed without vectors."""
    an = get_analyzer(analyzer)
    qseqs = [an.tokenize_one(p) for p in phrases]
    qseqs = [q for q in qseqs if q]
    if not qseqs:
        raise ValueError("no analyzable phrase")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, frags, snips = [], [], []
            for key, text, terms, starts, ends in zip(
                    pdf[key_col], pdf[text_col], pdf[terms_col],
                    pdf[starts_col], pdf[ends_col]):
                if not isinstance(text, str) or not text or terms is None:
                    continue
                toks = [(t, int(s), int(e))
                        for t, s, e in zip(terms, starts, ends)]
                for fi, snip in _build_fragments(
                        text, toks, qseqs, margin, pre, post, max_fragments):
                    keys.append(key)
                    frags.append(fi)
                    snips.append(snip)
            yield pd.DataFrame({"key": keys, "fragment": frags,
                                "snippet": snips})

    key_type = docs.schema[key_col].dataType.simpleString()
    return docs.select(key_col, text_col, terms_col, starts_col,
                       ends_col).mapInPandas(
        run, f"key {key_type}, fragment int, snippet string")
