"""Spell correction — the lucene/suggest spell package restated.

Role analogues:
- `suggest/spell/DirectSpellChecker.java`: candidates straight from the
  live term dictionary within `maxEdits` of the query term, sharing a
  `minPrefix`-char prefix, a term treated as misspelled only while its
  docFreq stays under `maxQueryFrequency`·maxDoc, suggestions optionally
  required to be more popular than the query term.
- `suggest/spell/LevenshteinDistance.java` (getDistance): string
  similarity = 1 − ed / min(|a|, |b|) — the default ranking key, ties
  broken by docFreq then term.
- `solr/core/.../spelling/SpellCheckCollator.java`: collation = the
  original query with every misspelled term replaced by its top
  suggestion.

Spark shape: the sorted termdict parquet plays the FST/terms-enum role.
A length band + first-char prefix filter prunes the dictionary scan
JVM-side before the (thresholded) `levenshtein` — the same pruning the
reference gets from its Levenshtein automaton intersection, expressed as
predicates Catalyst pushes into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.reader import IndexReader


def suggest_similar(
    reader: IndexReader,
    term: str,
    n: int = 5,
    field: str | None = None,
    max_edits: int = 2,
    min_prefix: int = 1,
    more_popular_than: int = 0,
) -> DataFrame:
    """Top-n corrections for `term`: (term, df, ed, similarity) ordered by
    (similarity desc, df desc, term asc) — DirectSpellChecker's ScoreTerm
    ordering (DirectSpellChecker.java suggestSimilar + ScoreTerm.compareTo).

    `more_popular_than` implements SuggestMode.SUGGEST_MORE_POPULAR:
    pass the query term's own df to only surface more frequent terms.
    """
    if not 1 <= max_edits <= 2:
        raise ValueError("max_edits must be 1 or 2 (LevenshteinAutomata bound)")
    f = field or reader.default_field
    tlen = len(term)
    cand = (
        reader.termdict()
        .filter(F.col("field") == f)
        .filter(F.length("term").between(tlen - max_edits, tlen + max_edits))
        .filter(F.col("term") != term)
    )
    if min_prefix > 0:
        cand = cand.filter(F.col("term").startswith(term[:min_prefix]))
    if more_popular_than > 0:
        cand = cand.filter(F.col("df") > int(more_popular_than))
    # thresholded levenshtein (returns -1 past the threshold) keeps the
    # comparison O(len·maxEdits); threshold must be a Python int.
    # EXACT similarity orders the results (ScoreTerm.compareTo compares
    # the raw float score first — rounding before sorting would let df
    # outrank a strictly more similar term on a rounding tie); the
    # returned column is rounded for display only.
    sim = (F.lit(1.0) - F.col("ed").cast("double")
           / F.least(F.length("term"), F.lit(tlen)).cast("double"))
    cand = (
        cand.withColumn("ed", F.levenshtein(F.col("term"), F.lit(term), int(max_edits)))
        .filter(F.col("ed") >= 1)
        .withColumn("__sim", sim)
        .withColumn("similarity", F.round(F.col("__sim"), 4))
    )
    return (
        cand.orderBy(F.col("__sim").desc(), F.col("df").desc(), F.col("term").asc())
        .select("term", "df", "ed", "similarity")
        .limit(n)
    )


def collate(
    searcher,
    query: str,
    max_query_frequency: float = 0.01,
    max_edits: int = 2,
    min_prefix: int = 1,
) -> tuple[str, dict[str, str]]:
    """Did-you-mean collation (SpellCheckCollator.collate): analyze the
    free-text query, find a top more-popular suggestion for every
    misspelled token (df/maxDoc ≤ `max_query_frequency`), and return
    (collated query string, {original: replacement}). The collation is
    the ORIGINAL query with only the misspelled words swapped — the
    SpellCheckCollator contract — so case, stopwords, and unstemmed
    forms of correctly-spelled words survive; each original word maps to
    a replacement via its own analyzed form.

    Driver-side work is bounded by the number of DISTINCT misspelled
    tokens (memoized); each suggestion lookup is one pruned termdict
    scan.
    """
    import re

    reader = searcher.reader
    field = reader.default_field
    an = searcher.analyzer
    tokens = an.tokenize_one(query)
    stats = reader.term_stats([(field, t) for t in tokens])
    n_docs = max(reader.doc_count, 1)
    replacements: dict[str, str] = {}
    for tok in dict.fromkeys(tokens):           # distinct, order kept
        df = stats.get((field, tok), (0, 0))[0]
        if df > max_query_frequency * n_docs:
            continue
        best = suggest_similar(
            reader, tok, n=1, field=field, max_edits=max_edits,
            min_prefix=min_prefix, more_popular_than=df,
        ).collect()
        if best:
            replacements[tok] = best[0]["term"]

    def fix_word(m: re.Match) -> str:
        word = m.group(0)
        analyzed = an.tokenize_one(word)
        if len(analyzed) == 1 and analyzed[0] in replacements:
            return replacements[analyzed[0]]
        return word

    collated = re.sub(r"\w+", fix_word, query)
    return collated, replacements
