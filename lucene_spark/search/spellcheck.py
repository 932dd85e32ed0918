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

import pandas as pd
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
    distance: str = "internal",
) -> DataFrame:
    """Top-n corrections for `term`: (term, df, ed, similarity) ordered by
    (similarity desc, df desc, term asc) — DirectSpellChecker's ScoreTerm
    ordering (DirectSpellChecker.java suggestSimilar + ScoreTerm.compareTo).

    `more_popular_than` implements SuggestMode.SUGGEST_MORE_POPULAR:
    pass the query term's own df to only surface more frequent terms.

    `distance` selects the similarity that ORDERS the results — Solr's
    spellcheck.distanceMeasure (DirectSolrSpellChecker wires
    setDistance): "internal" is DirectSpellChecker's own
    1 - ed/min(len); "levenshtein" / "lucene_levenshtein" /
    "jaro_winkler" / "ngram" rescore the edit-bounded candidate set
    with the matching spell.StringDistance (search/stringdist.py),
    Arrow-batched. Candidate GENERATION stays the Levenshtein automaton
    bound either way, exactly like the reference (the measure only
    reorders)."""
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
    # JVM prefilter O(len·maxEdits); the exact candidate distance is the
    # unrestricted Damerau-Levenshtein, because DirectSpellChecker's
    # FuzzyTermsEnum runs with transpositions=true
    # (DirectSpellChecker.java:415) and the transposition automaton has
    # no OSA restriction — every Damerau-match has plain distance
    # ≤ 2·maxEdits, so the prefilter is lossless.
    # EXACT similarity orders the results (ScoreTerm.compareTo compares
    # the raw float score first — rounding before sorting would let df
    # outrank a strictly more similar term on a rounding tie); the
    # returned column is rounded for display only.
    sim = (F.lit(1.0) - F.col("ed").cast("double")
           / F.least(F.length("term"), F.lit(tlen)).cast("double"))
    from lucene_spark.search.stringdist import damerau_distance

    @F.pandas_udf("int")
    def _osa(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: damerau_distance(t, term))

    cand = (
        cand.withColumn("ed", F.levenshtein(F.col("term"), F.lit(term),
                                            int(2 * max_edits)))
        .filter((F.col("ed") >= 1) & (F.col("ed") <= 2 * max_edits))
        .withColumn("ed", _osa(F.col("term")))
        .filter((F.col("ed") >= 1) & (F.col("ed") <= max_edits))
    )
    if distance != "internal":
        from lucene_spark.search.stringdist import STRING_DISTANCES

        if distance not in STRING_DISTANCES:
            raise ValueError(f"unknown distance measure {distance!r}")
        fn = STRING_DISTANCES[distance]

        @F.pandas_udf("double")
        def _dist(terms: pd.Series) -> pd.Series:
            return terms.map(lambda t: float(fn(t, term)))

        cand = cand.withColumn("__sim", _dist(F.col("term")))
    else:
        cand = cand.withColumn("__sim", sim)
    cand = cand.withColumn("similarity", F.round(F.col("__sim"), 4))
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


def suggest_word_breaks(
    reader: IndexReader,
    term: str,
    max_suggestions: int = 5,
    field: str | None = None,
    suggest_mode: str = "not_in_index",
    sort_method: str = "max",
    min_suggestion_frequency: int = 1,
    min_break_word_length: int = 1,
    max_changes: int = 1,
    max_evaluations: int = 1000,
) -> list[list[tuple[str, int]]]:
    """WordBreakSpellChecker.suggestWordBreaks
    (suggest/spell/WordBreakSpellChecker.java:71-143, 240-310): break a
    run-together term into dictionary words. Every split point where BOTH
    halves clear the frequency floor yields a suggestion; the right half
    recurses while breaks ≤ max_changes (java:277). Returns up to
    max_suggestions lists of (word, docFreq), ordered fewest-breaks
    first, ties by max ('max') or summed ('sum') component frequency
    (BreakSuggestionSortMethod). suggest_mode: 'not_in_index' (default —
    no suggestions when the term itself is indexed, java:97-99),
    'more_popular' (components must beat the term's own df, java:101-104),
    or 'always'. Spark shape: each recursion level resolves ALL its
    candidate halves in ONE batched term_stats lookup (a single pruned
    termdict scan) instead of the reference's per-substring docFreq
    calls."""
    fld = field or reader.default_field
    if max_suggestions < 1:
        return []
    orig_df = reader.term_stats([(fld, term)]).get((fld, term), (0, 0))[0]
    if orig_df > 0 and suggest_mode == "not_in_index":
        return []
    min_freq = min_suggestion_frequency
    if suggest_mode == "more_popular":
        min_freq = max(orig_df, 1)
    mbl = max(min_break_word_length, 1)
    out: list[tuple[int, int, int, list[tuple[str, int]]]] = []
    evals = [0]

    def recurse(text: str, breaks: int, prefix: list[tuple[str, int]]) -> None:
        if len(text) < 2 * mbl or evals[0] >= max_evaluations:
            return
        splits = [(text[:i], text[i:]) for i in range(mbl, len(text) - mbl + 1)]
        words = {w for pair in splits for w in pair}
        stats = reader.term_stats([(fld, w) for w in words])
        for left, right in splits:
            if evals[0] >= max_evaluations:
                break
            evals[0] += 1
            ldf = stats.get((fld, left), (0, 0))[0]
            if ldf < min_freq:
                continue
            rdf = stats.get((fld, right), (0, 0))[0]
            if rdf >= min_freq:
                sug = prefix + [(left, ldf), (right, rdf)]
                freqs = [f for _, f in sug]
                out.append((len(sug) - 1,
                            -(max(freqs) if sort_method == "max" else sum(freqs)),
                            len(out), sug))
            if breaks + 1 <= max_changes:
                recurse(right, breaks + 1, prefix + [(left, ldf)])

    recurse(term, 1, [])
    out.sort(key=lambda t: t[:3])
    return [sug for _, _, _, sug in out[:max_suggestions]]


def suggest_word_combinations(
    reader: IndexReader,
    terms: list[str],
    max_suggestions: int = 5,
    field: str | None = None,
    suggest_mode: str = "not_in_index",
    min_suggestion_frequency: int = 1,
    max_combine_word_length: int = 20,
    max_changes: int = 1,
) -> list[dict]:
    """WordBreakSpellChecker.suggestWordCombinations
    (WordBreakSpellChecker.java:145-239): combine runs of ≤ max_changes+1
    adjacent query terms into one dictionary word. 'not_in_index' keeps
    combinations including ≥1 unindexed component (java doc: "each
    suggestion will include at least one term not in the index");
    'more_popular' requires the combined word's df to beat every
    component's. Returns up to max_suggestions dicts {word, freq,
    indexes} ordered by (fewest combines, freq desc, first index).
    All component and combined dfs resolve in ONE batched term_stats
    call each — two pruned termdict scans total."""
    fld = field or reader.default_field
    if max_suggestions < 1 or not terms:
        return []
    orig = reader.term_stats([(fld, t) for t in terms])
    cands: list[tuple[int, ...]] = []
    for i in range(len(terms)):
        for j in range(i + 1, min(i + max_changes + 1, len(terms))):
            combined = "".join(terms[i:j + 1])
            if len(combined) <= max_combine_word_length:
                cands.append((i, j))
    cstats = reader.term_stats(
        [(fld, "".join(terms[i:j + 1])) for i, j in cands])
    out = []
    for i, j in cands:
        word = "".join(terms[i:j + 1])
        cdf = cstats.get((fld, word), (0, 0))[0]
        comp = [orig.get((fld, t), (0, 0))[0] for t in terms[i:j + 1]]
        if suggest_mode == "more_popular" and cdf < max(comp):
            continue
        if suggest_mode == "not_in_index" and min(comp) != 0:
            continue
        if cdf < min_suggestion_frequency:
            continue
        out.append({"word": word, "freq": cdf,
                    "indexes": tuple(range(i, j + 1))})
    out.sort(key=lambda d: (len(d["indexes"]), -d["freq"], d["indexes"][0]))
    return out[:max_suggestions]
