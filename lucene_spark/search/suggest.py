"""Autocomplete / spell suggestion — the lucene/suggest module restated.

Role analogue: lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/AnalyzingSuggester.java (FST prefix → completions ordered by
weight) and FuzzySuggester.java (Levenshtein-tolerant prefix). Our sorted
term dictionary plays the FST's role: a prefix scan is a Parquet
row-group-pruned range read (termdict is written term-sorted,
BlockTreeTermsWriter.java:204-210 analogue), and `df` is the weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.reader import IndexReader


def suggest(reader: IndexReader, prefix: str, n: int = 10,
            field: str | None = None) -> DataFrame:
    """Top-n completions for a prefix, ordered by (df desc, term asc)."""
    return (
        reader.termdict()
        .filter(F.col("field") == (field or reader.default_field))
        .filter(F.col("term").startswith(prefix))
        .select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(n)
    )


def suggest_fuzzy(reader: IndexReader, text: str, n: int = 10, max_edits: int = 1,
                  field: str | None = None) -> DataFrame:
    """FuzzySuggester: completions whose PREFIX is within Levenshtein ≤
    max_edits of the typed text. The prefix alignment may be shorter or
    longer than the typed text (an insert/delete typo shifts it), so the
    edit distance is the MINIMUM over candidate prefix lengths
    tlen±max_edits — a fixed tlen-char prefix would overestimate the
    distance for indel typos ("appple" vs "applesauce"). Completions of
    any length qualify (only a LOWER length bound applies: a term
    shorter than tlen - max_edits cannot contain a qualifying prefix)."""
    tlen = len(text)
    lens = [m for m in range(max(1, tlen - max_edits), tlen + max_edits + 1)]
    ed = F.least(*[
        F.levenshtein(F.substring(F.col("term"), 1, m), F.lit(text))
        for m in lens
    ]) if len(lens) > 1 else F.levenshtein(
        F.substring(F.col("term"), 1, lens[0]), F.lit(text))
    return (
        reader.termdict()
        .filter(F.col("field") == (field or reader.default_field))
        .filter(F.length("term") >= max(1, tlen - max_edits))
        .withColumn("ed", ed)
        .filter(F.col("ed") <= max_edits)
        .select("term", "df", "ed")
        .orderBy(F.col("ed").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(n)
    )


def suggest_free_text(reader: IndexReader, context: str, n: int = 10,
                      alpha: float = 0.4, field: str | None = None) -> DataFrame:
    """FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java):
    next-word prediction from an n-gram language model with stupid
    backoff (Brants et al. 2007, the paper the reference cites at
    FreeTextSuggester.java:105): for context word c,

        score(w) = cf("c w") / cf(c)          when the bigram was indexed
                 = alpha · cf(w) / totTokens  backoff otherwise

    Lucene builds a dedicated shingle index for the model; here a field
    analyzed with the shingle chain IS the model — the term dictionary's
    cf column carries exactly the n-gram counts the FST stores, so the
    suggester is two pruned termdict reads and a join, no extra
    artifact. Returns (term, score) ordered by (score desc, term asc);
    higher-order estimates win over backoff for the same word (the
    seen-set dedup in FreeTextSuggester.lookup)."""
    f = field or reader.default_field
    # the lookup key runs through the FIELD'S analyzer chain, exactly as
    # FreeTextSuggester.lookup analyzes its key — a raw split would miss
    # the dictionary whenever the chain lowercases/stems
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer(reader.field_analyzer_name(f))
    ctx_tokens = [t for t in an.tokenize_one(context)
                  if " " not in t]
    if not ctx_tokens:
        raise ValueError("context analyzed to zero tokens")
    ctx = ctx_tokens[-1]
    td = reader.termdict().filter(F.col("field") == f)
    uni = td.filter(~F.col("term").contains(" ")).select("term", "cf")
    # two scalars: the total token count (per-reader constant, memoized
    # like term_stats) and the context unigram count (served by the
    # reader's memoized term_stats — zero extra jobs on repeat lookups)
    if not hasattr(reader, "_ft_tot_cache"):
        reader._ft_tot_cache = {}
    if f not in reader._ft_tot_cache:
        reader._ft_tot_cache[f] = uni.agg(F.sum("cf")).collect()[0][0] or 1
    tot = reader._ft_tot_cache[f]
    ctx_cf = reader.term_stats([(f, ctx)]).get((f, ctx), (0, 0))[1]
    backoff = uni.select(
        "term",
        (F.lit(float(alpha)) * F.col("cf") / F.lit(float(tot))).alias("__bo"))
    if ctx_cf > 0:
        big = (
            td.filter(F.col("term").startswith(ctx + " "))
            .select(
                F.expr(f"substring(term, {len(ctx) + 2})").alias("term"),
                (F.col("cf") / F.lit(float(ctx_cf))).alias("__hi"))
        )
        scored = backoff.join(big, "term", "left").select(
            "term", F.coalesce(F.col("__hi"), F.col("__bo")).alias("score"))
    else:
        scored = backoff.select("term", F.col("__bo").alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col("term").asc()).limit(n)


def suggest_infix(reader: IndexReader, fragment: str, n: int = 10,
                  field: str | None = None) -> DataFrame:
    """AnalyzingInfixSuggester (suggest/analyzing/AnalyzingInfixSuggester.java):
    completions CONTAINING the fragment anywhere, ordered by weight
    (df desc, term asc). Lucene maintains a dedicated edge-ngram sidecar
    index for this; the Spark analogue is a contains-filter over the
    sorted termdict — a full dictionary scan, but the dictionary is tiny
    relative to postings and the predicate stays JVM-side."""
    return (
        reader.termdict()
        .filter(F.col("field") == (field or reader.default_field))
        .filter(F.col("term").contains(fragment))
        .select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(n)
    )
