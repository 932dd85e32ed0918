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
    """FuzzySuggester: completions within Levenshtein ≤ max_edits of the
    typed text (cheap length pre-filter keeps the dictionary scan tight)."""
    tlen = len(text)
    return (
        reader.termdict()
        .filter(F.col("field") == (field or reader.default_field))
        .filter(F.length("term").between(tlen - max_edits, tlen + max_edits + 2))
        .withColumn("ed", F.levenshtein(F.substring(F.col("term"), 1, tlen), F.lit(text)))
        .filter(F.col("ed") <= max_edits)
        .select("term", "df", "ed")
        .orderBy(F.col("ed").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(n)
    )


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
