"""Significant terms — terms over-represented in a result set vs the corpus.

Role analogue: Solr's significantTerms stream / query parser
(solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
SignificantTermsStream.java:59; scoring in solr/core/src/java/org/apache/
solr/search/SignificantTermsQParserPlugin.java:212):

    score = log(fg) * (log((numDocs + 1) / (docFreq + 1)) + 1.0)

where fg = number of RESULT-SET docs containing the term, docFreq = the
term's background document frequency over the whole index, numDocs =
index size; terms outside [min_df, max_df_ratio·numDocs] background
bounds are excluded (the plugin's minDocs/maxDocs gates).

Spark-first restatement: Solr walks every term's postings and intersects
with the result docset. Columnar Spark inverts that: re-derive term
vectors for ONLY the matched docs (one map-side mapInPandas over the
hydrated slice — O(result set), not O(index)), aggregate distinct-doc
counts per term, then broadcast-join the tiny per-term foreground table
against the termdict for background df. The full index is never
re-scanned; the termdict lookup is the same bucketed stats read every
query uses. At 100 TB the result slice is the only data touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.reader import IndexReader
from lucene_spark.index.termvectors import term_vectors


def significant_terms(
    reader: IndexReader,
    matched_keys: DataFrame,
    corpus: DataFrame,
    key_col: str,
    text_col: str,
    k: int = 20,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
    analyzer: str | None = None,
    field: str | None = None,
) -> DataFrame:
    """Top-k significant terms of the docs in `matched_keys` (a one-column
    DataFrame of `key_col` values, e.g. a search() result joined back to
    external keys). Returns (term, fg, df, score) ordered by
    (score desc, term asc), ties broken lexicographically.

    `analyzer` defaults to the INDEX FIELD'S chain — foreground terms
    must be produced by the same analyzer as the background termdict or
    the join silently mismatches (e.g. unstemmed fg vs stemmed bg)."""
    n_docs = max(int(reader.doc_count), 1)
    if field is None:
        field = reader.default_field
    if analyzer is None:
        analyzer = reader.field_analyzer_name(field)
    hydrated = corpus.join(matched_keys.select(key_col).distinct(), key_col)
    fg = (
        term_vectors(hydrated, text_col, key_col, analyzer=analyzer)
        .groupBy("term")
        .agg(F.count("*").alias("fg"))   # term_vectors: one row per (doc, term)
    )
    td = reader.termdict()
    bg = td.filter(F.col("field") == field).select("term", "df")
    # fg is tiny (terms of k-ish matched docs) but its size is opaque to
    # the planner — broadcast explicitly so the termdict is never
    # shuffled (the O(vocabulary) rescan this design exists to avoid)
    out = (
        bg.join(F.broadcast(fg), "term")
        .filter((F.col("df") >= F.lit(int(min_df)))
                & (F.col("df") <= F.lit(float(max_df_ratio) * n_docs)))
        .withColumn(
            "score",
            F.log(F.col("fg").cast("double"))
            * (F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    return out.orderBy(F.col("score").desc(), F.col("term").asc()).limit(k)
