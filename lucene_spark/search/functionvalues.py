"""Index-stat function values — the TermFreqValueSource family.

Role analogue: lucene/queries/src/java/org/apache/lucene/queries/function/
valuesource/ TermFreqValueSource.java (raw postings freq, 0 when the doc
has no posting), TFValueSource.java (TFIDFSimilarity.tf(freq) — Classic's
sqrt), NormValueSource.java:70-94 (the similarity's norm contribution at
tf=1/idf=1 — for Classic that is lengthNorm = 1/sqrt(doclen); this engine
keeps EXACT doclens, the north rule's lossy-norm-free variant, so the
value is exact rather than SmallFloat-requantized), DocFreqValueSource /
IDFValueSource (ClassicSimilarity.idf(df, docCount) = ln((N+1)/(df+1))+1),
TotalTermFreqValueSource / SumTotalTermFreqValueSource / MaxDocValueSource
/ NumDocsValueSource (reader constants).  Solr exposes these as the
termfreq()/tf()/norm()/docfreq()/idf()/totaltermfreq() function queries
(ValueSourceParser.java).

Spark shape: ONE bucket-pruned postings scan for the term, vectorized
VByte decode in mapInPandas, then a left join onto the docstats sidecar —
every doc gets a row (absent term → termfreq 0, exactly the reference's
zero-freq PostingsEnum stub in TermFreqValueSource).  The constants ride
as literal columns, so the whole result stays one narrow JVM plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.combined import _decode_partition

__all__ = ["term_function_values", "classic_idf"]


def classic_idf(df: int, doc_count: int) -> float:
    """ClassicSimilarity.idf(docFreq, docCount) (:62-64)."""
    return math.log((doc_count + 1) / (df + 1)) + 1.0


def term_postings_df(reader, field: str | None, term: str) -> DataFrame:
    """Decoded (doc_id, termfreq) rows for one indexed term — the
    PostingsEnum the ValueSources iterate, as a DataFrame."""
    fld = field or reader.default_field
    post = reader.postings_for_terms([(fld, term)]).select(
        "field", "doc_blob", "tf_blob")
    return (post.mapInPandas(_decode_partition,
                             "field string, doc_id long, tf long")
            .select("doc_id", F.col("tf").alias("termfreq")))


def term_function_values(reader, term: str, field: str | None = None,
                         include_norm: bool = True) -> DataFrame:
    """One row per document in the index with the function-query columns:

      doc_id, termfreq (long), tf (double — sqrt(termfreq)),
      norm (double — 1/sqrt(doclen)), docfreq (long), idf (double),
      totaltermfreq (long), maxdoc (long), numdocs (long),
      sumtotaltermfreq (long)

    Mirrors a Solr `fl=termfreq(f,t),tf(f,t),...` projection over the
    whole reader."""
    fld = field or reader.default_field
    stats = reader.term_stats([(fld, term)])
    df_, cf = stats.get((fld, term), (0, 0))
    n = reader.doc_count
    fstat = reader.field_stats.get(fld, {})
    sum_ttf = int(fstat.get("sum_ttf", reader.sum_doclen))

    base = reader.docstats().select("doc_id", "doclen")
    tf = term_postings_df(reader, fld, term)
    out = (base.join(tf, "doc_id", "left")
           .withColumn("termfreq",
                       F.coalesce(F.col("termfreq"), F.lit(0)).cast("long"))
           .withColumn("tf", F.sqrt(F.col("termfreq").cast("double"))))
    if include_norm:
        out = out.withColumn(
            "norm", F.lit(1.0) / F.sqrt(F.col("doclen").cast("double")))
    return (out.drop("doclen")
            .withColumn("docfreq", F.lit(int(df_)).cast("long"))
            .withColumn("idf", F.lit(classic_idf(df_, n)))
            .withColumn("totaltermfreq", F.lit(int(cf)).cast("long"))
            .withColumn("maxdoc", F.lit(n).cast("long"))
            .withColumn("numdocs", F.lit(n).cast("long"))
            .withColumn("sumtotaltermfreq", F.lit(sum_ttf).cast("long")))
