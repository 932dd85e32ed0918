"""Declarative BM25 — the whole ranking expressed as a Catalyst plan.

This is the "IndexOrDocValuesQuery" second physical strategy
(reference: lucene/core/src/java/org/apache/lucene/search/IndexOrDocValuesQuery.java:51):
the same BM25 semantics as the postings-backed kernel, but computed as a
pure DataFrame plan straight off the corpus table — tokenize (JVM-side
split), explode, two aggregations, broadcast stat joins, windowed top-k.
Catalyst gets to do predicate pushdown / partial aggregation / broadcast
planning; there is zero Python in the plan.

Uses float64 end-to-end (the engine kernel uses float32 for Lucene
rank-parity; this path is the ANSI-SQL-reproducible variant used by the
external DuckDB oracle gate). Formula is Lucene's exact BM25 variant
(search/similarities/BM25Similarity.java:104-107,114-117,246-258):

    idf   = ln(1 + (N - df + 0.5)/(df + 0.5))
    norm  = k1 * (1 - b + b * dl/avgdl)
    score = sum over query terms of idf * tf / (tf + norm)

Scale notes: the token explode is map-side only; tf/dl aggregations are
partially aggregated before shuffle; `df` for the handful of query terms
and the 1-row collection stats are broadcast; the final top-k is a
TakeOrderedAndProject over (rounded score, doc id) — no global sort
materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

K1 = 1.2
B = 0.75
TOKEN_SPLIT = r"\s+"


def tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term) pairs via JVM-side whitespace split (whole-stage codegen)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(F.split(F.col(text_col), TOKEN_SPLIT)).alias("term"))
        .filter(F.col("term") != "")
    )


def bm25_topk_sql(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    mode: str = "or",
    round_to: int = 4,
) -> DataFrame:
    """Top-k BM25 as one declarative plan.

    mode='or'  → docs matching any term (BooleanQuery SHOULD)
    mode='and' → docs matching all terms (BooleanQuery MUST)
    Returns (doc_id, score_r, rank) — score rounded to `round_to`, rank
    over (score_r desc, doc_id asc): Lucene's TopDocs tie order
    (search/TopScoreDocCollector.java:90-93).
    """
    qterms = sorted(set(query_terms))
    tok = tokens(docs, id_col, text_col)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    st = dl.agg(F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl"))
    qdf = (
        tf.filter(F.col("term").isin(qterms))
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
    per_term = (
        tf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .withColumn("s", idf * F.col("tf") / (F.col("tf") + norm))
    )
    agg = per_term.groupBy("doc_id").agg(
        F.sum("s").alias("s"), F.count("*").alias("nmatch")
    )
    if mode == "and":
        agg = agg.filter(F.col("nmatch") == len(qterms))
    scored = agg.select("doc_id", F.round(F.col("s"), round_to).alias("score_r"))
    w = Window.orderBy(F.col("score_r").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "score_r", "rank")
    )


def choose_bm25_backend(reader, terms: list[str], scan_threshold: float = 0.2,
                        field: str | None = None) -> str:
    """Cost-based physical-plan choice — the IndexOrDocValuesQuery role
    (search/IndexOrDocValuesQuery.java:51): two physical strategies exist
    for the same BM25 semantics — the bucket-pruned postings kernel
    (cheap when query terms are selective: it touches Σdf posting entries
    across the pruned buckets) and the declarative corpus-scan plan in
    this module (cheap when the query matches most of the corpus: one
    streaming pass, no per-term row lookups, and Catalyst fuses it with
    downstream relational work).

    Decision mirrors Lucene's estimateCost comparison: prefer the
    postings path while Σdf / (N · |terms|) stays under `scan_threshold`.
    Caveat (documented): the kernel scores in float32 (Lucene parity),
    the scan path in float64 — rank-stable on real data, not bit-equal;
    use one backend when bit-stability across calls matters. The scan
    path also requires the corpus table and a tokenizer the scan can
    reproduce (whitespace)."""
    stats = reader.term_stats([(field or reader.default_field, t) for t in terms])
    n = max(reader.doc_count, 1)
    total_df = sum(df for df, _ in stats.values())
    return "scan" if total_df > scan_threshold * n * max(len(terms), 1) else "postings"


def bm25_topk_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    mode: str = "or",
    round_to: int = 4,
) -> str:
    """The ANSI-SQL twin of bm25_topk_sql for the DuckDB oracle gate —
    byte-for-byte the same math in float64."""
    qterms = sorted(set(query_terms))
    inlist = ", ".join(f"'{t}'" for t in qterms)
    and_filter = f"WHERE nmatch = {len(qterms)}" if mode == "and" else ""
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id, unnest(string_split_regex({text_col}, '\\s+')) AS term
  FROM {table}
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok2 GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok2 GROUP BY doc_id
), st AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
), qdf AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf WHERE term IN ({inlist}) GROUP BY term
), sc AS (
  SELECT tf.doc_id,
         sum( ln(1 + (st.n - qdf.df + 0.5)/(qdf.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / st.avgdl)) ) AS s,
         count(*) AS nmatch
  FROM tf JOIN qdf ON tf.term = qdf.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN st
  GROUP BY tf.doc_id
), flt AS (
  SELECT doc_id, round(s, {round_to}) AS score_r FROM sc {and_filter}
)
SELECT doc_id, score_r,
       row_number() OVER (ORDER BY score_r DESC, doc_id ASC) AS rank
FROM flt
QUALIFY rank <= {k}
ORDER BY rank
"""
