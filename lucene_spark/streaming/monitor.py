"""Percolator / reverse search — the Lucene `monitor` module restated.

Role analogue: lucene/monitor/src/java/org/apache/lucene/monitor/
(Monitor.java, Presearcher.java, QueryAnalyzer.java): stored queries are
indexed; each incoming document is matched against all of them. The
presearcher extracts each query's term requirements so only candidate
queries are evaluated per doc.

Spark-first restatement: the stored queries become a (query_id, term,
occur) TABLE; matching one micro-batch of documents is ONE plan:

    doc tokens (explode, JVM split/UDF-free for whitespace analyzers)
    ⋈ broadcast(query terms)                  ← presearcher term filter
    → groupBy (doc, query) matched-clause counts
    → join per-query requirements, filter satisfied
    → phrase-bearing queries verified with a JVM regexp post-filter

so percolation is a single broadcast-join + aggregation per batch — no
per-(doc, query) Python. Works identically on a static DataFrame or a
Structured Streaming micro-batch (stream-static broadcast joins are
supported by Spark), which is exactly the TopicStream/DaemonStream
continuous-matching surface of the reference
(solr/solrj/.../io/stream/TopicStream.java).

v1 query support: flat boolean over terms — MUST / SHOULD / MUST_NOT
(minimum_should_match=1) — plus quoted exact phrases (verified by anchored
regexp on the raw text, whitespace analyzer). Nested booleans are rejected
at registration time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.analysis import Analyzer, get_analyzer
from lucene_spark.search import plan as P
from lucene_spark.search.qparser import parse_query


@dataclass(frozen=True)
class _StoredQuery:
    query_id: str
    musts: tuple[str, ...]
    shoulds: tuple[str, ...]
    must_nots: tuple[str, ...]
    phrases: tuple[tuple[str, ...], ...]


def _flatten(query_id: str, node: P.Node) -> _StoredQuery:
    musts: list[str] = []
    shoulds: list[str] = []
    must_nots: list[str] = []
    phrases: list[tuple[str, ...]] = []

    def leaf_terms(n: P.Node, occur: P.Occur) -> None:
        into = {P.Occur.MUST: musts, P.Occur.FILTER: musts,
                P.Occur.SHOULD: shoulds, P.Occur.MUST_NOT: must_nots}[occur]
        if isinstance(n, P.TermNode):
            into.append(n.term)
        elif isinstance(n, P.TermInSetNode):
            # an IN-set is a DISJUNCTION: fine as the whole query / a
            # SHOULD clause (any one term counts) and as MUST_NOT (no
            # term may appear); as a required clause among others its
            # at-least-one semantics can't be expressed with the flat
            # matched-term counts — reject, consistent with v1 scope
            if occur in (P.Occur.MUST, P.Occur.FILTER):
                raise ValueError(
                    "monitor v1 does not support a required IN-set "
                    "clause (its at-least-one semantics need per-set "
                    "counting)")
            into.extend(n.terms)
        elif isinstance(n, P.PhraseNode):
            if occur is not P.Occur.MUST and occur is not P.Occur.FILTER:
                # the phrase post-filter REQUIRES presence, so a phrase
                # is only expressible as a required clause; an optional
                # (SHOULD) or negated phrase would silently turn
                # mandatory / unmatchable — reject loudly (v1 scope)
                raise ValueError(
                    "monitor v1 supports phrases as required clauses "
                    "only (not SHOULD/MUST_NOT)")
            phrases.append(n.terms)
            into.extend(n.terms)      # phrase terms are conjunctive requirements
        else:
            raise ValueError(f"monitor v1 supports flat boolean queries; got {n!r}")

    if isinstance(node, P.TermNode):
        leaf_terms(node, P.Occur.MUST)
    elif isinstance(node, P.TermInSetNode):
        leaf_terms(node, P.Occur.SHOULD)   # whole-query IN-set = pure OR
    elif isinstance(node, P.PhraseNode):
        leaf_terms(node, P.Occur.MUST)
    elif isinstance(node, P.BooleanNode):
        for c in node.clauses:
            leaf_terms(c.node, c.occur)
    else:
        raise ValueError(f"monitor v1 supports flat boolean queries; got {node!r}")
    return _StoredQuery(query_id, tuple(musts), tuple(shoulds), tuple(must_nots),
                        tuple(phrases))


class Monitor:
    def __init__(self, spark: SparkSession, analyzer: str = "whitespace"):
        self.spark = spark
        self.analyzer: Analyzer = get_analyzer(analyzer)
        self._queries: list[_StoredQuery] = []

    def register(self, query_id: str, query: str) -> None:
        node = parse_query(query, self.analyzer)
        self._queries.append(_flatten(query_id, node))

    # ---- the percolation plan -------------------------------------------
    def _qterms_df(self) -> DataFrame:
        rows = []
        for q in self._queries:
            for t in q.musts:
                rows.append((q.query_id, t, "MUST"))
            for t in q.shoulds:
                rows.append((q.query_id, t, "SHOULD"))
            for t in q.must_nots:
                rows.append((q.query_id, t, "MUST_NOT"))
        return self.spark.createDataFrame(rows, "query_id string, term string, occur string")

    def _requirements(self) -> DataFrame:
        # mirrors the kernel/parser rule: SHOULD clauses are OPTIONAL when
        # the query also has MUST/FILTER clauses (minimum_should_match=0),
        # required (msm=1) only for pure disjunctions — percolating
        # '+foo bar' must agree with searching the same string
        rows = [(q.query_id, len(set(q.musts)),
                 1 if (q.shoulds and not q.musts) else 0)
                for q in self._queries]
        return self.spark.createDataFrame(
            rows, "query_id string, need_must int, need_should int")

    def match(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """All (doc_id, query_id) matches for a batch (static or streaming
        micro-batch). One broadcast join + one aggregation."""
        if self.analyzer.name == "whitespace":
            tok_col = F.split(F.col(text_col), r"\s+")
        else:
            # any other chain (lowercase/stem/stop) must tokenize docs
            # EXACTLY as register() tokenized the queries, or stored
            # terms never match; Arrow-batched, not per-row Python
            an = self.analyzer
            import pandas as pd

            @F.pandas_udf("array<string>")
            def _tok(texts: pd.Series) -> pd.Series:
                return an.tokenize_series(texts)

            tok_col = _tok(F.col(text_col))
        toks = (
            docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(tok_col).alias("term"))
            .filter(F.col("term") != "")
            .distinct()
        )
        qt = F.broadcast(self._qterms_df())
        hits = (
            toks.join(qt, "term")
            .groupBy("doc_id", "query_id")
            .agg(
                F.count_distinct(F.when(F.col("occur") == "MUST", F.col("term"))).alias("n_must"),
                F.count_distinct(F.when(F.col("occur") == "SHOULD", F.col("term"))).alias("n_should"),
                F.count_distinct(F.when(F.col("occur") == "MUST_NOT", F.col("term"))).alias("n_not"),
            )
        )
        sat = (
            hits.join(F.broadcast(self._requirements()), "query_id")
            .filter((F.col("n_must") >= F.col("need_must"))
                    & (F.col("n_should") >= F.col("need_should"))
                    & (F.col("n_not") == 0))
            .select("doc_id", "query_id")
        )
        # phrase verification post-filter (JVM regexp on the raw text)
        phrase_qs = [q for q in self._queries if q.phrases]
        if phrase_qs:
            texts = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))
            sat = sat.join(texts, "doc_id", "left")
            cond = None
            for q in phrase_qs:
                # EVERY phrase of the query must be present (they are
                # required clauses): AND the per-phrase regexes — a
                # joined alternation would accept any one of them
                ok = None
                for ph in q.phrases:
                    rx = (r"(^|\s)" + r"\s+".join(re.escape(t) for t in ph)
                          + r"(\s|$)")
                    t = F.col("__text").rlike(rx)
                    ok = t if ok is None else (ok & t)
                bad = (F.col("query_id") == q.query_id) & ~ok
                cond = bad if cond is None else (cond | bad)
            sat = sat.filter(~cond).drop("__text")
        return sat

    def start_stream(self, docs_stream: DataFrame, id_col: str, text_col: str,
                     process, checkpoint_dir: str, available_now: bool = True):
        """Streaming percolation via foreachBatch: matching is scoped to
        each micro-batch ON PURPOSE — a global streaming aggregation would
        accumulate matched-clause counts across batches and match queries
        against token sets spanning documents from different arrivals.
        `process(matches_df, batch_id)` receives each batch's matches."""

        def fb(batch_df: DataFrame, batch_id: int) -> None:
            process(self.match(batch_df, id_col, text_col), batch_id)

        writer = (
            docs_stream.writeStream.foreachBatch(fb)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def percolate(spark: SparkSession, queries: list[tuple[str, str]], docs: DataFrame,
              id_col: str, text_col: str, analyzer: str = "whitespace") -> DataFrame:
    m = Monitor(spark, analyzer)
    for qid, q in queries:
        m.register(qid, q)
    return m.match(docs, id_col, text_col)
