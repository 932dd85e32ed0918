"""Vector fields on the index — the VectorField / vector-format role.

Reference mapping:
- document/VectorField.java (a per-document float vector as a FIELD of
  the index, declared at indexing time) → `IndexConfig.carry_cols`: the
  vector source column rides the docstats sidecar, co-partitioned with
  the doc ids — exactly where the reference's vector file lives
  (alongside the segment; codecs/lucene90/Lucene90VectorWriter.java
  writes `.vec` next to the postings).
- util/hnsw/HnswGraphSearcher (beam search over a proximity graph) →
  the per-partition NSW graphs of pipeline/ann.py, run inside ONE
  mapInPandas pass over the docstats partitions: each task builds (or
  cache-hits) its shard's graph, beam-searches the broadcast query, and
  emits shard top-k; a windowed merge picks the global k (the
  TopDocs.merge shape every searcher path uses).
- Lucene builds the graph at INDEX time (Lucene90VectorWriter); here the
  graph is built lazily on first search and kept in a worker-resident
  LRU keyed by (reader epoch, field, partition) — the decoded-postings
  cache pattern (searcher._ASM_CACHE). Tradeoff documented: first query
  per partition pays the build; every later query (the serving steady
  state) rides the cache. The corpus is never shuffled for a KNN query.
- search/KnnVectorQuery semantics: `ef >= partition size` saturates the
  beam, so the search is EXACT over the chain-connected graph
  (pipeline/ann.py build invariant) — the oracle gate pins this
  degenerate mode against brute-force cosine SQL; partial-ef recall is
  a measured property (tests).

Hybrid retrieval: `knn_rescore` blends a BM25 candidate set with vector
cosine (the KnnVectorQuery-plus-rescore pattern), joining kernel scores
with the vector sidecar — broadcast on the k-row side.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.pipeline.ann import (
    _normalize_rows,
    build_hnsw,
    search_hnsw,
)

# worker-resident shard graph LRU: (epoch, field, partition_id, n) →
# hierarchical graph (layers, entry, levels). Bounded by entry count —
# graphs are O(n · m_neighbors · levels) ints beside the unit matrix the
# task already held.
_GRAPH_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_GRAPH_CACHE_MAX = 64


def _graph_for(key, unit: np.ndarray, m_neighbors: int, ef_c: int):
    g = _GRAPH_CACHE.get(key)
    if g is not None:
        _GRAPH_CACHE.move_to_end(key)
        return g
    graph = build_hnsw(unit, m_neighbors=m_neighbors, ef_construction=ef_c)
    _GRAPH_CACHE[key] = graph
    while len(_GRAPH_CACHE) > _GRAPH_CACHE_MAX:
        _GRAPH_CACHE.popitem(last=False)
    return graph


def knn_field_topk(searcher, field: str, query_vec, k: int = 10,
                   ef: int | None = None, m_neighbors: int = 8,
                   ef_construction: int = 64) -> DataFrame:
    """Top-k (doc_id, score=cosine) for one query vector over the indexed
    vector field. `ef=None` → exact (beam covers each shard). Returns the
    standard result shape ordered (score desc, doc_id asc)."""
    reader = searcher.reader
    ds = reader.docstats().select("doc_id", field).filter(
        F.col(field).isNotNull())
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    epoch = searcher._asm_epoch_base
    kk, eff = int(k), ef
    # liveDocs travel INTO the shard search (KnnVectorQuery passes
    # liveDocs to the graph searcher) so tombstoned docs never consume
    # the per-shard k budget; the graph itself is built over ALL docs
    # (delete-independent — the cache key stays valid across delete sets)
    # and the beam over-fetches by the delete count so k LIVE results
    # survive the mask. Rides PySpark's automatic command broadcast.
    deleted = searcher._deleted
    n_dead = int(deleted.size)

    def shard(batches):
        from pyspark import TaskContext

        chunks = [p for p in batches if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        vecs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in pdf[field]])
        unit = _normalize_rows(vecs)
        n = unit.shape[0]
        # num_candidates >= k (KnnFloatVectorQuery requires it), plus the
        # delete over-fetch; saturates to n (exact) when deletes dominate
        beam = n if eff is None else min(max(eff, kk) + n_dead, n)
        tc = TaskContext.get()
        key = (epoch, field, tc.partitionId() if tc else -1, n)
        graph = _graph_for(key, unit, m_neighbors, ef_construction)
        ids, sims = search_hnsw(unit, graph, qn, ef=beam)
        docs = pdf["doc_id"].to_numpy()[ids]
        if n_dead:
            dead = deleted.dead_mask(docs)
            if dead is not None and dead.any():
                docs, sims = docs[~dead], sims[~dead]
        top = min(kk, len(docs))
        yield pd.DataFrame({
            "doc_id": docs[:top],
            "score": sims[:top].astype(np.float64),
        })

    cand = ds.mapInPandas(shard, "doc_id long, score double")
    return (cand.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def knn_rescore(searcher, query, field: str, query_vec, k: int = 10,
                n_candidates: int = 100, alpha: float = 0.5) -> DataFrame:
    """Hybrid BM25 + vector retrieval: take the BM25 top-n_candidates,
    join their vectors from the docstats sidecar (broadcast on the
    candidate side — the hydrate() direction), and rerank by
    alpha·cosine + (1-alpha)·minmax-normalized BM25. The
    KnnVectorQuery-rescoring pattern with the blend explicit."""
    reader = searcher.reader
    # collect the k-row candidate list ONCE (n_candidates rows — driver-
    # trivial); the BM25 search never re-executes, and the min/max for
    # the blend normalization come from the same rows
    cand_rows = searcher.search(query, k=n_candidates).collect()
    if not cand_rows:
        return searcher.reader.spark.createDataFrame(
            [], "doc_id long, score float, cosine double")
    scores = [float(r["score"]) for r in cand_rows]
    lo, hi = min(scores), max(scores)
    span = (hi - lo) or 1.0
    cand = reader.spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in cand_rows],
        "doc_id long, score float")
    ds = reader.docstats().select("doc_id", field)
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)

    joined = ds.join(F.broadcast(cand), "doc_id")

    @F.pandas_udf("double")
    def _cos(vs: pd.Series) -> pd.Series:
        def one(v):
            a = np.asarray(v, dtype=np.float64)
            nrm = float(np.linalg.norm(a))
            return float(a @ qn / nrm) if nrm > 0 else 0.0
        return vs.map(one)

    scored = joined.withColumn("cosine", _cos(F.col(field)))
    blended = scored.withColumn(
        "blend",
        F.lit(alpha) * F.col("cosine")
        + F.lit(1.0 - alpha) * (F.col("score") - F.lit(lo)) / F.lit(span))
    return (blended.select("doc_id", F.col("blend").alias("score"),
                           "cosine")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))
