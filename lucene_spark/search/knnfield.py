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

import os
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


def _shard_topk(unit, doc_ids, graph, qn, kk, eff, n_dead, deleted):
    """Shared per-shard search core: beam search + liveDocs mask + top-k.
    liveDocs travel INTO the shard search (KnnVectorQuery passes them to
    the graph searcher) so tombstoned docs never consume the k budget;
    the beam over-fetches by the delete count (clamped to n = exact)."""
    n = unit.shape[0]
    # num_candidates >= k (KnnFloatVectorQuery requires it)
    beam = n if eff is None else min(max(eff, kk) + n_dead, n)
    ids, sims = search_hnsw(unit, graph, qn, ef=beam)
    docs = doc_ids[ids]
    if n_dead:
        dead = deleted.dead_mask(docs)
        if dead is not None and dead.any():
            docs, sims = docs[~dead], sims[~dead]
    top = min(kk, len(docs))
    return docs[:top], sims[:top]


def knn_field_topk(searcher, field: str, query_vec, k: int = 10,
                   ef: int | None = None, m_neighbors: int = 8,
                   ef_construction: int = 64,
                   strict_sidecar: bool = False) -> DataFrame:
    """Top-k (doc_id, score=cosine) for one query vector over the indexed
    vector field. `ef=None` → exact (beam covers each shard). Returns the
    standard result shape ordered (score desc, doc_id asc).

    When an index-time graph sidecar generation exists for this field
    (index/vecgraph.py — the Lucene90VectorWriter `.vec` role) and
    matches the reader's current docstats generation + graph params, the
    search maps over the sidecar's per-file shards: each task does a
    targeted pyarrow read of its docstats file and DECODES the stored
    graph (worker LRU = decode cache) — zero graph builds on the query
    path, surviving executor restarts. A digest mismatch falls back to
    an in-task build (`strict_sidecar=True` raises instead — the test
    hook proving the zero-build property). Without a sidecar the graph
    is built lazily per scan partition as before."""
    from lucene_spark.index import vecgraph as vg

    reader = searcher.reader
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    epoch = searcher._asm_epoch_base
    kk, eff = int(k), ef
    deleted = searcher._deleted
    n_dead = int(deleted.size)
    spark = reader.spark

    man = vg.sidecar_current(reader, field, m_neighbors, ef_construction)
    if man is not None:
        from lucene_spark.index.layout import derived_path

        ds_dir = derived_path(reader.index_dir, reader.manifest, "docstats")
        npz_dir = os.path.join(reader.index_dir, "vecgraph", man["dir"])
        rows = [(s["file"], s["digest"]) for s in man["shards"]
                if s["n"] > 0]
        if not rows:
            return spark.createDataFrame([], "doc_id long, score double")

        def stored(batches):
            for pdf in batches:
                for file, digest in zip(pdf["file"], pdf["digest"]):
                    doc_ids, vecs = vg._read_shard(
                        os.path.join(ds_dir, file), field)
                    if not doc_ids.size:
                        continue
                    unit = _normalize_rows(vecs)
                    if vg._doc_digest(doc_ids) != digest:
                        # stale shard (docstats rewritten under the
                        # manifest): detected, never silently wrong
                        if strict_sidecar:
                            raise RuntimeError(
                                f"vecgraph sidecar stale for {file}")
                        graph = _graph_for(
                            (epoch, field, file, unit.shape[0]),
                            unit, m_neighbors, ef_construction)
                    else:
                        key = ("vec", field, file, digest)
                        graph = _GRAPH_CACHE.get(key)
                        if graph is None:
                            with np.load(os.path.join(
                                    npz_dir, file + ".npz")) as z:
                                graph = vg._unpack_graph(z)
                            _GRAPH_CACHE[key] = graph
                            while len(_GRAPH_CACHE) > _GRAPH_CACHE_MAX:
                                _GRAPH_CACHE.popitem(last=False)
                        else:
                            _GRAPH_CACHE.move_to_end(key)
                    docs, sims = _shard_topk(unit, doc_ids, graph, qn,
                                             kk, eff, n_dead, deleted)
                    yield pd.DataFrame({
                        "doc_id": docs,
                        "score": sims.astype(np.float64)})

        src = spark.createDataFrame(rows, "file string, digest string")
        cand = (src.repartition(len(rows))
                .mapInPandas(stored, "doc_id long, score double"))
        return (cand.orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))

    if strict_sidecar:
        raise RuntimeError(
            f"no current vecgraph sidecar for field {field!r} "
            "(build_vector_graphs not run, stale docstats generation, "
            "or graph params differ)")

    ds = reader.docstats().select("doc_id", field).filter(
        F.col(field).isNotNull())

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
        tc = TaskContext.get()
        key = (epoch, field, tc.partitionId() if tc else -1, n)
        graph = _graph_for(key, unit, m_neighbors, ef_construction)
        docs, sims = _shard_topk(unit, pdf["doc_id"].to_numpy(), graph,
                                 qn, kk, eff, n_dead, deleted)
        yield pd.DataFrame({
            "doc_id": docs,
            "score": sims.astype(np.float64),
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
