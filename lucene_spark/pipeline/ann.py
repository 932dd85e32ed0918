"""Graph-based approximate nearest neighbors — the HNSW-class scale path.

Fills the role of Lucene's NSW vector-search graph (LUCENE-9004,
`lucene/CHANGES.txt:13-15`: "Approximate nearest vector search via
NSW graphs"; `lucene/core/src/java/org/apache/lucene/util/hnsw/
HnswGraphBuilder.java` / `HnswGraphSearcher.java` in later snapshots)
re-expressed for Spark's execution model:

**Sharded-graph architecture.** Each Spark partition builds an in-memory
NSW proximity graph over its local vectors (numpy — vectorized distance
evaluation, no per-row Python) inside one `mapInPandas` pass; the (small)
query matrix rides into every task closure; each shard beam-searches its
own graph and emits per-shard top-k; the global answer is a windowed merge
of shard winners — the same merge shape as `pairwise_topk_gemm`. This is
how graph ANN actually deploys on clusters (per-shard graphs + scatter/
gather): the corpus is never shuffled and never leaves its partition, the
graph build is embarrassingly parallel, and query fan-out cost is
(shards × beam) rather than (shards × partition_size).

**Exactness/recall contract.** With `ef >= partition size` the beam never
saturates, so the search visits the entire graph component; the builder
maintains an unprunable sequential chain (node i ↔ i-1) so the graph is
strongly connected by construction — full-`ef` search is therefore EXACT
and oracle-checkable against brute-force cosine SQL (the same
degenerate-to-exact gating used for IVF's nprobe=all). Partial-`ef`
recall is measured in tests (`tests/test_pipeline.py`).

Distances are cosine via dot products over row-normalized float64 copies;
returned `cosine` values are exact for every emitted candidate.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def build_nsw(unit: np.ndarray, m_neighbors: int = 8,
              ef_construction: int = 64) -> list[list[int]]:
    """Incremental NSW build over row-normalized vectors: each new node is
    beam-searched into the current graph (ef_construction beam), linked
    bidirectionally to its m_neighbors nearest, and neighbor lists are
    pruned to 2*m_neighbors by similarity — EXCEPT the sequential chain
    edge (i ↔ i-1), which is exempt from pruning so the graph stays
    strongly connected (full-ef search = exact; see module docstring)."""
    n = unit.shape[0]
    adj: list[list[int]] = [[] for _ in range(n)]
    cap = 2 * m_neighbors
    for i in range(1, n):
        ids, _ = search_nsw(unit, adj, unit[i], ef=ef_construction, n_nodes=i)
        nbrs = list(ids[:m_neighbors])
        if i - 1 not in nbrs:  # chain edge: connectivity invariant
            nbrs.append(i - 1)
        for j in nbrs:
            j = int(j)
            adj[i].append(j)
            adj[j].append(i)
            if len(adj[j]) > cap + 1:
                a = np.array(adj[j])
                sims = unit[a] @ unit[j]
                keep = a[np.argsort(-sims)[:cap]].tolist()
                for chain in (j - 1, j + 1):  # never prune the chain
                    if 0 <= chain < n and chain in adj[j] and chain not in keep:
                        keep.append(chain)
                adj[j] = keep
    return adj


def search_nsw(unit: np.ndarray, adj: list[list[int]], q: np.ndarray,
               ef: int, n_nodes: int | None = None, entry: int = 0):
    """Beam (ef) search from `entry` (default node 0). Returns (ids,
    sims) sorted by (cosine desc, id asc). When ef >= n the early-exit
    never fires and the whole connected component is visited (exact
    search)."""
    n = len(adj) if n_nodes is None else n_nodes
    if n <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    e = int(entry) if 0 <= int(entry) < n else 0
    d0 = float(unit[e] @ q)
    visited = np.zeros(n, dtype=bool)
    visited[e] = True
    cand = [(-d0, e)]      # min-heap on -sim: best candidate first
    result = [(d0, e)]     # min-heap on sim: worst kept result on top
    while cand:
        neg, c = heapq.heappop(cand)
        if len(result) >= ef and -neg < result[0][0]:
            break
        nbr = [x for x in adj[c] if x < n and not visited[x]]
        if not nbr:
            continue
        na = np.array(nbr)
        visited[na] = True
        sims = unit[na] @ q
        floor = result[0][0] if len(result) >= ef else -np.inf
        for s, x in zip(sims.tolist(), na.tolist()):
            if len(result) < ef or s > floor:
                heapq.heappush(cand, (-s, x))
                heapq.heappush(result, (s, x))
                if len(result) > ef:
                    heapq.heappop(result)
                floor = result[0][0] if len(result) >= ef else -np.inf
    out = sorted(result, key=lambda t: (-t[0], t[1]))
    return (np.array([x for _, x in out], dtype=np.int64),
            np.array([s for s, _ in out]))


def nsw_topk(
    df: DataFrame, vec_col: str, key_col: str, query_vecs,
    k: int = 10, m_neighbors: int = 8, ef: int = 64,
    ef_construction: int | None = None,
) -> DataFrame:
    """Graph-ANN top-k for a batch of query vectors over a distributed
    corpus: per-partition NSW graphs, broadcast queries, windowed global
    merge. Returns (query_id, key, cosine), k rows per query, ties broken
    key asc. `ef=None`/huge ef degrades gracefully to exact (beam covers
    the shard). Cost per shard: O(n·efc·deg) build + O(Q·ef·deg) search —
    independent of total corpus size, which is the 100 TB property."""
    qm = np.asarray(query_vecs, dtype=np.float64)
    if qm.ndim == 1:
        qm = qm[None, :]
    qu = _normalize_rows(qm)
    # ef=None = exact (beam covers the shard): use an effectively
    # unbounded beam, as the docstring promises
    eff = int(ef) if ef is not None else (1 << 30)
    efc = ef_construction if ef_construction is not None \
        else max(eff, 2 * m_neighbors)
    mm = m_neighbors
    kk = k

    def shard(batches):
        keys, mats = [], []
        for pdf in batches:
            if len(pdf):
                keys.append(pdf[key_col].to_numpy())
                mats.append(np.array(pdf[vec_col].to_list(), dtype=np.float64))
        if not keys:
            return
        key_arr = np.concatenate(keys)
        unit = _normalize_rows(np.vstack(mats))
        adj = build_nsw(unit, m_neighbors=mm,
                        ef_construction=min(efc, unit.shape[0]))
        frames = []
        for qi in range(qu.shape[0]):
            ids, sims = search_nsw(unit, adj, qu[qi],
                                   ef=min(max(eff, kk), unit.shape[0]))
            top = min(kk, len(ids))
            frames.append(pd.DataFrame({
                "query_id": np.full(top, qi, dtype=np.int32),
                "key": key_arr[ids[:top]].astype(np.int64),
                "cosine": sims[:top],
            }))
        if not frames:   # zero-row query matrix → empty result, not a crash
            yield pd.DataFrame({"query_id": pd.Series([], dtype=np.int32),
                                "key": pd.Series([], dtype=np.int64),
                                "cosine": pd.Series([], dtype=np.float64)})
            return
        yield pd.concat(frames, ignore_index=True)

    out = df.select(key_col, vec_col).mapInPandas(
        shard, schema="query_id int, key long, cosine double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("key").asc())
    return (out.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


# -------------------------- hierarchical HNSW ----------------------------
# The reference's HnswGraphBuilder/HnswGraphSearcher shape
# (lucene/core/src/java/org/apache/lucene/util/hnsw/HnswGraphBuilder.java
# :1-282): nodes get a geometric random level (mL = 1/ln(M)); search
# greedily descends the sparse upper layers to a good entry point, then
# beam-searches the bottom layer. Our determinism twist: the level comes
# from a hash of the node id (splitmix-style), not an RNG — identical
# graphs on every rebuild, which the cache/oracle story needs. Layer 0
# keeps the sequential-chain invariant, so full-ef search remains EXACT
# regardless of which entry the upper layers chose (the degenerate mode
# the ft_knn_field gate pins).

def _hnsw_level(i: int, m_l: float, max_level: int = 8) -> int:
    x = (i + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    u = ((x >> 11) + 1) / float(1 << 53)          # (0, 1]
    lvl = int(-math.log(u) * m_l)
    return min(lvl, max_level)


def build_hnsw(unit: np.ndarray, m_neighbors: int = 8,
               ef_construction: int = 64):
    """Hierarchical graph: returns (layers, entry, levels) where
    layers[L] is an adjacency list over ALL node ids (empty lists for
    nodes below level L), entry is the highest-level node. Layer 0 is
    the chain-connected NSW (build_nsw); upper layers link each member
    to its m nearest same-layer predecessors via exact partial GEMVs —
    cost O(|members|²·dim/2) per layer, and with mL = 1/ln(M) only
    ~1/e² of nodes reach level 1, so the upper layers stay a small
    fraction of the layer-0 build; the whole build runs once per
    partition per snapshot behind the worker graph cache."""
    n = unit.shape[0]
    layer0 = build_nsw(unit, m_neighbors=m_neighbors,
                       ef_construction=ef_construction)
    m_l = 1.0 / math.log(max(2, m_neighbors))
    levels = [_hnsw_level(i, m_l) for i in range(n)]
    max_level = max(levels) if n else 0
    layers = [layer0]
    entry = int(np.argmax(levels)) if n else 0
    for lvl in range(1, max_level + 1):
        members = [i for i in range(n) if levels[i] >= lvl]
        adj: list[list[int]] = [[] for _ in range(n)]
        if len(members) > 1:
            mu = unit[members]
            for a_pos, i in enumerate(members):
                if a_pos == 0:
                    continue
                sims = mu[:a_pos] @ unit[i]
                order = np.argsort(-sims)[:m_neighbors]
                for b_pos in order.tolist():
                    j = members[b_pos]
                    adj[i].append(j)
                    adj[j].append(i)
        layers.append(adj)
    return layers, entry, levels


def search_hnsw(unit: np.ndarray, graph, q: np.ndarray, ef: int):
    """HnswGraphSearcher shape: greedy 1-beam descent through the upper
    layers picks the bottom-layer entry; the ef-beam on layer 0 does the
    real work. ef >= n ⇒ exact (layer-0 chain connectivity)."""
    layers, entry, _ = graph
    n = unit.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    cur = entry
    for lvl in range(len(layers) - 1, 0, -1):
        adj = layers[lvl]
        improved = True
        best = float(unit[cur] @ q)
        while improved:
            improved = False
            for j in adj[cur]:
                s = float(unit[j] @ q)
                if s > best or (s == best and j < cur):
                    best, cur, improved = s, j, True
    return search_nsw(unit, layers[0], q, ef=ef, entry=cur)
