"""Index-time persisted vector graphs — the `.vec`-next-to-segment role.

Reference mapping: Lucene builds the HNSW graph at flush and stores it
beside the segment (codecs/lucene90/Lucene90VectorWriter.java writes the
vector data + graph files; util/hnsw/HnswGraphBuilder.java:1-282 is the
builder). Searchers mmap the stored graph — they never rebuild it on the
query path. This module gives the vector FIELD the same lifecycle:

- `build_vector_graphs(reader, field)` runs ONE distributed pass, one
  task per docstats parquet file (the file is the segment analogue),
  builds that shard's hierarchical NSW graph and writes it as an `.npz`
  sidecar under `<index_dir>/vecgraph/<field>.g<N>/`, then publishes a
  JSON manifest atomically (os.replace — the segments_N pattern of
  layout.py). Each shard entry records the doc-id digest it was built
  over, so a stale sidecar is DETECTED, never silently wrong.
- `knn_field_topk` (search/knnfield.py) maps over the manifest's file
  list: each task reads its parquet file with pyarrow (the targeted
  per-segment read, no Spark scan-split dependence), loads the stored
  graph through the worker LRU — now a DECODE cache, not a builder —
  and beam-searches. A digest mismatch falls back to an in-task build
  (and `strict=True` raises instead, which is how tests prove zero
  query-time builds).

At 100 TB this moves the O(n·M) per-partition graph build off the query
path entirely: executor restarts and cache evictions re-pay only an
O(n·M) *decode* (sequential npz read), and the build cost is amortized
into the index build where Lucene pays it.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np

from lucene_spark.index.layout import derived_path


def _doc_digest(doc_ids: np.ndarray) -> str:
    h = hashlib.blake2b(digest_size=12)
    h.update(np.ascontiguousarray(doc_ids, dtype=np.int64).tobytes())
    return h.hexdigest()


def _pack_graph(graph) -> dict:
    """(layers, entry, levels) → flat arrays for npz: per layer an
    int64 offsets[n+1] + int32 neighbors CSR pair."""
    layers, entry, levels = graph
    out = {"entry": np.int64(entry),
           "levels": np.asarray(levels, dtype=np.int32),
           "num_layers": np.int64(len(layers))}
    for li, adj in enumerate(layers):
        offs = np.zeros(len(adj) + 1, dtype=np.int64)
        for i, nb in enumerate(adj):
            offs[i + 1] = offs[i] + len(nb)
        flat = np.empty(int(offs[-1]), dtype=np.int32)
        for i, nb in enumerate(adj):
            flat[offs[i]:offs[i + 1]] = nb
        out[f"off{li}"] = offs
        out[f"nbr{li}"] = flat
    return out


def _unpack_graph(z) -> tuple:
    n_layers = int(z["num_layers"])
    layers = []
    for li in range(n_layers):
        offs = z[f"off{li}"]
        flat = z[f"nbr{li}"]
        layers.append([flat[offs[i]:offs[i + 1]]
                       for i in range(len(offs) - 1)])
    return layers, int(z["entry"]), z["levels"].tolist()


def _docstats_files(reader) -> list[str]:
    d = derived_path(reader.index_dir, reader.manifest, "docstats")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith("."))


def manifest_path(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, "vecgraph", f"{field}.json")


def load_manifest(index_dir: str, field: str) -> dict | None:
    p = manifest_path(index_dir, field)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _read_shard(path: str, field: str):
    """Targeted per-segment read (the .vec mmap analogue): doc ids +
    vectors of ONE docstats parquet file, nulls dropped, file order."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["doc_id", field])
    mask = t[field].is_valid()
    t = t.filter(mask)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in t[field].to_pylist()]) \
        if len(t) else np.empty((0, 0))
    return doc_ids, vecs


def build_vector_graphs(reader, field: str, m_neighbors: int = 8,
                        ef_construction: int = 64) -> dict:
    """Build + publish the graph sidecar generation for `field`.
    One Spark task per docstats file; returns the published manifest."""
    from lucene_spark.pipeline.ann import _normalize_rows, build_hnsw

    files = _docstats_files(reader)
    index_dir = reader.index_dir
    gdir = os.path.join(index_dir, "vecgraph")
    os.makedirs(gdir, exist_ok=True)
    prev = load_manifest(index_dir, field)
    gen = (int(prev["gen"]) + 1) if prev else 0
    out_dir = os.path.join(gdir, f"{field}.g{gen}")
    os.makedirs(out_dir, exist_ok=True)
    mn, efc = int(m_neighbors), int(ef_construction)
    fld = field

    def one(it):
        for path in it:
            doc_ids, vecs = _read_shard(path, fld)
            base = os.path.basename(path)
            npz = os.path.join(out_dir, base + ".npz")
            if doc_ids.size:
                unit = _normalize_rows(vecs)
                graph = build_hnsw(unit, m_neighbors=mn,
                                   ef_construction=efc)
                arrs = _pack_graph(graph)
                tmp = npz + ".tmp"
                with open(tmp, "wb") as f:
                    np.savez_compressed(f, **arrs)
                os.replace(tmp, npz)
            yield (base, int(doc_ids.size), _doc_digest(doc_ids))

    sc = reader.spark.sparkContext
    shards = (sc.parallelize(files, max(len(files), 1))
              .mapPartitions(one).collect())
    man = {
        "field": field, "gen": gen,
        "m_neighbors": mn, "ef_construction": efc,
        "docstats": (reader.manifest.get("derived") or {}).get(
            "docstats", "docstats"),
        "dir": f"{field}.g{gen}",
        "shards": [{"file": b, "n": n, "digest": d}
                   for (b, n, d) in shards],
    }
    tmp = manifest_path(index_dir, field) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, manifest_path(index_dir, field))
    # retire older generations (one-writer rule, mirrors gc_derived)
    pat = re.compile(re.escape(field) + r"\.g(\d+)$")
    for name in os.listdir(gdir):
        m = pat.match(name)
        if m and int(m.group(1)) < gen:
            import shutil

            shutil.rmtree(os.path.join(gdir, name), ignore_errors=True)
    return man


def sidecar_current(reader, field: str, m_neighbors: int,
                    ef_construction: int) -> dict | None:
    """The manifest, iff it matches the reader's CURRENT docstats
    generation and the requested graph params; else None (callers fall
    back to the lazy build path)."""
    man = load_manifest(reader.index_dir, field)
    if man is None:
        return None
    cur = (reader.manifest.get("derived") or {}).get("docstats", "docstats")
    if man.get("docstats") != cur:
        return None
    if (int(man.get("m_neighbors", -1)) != int(m_neighbors)
            or int(man.get("ef_construction", -1)) != int(ef_construction)):
        return None
    return man
