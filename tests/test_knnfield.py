"""Vector fields on the index (VectorField / KnnVectorQuery role) —
search/knnfield.py: carry-column sidecar, per-partition NSW search,
XML-parser entry, tombstone masking, hybrid rescoring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vec_index(spark, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    rng = np.random.default_rng(11)
    n, dim = 120, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, f"doc {i} term{i % 7} payload", [float(x) for x in vecs[i]])
            for i in range(n)]
    src = spark.createDataFrame(
        rows, "id long, text string, emb array<float>")
    idx = str(tmp_path_factory.mktemp("vecidx") / "index")
    cfg = IndexConfig(key_cols=("id",), content_col="text",
                      analyzer="whitespace", partitions=3, num_groups=1,
                      num_buckets=4, carry_cols=("emb",))
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    r = IndexReader(spark, idx)
    return r, IndexSearcher(r), vecs


def _brute_topk(vecs: np.ndarray, q: np.ndarray, k: int):
    u = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    cos = u.astype(np.float64) @ qn.astype(np.float64)
    order = np.lexsort((np.arange(len(cos)), -cos))
    return order[:k], cos[order[:k]]


def test_knn_exact_matches_bruteforce(vec_index):
    from lucene_spark.search.knnfield import knn_field_topk

    r, s, vecs = vec_index
    q = vecs[5].astype(np.float64)
    hits = knn_field_topk(s, "emb", q, k=10).collect()   # ef=None → exact
    ds = {row["doc_id"]: row["id"] for row in
          r.docstats().select("doc_id", "id").collect()}
    got = [(ds[h["doc_id"]], round(h["score"], 6)) for h in hits]
    ids, cos = _brute_topk(vecs, q, 10)
    want = [(int(i), round(float(c), 6)) for i, c in zip(ids, cos)]
    assert got == want


def test_knn_via_parser_and_search(vec_index):
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.search.xmlparser import parse_xml_query

    r, s, vecs = vec_index
    q = vecs[7]
    xml = ("<KnnVectorQuery fieldName='emb' k='5'>"
           + " ".join(str(float(x)) for x in q) + "</KnnVectorQuery>")
    node = parse_xml_query(xml, get_analyzer("whitespace"), {}, "text")
    hits = s.search(node, k=5).collect()
    assert len(hits) == 5
    # doc 7 itself is the top hit with cosine ~1
    ds = {row["doc_id"]: row["id"] for row in
          r.docstats().select("doc_id", "id").collect()}
    assert ds[hits[0]["doc_id"]] == 7
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_knn_masks_tombstones(vec_index):
    from lucene_spark.search.knnfield import knn_field_topk

    r, s, vecs = vec_index
    q = vecs[3].astype(np.float64)
    top = knn_field_topk(s, "emb", q, k=3).collect()
    victim = top[0]["doc_id"]
    s2 = s.with_deletes([victim])
    hits = knn_field_topk(s2, "emb", q, k=10).collect()
    assert victim not in {h["doc_id"] for h in hits}
    assert len(hits) == 10


def test_partial_ef_recall(vec_index):
    from lucene_spark.search.knnfield import knn_field_topk

    r, s, vecs = vec_index
    q = vecs[9].astype(np.float64)
    exact = {h["doc_id"] for h in knn_field_topk(s, "emb", q, k=10).collect()}
    approx = {h["doc_id"]
              for h in knn_field_topk(s, "emb", q, k=10, ef=24).collect()}
    # recall of the bounded beam is a measured property, not a contract;
    # the chain-connected graph keeps it high on 40-row shards
    assert len(exact & approx) >= 6


def test_hybrid_rescore(vec_index):
    from lucene_spark.search.knnfield import knn_rescore

    r, s, vecs = vec_index
    q = vecs[12].astype(np.float64)
    out = knn_rescore(s, "term5", "emb", q, k=5, n_candidates=20).collect()
    assert 0 < len(out) <= 5
    # candidates all match the BM25 query (term5 → ids ≡ 5 mod 7)
    ds = {row["doc_id"]: row["id"] for row in
          r.docstats().select("doc_id", "id").collect()}
    assert all(ds[h["doc_id"]] % 7 == 5 for h in out)
    # ordered by blended score desc
    scores = [h["score"] for h in out]
    assert scores == sorted(scores, reverse=True)


def test_xml_knn_errors(vec_index):
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.search.xmlparser import XmlParserError, parse_xml_query

    with pytest.raises(XmlParserError):
        parse_xml_query("<KnnVectorQuery fieldName='emb'>not floats"
                        "</KnnVectorQuery>", get_analyzer("whitespace"),
                        {}, "text")
    with pytest.raises(XmlParserError):
        parse_xml_query("<KnnVectorQuery fieldName='emb'></KnnVectorQuery>",
                        get_analyzer("whitespace"), {}, "text")


# ---- hierarchical HNSW (util/hnsw role, pipeline/ann.py round 4) ----------

def test_hnsw_exact_equals_bruteforce():
    from lucene_spark.pipeline.ann import (_normalize_rows, build_hnsw,
                                           search_hnsw)

    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(300, 12))
    unit = _normalize_rows(vecs)
    graph = build_hnsw(unit, m_neighbors=6, ef_construction=32)
    layers, entry, levels = graph
    assert len(layers) >= 1 and levels[entry] == max(levels)
    for qi in (0, 7, 123):
        ids, sims = search_hnsw(unit, graph, unit[qi], ef=300)  # exact
        cos = unit @ unit[qi]
        order = np.lexsort((np.arange(300), -cos))
        assert np.array_equal(ids, order)          # full exact ordering


def test_hnsw_deterministic_rebuild():
    from lucene_spark.pipeline.ann import _normalize_rows, build_hnsw

    rng = np.random.default_rng(3)
    unit = _normalize_rows(rng.normal(size=(120, 8)))
    a = build_hnsw(unit, 6, 24)
    b = build_hnsw(unit, 6, 24)
    assert a[1] == b[1] and a[2] == b[2]
    assert all(x == y for x, y in zip(a[0], b[0]))


def test_hnsw_partial_ef_recall():
    from lucene_spark.pipeline.ann import (_normalize_rows, build_hnsw,
                                           search_hnsw)

    rng = np.random.default_rng(5)
    unit = _normalize_rows(rng.normal(size=(500, 16)))
    graph = build_hnsw(unit, m_neighbors=8, ef_construction=64)
    hits = 0
    for qi in range(20):
        ids, _ = search_hnsw(unit, graph, unit[qi], ef=48)
        cos = unit @ unit[qi]
        want = set(np.lexsort((np.arange(500), -cos))[:10])
        hits += len(want & set(ids[:10].tolist()))
    assert hits / 200 >= 0.85          # measured recall, generous floor


def test_knn_deletes_inside_shard_budget(spark, tmp_path_factory):
    """ADVICE r4 (high): liveDocs must be applied INSIDE the shard search
    before the per-shard top-k cut (KnnVectorQuery passes liveDocs into
    the graph searcher). With a SINGLE partition, deleting members of the
    top-k must not shrink the result below k or drop live docs ranked
    just past k."""
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search.knnfield import knn_field_topk

    rng = np.random.default_rng(23)
    n, dim = 40, 6
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, f"doc {i}", [float(x) for x in vecs[i]]) for i in range(n)]
    src = spark.createDataFrame(rows, "id long, text string, emb array<float>")
    idx = str(tmp_path_factory.mktemp("vecidx1p") / "index")
    cfg = IndexConfig(key_cols=("id",), content_col="text",
                      analyzer="whitespace", partitions=1, num_groups=1,
                      num_buckets=2, carry_cols=("emb",))
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    r = IndexReader(spark, idx)
    s = IndexSearcher(r)
    q = vecs[0].astype(np.float64)
    top = knn_field_topk(s, "emb", q, k=5).collect()
    victims = [h["doc_id"] for h in top[:3]]
    s2 = s.with_deletes(victims)
    hits = knn_field_topk(s2, "emb", q, k=5).collect()
    assert len(hits) == 5
    assert not (set(victims) & {h["doc_id"] for h in hits})
    # exact parity with brute-force over the LIVE subset
    ds = {row["doc_id"]: row["id"] for row in
          r.docstats().select("doc_id", "id").collect()}
    dead = {ds[v] for v in victims}
    live = np.array([i for i in range(n) if i not in dead])
    ids, cos = _brute_topk(vecs[live], q, 5)
    want = [(int(live[i]), round(float(c), 6)) for i, c in zip(ids, cos)]
    got = [(ds[h["doc_id"]], round(h["score"], 6)) for h in hits]
    assert got == want
    # partial-ef path: beam over-fetches by the delete count, still k rows
    hits_ef = knn_field_topk(s2, "emb", q, k=5, ef=5).collect()
    assert len(hits_ef) == 5
    assert not (set(victims) & {h["doc_id"] for h in hits_ef})


def test_knn_ef_below_k_clamped(vec_index):
    """ADVICE r4 (low): KnnFloatVectorQuery requires num_candidates >= k —
    an ef below k must be clamped up so k rows still come back."""
    from lucene_spark.search.knnfield import knn_field_topk

    r, s, vecs = vec_index
    q = vecs[2].astype(np.float64)
    hits = knn_field_topk(s, "emb", q, k=10, ef=2).collect()
    assert len(hits) == 10
