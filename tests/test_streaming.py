"""Streaming surface: percolator (monitor) matching and incremental
index maintenance via Structured Streaming."""

from __future__ import annotations

import os

import pandas as pd
import pytest


DOCS = [
    (0, "quick brown fox jumps"),
    (1, "slow green turtle"),
    (2, "quick green fox"),
    (3, "brown turtle sleeps"),
    (4, "fox fox fox quick brown"),
]

QUERIES = [
    ("q_and", "quick AND fox"),
    ("q_or", "turtle OR sleeps"),
    ("q_not", "fox AND NOT brown"),
    ("q_phrase", '"brown fox"'),
    ("q_term", "green"),
]

# hand-derived expectations (whitespace analyzer)
EXPECT = {
    ("q_and", 0), ("q_and", 2), ("q_and", 4),
    ("q_or", 1), ("q_or", 3),
    ("q_not", 2),
    ("q_phrase", 0),
    ("q_term", 1), ("q_term", 2),
}


def test_monitor_percolate(spark):
    from lucene_spark.streaming import percolate

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = percolate(spark, QUERIES, docs, "doc_id", "text")
    got = {(r["query_id"], r["doc_id"]) for r in out.collect()}
    assert got == EXPECT


def test_monitor_rejects_nested(spark):
    from lucene_spark.streaming import Monitor

    m = Monitor(spark)
    with pytest.raises(ValueError):
        m.register("bad", "(a OR b) AND (c OR d)")


def test_monitor_stream(spark, tmp_path):
    """Same percolation plan over a file-source stream with a memory sink."""
    from lucene_spark.streaming import Monitor

    src = tmp_path / "docs_in"
    src.mkdir()
    pd.DataFrame(DOCS, columns=["doc_id", "text"]).to_parquet(src / "b0.parquet")

    m = Monitor(spark)
    for qid, q in QUERIES:
        m.register(qid, q)
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    got: set[tuple[str, int]] = set()

    def process(matches, batch_id):
        got.update((r["query_id"], r["doc_id"]) for r in matches.collect())

    q = m.start_stream(stream, "doc_id", "text", process, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert got == EXPECT


def test_streaming_indexer_incremental(spark, tmp_path):
    """Two drops → two micro-batches → two segment groups; a third drop in
    a second run appends without rebuilding earlier groups; search and
    stats reflect all docs."""
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.streaming import StreamingIndexer

    src_dir = tmp_path / "drops"
    src_dir.mkdir()
    idx_dir = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")

    full = make_corpus(90, seed=11)
    full.iloc[:30].to_parquet(src_dir / "drop0.parquet", index=False)
    full.iloc[30:60].to_parquet(src_dir / "drop1.parquet", index=False)

    cfg = IndexConfig(partitions=2, num_buckets=4, analyzer="code")
    ix = StreamingIndexer(spark, idx_dir, cfg)
    schema = "repo string, path string, commit string, lang string, content string"
    q = ix.start(str(src_dir), schema, ckpt, available_now=True)
    q.awaitTermination(300)

    r = IndexReader(spark, idx_dir)
    assert r.doc_count == 60
    groups_before = set(os.listdir(os.path.join(idx_dir, "raw")))
    mtimes = {g: os.path.getmtime(os.path.join(idx_dir, "raw", g)) for g in groups_before}

    # append a third drop; new run resumes from the checkpoint cursor
    full.iloc[60:].to_parquet(src_dir / "drop2.parquet", index=False)
    q = ix.start(str(src_dir), schema, ckpt, available_now=True)
    q.awaitTermination(300)

    r = IndexReader(spark, idx_dir)
    assert r.doc_count == 90
    groups_after = set(os.listdir(os.path.join(idx_dir, "raw")))
    assert groups_before < groups_after
    for g in groups_before:   # earlier segment groups were not rewritten
        assert os.path.getmtime(os.path.join(idx_dir, "raw", g)) == mtimes[g]

    s = IndexSearcher(r)
    hits = s.search("index OR writer", k=10).collect()
    assert len(hits) == 10
    # doc ids from multiple groups present overall
    parts = {int(row["doc_id"]) >> 40 for row in s.matches("index").collect()}
    assert len(parts) > 1


def test_incremental_publish_equals_full_remerge(spark, tmp_path):
    """The append-only per-batch publish must produce an index identical
    (termdict, doc stats, search results) to a full derived-artifact
    rebuild over the same raw groups."""
    import numpy as np

    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.streaming import StreamingIndexer

    src_dir = tmp_path / "drops"
    src_dir.mkdir()
    idx_dir = str(tmp_path / "sidx")
    full = make_corpus(80, seed=21)
    full.iloc[:40].to_parquet(src_dir / "d0.parquet", index=False)
    full.iloc[40:].to_parquet(src_dir / "d1.parquet", index=False)

    cfg = IndexConfig(partitions=2, num_buckets=4, analyzer="code")
    ix = StreamingIndexer(spark, idx_dir, cfg)
    schema = "repo string, path string, commit string, lang string, content string"
    q = ix.start(str(src_dir), schema, str(tmp_path / "ck"), available_now=True,
                 max_files_per_trigger=1)
    q.awaitTermination(300)

    r1 = IndexReader(spark, idx_dir)
    assert len(r1.manifest.get("published_groups", [])) == 2
    s1 = IndexSearcher(r1)
    inc_hits = [(h["doc_id"], np.float32(h["score"]))
                for h in s1.search("index OR writer", k=10).collect()]
    inc_td = {(x["field"], x["term"]): (x["df"], x["cf"])
              for x in r1.termdict().collect()}
    inc_docs = r1.docstats().count()

    # force the full-rebuild path over the same raw groups
    ix._remerge()
    r2 = IndexReader(spark, idx_dir)
    s2 = IndexSearcher(r2)
    assert [(h["doc_id"], np.float32(h["score"]))
            for h in s2.search("index OR writer", k=10).collect()] == inc_hits
    assert {(x["field"], x["term"]): (x["df"], x["cf"])
            for x in r2.termdict().collect()} == inc_td
    assert r2.docstats().count() == inc_docs == 80
    assert r1.doc_count == r2.doc_count == 80
