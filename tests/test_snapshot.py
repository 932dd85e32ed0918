"""Index snapshots (SnapshotDeletionPolicy + ReplicationHandler backup
role): a snapshot is an independent, identical index that survives the
source's later mutations."""

from __future__ import annotations

import pytest

from lucene_spark.index import IndexReader, check_index
from lucene_spark.index.snapshot import snapshot_index
from lucene_spark.search import IndexSearcher


@pytest.fixture(scope="module")
def snap(spark, index_dir, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("snap") / "backup")
    res = snapshot_index(index_dir, dest)
    return spark, index_dir, dest, res


def test_snapshot_is_identical_index(snap, corpus_pdf):
    spark, src, dest, res = snap
    r = IndexReader(spark, dest)
    assert r.doc_count == res["doc_count"]
    out = check_index(r, source=spark.createDataFrame(corpus_pdf))
    assert out["sha256_ok"]


def test_snapshot_search_parity(snap):
    spark, src, dest, res = snap
    a = IndexSearcher(IndexReader(spark, src))
    b = IndexSearcher(IndexReader(spark, dest))
    for q in ["merge", "index AND writer", "merge OR scan"]:
        assert a.search(q, k=10).collect() == b.search(q, k=10).collect()


def test_snapshot_survives_source_compaction(snap, tmp_path_factory):
    """Backup independence: compact + gc the SOURCE (gc grace zeroed) —
    the snapshot must keep serving identical results."""
    import shutil

    from lucene_spark.index import IndexBuilder, IndexConfig, compact
    from lucene_spark.corpus import make_corpus

    spark = snap[0]
    base = str(tmp_path_factory.mktemp("snap_ind"))
    src = base + "/src"
    cfg = IndexConfig(partitions=2, num_groups=3, num_buckets=4)
    IndexBuilder(spark, cfg).build(
        spark.createDataFrame(make_corpus(90, seed=31)), src,
        overwrite=True)
    before = IndexSearcher(IndexReader(spark, src)).search(
        "merge OR scan", k=10).collect()
    dest = base + "/backup"
    snapshot_index(src, dest)
    compact(spark, src, segs_per_tier=1, max_merge_at_once=10,
            gc_min_age_seconds=0.0)
    after_backup = IndexSearcher(IndexReader(spark, dest)).search(
        "merge OR scan", k=10).collect()
    assert after_backup == before
    # and the source itself still agrees (compaction is lossless)
    assert IndexSearcher(IndexReader(spark, src)).search(
        "merge OR scan", k=10).collect() == before
    shutil.rmtree(base, ignore_errors=True)


def test_overwrite_guard(snap):
    spark, src, dest, res = snap
    with pytest.raises(FileExistsError):
        snapshot_index(src, dest)
    res2 = snapshot_index(src, dest, overwrite=True)
    assert res2["doc_count"] == res["doc_count"]
