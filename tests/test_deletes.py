"""Tombstone deletes (LiveDocs analogue): deleted docs vanish from every
query path while collection/term statistics keep Lucene's
until-merge semantics (scores of surviving docs unchanged)."""

from __future__ import annotations

import numpy as np


def test_deletes_mask_all_paths(searcher, reader):
    base_hits = searcher.search("index OR writer", k=10).collect()
    assert base_hits
    victims = [base_hits[0]["doc_id"], base_hits[2]["doc_id"]]
    s2 = searcher.with_deletes(victims)

    # top-k: victims gone, everyone else keeps the EXACT same score
    # (stats still include deleted docs until merge — Lucene semantics)
    new_hits = s2.search("index OR writer", k=10).collect()
    ids = {r["doc_id"] for r in new_hits}
    assert not (set(victims) & ids)
    old = {r["doc_id"]: r["score"] for r in base_hits}
    for r in new_hits:
        if r["doc_id"] in old:
            assert np.float32(r["score"]) == np.float32(old[r["doc_id"]])

    # count drops by exactly the number of deleted matching docs
    full = {r["doc_id"] for r in searcher.matches("index OR writer").collect()}
    assert s2.count("index OR writer") == len(full) - len(set(victims) & full)

    # boolean NOT / filter paths also masked
    m2 = {r["doc_id"] for r in s2.matches("index", with_scores=False).collect()}
    assert not (set(victims) & m2)


def test_delete_by_keys(searcher, reader, corpus_pdf):
    row = corpus_pdf.iloc[3]
    keys = searcher.reader.spark.createDataFrame(
        [(row["repo"], row["path"], row["commit"])], "repo string, path string, commit string")
    s2 = searcher.delete_by_keys(keys)
    assert s2._deleted.size == 1
    # that doc no longer matches its own unique identifier term
    uid = next(t for t in row["content"].split() if t.startswith("uid"))
    from lucene_spark.analysis import get_analyzer
    import pandas as pd

    toks = get_analyzer("code").tokenize_series(pd.Series([uid])).iloc[0]
    hits = s2.matches(" ".join(toks)).collect()
    assert all(r["doc_id"] != int(s2._deleted[0]) for r in hits)


def test_deletes_with_blockmax(searcher):
    """Deleting the top doc of a hot term: block-max pruned top-k stays
    correct (block metadata realigned after masking)."""
    top = searcher.search("license", k=3).collect()
    s2 = searcher.with_deletes([top[0]["doc_id"]])
    pruned = s2.search("license", k=10).collect()
    exhaustive = sorted(
        ((r["doc_id"], r["score"]) for r in s2.matches("license").collect()),
        key=lambda x: (-x[1], x[0]))[:10]
    assert [(r["doc_id"], r["score"]) for r in pruned] == exhaustive
    assert top[0]["doc_id"] not in {r["doc_id"] for r in pruned}


def test_deletes_folded_at_compaction(spark, tmp_path):
    """Merge applies deletes (index/FreqProxTermsWriter.java:51-79): after
    compacting ALL groups with a tombstone set, the index equals a fresh
    build of the live subset — stats (doc_count, sum_doclen, field_stats,
    termdict df/cf) and search results both."""
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader, check_index
    from lucene_spark.index.compaction import compact
    from lucene_spark.search import IndexSearcher

    pdf = make_corpus(150, seed=11)
    src = spark.createDataFrame(pdf)
    idx = str(tmp_path) + "/full"
    cfg = IndexConfig(partitions=2, num_groups=3, num_buckets=4,
                      index_positions=True)
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))

    # choose victims: every doc matching 'merge'
    dead = [r["doc_id"] for r in s.matches("merge", with_scores=False).collect()]
    assert dead
    dead_keys = {(r["repo"], r["path"], r["commit"])
                 for r in s.hydrate(s.matches("merge", with_scores=False)).collect()}

    # fold ALL groups into one, applying the tombstones
    res = compact(spark, idx, segs_per_tier=1, max_merge_at_once=10,
                  deletes=dead)
    assert res["merged"], res

    # reference: fresh build of the live subset (single group)
    live_pdf = pdf[~pdf.apply(
        lambda r: (r["repo"], r["path"], r["commit"]) in dead_keys, axis=1)]
    idx2 = str(tmp_path) + "/live"
    cfg2 = IndexConfig(partitions=2, num_groups=1, num_buckets=4,
                       index_positions=True)
    IndexBuilder(spark, cfg2).build(
        spark.createDataFrame(live_pdf), idx2, overwrite=True)

    r1 = IndexReader(spark, idx)
    r2 = IndexReader(spark, idx2)
    assert r1.doc_count == r2.doc_count == len(live_pdf)
    assert r1.sum_doclen == r2.sum_doclen
    assert r1.field_stats == r2.field_stats

    # termdict identical (df/cf per term)
    td1 = {(r["field"], r["term"]): (r["df"], r["cf"])
           for r in r1.termdict().collect()}
    td2 = {(r["field"], r["term"]): (r["df"], r["cf"])
           for r in r2.termdict().collect()}
    assert td1 == td2

    # the compacted index passes CheckIndex and never returns dead docs
    check_index(r1)
    s1 = IndexSearcher(r1)
    assert s1.count("merge") == 0
    # scores now reflect post-merge stats: identical result SETS for a
    # probe query between compacted and fresh-live indexes
    a = {r["doc_id"] for r in s1.matches("index", with_scores=False).collect()}
    s2 = IndexSearcher(r2)
    b = {r["doc_id"] for r in s2.matches("index", with_scores=False).collect()}
    # doc_ids differ between builds (different partitioning); compare counts
    assert len(a) == len(b)


def test_compaction_folds_dataframe_deletes_at_scale(spark, tmp_path):
    """The delete set arrives as a 1M-row DataFrame and is folded without
    any driver-side collect (distributed via part_id cogroup): survivors
    and stats match the small-list path exactly."""
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.index.compaction import compact
    from lucene_spark.search import IndexSearcher
    from pyspark.sql import functions as F

    pdf = make_corpus(120, seed=23)
    idx = str(tmp_path) + "/idx"
    cfg = IndexConfig(partitions=2, num_groups=3, num_buckets=4)
    IndexBuilder(spark, cfg).build(spark.createDataFrame(pdf), idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    dead = sorted(r["doc_id"] for r in
                  s.matches("merge", with_scores=False).collect())
    assert dead
    # 1M-row delete DataFrame: the real victims plus ~1M ids that do not
    # exist in the index (fold must ignore them and never collect the set)
    dels_df = (spark.range(1_000_000)
               .select((F.lit(1 << 55) + F.col("id")).alias("doc_id"))
               .unionByName(spark.createDataFrame([(int(d),) for d in dead],
                                                  "doc_id long")))
    res = compact(spark, idx, segs_per_tier=1, max_merge_at_once=10,
                  deletes=dels_df)
    assert res["merged"], res
    r1 = IndexReader(spark, idx)
    assert r1.doc_count == len(pdf) - len(dead)
    assert IndexSearcher(r1).count("merge") == 0


def test_with_deletes_count_not_inflated_over_containers(spark, searcher):
    """ADVICE r4 (low): adding iterable ids that are ALREADY tombstoned in
    the container form must not inflate DeleteSet.size (an inflated count
    can flip the _mask_deleted broadcast-vs-shuffle gating)."""
    from pyspark.sql import functions as F

    all_ids = [r["doc_id"] for r in
               searcher.reader.docstats().select("doc_id").collect()]
    dels = sorted(all_ids)[:6]
    s = searcher
    s = s.__class__(s.reader)
    s.max_collected_deletes = 3          # force the container path
    dels_df = spark.createDataFrame([(int(d),) for d in dels], "doc_id long")
    s2 = s.with_deletes(dels_df)
    assert s2._deleted.containers is not None
    assert s2._deleted.size == len(dels)
    # re-add 2 already-deleted ids + 1 genuinely new one
    new_id = sorted(all_ids)[6]
    s3 = s2.with_deletes([dels[0], dels[1], new_id])
    assert s3._deleted.size == len(dels) + 1
    # idempotent: adding the same ids again changes nothing
    s4 = s3.with_deletes([dels[0], new_id])
    assert s4._deleted.size == len(dels) + 1
