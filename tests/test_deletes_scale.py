"""Large-scale query-time tombstones: the DataFrame/container delete path
(VERDICT r3 item 2). Contract = codecs/LiveDocsFormat.java — the live-docs
bitset lives with the segment, never as a driver-side id list; our driver
bound is the finished roaring-style container map (≤ min(2 B × deletes,
maxdoc/8 B)), not the delete count, and the 64K-range keying handles the
sparse packed doc_id space (part_id << 40 | local_id)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def _with_cap(s, cap):
    from lucene_spark.search import IndexSearcher

    t = IndexSearcher(s.reader)
    t.sim = s.sim
    t.field_sims = s.field_sims
    t.synonyms = s.synonyms
    t.max_collected_deletes = cap
    return t


def test_deleteset_containers_match_ids_mask():
    """dead_mask parity: container form ≡ sorted-ids form on random probes,
    across sparse (uint16-ids) and dense (bitmap) containers and a sparse
    packed id space."""
    from lucene_spark.search.searcher import DeleteSet

    rng = np.random.default_rng(7)
    # dense range (forces bitmap containers) + sparse high range (uint16)
    ids = np.unique(np.concatenate([
        rng.integers(0, 1 << 17, size=40000),
        rng.integers(5 << 40, (5 << 40) + 100000, size=300),
    ]).astype(np.int64))
    containers = {}
    for key in np.unique(ids >> 16):
        lows = ((ids[(ids >> 16) == key]) & 0xFFFF).astype(np.uint16)
        if lows.size <= 4096:
            containers[int(key)] = np.sort(lows)
        else:
            arr = np.zeros(8192, dtype=np.uint8)
            np.bitwise_or.at(arr, lows.astype(np.int64) >> 3,
                             (1 << (lows & 7)).astype(np.uint8))
            containers[int(key)] = arr
    kinds = {c.dtype.char for c in containers.values()}
    assert kinds == {"B", "H"}       # both container kinds exercised
    a = DeleteSet(ids=ids)
    b = DeleteSet(containers=containers, count=ids.size)
    probes = np.concatenate([
        rng.integers(0, 1 << 18, size=20000),
        rng.integers(5 << 40, (5 << 40) + 200000, size=2000),
        rng.integers(9 << 40, 10 << 40, size=100),   # untouched ranges
    ]).astype(np.int64)
    assert np.array_equal(a.dead_mask(probes), b.dead_mask(probes))
    assert b.digest() != a.digest()  # distinct cache epochs per form
    assert int(a[0]) == int(b[0]) and int(a[10]) == int(b[10])


def test_dataframe_deletes_small_collects(searcher, spark):
    """Under the cap, a DataFrame delete set collects to the ids fast path
    and behaves exactly like the list form."""
    top = searcher.search("index", k=3).collect()
    victims = [int(top[0]["doc_id"]), int(top[1]["doc_id"])]
    dels = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    s_df = searcher.with_deletes(dels)
    s_ls = searcher.with_deletes(victims)
    assert s_df._deleted.containers is None and s_df._deleted.size == 2
    h_df = [(r["doc_id"], np.float32(r["score"]))
            for r in s_df.search("index", k=10).collect()]
    h_ls = [(r["doc_id"], np.float32(r["score"]))
            for r in s_ls.search("index", k=10).collect()]
    assert h_df == h_ls
    assert not (set(victims) & {d for d, _ in h_df})


def test_dataframe_deletes_container_path(searcher, spark):
    """Over the cap: distributed container build; query-time equality vs
    the collected-ids path on the same delete set; bounded driver bytes."""
    top = searcher.search("index OR writer", k=5).collect()
    victims = [int(r["doc_id"]) for r in top[:2]]
    dels = (spark.range(10_000_000, 10_060_000)
            .select(F.col("id").alias("doc_id"))
            .unionByName(spark.createDataFrame(
                [(v,) for v in victims], "doc_id long")))
    s2 = searcher.with_deletes(dels)       # default 1M cap → collected ids
    s_bm = _with_cap(searcher, cap=1000).with_deletes(dels)
    assert s_bm._deleted.containers is not None
    assert s2._deleted.containers is None
    assert s_bm._deleted.size == 60_000 + len(victims)
    # driver holds containers (≤ 2 B/delete), never the int64 id list
    assert s_bm._deleted.nbytes() <= 2 * s_bm._deleted.size
    h_ids = [(r["doc_id"], np.float32(r["score"]))
             for r in s2.search("index OR writer", k=10).collect()]
    h_bm = [(r["doc_id"], np.float32(r["score"]))
            for r in s_bm.search("index OR writer", k=10).collect()]
    assert h_ids == h_bm
    assert not (set(victims) & {d for d, _ in h_bm})
    assert s2.count("index OR writer") == s_bm.count("index OR writer")
    # _mask_deleted path (facets/hydrate/features) uses the DataFrame set
    m = {r["doc_id"] for r in s_bm._mask_deleted(
        searcher.reader.docstats().select("doc_id")).collect()}
    assert not (set(victims) & m)


def test_hundred_million_tombstones_bounded_driver(searcher, spark):
    """10⁸-tombstone build (VERDICT done-criterion): the driver never holds
    the id list — peak extra driver memory is the ~12.5 MB container map
    (dense ids pack to bitmap containers: 1 bit/doc)."""
    dels = spark.range(0, 100_000_000).select(F.col("id").alias("doc_id"))
    s2 = _with_cap(searcher, cap=1000).with_deletes(dels)
    assert s2._deleted.containers is not None
    assert s2._deleted.size == 100_000_000
    assert s2._deleted.nbytes() <= 13 * (1 << 20)
    # every corpus doc lives at part_id<<40 | local ≥ 2^40 → none deleted:
    # results identical to the base searcher (sparse ranges untouched)
    base = [(r["doc_id"], np.float32(r["score"]))
            for r in searcher.search("index", k=5).collect()]
    got = [(r["doc_id"], np.float32(r["score"]))
           for r in s2.search("index", k=5).collect()]
    assert base == got
    # and deleting the actual top doc via a DataFrame in the same searcher
    # still masks it (containers + range sparsity compose)
    dels2 = dels.unionByName(spark.createDataFrame(
        [(base[0][0],)], "doc_id long"))
    s3 = _with_cap(searcher, cap=1000).with_deletes(dels2)
    got3 = {r["doc_id"] for r in s3.search("index", k=5).collect()}
    assert base[0][0] not in got3


def test_mixed_dataframe_then_list_deletes(searcher, spark):
    """Layering with_deletes(list) on top of with_deletes(DataFrame):
    BOTH the kernel mask and the DataFrame mask (_mask_deleted, used by
    facets/hydrate/features) must see the union."""
    top = searcher.search("index", k=4).collect()
    v1, v2 = int(top[0]["doc_id"]), int(top[1]["doc_id"])
    s1 = searcher.with_deletes(
        spark.createDataFrame([(v1,)], "doc_id long"))
    s2 = s1.with_deletes([v2])
    hits = {r["doc_id"] for r in s2.search("index", k=10).collect()}
    assert v1 not in hits and v2 not in hits
    masked = {r["doc_id"] for r in s2._mask_deleted(
        searcher.reader.docstats().select("doc_id")).collect()}
    assert v1 not in masked and v2 not in masked
