"""BPE trainer/encoder: greedy-merge semantics, distributed/local path
identity, dictionary truncation, encode join-back ordering."""

from __future__ import annotations

from lucene_spark.pipeline import bpe

DOCS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "wider wide wide low"),
]


def test_greedy_merge_overlaps():
    # 'aaa' with merge (a,a) → ['aa','a'] (left-to-right, non-overlapping)
    assert bpe._greedy_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert bpe._greedy_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert bpe._greedy_merge(["x", "a", "a", "x"], "a", "a") == ["x", "aa", "x"]
    assert bpe._greedy_merge(["ab"], "a", "b") == ["ab"]  # no pair, no change


def test_distributed_and_local_paths_identical(spark):
    df = spark.createDataFrame(DOCS, "key long, text string")
    dist = bpe.bpe_train(df, "text", num_merges=6, min_pair_count=1)
    loc = bpe.bpe_train(df, "text", num_merges=6, min_pair_count=1, local=True)
    assert dist == loc
    assert len(dist) == 6
    # counts are non-increasing is NOT guaranteed by BPE (merges create
    # new pairs), but the first merge must be the global max pair
    assert dist[0][2] == max(m[2] for m in dist)


def test_min_pair_count_stops_early(spark):
    df = spark.createDataFrame([(1, "ab cd")], "key long, text string")
    # every adjacent pair occurs once; min_pair_count=2 stops immediately
    assert bpe.bpe_train(df, "text", num_merges=5, min_pair_count=2,
                         local=True) == []


def test_word_limit_truncates_dictionary(spark):
    df = spark.createDataFrame(
        [(1, "zz zz zz qq")], "key long, text string")
    # word_limit=1 keeps only 'zz' (count 3); merges can only involve z/</w>
    merges = bpe.bpe_train(df, "text", num_merges=3, min_pair_count=1,
                           word_limit=1, local=True)
    assert all("q" not in m[0] + m[1] for m in merges)


def test_encode_matches_sequential_reference(spark):
    df = spark.createDataFrame(DOCS, "key long, text string")
    merges = bpe.bpe_train(df, "text", num_merges=6, min_pair_count=1,
                           local=True)
    got = {r["key"]: r["tokens"]
           for r in bpe.bpe_encode(df, "text", "key", merges).collect()}
    for key, text in DOCS:
        want = []
        for w in text.lower().split():
            syms = list(w) + [bpe.EOW]
            for l, r, _ in merges:
                syms = bpe._greedy_merge(syms, l, r)
            want.extend(syms)
        assert got[key] == want, (key, got[key], want)


def test_encode_roundtrip_surface(spark):
    """Concatenating tokens (stripping the EOW marker) recovers the text."""
    df = spark.createDataFrame(DOCS, "key long, text string")
    merges = bpe.bpe_train(df, "text", num_merges=4, min_pair_count=1,
                           local=True)
    got = {r["key"]: r["tokens"]
           for r in bpe.bpe_encode(df, "text", "key", merges).collect()}
    for key, text in DOCS:
        joined = "".join(got[key]).replace(bpe.EOW, " ").strip()
        assert joined == " ".join(text.lower().split())
