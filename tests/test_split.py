"""Deterministic holdout split (pipeline/split.py)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from lucene_spark.pipeline.split import holdout_flag, train_holdout_split


def test_matches_reference_sha_and_partitioning_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    train, hold = train_holdout_split(df, "k", 0.25, salt="s1")
    got = {r["k"] for r in hold.collect()}
    exp = {i for i in range(2000)
           if hashlib.sha256(f"{i}s1".encode()).hexdigest()[:8]
           < format(int(0.25 * (1 << 32)), "08x")}
    assert got == exp
    # fraction lands near 0.25 on 2000 uniform keys
    assert 0.20 < len(got) / 2000 < 0.30
    # partitioning does not change the assignment
    got2 = {r["k"] for r in
            train_holdout_split(df.repartition(13), "k", 0.25, "s1")[1]
            .collect()}
    assert got2 == got
    # the two sides are a disjoint cover
    assert {r["k"] for r in train.collect()} | got == set(range(2000))
    assert {r["k"] for r in train.collect()} & got == set()


def test_salt_rotates_the_split(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = {r["k"] for r in train_holdout_split(df, "k", 0.5, "a")[1].collect()}
    b = {r["k"] for r in train_holdout_split(df, "k", 0.5, "b")[1].collect()}
    assert a != b


def test_edge_fractions_and_validation(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert train_holdout_split(df, "k", 0.0)[1].count() == 0
    assert train_holdout_split(df, "k", 1.0)[0].count() == 0
    with pytest.raises(ValueError):
        holdout_flag(F.col("k"), 1.5)


def test_stratified_sample_exact_n_and_stable(spark):
    import hashlib

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    rows += [(1000, "rare")]  # stratum smaller than n
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    from lucene_spark.pipeline.split import stratified_sample

    out = stratified_sample(df, "lang", "doc_id", 5, salt="s1")
    got = {}
    for r in out.collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {k: len(v) for k, v in got.items()} == {
        "en": 5, "de": 5, "fr": 5, "rare": 1}

    # pure function of (stratum members, keys): matches hashlib replay
    for lang, members in [("en", range(0, 90, 3)), ("de", range(1, 90, 3)),
                          ("fr", range(2, 90, 3))]:
        ranked = sorted(
            members,
            key=lambda i: (hashlib.sha256(f"{i}s1".encode()).hexdigest(), i))
        assert got[lang] == set(ranked[:5])

    # stable under repartitioning
    out2 = stratified_sample(df.repartition(17), "lang", "doc_id", 5,
                             salt="s1")
    assert sorted((r["doc_id"], r["lang"]) for r in out2.collect()) == \
        sorted((d, l) for l, v in got.items() for d in v)


def test_null_keys_land_in_train_not_dropped(spark):
    from lucene_spark.pipeline.split import train_holdout_split

    df = spark.createDataFrame(
        [(i, f"k{i}") for i in range(20)] + [(98, None), (99, None)],
        "doc_id long, key string")
    train, hold = train_holdout_split(df, "key", fraction=0.5, salt="z")
    train_ids = {r["doc_id"] for r in train.collect()}
    hold_ids = {r["doc_id"] for r in hold.collect()}
    # every row on exactly one side; NULL keys never held out
    assert train_ids | hold_ids == set(range(20)) | {98, 99}
    assert not train_ids & hold_ids
    assert {98, 99} <= train_ids


def test_leakage_safe_split_keeps_clusters_together(spark):
    from lucene_spark.pipeline import dedup
    from lucene_spark.pipeline.split import (leakage_safe_split,
                                             train_holdout_split)

    base = "alpha beta gamma delta epsilon zeta eta"
    rows = []
    # 40 near-dup pairs (2k, 2k+1 share text) + 20 singletons
    for k in range(40):
        rows.append((2 * k, f"{base} group{k} filler one"))
        rows.append((2 * k + 1, f"{base} group{k} filler two"))
    for k in range(100, 120):
        rows.append((k, f"unique text number {k} with nothing shared {k}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.exact_jaccard_pairs(df, "text", "doc_id", threshold=0.5)
    tr, ho = leakage_safe_split(df, pairs, "doc_id", 0.3, salt="s1")
    tr_ids = {r["doc_id"] for r in tr.collect()}
    ho_ids = {r["doc_id"] for r in ho.collect()}
    assert tr_ids.isdisjoint(ho_ids)
    assert tr_ids | ho_ids == {r[0] for r in rows}
    # the leakage guarantee: both members of every pair on ONE side
    for k in range(40):
        a, b = 2 * k, 2 * k + 1
        assert (a in tr_ids) == (b in tr_ids), k
    # a plain per-doc split DOES split some pair (the failure this fixes)
    ptr, pho = train_holdout_split(df, "doc_id", 0.3, salt="s1")
    p_tr = {r["doc_id"] for r in ptr.collect()}
    split_pairs = [k for k in range(40)
                   if (2 * k in p_tr) != (2 * k + 1 in p_tr)]
    assert split_pairs, "fixture should demonstrate the leak"
