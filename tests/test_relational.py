"""Relational layer (facets / streaming-expression analogues) and
pipeline operators (dedup / textstats / similarity / multimodal /
highlighter) against hand-computed expectations on tiny inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        ("a", "x", 1.0), ("a", "y", 2.0), ("a", "y", 3.0),
        ("b", "x", 4.0), ("b", "x", 5.0), ("c", "z", 6.0),
    ]
    return spark.createDataFrame(rows, "grp string, cat string, v double")


def test_facet_counts(people):
    from lucene_spark.relational.facets import facet_counts

    got = [(r["grp"], r["count"]) for r in facet_counts(people, "grp").collect()]
    assert got == [("a", 3), ("b", 2), ("c", 1)]


def test_taxonomy_facets(spark):
    """FastTaxonomyFacetCounts.getTopChildren: immediate children of a
    path, each child's count covering its descendants; deeper-only docs
    never surface at shallower sibling levels."""
    from lucene_spark.relational.facets import taxonomy_facets

    rows = [("a/b",), ("a/b/c",), ("a/d",), ("a",), ("e/f",), ("e",)]
    df = spark.createDataFrame(rows, "p string")
    root = [(r["label"], r["count"]) for r in
            taxonomy_facets(df, "p").collect()]
    assert root == [("a", 4), ("e", 2)]
    under_a = [(r["label"], r["count"]) for r in
               taxonomy_facets(df, "p", path=("a",)).collect()]
    # 'a' alone has no child segment; a/b/c counts toward child 'b'
    assert under_a == [("b", 2), ("d", 1)]
    assert taxonomy_facets(df, "p", path=("a", "b", "c")).count() == 0


def test_association_facets(spark):
    """TaxonomyFacetSumIntAssociations: children weighted by each doc's
    association value; sum/max variants; value-desc label-asc order."""
    import pytest

    from lucene_spark.relational.facets import association_facets

    rows = [("a/b", 5), ("a/b/c", 2), ("a/d", 10), ("a", 99), ("e/f", 1)]
    df = spark.createDataFrame(rows, "p string, v long")
    under_a = [(r["label"], r["value"]) for r in
               association_facets(df, "p", "v", path=("a",)).collect()]
    # b: 5+2 = 7; d: 10; bare 'a' (no child) contributes nowhere
    assert under_a == [("d", 10), ("b", 7)]
    mx = [(r["label"], r["value"]) for r in
          association_facets(df, "p", "v", path=("a",), agg="max").collect()]
    assert mx == [("d", 10), ("b", 5)]
    with pytest.raises(ValueError):
        association_facets(df, "p", "v", agg="median")


def test_range_facets(people):
    from lucene_spark.relational.facets import range_facets

    got = {(r["bucket_lo"], r["count"]) for r in range_facets(people, "v", 0, 10, 2).collect()}
    assert got == {(0.0, 1), (2.0, 2), (4.0, 2), (6.0, 1)}


def test_stats_facet(people):
    from lucene_spark.relational.facets import stats_facet

    r = stats_facet(people, "v").collect()[0]
    assert r["count"] == 6 and r["min"] == 1.0 and r["max"] == 6.0
    assert r["sum"] == 21.0 and abs(r["mean"] - 3.5) < 1e-9


def test_percentiles_facet(people):
    """StatsComponent percentiles: exact interpolated (R-7) values; the
    approx path returns the same count of percentiles per group."""
    from lucene_spark.relational.facets import percentiles_facet

    r = percentiles_facet(people, "v", ps=(0.5, 1.0)).collect()[0]
    # v = 1..6 → median 3.5 (interpolated), max 6
    assert list(r["percentiles"]) == [3.5, 6.0]
    g = {row[0]: list(row["percentiles"]) for row in
         percentiles_facet(people, "v", by="grp", ps=(0.5,)).collect()}
    assert g == {"a": [2.0], "b": [4.5], "c": [6.0]}
    a = percentiles_facet(people, "v", ps=(0.5,), exact=False).collect()[0]
    assert len(a["percentiles"]) == 1


def test_pivot_facets(people):
    from lucene_spark.relational.facets import pivot_facets

    rows = {(r["grp"], r["cat"]): r["count"] for r in pivot_facets(people, ["grp", "cat"]).collect()}
    assert rows[(None, None)] == 6            # grand total
    assert rows[("a", None)] == 3 and rows[("a", "y")] == 2


def test_group_top_docs(people):
    from lucene_spark.relational.facets import group_top_docs

    out = group_top_docs(people, "grp", [F.col("v").desc()], 1)
    got = {(r["grp"], r["v"]) for r in out.collect()}
    assert got == {("a", 3.0), ("b", 5.0), ("c", 6.0)}


def test_streams_suite(spark, people):
    from lucene_spark.relational import streams as S

    small = spark.createDataFrame([("a", 10), ("b", 20)], "grp string, w int")
    j = S.hash_join_stream(people, small, ["grp"])
    assert j.count() == 5 and "BroadcastHashJoin" in j._jdf.queryExecution().executedPlan().toString()

    ru = S.rollup_stream(people, ["grp"], [F.sum("v").alias("s")])
    assert {(r["grp"], r["s"]) for r in ru.collect()} == {("a", 6.0), ("b", 9.0), ("c", 6.0)}

    hv = S.having_stream(ru, F.col("s") > 6.0)
    assert [r["grp"] for r in hv.collect()] == ["b"]

    comp = S.complement_stream(people.select("grp").distinct(), small.select("grp"))
    assert [r["grp"] for r in comp.collect()] == ["c"]

    ex = S.expand_component(people, "grp", F.col("v").asc(), 1)
    assert {(r["grp"], r["v"]) for r in ex.collect()} == {("a", 1.0), ("b", 4.0), ("c", 6.0)}


def test_dedup_exact_and_jaccard(spark):
    from lucene_spark.pipeline import dedup

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog"),     # near dup
        (3, "completely different content here entirely now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dups = dedup.exact_duplicates(df, "text", "doc_id").collect()
    assert len(dups) == 1 and dups[0]["n_dups"] == 2 and dups[0]["keys"] == [0, 1]

    kept = dedup.dedup_keep_first(df, "text", "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2, 3]

    # jaccard(0,2) = 4/10 = 0.4 (3 of 7 shingles touch the changed word)
    pairs = dedup.exact_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.35)
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any(3 in p for p in got)
    # every reported value equals a brute-force python computation
    for r in pairs.collect():
        a = _shingles(rows[r["key_a"]][1])
        b = _shingles(rows[r["key_b"]][1])
        assert abs(r["jaccard"] - len(a & b) / len(a | b)) < 1e-9


def _shingles(text: str, n: int = 3) -> set[str]:
    w = text.lower().split()
    if len(w) < n:
        return {" ".join(w)}
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def test_minhash_lsh_finds_neardups(spark):
    from lucene_spark.pipeline import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [(i, base + f"tail{i}") for i in range(4)] + [
        (10, "unrelated words that share nothing with the others at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.shingles(df, "text", "doc_id", n=3)
    sig = dedup.minhash_signatures(sh, num_hashes=32)
    pairs = dedup.minhash_lsh_pairs(sig, bands=8, rows_per_band=4)
    verified = dedup.jaccard_verify(sh, pairs, threshold=0.8)
    got = {(r["key_a"], r["key_b"]) for r in verified.collect()}
    assert {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)} <= got
    assert not any(10 in p for p in got)


def test_simhash_close_for_neardups(spark):
    from lucene_spark.pipeline import dedup

    rows = [(0, "a b c d e f g h"), (1, "a b c d e f g x"), (2, "q r s t u v w z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["key"]: r["simhash"] for r in dedup.simhash(df, "text", "doc_id").collect()}
    ham01 = bin(out[0] ^ out[1]).count("1")
    ham02 = bin(out[0] ^ out[2]).count("1")
    assert ham01 < ham02


def test_textstats(spark):
    from lucene_spark.pipeline import textstats

    df = spark.createDataFrame(
        [(0, "the quick fox is in the barn"), (1, ""), (2, "word")],
        "doc_id long, text string")
    tc = {r["doc_id"]: r["n"] for r in
          df.select("doc_id", textstats.token_count(F.col("text")).alias("n")).collect()}
    assert tc == {0: 7, 1: 0, 2: 1}

    q = textstats.quality_features(df, "text")
    r0 = q.filter(F.col("doc_id") == 0).collect()[0]
    assert r0["n_tokens"] == 7 and r0["stopword_hits"] == 3  # the, is, in
    assert q.filter(F.col("doc_id") == 1).collect()[0]["quality_score"] == 0.0

    lang = textstats.detect_language(
        spark.createDataFrame(
            [(0, "der hund ist nicht da"), (1, "the dog is here"), (2, "xyz abc")],
            "doc_id long, text string"), "text")
    got = {r["doc_id"]: r["detected_lang"] for r in lang.collect()}
    assert got == {0: "de", 1: "en", 2: "und"}


def test_similarity_bruteforce_and_lsh(spark):
    from lucene_spark.pipeline import similarity

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[7]]

    top = similarity.cosine_topk_bruteforce(df, "embedding", "vec_id", q, k=5).collect()
    assert top[0]["key"] == 7 and abs(top[0]["cosine"] - 1.0) < 1e-6
    # verify order against numpy
    vv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vv @ (np.asarray(q) / np.linalg.norm(q))
    want = list(np.argsort(-sims)[:5])
    assert [r["key"] for r in top] == want

    gem = similarity.pairwise_topk_gemm(df, "embedding", "vec_id", vecs[:2].astype(np.float64), k=3)
    rows2 = gem.collect()
    by_q = {}
    for r in rows2:
        by_q.setdefault(r["query_id"], []).append(r["key"])
    assert by_q[0][0] == 0 and by_q[1][0] == 1


def test_embedding_neardup(spark):
    from lucene_spark.pipeline import similarity

    rng = np.random.default_rng(5)
    base = rng.standard_normal((10, 16))
    # three true near-dups of vector 0
    vecs = np.vstack([base, base[0] + 0.05 * rng.standard_normal((3, 16))])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = similarity.embedding_neardup_exact(df, "embedding", "vec_id", 0.95)
    got = {(r["key_a"], r["key_b"]) for r in exact.collect()}
    assert {(0, 10), (0, 11), (0, 12)} <= got
    # verify values vs numpy
    vn = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    vn /= np.linalg.norm(vn, axis=1, keepdims=True)
    for r in exact.collect():
        want = float(vn[r["key_a"]] @ vn[r["key_b"]])
        assert abs(r["cosine"] - want) < 1e-6

    lsh = similarity.embedding_neardup_lsh(df, "embedding", "vec_id", 0.95,
                                           bits=4, tables=6)
    got_lsh = {(r["key_a"], r["key_b"]) for r in lsh.collect()}
    assert got_lsh <= got           # precision exact (verified)
    assert len(got_lsh) >= 3        # high-cosine pairs collide w.h.p.


def test_gate_lsh_recall_pinned(spark):
    """The gate parameters (sign-LSH 2 bits x 12 tables; MinHash 32x2
    banding) must recover EVERY exact pair on the sf0.001 fixture — the
    property that makes the LSH gates oracle-checkable against the exact
    SQL twin. A param regression fails here before it fails the driver."""
    import os

    from lucene_spark.pipeline import dedup, similarity

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest

        pytest.skip("driver testdata not present")
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    exact = {(r["key_a"], r["key_b"]) for r in
             similarity.embedding_neardup_exact(e, "embedding", "vec_id", 0.44).collect()}
    lsh = {(r["key_a"], r["key_b"]) for r in
           similarity.embedding_neardup_lsh(e, "embedding", "vec_id", 0.44,
                                            bits=2, tables=12).collect()}
    assert lsh == exact, f"sign-LSH recall {len(lsh & exact)}/{len(exact)}"

    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    sh = dedup.shingles(d, "text", "doc_id", n=3)
    want = {(r["key_a"], r["key_b"]) for r in
            dedup.exact_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5).collect()}
    sig = dedup.minhash_signatures(sh, num_hashes=64)
    pairs = dedup.minhash_lsh_pairs(sig, bands=32, rows_per_band=2)
    got = {(r["key_a"], r["key_b"]) for r in
           dedup.jaccard_verify(sh, pairs, threshold=0.5).collect()}
    assert got == want, f"MinHash-LSH recall {len(got & want)}/{len(want)}"


def test_knn_join(spark):
    """knn_join: exact parity vs numpy; knn_join_lsh: measured recall vs
    the exact result (the training-data KNN primitive)."""
    import os

    import pytest

    from lucene_spark.pipeline import similarity

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    q = e.filter("vec_id < 10")
    got = similarity.knn_join(q, e, "embedding", "vec_id", k=5).collect()
    # numpy oracle
    rows = e.select("vec_id", "embedding").collect()
    keys = np.array([r[0] for r in rows])
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    want = {}
    for r in rows:
        if r[0] >= 10:
            continue
        qv = np.asarray(r[1], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-30)
        sims = m @ qv
        order = sorted(zip(-sims, keys))[:5]
        want[r[0]] = [int(k) for _, k in order]
    got_by_q = {}
    for r in sorted(got, key=lambda r: -r["cosine"]):
        got_by_q.setdefault(r["query_key"], []).append(r["key"])
    assert set(got_by_q) == set(want)
    for qk in want:
        assert set(got_by_q[qk]) == set(want[qk]), qk

    # LSH path recall over the same queries
    lsh = similarity.knn_join_lsh(q, e, "embedding", "vec_id", k=5,
                                  bits=2, tables=8).collect()
    lsh_by_q = {}
    for r in lsh:
        lsh_by_q.setdefault(r["query_key"], set()).add(r["key"])
    hits = sum(len(lsh_by_q.get(qk, set()) & set(want[qk])) for qk in want)
    recall = hits / (5 * len(want))
    assert recall >= 0.9, f"knn_join_lsh recall {recall:.2f}"


def test_nsw_graph_ann(spark):
    """NSW graph ANN (lucene/CHANGES.txt:13-15, LUCENE-9004 role):
    full-ef beam search over the chain-connected shard graphs is
    exhaustive, so the multi-shard merge must equal brute force exactly;
    partial-ef recall is measured against the same oracle."""
    import os

    import pytest

    from lucene_spark.pipeline import ann

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    rows = e.select("vec_id", "embedding").collect()
    keys = np.array([r[0] for r in rows])
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    qm = [list(r[1]) for r in rows if r[0] < 3]

    exact = {}
    for qi in range(3):
        qv = np.asarray(qm[qi], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-30)
        sims = m @ qv
        exact[qi] = [int(k) for _, k in sorted(zip(-sims, keys))[:10]]

    got = ann.nsw_topk(e.repartition(4, "vec_id"), "embedding", "vec_id",
                       qm, k=10, m_neighbors=8, ef=10 ** 6).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (-r["cosine"], r["key"])):
        by_q.setdefault(r["query_id"], []).append(r["key"])
    assert set(by_q) == {0, 1, 2}
    for qi in exact:
        assert set(by_q[qi]) == set(exact[qi]), qi

    # partial-ef recall on a single shard (the approximate serving point)
    approx = ann.nsw_topk(e.coalesce(1), "embedding", "vec_id", qm, k=10,
                          m_neighbors=8, ef=32).collect()
    ap_q = {}
    for r in approx:
        ap_q.setdefault(r["query_id"], set()).add(r["key"])
    hits = sum(len(ap_q.get(qi, set()) & set(exact[qi])) for qi in exact)
    recall = hits / 30
    assert recall >= 0.8, f"nsw recall@10 {recall:.2f}"


def test_multimodal_plumbing(spark):
    from lucene_spark.pipeline import multimodal

    media = multimodal.make_fake_media(spark, n=12)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)
    # deterministic: same payload → same feature
    again = multimodal.extract_features(media).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {r["media_id"]: r["feature"] for r in again}

    frames = multimodal.frame_sample_plan(media, every_ms=1000)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 6 for r in per)  # 0..5000 ms inclusive


def test_function_queries(spark):
    from lucene_spark.relational.functions import FUNCTIONS

    df = spark.createDataFrame([(1, 2.0), (2, 8.0), (3, 0.0)], "id long, x double")
    out = df.select(
        "id",
        FUNCTIONS["linear"](F.col("x"), 2, 1).alias("lin"),
        FUNCTIONS["recip"](F.col("x"), 1, 10, 2).alias("rec"),
        FUNCTIONS["map"](F.col("x"), 0, 3, 99, -1).alias("mapped"),
        FUNCTIONS["sum"](F.col("x"), F.lit(1.0), F.lit(2.0)).alias("s"),
        FUNCTIONS["product"](F.col("x"), F.lit(3.0)).alias("p"),
        FUNCTIONS["if"](F.col("x") > 1, F.lit("big"), F.lit("small")).alias("c"),
        FUNCTIONS["def"](F.col("x"), F.lit(7.0)).alias("d"),
        FUNCTIONS["strdist"](F.lit("kitten"), F.lit("sitten")).alias("sd"),
    ).collect()
    r = {row["id"]: row for row in out}
    assert r[1]["lin"] == 5.0 and abs(r[1]["rec"] - 10 / 4) < 1e-9
    assert r[1]["mapped"] == 99.0 and r[2]["mapped"] == -1.0
    assert r[1]["s"] == 5.0 and r[2]["p"] == 24.0
    assert r[1]["c"] == "big" and r[3]["c"] == "small"
    assert r[3]["d"] == 7.0 and r[2]["d"] == 8.0
    assert abs(r[1]["sd"] - (1 - 1 / 6)) < 1e-9

    sc = FUNCTIONS["scale"](df, F.col("x"), 0, 1)
    vals = {row["id"]: row["sc"] for row in df.select("id", sc.alias("sc")).collect()}
    assert vals[3] == 0.0 and vals[2] == 1.0 and abs(vals[1] - 0.25) < 1e-9


def test_sql_views(spark, reader):
    from lucene_spark.relational.sql import register_index_views

    views = register_index_views(reader)
    assert set(views) == {"termdict", "docstats", "postings", "fieldstats"}
    top = spark.sql("SELECT term, df FROM termdict ORDER BY df DESC, term LIMIT 3").collect()
    assert len(top) == 3 and top[0]["df"] >= top[-1]["df"]
    n = spark.sql("SELECT count(*) AS n FROM docstats").collect()[0]["n"]
    assert n == reader.doc_count
    fs = spark.sql("SELECT doc_count FROM fieldstats").collect()[0]["doc_count"]
    assert fs == reader.doc_count


def test_highlighter(spark):
    from lucene_spark.search.highlight import highlight, highlight_regex

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta the index writer works")],
        "doc_id long, text string")
    out = highlight(df, "text", ["index", "writer"], analyzer="standard", window=5).collect()[0]
    assert "<b>index</b>" in out["snippet"] and "<b>writer</b>" in out["snippet"]

    out2 = highlight_regex(df, "text", ["index"]).collect()[0]
    assert "<b>index</b>" in out2["snippet"]


def test_ivf_ann(spark):
    """IVF quantizer: nprobe=all equals exact brute force; partial probes
    reach measured recall."""
    import os

    import pytest

    from lucene_spark.pipeline import similarity

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    q = list(e.filter("vec_id = 0").select("embedding").head()[0])
    assigned, cent = similarity.ivf_build(e, "embedding", "vec_id",
                                          n_clusters=8, seed=7)
    assigned = assigned.persist()
    exact = [r["key"] for r in
             similarity.cosine_topk_bruteforce(e, "embedding", "vec_id", q, k=10).collect()]
    allprobe = [r["key"] for r in
                similarity.ivf_topk(assigned, cent, "embedding", "vec_id", q,
                                    k=10, nprobe=8).collect()]
    assert allprobe == exact
    part = {r["key"] for r in
            similarity.ivf_topk(assigned, cent, "embedding", "vec_id", q,
                                k=10, nprobe=3).collect()}
    recall = len(part & set(exact)) / 10
    assert recall >= 0.6, recall

    # IVF-PQ composition (IndexIVFPQ role): ADC shortlist within the
    # probed lists; full-probe + exact refine recovers brute force, the
    # pruned+refined path reaches measured recall
    books = similarity.pq_train(e, "embedding", "vec_id", m=4, k=8,
                                normalize=True)
    full = [r["key"] for r in
            similarity.ivf_pq_topk(assigned, cent, "embedding", "vec_id",
                                   q, books, k=10, nprobe=8,
                                   refine=e.count()).collect()]
    assert full == exact
    adc = similarity.ivf_pq_topk(assigned, cent, "embedding", "vec_id",
                                 q, books, k=10, nprobe=3).collect()
    assert len(adc) == 10
    dists = [r["pq_dist"] for r in adc]
    assert dists == sorted(dists)
    ref = {r["key"] for r in
           similarity.ivf_pq_topk(assigned, cent, "embedding", "vec_id",
                                  q, books, k=10, nprobe=3,
                                  refine=50).collect()}
    assert len(ref & set(exact)) / 10 >= 0.6
    assigned.unpersist()


def test_significant_terms_formula(spark, searcher, reader, corpus_pdf):
    """Engine significant_terms must equal a brute-force pandas
    recomputation of the Solr formula (SignificantTermsQParserPlugin
    .java:212) over the same matched slice."""
    import math

    from pyspark.sql import functions as F

    from lucene_spark.search.significant import significant_terms

    corpus = spark.createDataFrame(corpus_pdf)
    key = corpus.columns[0]
    # match a mid-frequency term through the engine
    matched = searcher.matches("merge", with_scores=False)
    ds = reader.docstats().select("doc_id", *[c for c in (key,) if c])
    ext = matched.join(ds, "doc_id").select(key)
    got = significant_terms(
        reader, ext, corpus, key, "content", k=5, min_df=2,
        max_df_ratio=0.9, analyzer="code").collect()
    assert got, "expected at least one significant term"
    n = reader.doc_count
    td = {(r["term"]): r["df"]
          for r in reader.termdict().select("term", "df").collect()}
    for r in got:
        expect = math.log(r["fg"]) * (math.log((n + 1) / (td[r["term"]] + 1)) + 1.0)
        assert abs(r["score"] - expect) < 1e-9
    # ordering: score desc then term asc
    pairs = [(r["score"], r["term"]) for r in got]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_expression_compiler(spark):
    """JavascriptCompiler/FunctionQParser analogue: expression strings
    compile to one Catalyst Column; precedence, unary minus, registry
    functions, pyspark fallback, bindings and error paths all behave."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from lucene_spark.relational.expressions import (
        ExpressionError, compile_expression)

    df = spark.createDataFrame(
        [(1, 2.0, 10.0), (2, 3.0, 100.0)], "id long, a double, b double")

    def ev(src, **cols):
        out = df.withColumn(
            "r", compile_expression(src, {k: F.col(v) for k, v in cols.items()}))
        return {r["id"]: r["r"] for r in out.collect()}

    assert ev("a + b * 2") == {1: 22.0, 2: 203.0}          # precedence
    assert ev("(a + b) * 2") == {1: 24.0, 2: 206.0}
    assert ev("-a + 5") == {1: 3.0, 2: 2.0}                 # unary minus
    assert ev("sum(a, b, 1)") == {1: 13.0, 2: 104.0}        # registry vararg
    r = ev("recip(b, 1, 1000, 1000)")                       # date-boost fn
    assert abs(r[1] - 1000 / 1010) < 1e-12
    r = ev("ln(b)")                                         # registry ln
    assert abs(r[1] - math.log(10.0)) < 1e-12
    r = ev("exp(a)")                                        # pyspark fallback
    assert abs(r[1] - math.exp(2.0)) < 1e-12
    assert ev("x * 2", x="a") == {1: 4.0, 2: 6.0}           # bindings
    for bad in ["a +", "foo(", "1 2", "nosuchfn(a)", "a @ b"]:
        with pytest.raises(ExpressionError):
            compile_expression(bad)


def test_expression_conditionals(spark):
    """JavascriptCompiler boolean/comparison/ternary semantics
    (Javascript.g:56-118): comparisons and &&/||/! yield 1.0/0.0 over
    doubles; ternary conditions are true iff nonzero; null operands
    compare false (advanceExact-missing collapses to the else branch)."""
    import pytest
    from pyspark.sql import functions as F

    from lucene_spark.relational.expressions import (
        ExpressionError, compile_expression)

    df = spark.createDataFrame(
        [(1, 2.0, 10.0), (2, 3.0, 100.0), (3, None, 5.0)],
        "id long, a double, b double")

    def ev(src):
        out = df.withColumn("r", compile_expression(src))
        return {r["id"]: r["r"] for r in out.collect()}

    assert ev("a > 2") == {1: 0.0, 2: 1.0, 3: 0.0}          # null → false
    assert ev("a >= 2 && b < 50") == {1: 1.0, 2: 0.0, 3: 0.0}
    assert ev("a > 2 || b > 50") == {1: 0.0, 2: 1.0, 3: 0.0}
    assert ev("!(a > 2)") == {1: 1.0, 2: 0.0, 3: 1.0}
    assert ev("a == 3") == {1: 0.0, 2: 1.0, 3: 0.0}
    assert ev("a != 3") == {1: 1.0, 2: 0.0, 3: 0.0}
    # ternary picks per-row; nested in the false arm (right-assoc)
    assert ev("a > 2 ? b * 2 : b + 1") == {1: 11.0, 2: 200.0, 3: 6.0}
    assert ev("b >= 100 ? 1 : b >= 10 ? 2 : 3") == {1: 2.0, 2: 1.0, 3: 3.0}
    # arithmetic over boolean results (1/0 doubles, the reference's model)
    assert ev("(a > 2) + (b > 2)") == {1: 1.0, 2: 2.0, 3: 1.0}
    # conditionals inside function args
    assert ev("sqrt(a > 2 ? 16 : 4)") == {1: 2.0, 2: 4.0, 3: 2.0}
    # chained comparison is left-assoc over 1/0 like C
    assert ev("5 > 4 > 1") == {1: 0.0, 2: 0.0, 3: 0.0}
    # equality binds looser than relational (Javascript.g): x == (b < 50),
    # NOT (x == b) < 50 — the left-assoc reading would make every row 1.0
    # for '0 == b < 50' (0-or-1 compared < 50)
    assert ev("0 == b < 50") == {1: 0.0, 2: 1.0, 3: 0.0}
    assert ev("1 == b < 50") == {1: 1.0, 2: 0.0, 3: 1.0}
    for bad in ["a ? 1", "a ? 1 :", "a <", "a &&", "? 1 : 2"]:
        with pytest.raises(ExpressionError):
            compile_expression(bad)


def test_function_match(spark, searcher):
    """FunctionMatchQuery (queries/function/FunctionMatchQuery.java:33-60):
    predicate over a doc-values column, constant score, live docs only."""
    from lucene_spark.search.features import function_match

    ds = searcher.reader.docstats().select("doc_id", "doclen")
    want = {r["doc_id"] for r in ds.collect() if r["doclen"] > 300}
    got = function_match(searcher, "doclen > 300", columns=("doclen",),
                         boost=2.5).collect()
    assert {r["doc_id"] for r in got} == want
    assert want and all(r["score"] == 2.5 for r in got)
    # compound predicate = intersection
    both = function_match(
        searcher, "doclen > 300 && doclen < 400", columns=("doclen",))
    lens = {r["doc_id"]: r["doclen"] for r in ds.collect()}
    assert {r["doc_id"] for r in both.collect()} == {
        d for d, L in lens.items() if 300 < L < 400}


def test_scalar_quantization(spark):
    """int7 scalar quantization: reconstruction bounded by delta/2 per
    component, corrected dot-product estimate matches the numpy twin,
    and top-k over a clustered set recalls the exact top-k."""
    import numpy as np

    from lucene_spark.pipeline.similarity import (
        scalar_quantize, scalar_quantize_fit, sq_dot_topk)

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    base[7] = base[0] + 0.01   # near-dup of the query → must rank top
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mn, mx = scalar_quantize_fit(df, "embedding")
    assert mn == float(base.min()) and mx == float(base.max())

    q = scalar_quantize(df, "embedding", mn, mx, bits=7)
    got = {r["vec_id"]: (list(r["qvec"]), r["qvec_sum"]) for r in q.collect()}
    delta = (mx - mn) / 127
    for i in range(40):
        qv, qs = got[i]
        assert qs == sum(qv)
        recon = np.array(qv) * delta + mn
        assert np.abs(recon - base[i].astype(np.float64)).max() <= delta / 2 + 1e-12

    query = [float(x) for x in base[0]]
    topk = sq_dot_topk(df, "embedding", "vec_id", query, mn, mx, k=5).collect()
    # numpy twin of the corrected estimate
    qq = np.floor((np.clip(base.astype(np.float64), mn, mx) - mn) / delta + 0.5)
    qb = np.floor((np.clip(np.array(query), mn, mx) - mn) / delta + 0.5)
    est = (8 * mn * mn + mn * delta * (qq.sum(1) + qb.sum())
           + delta * delta * (qq @ qb))
    exp = sorted(range(40), key=lambda i: (-est[i], i))[:5]
    assert [r["key"] for r in topk] == exp
    for r in topk:
        assert abs(r["sq_dot"] - est[r["key"]]) < 1e-9
    # approximate ranking finds the exact-dot winners (clustered case)
    exact = base.astype(np.float64) @ np.array(query)
    assert set(r["key"] for r in topk) >= set(
        sorted(range(40), key=lambda i: (-exact[i], i))[:2])


def test_euclidean_and_dot_topk(spark):
    """VectorSimilarityFunction EUCLIDEAN / DOT_PRODUCT brute-force
    twins against numpy."""
    import numpy as np

    from lucene_spark.pipeline.similarity import (
        dot_topk_bruteforce, euclidean_topk_bruteforce)

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 6)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        "vec_id long, embedding array<float>")
    q = [float(x) for x in base[4]]
    x = base.astype(np.float64)
    d = np.sqrt(((x - np.array(q)) ** 2).sum(1))
    exp = sorted(range(30), key=lambda i: (d[i], i))[:5]
    got = euclidean_topk_bruteforce(df, "embedding", "vec_id", q, k=5).collect()
    assert [r["key"] for r in got] == exp
    assert got[0]["key"] == 4 and abs(got[0]["distance"]) < 1e-9
    dots = x @ np.array(q)
    expd = sorted(range(30), key=lambda i: (-dots[i], i))[:5]
    gotd = dot_topk_bruteforce(df, "embedding", "vec_id", q, k=5).collect()
    assert [r["key"] for r in gotd] == expd
    for r in gotd:
        assert abs(r["dot"] - dots[r["key"]]) < 1e-9


def test_product_quantization(spark):
    """PQ (Jégou et al. 2011): deterministic per-subspace Lloyd, codegen
    argmin encoding identical to numpy, ADC distances equal the table
    lookups, and a clustered near-dup of the query survives top-1."""
    import numpy as np

    from lucene_spark.pipeline.similarity import (
        pq_adc_topk, pq_encode, pq_train)

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 5
    base = np.vstack([centers[i % 4] + 0.1 * rng.standard_normal(16)
                      for i in range(48)]).astype(np.float32)
    base[13] = base[0] + 0.01
    rows = [(i, [float(x) for x in base[i]]) for i in range(48)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    books = pq_train(df, "embedding", "vec_id", m=4, k=4, iters=3)
    assert len(books) == 4 and all(len(b) == 4 and len(b[0]) == 4
                                   for b in books)

    # encode matches numpy argmin per subspace
    enc = {r["vec_id"]: list(r["pq_codes"]) for r in
           pq_encode(df, "embedding", books).collect()}
    xs = base.astype(np.float64)
    for i in range(48):
        for j in range(4):
            sv = xs[i, j * 4:(j + 1) * 4]
            d2 = [((sv - np.array(c)) ** 2).sum() for c in books[j]]
            assert enc[i][j] == int(np.argmin(d2)), (i, j)

    # ADC = sum of query-table lookups; ordering matches the numpy twin
    q = [float(x) for x in base[0]]
    got = pq_adc_topk(df, "embedding", "vec_id", q, books, k=5).collect()
    dist = {}
    for i in range(48):
        s = 0.0
        for j in range(4):
            qj = np.array(q[j * 4:(j + 1) * 4])
            cj = np.array(books[j][enc[i][j]])
            s += ((qj - cj) ** 2).sum()
        dist[i] = s
    exp = sorted(dist, key=lambda i: (dist[i], i))[:5]
    assert [r["key"] for r in got] == exp
    for r in got:
        assert abs(r["pq_dist"] - dist[r["key"]]) < 1e-9
    # the near-dup (13) and the query itself share codes → both in top
    assert {0, 13} <= {r["key"] for r in got}


def test_scalar_quantization_degenerate_range(spark):
    from lucene_spark.pipeline.similarity import scalar_quantize, sq_dot_topk

    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<float>")
    q = scalar_quantize(df, "embedding", 1.0, 1.0).collect()
    assert all(list(r["qvec"]) == [0, 0] for r in q)
    out = sq_dot_topk(df, "embedding", "vec_id", [1.0, 1.0], 1.0, 1.0, k=2).collect()
    # all-constant vectors: estimate = d·mn² exactly
    assert [r["key"] for r in out] == [0, 1]
    assert all(abs(r["sq_dot"] - 2.0) < 1e-12 for r in out)


def test_knn_classify_majority_vote(spark):
    """knn_classify (KNearestNeighborClassifier role): matches a numpy
    vote oracle — count desc, summed-cosine desc, label asc."""
    import os

    import pytest

    from lucene_spark.pipeline.classify import knn_classify

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    train = e.filter("vec_id >= 100").withColumn(
        "label", F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                              (F.col("vec_id") % 3 + 1).cast("int")))
    test = e.filter("vec_id < 10")
    got = {r["key"]: (r["label"], r["votes"]) for r in
           knn_classify(train, test, "embedding", "vec_id", "label", k=5).collect()}

    rows = e.select("vec_id", "embedding").collect()
    m = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    unit = {k: v / max(np.linalg.norm(v), 1e-30) for k, v in m.items()}
    train_keys = sorted(k for k in m if k >= 100)
    want = {}
    for tk in sorted(k for k in m if k < 10):
        sims = sorted(((-(unit[tk] @ unit[k]), k) for k in train_keys))[:5]
        votes = {}
        for negs, k in sims:
            lab = "abc"[k % 3]
            c, s = votes.get(lab, (0, 0.0))
            votes[lab] = (c + 1, s + (-negs))
        best = sorted(votes.items(), key=lambda kv: (-kv[1][0], -kv[1][1], kv[0]))[0]
        want[tk] = (best[0], best[1][0])
    assert got == want and len(got) == 10


def test_duplicate_clusters_chain(spark):
    """A~B, B~C without A~C must still collapse to one cluster; two
    disjoint components keep distinct labels; convergence beyond one
    round (a path of length 4 needs >1 propagation rounds)."""
    from lucene_spark.pipeline import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),       # path: needs >1 round
         (10, 11), (11, 12),                   # second component
         (20, 21)],
        "key_a long, key_b long")
    got = {r["key"]: r["cluster"]
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_keep_representative(spark):
    from lucene_spark.pipeline import dedup

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id long, quality double")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "key long, cluster long")
    kept = {r["doc_id"] for r in dedup.dedup_keep_representative(
        df, clusters, "doc_id", quality_col="quality").collect()}
    # cluster 1 → best quality 0.9, tie 2 vs 3 → min key 2;
    # 4 is its own cluster; 9 is a singleton (absent from clusters)
    assert kept == {2, 4, 9}
    kept2 = {r["doc_id"] for r in dedup.dedup_keep_representative(
        df, clusters, "doc_id").collect()}
    assert kept2 == {1, 4, 9}
