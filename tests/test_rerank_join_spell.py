"""Query-time join (JoinUtil), LTR rerank (solr/contrib/ltr), spellcheck
(DirectSpellChecker), infix suggest, DFR G/L/H2 similarity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------- joins


def test_join_query_none_mode(searcher, reader):
    """score_mode=none: to-side docs whose repo occurs among from-side
    matches, all scores 1.0 (JoinUtil.createJoinQuery + ScoreMode.None)."""
    from lucene_spark.search.joins import join_query

    out = join_query(searcher, "merge", "repo", "repo", score_mode="none").collect()
    assert out and all(r["score"] == 1.0 for r in out)
    # oracle: repos of docs matching 'merge', then every doc in those repos
    hits = {r["doc_id"] for r in searcher.matches("merge", with_scores=False).collect()}
    ds = {r["doc_id"]: r["repo"] for r in reader.docstats().select("doc_id", "repo").collect()}
    repos = {ds[d] for d in hits}
    expect = {d for d, rp in ds.items() if rp in repos}
    assert {r["doc_id"] for r in out} == expect


@pytest.mark.parametrize("mode,agg", [("max", max), ("min", min),
                                      ("total", sum), ("avg", lambda v: sum(v) / len(v))])
def test_join_query_score_modes(searcher, reader, mode, agg):
    from lucene_spark.search.joins import join_query

    out = {r["doc_id"]: r["score"]
           for r in join_query(searcher, "merge", "repo", "repo", score_mode=mode).collect()}
    hits = {r["doc_id"]: r["score"] for r in searcher.matches("merge").collect()}
    ds = {r["doc_id"]: r["repo"] for r in reader.docstats().select("doc_id", "repo").collect()}
    by_repo: dict[str, list[float]] = {}
    for d, s in hits.items():
        by_repo.setdefault(ds[d], []).append(s)
    for d, s in out.items():
        exp = agg(by_repo[ds[d]])
        assert s == pytest.approx(exp, rel=1e-6), (d, mode)


def test_join_query_masks_deletes(searcher, reader):
    """Tombstoned docs never resurface on the to side (JoinUtil's toQuery
    only matches live docs)."""
    from lucene_spark.search.joins import join_query

    base = {r["doc_id"] for r in
            join_query(searcher, "merge", "repo", "repo").collect()}
    victim = sorted(base)[0]
    s2 = searcher.with_deletes([victim])
    out = {r["doc_id"] for r in
           join_query(s2, "merge", "repo", "repo").collect()}
    assert victim not in out


def test_join_query_rejects_uncarried_field(searcher):
    from lucene_spark.search.joins import join_query

    with pytest.raises(ValueError, match="not carried"):
        join_query(searcher, "merge", "nope", "repo")


# ------------------------------------------------------------------------ ltr


def test_ltr_linear_rerank(searcher, reader, spark):
    """Window semantics of rq={!ltr reRankDocs=N}: only the base top-N is
    rescored; model = w·score + w2·doclen-feature, verified by hand."""
    from lucene_spark.search.ltr import LinearModel, rerank

    hits = searcher.matches("index")
    feats = reader.docstats().select(
        "doc_id", F.log(F.lit(1.0) + F.col("doclen")).alias("logdl"))
    model = LinearModel({"score": 1.0, "logdl": 0.25}, intercept=0.5)
    out = rerank(hits, feats, model, k=5, rerank_docs=20).collect()
    assert len(out) == 5
    # hand-compute: top-20 base hits by (score desc, doc_id asc), rescore
    base = sorted(hits.collect(), key=lambda r: (-r["score"], r["doc_id"]))[:20]
    dl = {r["doc_id"]: r["doclen"] for r in reader.docstats().collect()}
    rescored = sorted(
        ((0.5 + r["score"] + 0.25 * math.log(1.0 + dl[r["doc_id"]]), r["doc_id"])
         for r in base),
        key=lambda t: (-t[0], t[1]))[:5]
    got = [(r["ltr_score"], r["doc_id"]) for r in sorted(out, key=lambda r: r["ltr_rank"])]
    for (es, ed), (gs, gd) in zip(rescored, got):
        assert gd == ed and gs == pytest.approx(es, rel=1e-6)


def test_ltr_tail_keeps_base_order(searcher, reader):
    """ReRankCollector semantics: k > rerank_docs returns below-window
    hits in base order with their original score."""
    from lucene_spark.search.ltr import LinearModel, rerank

    hits = searcher.matches("index")
    n_hits = hits.count()
    assert n_hits > 8
    model = LinearModel({"score": -1.0})     # reverse the window
    out = rerank(hits, None, model, k=n_hits, rerank_docs=5).collect()
    out = sorted(out, key=lambda r: r["ltr_rank"])
    base = sorted(hits.collect(), key=lambda r: (-r["score"], r["doc_id"]))
    window_ids = {r["doc_id"] for r in base[:5]}
    # first 5 rows are the (reversed) window; the rest are base order
    assert {r["doc_id"] for r in out[:5]} == window_ids
    assert [r["doc_id"] for r in out[:5]] == [r["doc_id"] for r in
                                              sorted(base[:5], key=lambda r: (r["score"], r["doc_id"]))]
    assert [r["doc_id"] for r in out[5:]] == [r["doc_id"] for r in base[5:]]
    for got, exp in zip(out[5:], base[5:]):
        assert got["ltr_score"] == pytest.approx(exp["score"], rel=1e-6)


def test_ltr_missing_features_default_zero(searcher, reader, spark):
    """A doc absent from the features frame scores with feature=0
    (FieldValueFeature default), not null."""
    from lucene_spark.search.ltr import LinearModel, rerank

    hits = searcher.matches("index")
    base = sorted(hits.collect(), key=lambda r: (-r["score"], r["doc_id"]))[:10]
    # features for every window doc EXCEPT the top one
    feats = spark.createDataFrame(
        [(r["doc_id"], 5.0) for r in base[1:]], ["doc_id", "bonus"])
    model = LinearModel({"score": 1.0, "bonus": 1.0})
    out = {r["doc_id"]: r["ltr_score"]
           for r in rerank(hits, feats, model, k=10, rerank_docs=10).collect()}
    assert out[base[0]["doc_id"]] == pytest.approx(base[0]["score"], rel=1e-6)
    assert out[base[1]["doc_id"]] == pytest.approx(base[1]["score"] + 5.0, rel=1e-6)


def test_ltr_trees_model(spark):
    """AdditiveTreesModel compiles to nested CASE WHEN, matches hand eval."""
    from lucene_spark.search.ltr import AdditiveTreesModel, TreeNode

    t1 = TreeNode(feature="x", threshold=2.0,
                  left=TreeNode(value=1.0),
                  right=TreeNode(feature="y", threshold=0.5,
                                 left=TreeNode(value=2.0), right=TreeNode(value=3.0)))
    model = AdditiveTreesModel(trees=[(0.5, t1), (1.0, TreeNode(value=10.0))])
    df = spark.createDataFrame(
        [(1.0, 0.0), (3.0, 0.4), (3.0, 0.9)], ["x", "y"])
    got = [r["s"] for r in df.select(model.expr().alias("s")).collect()]
    assert got == [0.5 * 1.0 + 10.0, 0.5 * 2.0 + 10.0, 0.5 * 3.0 + 10.0]


def test_ltr_normalizers(spark):
    from lucene_spark.search.ltr import minmax_normalizer, standard_normalizer

    df = spark.createDataFrame([(5.0,)], ["v"])
    r = df.select(
        minmax_normalizer(F.col("v"), 0.0, 10.0).alias("mm"),
        standard_normalizer(F.col("v"), 4.0, 2.0).alias("st")).first()
    assert r["mm"] == pytest.approx(0.5) and r["st"] == pytest.approx(0.5)


# ------------------------------------------------------------------ spellcheck


def test_spellcheck_suggest_similar(reader):
    from lucene_spark.search.spellcheck import suggest_similar

    # pick a real dictionary term, mutate it, expect it back as top hit
    td = reader.termdict().orderBy(F.col("df").desc()).limit(1).collect()
    term = td[0]["term"]
    assert len(term) >= 3
    typo = term[0] + term[2:] if len(term) > 3 else term + "x"
    out = suggest_similar(reader, typo, n=5, max_edits=2, min_prefix=1).collect()
    assert out and out[0]["ed"] >= 1
    assert any(r["term"] == term for r in out)
    # similarity = 1 - ed/min(len) (LevenshteinDistance.getDistance)
    for r in out:
        exp = 1.0 - r["ed"] / min(len(r["term"]), len(typo))
        assert r["similarity"] == pytest.approx(exp, abs=1e-4)
    # ordering: similarity desc, df desc, term asc
    keys = [(-r["similarity"], -r["df"], r["term"]) for r in out]
    assert keys == sorted(keys)


def test_spellcheck_more_popular(reader):
    from lucene_spark.search.spellcheck import suggest_similar

    td = reader.termdict().orderBy(F.col("df").desc()).limit(1).collect()
    term, df = td[0]["term"], td[0]["df"]
    typo = term[0] + term[2:] if len(term) > 3 else term + "x"
    out = suggest_similar(reader, typo, n=10, more_popular_than=df).collect()
    assert all(r["df"] > df for r in out)


def test_spellcheck_collate(searcher, reader):
    from lucene_spark.search.spellcheck import collate

    td = reader.termdict().orderBy(F.col("df").desc()).limit(2).collect()
    t0 = td[0]["term"]
    typo = t0[0] + t0[2:] if len(t0) > 3 else t0 + "x"
    collated, repl = collate(searcher, f"{typo} {td[1]['term']}")
    assert typo in repl and repl[typo] == t0
    assert collated.split()[0] == t0 and collated.split()[1] == td[1]["term"]


def test_suggest_infix(reader):
    from lucene_spark.search.suggest import suggest_infix

    out = suggest_infix(reader, "nde", n=10).collect()  # 'index' etc.
    assert out and all("nde" in r["term"] for r in out)
    keys = [(-r["df"], r["term"]) for r in out]
    assert keys == sorted(keys)


# ------------------------------------------------------------------- DFR G


def test_dfr_g_properties():
    from lucene_spark.search.similarity import DFRGL2Similarity

    sim = DFRGL2Similarity()
    w = sim.weight(10, 1000, cf=40)
    tf = np.array([1, 2, 4, 8, 16], dtype=np.float64)
    dl = np.full(5, 120.0)
    sc = sim.score(tf, dl, w, np.float32(100.0))
    assert np.all(np.isfinite(sc)) and np.all(sc >= 0)
    assert np.all(np.diff(sc) > 0)          # tf-monotone ↑
    sc2 = sim.score(np.full(4, 3.0), np.array([50.0, 100.0, 200.0, 400.0]),
                    w, np.float32(100.0))
    assert np.all(np.diff(sc2) < 1e-12)     # doclen-monotone ↓
    # max_score bound: score(max_tf, min_dl) ≥ any score in the block
    mx = sim.max_score(np.float64(16.0), np.float64(50.0), w, np.float32(100.0))
    assert mx >= sc.max() - 1e-6


def test_dfr_g_engine(reader):
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(reader, similarity="dfr_gl2")
    rows = s.search("index", k=5).collect()
    assert len(rows) == 5 and all(np.isfinite(r["score"]) and r["score"] >= 0
                                  for r in rows)


def test_collate_preserves_original_query_shape(searcher, reader):
    """SpellCheckCollator contract: collation = the ORIGINAL query with
    only misspelled words swapped — correctly spelled words keep their
    case/surface form (review fix: previously returned re-joined
    analyzed tokens)."""
    from lucene_spark.search.spellcheck import collate

    td = reader.termdict().orderBy(F.col("df").desc()).limit(2).collect()
    good = td[0]["term"]
    typo = good[:-1] + ("x" if good[-1] != "x" else "q")
    q = f"The {typo} Whatever"
    collated, repl = collate(searcher, q)
    assert repl.get(typo.lower()) == good or repl == {}, repl
    # surrounding words keep their original surface form
    assert collated.startswith("The ") and collated.endswith(" Whatever")


def test_ltr_boolean_feature_defaults_to_zero(searcher, reader, spark):
    """fillna(0.0) only fills numeric columns — boolean features of docs
    missing from the features frame must still default to 0, not null
    (review fix)."""
    from lucene_spark.search.ltr import LinearModel, rerank

    hits = searcher.search("table OR merge", k=10)
    some = hits.limit(1).collect()
    feats = spark.createDataFrame([(some[0]["doc_id"], True)],
                                  "doc_id long, is_premium boolean")
    model = LinearModel({"is_premium": 2.0, "score": 1.0})
    out = rerank(hits, feats, model, key="doc_id", rerank_docs=10, k=10)
    rows = out.collect()
    assert all(r["ltr_score"] is not None for r in rows)


# ------------------------------------------------------- word-break spelling

@pytest.fixture(scope="module")
def wb_reader(spark, tmp_path_factory):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader

    rows = [(1, "wire less network stack"),
            (2, "wire frame model"),
            (3, "unit test network")]
    df = spark.createDataFrame(rows, "ext_id long, body string")
    idx = str(tmp_path_factory.mktemp("wb")) + "/idx"
    cfg = IndexConfig(key_cols=("ext_id",), content_col="body",
                      analyzer="whitespace", partitions=1, num_groups=1,
                      num_buckets=2, termdict_partitions=1)
    IndexBuilder(spark, cfg).build(df, idx, overwrite=True)
    return IndexReader(spark, idx)


def test_word_breaks_single_change(wb_reader):
    """WordBreakSpellChecker.suggestWordBreaks (WordBreakSpellChecker
    .java:240-310): split an unindexed run-together term where both
    halves are dictionary words."""
    from lucene_spark.search.spellcheck import suggest_word_breaks

    got = suggest_word_breaks(wb_reader, "wireless")
    assert got == [[("wire", 2), ("less", 1)]]
    # indexed term + not_in_index mode → no suggestions (java:97-99)
    assert suggest_word_breaks(wb_reader, "network") == []
    # 'always' keeps suggesting even for indexed terms
    assert suggest_word_breaks(wb_reader, "network",
                               suggest_mode="always") == []  # no valid split
    # frequency floor: components must clear min_suggestion_frequency
    assert suggest_word_breaks(wb_reader, "wireless",
                               min_suggestion_frequency=2) == []


def test_word_breaks_recursive_two_changes(wb_reader):
    from lucene_spark.search.spellcheck import suggest_word_breaks

    got = suggest_word_breaks(wb_reader, "wirelessnetwork", max_changes=2)
    # fewest breaks first (wireless|network is NOT one indexed word, so
    # the only 1-break split dies; wire|less recursion wins at 2 breaks)
    assert [[w for w, _ in s] for s in got] == [["wire", "less", "network"]]
    # max_changes=1 cannot reach the 2-break suggestion
    assert suggest_word_breaks(wb_reader, "wirelessnetwork") == []


def test_word_combinations(wb_reader):
    """suggestWordCombinations (WordBreakSpellChecker.java:145-239):
    adjacent unindexed terms combining into a dictionary word."""
    from lucene_spark.search.spellcheck import suggest_word_combinations

    got = suggest_word_combinations(wb_reader, ["net", "work", "stack"])
    assert got and got[0]["word"] == "network" and got[0]["indexes"] == (0, 1)
    assert got[0]["freq"] == 2
    # both components indexed → filtered in not_in_index mode
    assert suggest_word_combinations(wb_reader, ["wire", "less"]) == []
    # more_popular: combined df must beat every component's
    mp = suggest_word_combinations(wb_reader, ["wire", "less"],
                                   suggest_mode="more_popular")
    assert mp == []  # 'wireless' (df 0) beats neither
