"""JSON Facet API tree + ML streaming expressions (featuresSelection /
textLogit roles). Brute-force pandas twins for every facet path; the
relatedness formula is pinned to RelatednessAgg.computeRelatedness
(RelatednessAgg.java:379-396) via hand-computed vectors."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    langs = ["en", "de", "fr", "zh", None]
    sources = [f"s{i}" for i in range(6)]
    words = ["merge", "scan", "hash", "table", "group", "sort", "index"]
    rows = []
    for i in range(500):
        rows.append({
            "doc_id": i,
            "lang": langs[int(rng.integers(0, len(langs)))],
            "source": sources[int(rng.integers(0, len(sources)))],
            "n_chars": int(rng.integers(10, 900)) if rng.random() > 0.05 else None,
            "text": " ".join(words[int(j)] for j in rng.integers(0, len(words), 12)),
        })
    return spark.createDataFrame(pd.DataFrame(rows)).cache()


def _ref_relatedness(fg_count, fg_size, bg_count, bg_size):
    bg_prob = bg_count / bg_size
    num = fg_count - fg_size * bg_prob
    denom = math.sqrt(fg_size * bg_prob * (1 - bg_prob)) or 1e-10
    z = num / denom

    def sig(x, off, sc):
        return (x + off) / (sc + abs(x + off))

    r = 0.2 * (sig(z, -80, 50) + sig(z, -30, 30) + sig(z, 0, 30)
               + sig(z, 30, 30) + sig(z, 80, 50))
    return math.floor(r * 1e5 + 0.5) / 1e5


def test_terms_facet_top_level(docs):
    from lucene_spark.relational.jsonfacets import json_facets

    spec = {"type": "terms", "field": "lang", "limit": 2,
            "facet": {"avg_chars": "avg(n_chars)"}}
    out = json_facets(docs, spec)[""].toPandas()
    pdf = docs.toPandas()
    counts = pdf[pdf.lang.notna()].groupby("lang").size().sort_values(ascending=False)
    assert list(out["lang"]) == sorted(counts.index[:2], key=lambda v: (-counts[v], v))
    for _, r in out.iterrows():
        sub = pdf[pdf.lang == r["lang"]]
        assert r["count"] == len(sub)
        assert r["avg_chars"] == pytest.approx(sub.n_chars.mean())


def test_missing_and_mincount_and_prefix(docs):
    from lucene_spark.relational.jsonfacets import json_facets

    pdf = docs.toPandas()
    out = json_facets(docs, {"type": "terms", "field": "lang",
                             "missing": True, "limit": 10})[""].toPandas()
    assert out["lang"].isna().any()
    assert out["count"].sum() == len(pdf)

    out = json_facets(docs, {"type": "terms", "field": "lang",
                             "prefix": "e", "limit": 10})[""].toPandas()
    assert set(out["lang"]) == {l for l in pdf.lang.dropna() if l.startswith("e")}

    big = int(pdf[pdf.lang.notna()].groupby("lang").size().max())
    out = json_facets(docs, {"type": "terms", "field": "lang",
                             "mincount": big, "limit": 10})[""].toPandas()
    assert (out["count"] >= big).all() and len(out) >= 1


def test_nested_subfacet_refinement(docs):
    """Sub-facets are computed only inside the parent's SURVIVING buckets
    and ranked within each parent independently."""
    from lucene_spark.relational.jsonfacets import json_facets

    spec = {"type": "terms", "field": "lang", "limit": 2,
            "facet": {"by_source": {
                "type": "terms", "field": "source", "limit": 2,
                "sort": {"m": "desc"}, "facet": {"m": "max(n_chars)"}}}}
    res = json_facets(docs, spec)
    parents = set(res[""].toPandas()["lang"])
    child = res["by_source"].toPandas()
    assert set(child["lang"]) <= parents
    pdf = docs.toPandas()
    for lang in parents:
        sub = pdf[(pdf.lang == lang) & pdf.source.notna()]
        exp = (sub.groupby("source").n_chars.max()
               .sort_values(ascending=False))
        got = child[child.lang == lang].sort_values("m", ascending=False)
        assert len(got) == min(2, exp.size)
        # top child by max(n_chars) matches pandas (ties resolve by value asc)
        top = exp[exp == exp.iloc[0]].index.min()
        assert got.iloc[0]["source"] == top


def test_agg_suite_matches_pandas(docs):
    from lucene_spark.relational.jsonfacets import json_facets

    spec = {"type": "terms", "field": "lang", "limit": 10,
            "facet": {"s": "sum(n_chars)", "mn": "min(n_chars)",
                      "mx": "max(n_chars)", "ssq": "sumsq(n_chars)",
                      "sd": "stddev(n_chars)", "va": "variance(n_chars)",
                      "cv": "countvals(n_chars)", "mi": "missing(n_chars)",
                      "u": "unique(source)",
                      "p": "percentile_exact(n_chars,50)"}}
    out = json_facets(docs, spec)[""].toPandas().set_index("lang")
    pdf = docs.toPandas()
    for lang, g in pdf[pdf.lang.notna()].groupby("lang"):
        r = out.loc[lang]
        assert r["s"] == g.n_chars.sum()
        assert r["mn"] == g.n_chars.min() and r["mx"] == g.n_chars.max()
        assert r["ssq"] == (g.n_chars.dropna() ** 2).sum()
        assert r["sd"] == pytest.approx(g.n_chars.std(ddof=1))
        assert r["va"] == pytest.approx(g.n_chars.var(ddof=1))
        assert r["cv"] == g.n_chars.notna().sum()
        assert r["mi"] == g.n_chars.isna().sum()
        assert r["u"] == g.source.nunique()
        assert r["p"] == pytest.approx(
            np.percentile(g.n_chars.dropna(), 50, method="linear"))


def test_relatedness_matches_reference_formula(docs):
    from lucene_spark.relational.jsonfacets import json_facets

    flagged = (docs.withColumn("is_fg", F.col("lang") == "en")
               .withColumn("is_bg", F.lit(True)))
    spec = {"type": "terms", "field": "source", "limit": 100,
            "sort": {"rel": "desc"},
            "facet": {"rel": "relatedness(is_fg,is_bg)"}}
    out = json_facets(flagged, spec)[""].toPandas()
    pdf = docs.toPandas()
    fg_size = int((pdf.lang == "en").sum())
    bg_size = len(pdf)
    for _, r in out.iterrows():
        g = pdf[pdf.source == r["source"]]
        exp = _ref_relatedness(int((g.lang == "en").sum()), fg_size,
                               len(g), bg_size)
        assert r["rel"] == pytest.approx(exp, abs=1e-12)
    rels = list(out["rel"])
    assert rels == sorted(rels, reverse=True)


def test_relatedness_min_pop(docs):
    from lucene_spark.relational.jsonfacets import json_facets

    flagged = (docs.withColumn("is_fg", F.col("lang") == "en")
               .withColumn("is_bg", F.lit(True)))
    spec = {"type": "terms", "field": "source", "limit": 100,
            "facet": {"rel": "relatedness(is_fg,is_bg,min_pop=0.9)"}}
    out = json_facets(flagged, spec)[""].toPandas()
    assert (out["rel"] == float("-inf")).all()


def test_igain_matches_bruteforce(docs):
    from lucene_spark.pipeline.mlstreams import igain_terms

    out = igain_terms(docs, "text", "lang", "en", num_terms=7).toPandas()
    pdf = docs.toPandas()
    n = len(pdf)
    npos = int((pdf.lang == "en").sum())

    def H(p):
        if p <= 0 or p >= 1:
            return 0.0
        return -p * math.log(p) - (1 - p) * math.log(1 - p)

    toksets = [set(t.lower().split()) for t in pdf.text]
    pos = (pdf.lang == "en").values
    vocab = set().union(*toksets)
    scores = {}
    for term in vocab:
        has = np.array([term in s for s in toksets])
        df = int(has.sum())
        xc = int((has & pos).sum())
        scores[term] = (H(npos / n)
                        - ((df / n) * H(xc / df)
                           + (1 - df / n) * H((npos - xc) / (n - df + 1))))
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:7]
    assert list(out["term"]) == [t for t, _ in exp]
    for (t, s), got in zip(exp, out["score"]):
        assert got == pytest.approx(s)
    for _, r in out.iterrows():
        assert r["idf"] == pytest.approx(math.log(n / (r["docfreq"] + 1)))


def test_text_logit_converges_and_deterministic(docs):
    from lucene_spark.pipeline.mlstreams import text_logit

    terms = ["merge", "scan", "hash"]
    a = text_logit(docs, "text", "lang", "en", terms, max_iterations=4,
                   alpha=0.05, id_col="doc_id").toPandas()
    b = text_logit(docs.repartition(13), "text", "lang", "en", terms,
                   max_iterations=4, alpha=0.05, id_col="doc_id").toPandas()
    assert a["error"].tolist() == b["error"].tolist()
    assert list(a["weights"].iloc[-1]) == list(b["weights"].iloc[-1])
    assert a["error"].iloc[-1] <= a["error"].iloc[0]
    assert len(a) == 4
    cm = a.iloc[-1]
    total = int(cm.true_positive + cm.true_negative
                + cm.false_positive + cm.false_negative)
    # every doc containing >=1 feature term is classified each pass
    pdf = docs.toPandas()
    expected = sum(any(t in s.lower().split() for t in terms) for s in pdf.text)
    assert total == expected


def test_text_logit_rejects_bad_idfs(docs):
    from lucene_spark.pipeline.mlstreams import text_logit

    with pytest.raises(ValueError):
        text_logit(docs, "text", "lang", "en", ["merge", "scan"],
                   idfs=[1.0], max_iterations=1)
