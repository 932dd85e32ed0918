"""Domain mixing, logit inference, URL canonicalization — training-data
pipeline ops vs hand-computed expectations."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from lucene_spark.pipeline.mixing import mix_domains
from lucene_spark.pipeline.mlstreams import apply_logit
from lucene_spark.pipeline.urlnorm import canonical_url, url_dedup


# --------------------------------------------------------------------------
# mix_domains


@pytest.fixture()
def mixdf(spark):
    rows = [(i, "a" if i < 4 else ("b" if i < 8 else "c")) for i in range(12)]
    return spark.createDataFrame(rows, "doc_id int, src string")


def test_mix_exact_counts_up_frac_down(mixdf):
    # 4 docs each; targets: a=8 (x2), b=6 (x1.5), c=2 (downsample)
    out = mix_domains(mixdf, "src", {"a": 0.5, "b": 0.375, "c": 0.125},
                      total=16)
    got = {r["src"]: c for r, c in
           [(row, row["n"]) for row in
            out.groupBy("src").agg(F.count("*").alias("n")).collect()]}
    assert got == {"a": 8, "b": 6, "c": 2}


def test_mix_deterministic_membership(mixdf):
    out = mix_domains(mixdf, "src", {"b": 1.0, "c": 1.0}, total=8)
    rows = sorted((r.src, r.doc_id, r.epoch) for r in out.collect())
    # b: 4 docs -> target 4, one epoch each; c: target 4, one epoch each
    assert rows == [("b", 4, 1), ("b", 5, 1), ("b", 6, 1), ("b", 7, 1),
                    ("c", 8, 1), ("c", 9, 1), ("c", 10, 1), ("c", 11, 1)]
    # upsample epochs: first (n mod c) ranks get the extra repeat
    up = mix_domains(mixdf, "src", {"c": 1.0}, total=6)
    got = sorted((r.doc_id, r.epoch) for r in up.collect())
    assert got == [(8, 1), (8, 2), (9, 1), (9, 2), (10, 1), (11, 1)]


def test_mix_absent_domain_and_bad_args(mixdf):
    out = mix_domains(mixdf, "src", {"zz": 1.0, "a": 1.0}, total=4)
    assert {r.src for r in out.collect()} == {"a"}
    with pytest.raises(ValueError):
        mix_domains(mixdf, "src", {}, total=4)


def test_mix_partitioning_invariant(mixdf):
    a = mix_domains(mixdf, "src", {"a": 2.0, "b": 1.0}, total=9)
    b = mix_domains(mixdf.repartition(7), "src", {"a": 2.0, "b": 1.0},
                    total=9)
    assert (sorted(map(tuple, a.select("src", "doc_id", "epoch").collect()))
            == sorted(map(tuple, b.select("src", "doc_id", "epoch").collect())))


# --------------------------------------------------------------------------
# apply_logit


def test_apply_logit_matches_manual_sigmoid(spark):
    docs = spark.createDataFrame(
        [(1, "fast fast scan"), (2, "slow merge"), (3, "")],
        "doc_id int, text string")
    terms, idfs, w = ["fast", "scan"], [1.5, 2.0], [0.1, 0.4, -0.3]
    out = {r.doc_id: r for r in
           apply_logit(docs, "text", terms, idfs, w).collect()}
    x1 = [1.0, 1.5 * (1 + math.log(2)), 2.0 * (1 + math.log(1))]
    s1 = sum(a * b for a, b in zip(w, x1))
    assert abs(out[1].probability - 1 / (1 + math.exp(-s1))) < 1e-12
    # no feature terms -> bias only
    assert abs(out[2].probability - 1 / (1 + math.exp(-0.1))) < 1e-12
    assert out[3].probability == out[2].probability
    assert out[1].predicted == 1 and out[2].predicted == 1


def test_apply_logit_validates_shapes(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        apply_logit(docs, "text", ["a"], [1.0], [0.0])
    with pytest.raises(ValueError):
        apply_logit(docs, "text", ["a"], [1.0, 2.0], [0.0, 1.0])


def test_text_logit_then_apply_consistent(spark):
    from lucene_spark.pipeline.mlstreams import text_logit

    rows = [(i, "good fast clean" if i % 2 else "bad slow dirty",
             "pos" if i % 2 else "neg") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id int, text string, y string")
    terms = ["good", "bad", "fast"]
    hist = text_logit(docs, "text", "y", "pos", terms=terms,
                      max_iterations=8, alpha=0.3, id_col="doc_id")
    last = hist.orderBy(F.col("iteration").desc()).first()
    n = docs.count()
    # recompute idfs exactly as text_logit's default
    dfm = {"good": 20, "bad": 20, "fast": 20}
    idfs = [math.log(n / (dfm[t] + 1)) for t in terms]
    scored = apply_logit(docs, "text", terms, idfs, list(last.weights))
    acc = scored.filter(
        (F.col("predicted") == 1) == (F.col("y") == "pos")).count()
    assert acc == 40  # linearly separable toy set


# --------------------------------------------------------------------------
# canonical_url / url_dedup


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonical_url(F.col("u")).alias("c")).first().c


@pytest.mark.parametrize("raw,want", [
    ("HTTP://ExAmple.COM:80/Path/?b=2&a=1#frag",
     "http://example.com/Path?a=1&b=2"),
    ("https://host.org:443/x", "https://host.org/x"),
    ("https://host.org:8443/x", "https://host.org:8443/x"),
    ("http://h.io/p/?utm_source=tw&utm_medium=c&q=1&fbclid=zz",
     "http://h.io/p?q=1"),
    ("http://h.io/", "http://h.io/"),          # root slash kept
    ("http://h.io/a//", "http://h.io/a/"),     # one slash stripped
    ("relative/path?b=1&a=2#x", "relative/path?a=2&b=1"),
])
def test_canonical_url_cases(spark, raw, want):
    assert _canon(spark, raw) == want


def test_url_dedup_first_fetch_wins(spark):
    rows = [
        (1, "http://A.com/x?utm_source=s"),
        (2, "HTTP://a.COM:80/x"),
        (3, "http://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    out = {r.canonical_url: r for r in url_dedup(df, "url").collect()}
    assert out["http://a.com/x"].doc_id == 1
    assert out["http://a.com/x"].n_dups == 2
    assert out["http://a.com/y"].n_dups == 1
