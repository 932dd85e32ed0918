"""CCNet-style curation composition (pipeline/ccnet.py)."""

from pyspark.sql import functions as F

from lucene_spark.pipeline.ccnet import ccnet_curate


def _corpus(spark):
    rows = [
        # en docs, increasingly "weird" (higher self-perplexity)
        (1, "the cat is in the hat and the cat is that"),
        (2, "the dog is in the house and the dog is that"),
        (3, "the cat is in the hat and the cat is that"),   # dup of 1
        (4, "the zz qq xx ww vv uu tt rr"),  # en marker + unseen bigrams
        (5, "the cat is in the house and it is that"),
        # de docs
        (6, "der hund ist nicht ein gutes das"),
        (7, "die katze ist ein das und der"),
        # too short for bigrams
        (8, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_langid_buckets(spark):
    out = {r["key"]: r for r in
           ccnet_curate(_corpus(spark), "text", "doc_id").collect()}
    # dup doc 3 removed, all others survive
    assert sorted(out) == [1, 2, 4, 5, 6, 7, 8]
    assert out[1]["detected_lang"] == "en"
    assert out[6]["detected_lang"] == "de"
    # zero-bigram doc goes to head
    assert out[8]["n_bigrams"] == 0 and out[8]["bucket"] == "head"
    # the unseen-bigram doc has the worst perplexity of the en docs
    en = [r for r in out.values()
          if r["detected_lang"] == "en" and r["n_bigrams"] > 0]
    worst = max(en, key=lambda r: r["ppl_r"])
    assert worst["key"] == 4 and worst["bucket"] == "tail"


def test_bucket_is_per_language_split(spark):
    """Each language's scored docs split by ITS OWN terciles: every
    language with >= 1 scored doc has at least one head doc."""
    out = ccnet_curate(_corpus(spark), "text", "doc_id").collect()
    for lang in ("en", "de"):
        scored = [r for r in out
                  if r["detected_lang"] == lang and r["n_bigrams"] > 0]
        assert any(r["bucket"] == "head" for r in scored), lang


def test_lm_docs_hook(spark):
    """Training the LM on a clean slice (the paper's Wikipedia role)
    changes scores but not the schema/coverage."""
    docs = _corpus(spark)
    clean = docs.filter(F.col("doc_id").isin(1, 2, 5))
    out = ccnet_curate(docs, "text", "doc_id", lm_docs=clean).collect()
    assert sorted(r["key"] for r in out) == [1, 2, 4, 5, 6, 7, 8]
    assert {r["bucket"] for r in out} <= {"head", "middle", "tail"}
