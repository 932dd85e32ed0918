"""IR-quality harness (QualityStats analogue): hand-computed metric
checks + end-to-end over search_many."""

from __future__ import annotations

import pytest


def test_metrics_hand_computed(spark):
    from lucene_spark.search.quality import evaluate, summarize

    # query q1: ranked [1✓, 2✗, 3✓, 4✗, 5✗]; 3 relevant total (one missed)
    # AP = (1/1 + 2/3)/3 = 0.5556; P@5 = 2/5; recall = 2/3; RR = 1
    # query q2: ranked [1✗, 2✓]; 1 relevant; AP = (1/2)/1 = .5; RR = .5
    results = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q1", 13, 4), ("q1", 14, 5),
         ("q2", 20, 1), ("q2", 21, 2)],
        "query_id string, doc_id long, rank int")
    qrels = spark.createDataFrame(
        [("q1", 10), ("q1", 12), ("q1", 99), ("q2", 21)],
        "query_id string, doc_id long")
    per = {r["query_id"]: r for r in evaluate(results, qrels, k=5).collect()}
    assert per["q1"]["hits"] == 2 and per["q1"]["n_rel"] == 3
    assert abs(per["q1"]["average_precision"] - (1 + 2 / 3) / 3) < 1e-9
    assert abs(per["q1"]["precision_at_k"] - 2 / 5) < 1e-9
    assert abs(per["q1"]["recall_at_k"] - 2 / 3) < 1e-9
    assert per["q1"]["reciprocal_rank"] == 1.0
    assert abs(per["q2"]["average_precision"] - 0.5) < 1e-9
    assert per["q2"]["reciprocal_rank"] == 0.5

    s = summarize(evaluate(results, qrels, k=5))
    assert abs(s["map"] - ((1 + 2 / 3) / 3 + 0.5) / 2) < 1e-9
    assert abs(s["mrr"] - 0.75) < 1e-9
    assert s["n_queries"] == 2


def test_quality_over_search_many(searcher, reader):
    """Self-referential sanity: using each query's own exhaustive match set
    as qrels, recall@k ≤ 1 and MRR = 1 (top hit is always relevant)."""
    from pyspark.sql import functions as F

    from lucene_spark.search.quality import evaluate, summarize

    qs = {"t1": "index", "t2": "index AND writer", "t3": "merge OR cache"}
    results = searcher.search_many(qs, k=10)
    qrels = None
    for qid, q in qs.items():
        m = searcher.matches(q, with_scores=False).select(
            F.lit(qid).alias("query_id"), "doc_id")
        qrels = m if qrels is None else qrels.unionByName(m)
    per = evaluate(results, qrels, k=10)
    s = summarize(per)
    assert s["mrr"] == 1.0 and s["mean_p_at_k"] == 1.0
    assert 0 < s["mean_recall_at_k"] <= 1.0


def test_script_based_language_id(spark):
    """CJK/Cyrillic text has no whitespace stopwords to count — the
    script-ratio tier must classify it; kana beats Han for Japanese
    kanji+kana mixtures; Latin text still goes through stopword argmax."""
    from lucene_spark.pipeline.textstats import detect_language

    rows = [
        (1, "这是一个简单的中文测试句子用来检测语言"),
        (2, "これは日本語のテストです漢字も含まれます"),
        (3, "한국어 문장입니다 언어 감지 테스트"),
        (4, "это простой русский текст для проверки языка"),
        (5, "the quick brown fox is in the garden and it is fast"),
        (6, "der hund ist nicht in der küche und das ist gut"),
        (7, "12345 67890 !!!"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["detected_lang"]
           for r in detect_language(df, "text").collect()}
    assert got == {1: "zh", 2: "ja", 3: "ko", 4: "ru", 5: "en", 6: "de", 7: "und"}
