"""Exact substring dedup (dedup.duplicate_spans / strip_duplicate_spans)
vs a brute-force reference implementation of the Lee-et-al semantics."""

from __future__ import annotations

import pytest

from lucene_spark.pipeline.dedup import duplicate_spans, strip_duplicate_spans


def _brute_spans(docs: list[tuple[int, str]], L: int):
    """Truth: positions covered by an L-gram occurring >= 2 times in the
    corpus (any occurrence, same-doc repeats included), merged to runs."""
    from collections import Counter

    toked = [(k, t.split()) for k, t in docs]
    counts = Counter()
    for _, ts in toked:
        for i in range(len(ts) - L + 1):
            counts[tuple(ts[i:i + L])] += 1
    out = []
    for k, ts in toked:
        covered = set()
        for i in range(len(ts) - L + 1):
            if counts[tuple(ts[i:i + L])] >= 2:
                covered.update(range(i, i + L))
        runs, run = [], None
        for p in sorted(covered):
            if run and p == run[1]:
                run[1] = p + 1
            else:
                if run:
                    runs.append(tuple(run))
                run = [p, p + 1]
        if run:
            runs.append(tuple(run))
        out.extend((k, s, e) for s, e in runs)
    return sorted(out)


def _collect(df):
    return sorted((r[0], r["span_start"], r["span_end"])
                  for r in df.collect())


BOILER = "this footer is repeated verbatim across many documents here"


def test_matches_brute_force_with_boilerplate(spark):
    docs = []
    for i in range(12):
        body = " ".join(f"u{i}w{j}" for j in range(15))  # unique tokens
        if i % 3 == 0:
            body = body + " " + BOILER            # shared 10-token tail
        if i == 1:
            body = BOILER + " " + body            # shared head
        docs.append((i, body))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for L in (4, 8, 10):
        got = _collect(duplicate_spans(df, "text", "doc_id", min_len=L))
        assert got == _brute_spans(docs, L), L


def test_same_doc_repeat_counts_as_duplicate(spark):
    phrase = "alpha beta gamma delta"
    docs = [(0, f"{phrase} filler one two {phrase}"),
            (1, "totally different words entirely here now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(duplicate_spans(df, "text", "doc_id", min_len=4))
    assert got == _brute_spans(docs, 4)
    assert got and all(k == 0 for k, _, _ in got)


def test_adjacent_and_overlapping_windows_merge(spark):
    # one long duplicated run: every window duplicated -> ONE merged span
    run = " ".join(f"r{j}" for j in range(20))
    docs = [(0, "x1 " + run + " y1"), (1, "x2 " + run + " y2")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(duplicate_spans(df, "text", "doc_id", min_len=5))
    assert got == [(0, 1, 21), (1, 1, 21)]


def test_strip_removes_exactly_the_spans(spark):
    docs = [(0, "keep0 keep1 " + BOILER + " keep2"),
            (1, BOILER),
            (2, "other words that are not shared with anything else")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text_clean"]
           for r in strip_duplicate_spans(df, "text", "doc_id",
                                          min_len=9).collect()}
    assert out[0] == "keep0 keep1 keep2"
    assert out[1] == ""          # entirely duplicated -> empty, not missing
    assert out[2] == docs[2][1]


def test_docs_shorter_than_window_survive(spark):
    # docs with < L tokens have no L-grams (negative slice length used
    # to crash the job); empty docs and the default min_len=50 included
    long_dup = " ".join(f"d{j}" for j in range(60))
    docs = [(0, "a b c"), (1, ""), (2, "   "),
            (3, "x " + long_dup), (4, long_dup + " y")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _collect(duplicate_spans(df, "text", "doc_id"))  # min_len=50
    assert got == _brute_spans([(k, t) for k, t in docs], 50)
    assert got == [(3, 1, 61), (4, 0, 60)]
    out = {r["doc_id"]: r["text_clean"]
           for r in strip_duplicate_spans(df, "text", "doc_id").collect()}
    assert out[0] == "a b c" and out[1] == "" and out[3] == "x"


def test_no_duplicates_no_spans(spark):
    docs = [(i, " ".join(f"d{i}t{j}" for j in range(30))) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert duplicate_spans(df, "text", "doc_id", min_len=5).count() == 0
    with pytest.raises(ValueError):
        duplicate_spans(df, "text", "doc_id", min_len=1)
