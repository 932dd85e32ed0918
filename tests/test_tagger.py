"""Solr Tagger (handler/tagger/TaggerRequestHandler.java role) —
search/tagger.py: trie matching, the three TagClusterReducer overlap
policies, char offsets, and the distributed pass."""

from __future__ import annotations

import re

import pytest

from lucene_spark.search.tagger import build_trie, tag_text, tag_documents

_RX = re.compile(r"\w+")


def _tags(text, pairs, overlaps="LONGEST_DOMINANT_RIGHT"):
    trie = build_trie(pairs)
    return tag_text(text, trie, _RX, True, overlaps)


def test_basic_longest_match_offsets():
    pairs = [("e1", "new york"), ("e2", "new york city"), ("e3", "city")]
    text = "I love New York City a lot"
    got = _tags(text, pairs)
    # LDR: 'new york city' (longest) dominates; overlapping
    # 'new york' and 'city' are removed
    assert got == [(7, 20, "New York City", "e2")]


def test_all_policy_keeps_overlaps():
    pairs = [("e1", "new york"), ("e2", "new york city"), ("e3", "city")]
    got = _tags("in new york city", pairs, overlaps="ALL")
    assert {(s, e, ent) for s, e, _, ent in got} == {
        (3, 11, "e1"), (3, 16, "e2"), (12, 16, "e3")}


def test_no_sub_policy():
    # NO_SUB removes contained tags but keeps partial overlaps
    pairs = [("a", "one two"), ("b", "two three"), ("c", "two")]
    got = _tags("one two three", pairs, overlaps="NO_SUB")
    # 'two' (contained in both) is removed; the two partial overlaps stay
    assert {(s, e, ent) for s, e, _, ent in got} == {
        (0, 7, "a"), (4, 13, "b")}


def test_ldr_rightmost_wins_on_tie():
    # TagClusterReducer.java:69-72: forward scan with >= → the RIGHTMOST
    # of equal-length overlapping tags is marked first
    pairs = [("l", "alpha beta"), ("r", "beta gamma")]
    got = _tags("alpha beta gamma", pairs)
    assert [(ent, s, e) for s, e, _, ent in got] == [("r", 6, 16)]


def test_repeated_and_shared_names():
    pairs = [("x", "scan"), ("y", "scan")]      # two entities, one name
    got = _tags("scan then scan", pairs)
    assert len(got) == 4                        # 2 occurrences × 2 entities
    assert {g[3] for g in got} == {"x", "y"}


def test_case_and_no_match():
    assert _tags("nothing here", [("e", "absent phrase")]) == []
    got = _tags("MERGE Policy", [("e", "merge policy")])
    assert got == [(0, 12, "MERGE Policy", "e")]


def test_tag_documents_distributed(spark):
    docs = spark.createDataFrame(
        [(1, "table hash and merge"), (2, "hash table hash"),
         (3, "nothing"), (4, None)],
        "doc_id long, text string")
    dictionary = spark.createDataFrame(
        [("e_th", "table hash"), ("e_t", "table"), ("e_h", "hash"),
         ("e_m", "merge")], "entity string, name string")
    out = tag_documents(docs, "text", "doc_id", dictionary).collect()
    rows = {(r["key"], r["entity"], r["start"], r["end"]) for r in out}
    # doc 1: 'table hash' dominates table+hash; merge separate
    assert (1, "e_th", 0, 10) in rows and (1, "e_m", 15, 20) in rows
    assert not any(k == 1 and e in ("e_t", "e_h") for k, e, _, _ in rows)
    # doc 2: 'hash' at 0 kept, 'table hash' at 5 dominates the rest
    assert (2, "e_h", 0, 4) in rows and (2, "e_th", 5, 15) in rows
    assert not any(k == 2 and e == "e_t" for k, e, _, _ in rows)
    assert not any(k in (3, 4) for k, _, _, _ in rows)


def test_dict_size_guard(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    d = spark.range(10).select(
        F_col("id").cast("string").alias("entity"),
        F_col("id").cast("string").alias("name"))
    with pytest.raises(ValueError):
        tag_documents(docs, "text", "doc_id", d, max_dict_entries=5)


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_offsets_survive_length_changing_lowercase():
    # review finding: 'İ'.lower() has length 2 — offsets must index the
    # ORIGINAL text, so tags after such a character stay aligned
    pairs = [("e", "table hash")]
    text = "İstanbul table hash"
    got = _tags(text, pairs)
    assert got == [(9, 19, "table hash", "e")]
    assert text[9:19] == "table hash"
