"""Tombstone deletes (LiveDocs analogue): deleted docs vanish from every
query path while collection/term statistics keep Lucene's
until-merge semantics (scores of surviving docs unchanged)."""

from __future__ import annotations

import numpy as np


def test_deletes_mask_all_paths(searcher, reader):
    base_hits = searcher.search("index OR writer", k=10).collect()
    assert base_hits
    victims = [base_hits[0]["doc_id"], base_hits[2]["doc_id"]]
    s2 = searcher.with_deletes(victims)

    # top-k: victims gone, everyone else keeps the EXACT same score
    # (stats still include deleted docs until merge — Lucene semantics)
    new_hits = s2.search("index OR writer", k=10).collect()
    ids = {r["doc_id"] for r in new_hits}
    assert not (set(victims) & ids)
    old = {r["doc_id"]: r["score"] for r in base_hits}
    for r in new_hits:
        if r["doc_id"] in old:
            assert np.float32(r["score"]) == np.float32(old[r["doc_id"]])

    # count drops by exactly the number of deleted matching docs
    full = {r["doc_id"] for r in searcher.matches("index OR writer").collect()}
    assert s2.count("index OR writer") == len(full) - len(set(victims) & full)

    # boolean NOT / filter paths also masked
    m2 = {r["doc_id"] for r in s2.matches("index", with_scores=False).collect()}
    assert not (set(victims) & m2)


def test_delete_by_keys(searcher, reader, corpus_pdf):
    row = corpus_pdf.iloc[3]
    keys = searcher.reader.spark.createDataFrame(
        [(row["repo"], row["path"], row["commit"])], "repo string, path string, commit string")
    s2 = searcher.delete_by_keys(keys)
    assert s2._deleted.size == 1
    # that doc no longer matches its own unique identifier term
    uid = next(t for t in row["content"].split() if t.startswith("uid"))
    from lucene_spark.analysis import get_analyzer
    import pandas as pd

    toks = get_analyzer("code").tokenize_series(pd.Series([uid])).iloc[0]
    hits = s2.matches(" ".join(toks)).collect()
    assert all(r["doc_id"] != int(s2._deleted[0]) for r in hits)


def test_deletes_with_blockmax(searcher):
    """Deleting the top doc of a hot term: block-max pruned top-k stays
    correct (block metadata realigned after masking)."""
    top = searcher.search("license", k=3).collect()
    s2 = searcher.with_deletes([top[0]["doc_id"]])
    pruned = s2.search("license", k=10).collect()
    exhaustive = sorted(
        ((r["doc_id"], r["score"]) for r in s2.matches("license").collect()),
        key=lambda x: (-x[1], x[0]))[:10]
    assert [(r["doc_id"], r["score"]) for r in pruned] == exhaustive
    assert top[0]["doc_id"] not in {r["doc_id"] for r in pruned}
