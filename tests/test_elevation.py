"""Query elevation (solr QueryElevationComponent): pinned docs first in
curated order (with their true query scores when they match, null when
they don't), exclusions dropped, remaining hits in base BM25 order."""

from __future__ import annotations

import math


def _key(row):
    return (row["repo"], row["path"], row["commit"])


def test_elevation_pins_excludes_and_preserves_tail(searcher, reader):
    from lucene_spark.search.elevation import elevate

    base = searcher.hydrate(searcher.search("merge", k=10)).select(
        "doc_id", "score", "repo", "path", "commit").collect()
    # hydrate()'s join does not preserve the top-k order — restore it
    base.sort(key=lambda r: (-r["score"], r["doc_id"]))
    assert len(base) == 10
    base_keys = [_key(r) for r in base]
    base_scores = {_key(r): r["score"] for r in base}

    # a matching doc pinned up from rank 5, plus a doc that does NOT match
    nonmatch = (reader.docstats()
                .join(searcher.matches("merge", with_scores=False)
                      .select("doc_id"), "doc_id", "left_anti")
                .select("repo", "path", "commit").limit(1).collect()[0])
    pin2 = (nonmatch["repo"], nonmatch["path"], nonmatch["commit"])
    got = elevate(searcher, "merge", k=10,
                  elevate_keys=(base_keys[4], pin2),
                  exclude_keys=(base_keys[0],)).collect()
    assert len(got) == 10
    assert [r["rank"] for r in got] == list(range(1, 11))

    # rank 1: the pinned matching doc, with its REAL query score
    assert _key(got[0]) == base_keys[4] and got[0]["elevated"]
    assert math.isclose(got[0]["score"], base_scores[base_keys[4]],
                        rel_tol=1e-6)
    # rank 2: the pinned non-matching doc, score null
    assert _key(got[1]) == pin2 and got[1]["elevated"]
    assert got[1]["score"] is None
    # excluded doc gone entirely
    assert base_keys[0] not in {_key(r) for r in got}
    # tail = base order minus pinned/excluded, scores preserved
    expect_tail = [kk for kk in base_keys
                   if kk not in (base_keys[0], base_keys[4], pin2)]
    assert [_key(r) for r in got[2:]] == expect_tail[:8]
    for r in got[2:]:
        assert not r["elevated"]
        assert math.isclose(r["score"], base_scores[_key(r)], rel_tol=1e-6)


def test_elevation_noop_matches_search(searcher):
    from lucene_spark.search.elevation import elevate

    got = elevate(searcher, "merge", k=5).collect()
    base = searcher.hydrate(searcher.search("merge", k=5)).select(
        "doc_id", "repo", "path", "commit", "score").collect()
    base.sort(key=lambda r: (-r["score"], r["doc_id"]))
    assert [_key(r) for r in got] == [_key(r) for r in base]
    assert all(not r["elevated"] for r in got)
