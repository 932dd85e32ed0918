"""Graph streams (gatherNodes/shortestPath), collapse/expand, diversified
top-k — vs hand-computed BFS/greedy references on crafted graphs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lucene_spark.relational.graph import Traversal, gather_nodes, shortest_path
from lucene_spark.relational.collapse import collapse, expand
from lucene_spark.search.diversify import diversified_topk


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string")


# --------------------------------------------------------------------------
# shortestPath — ShortestPathStream.java semantics


def test_shortest_path_single(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "x"), ("x", "d")])
    out = shortest_path(e, "a", "d", max_depth=4).collect()
    # two 2-hop paths: a-b-c-d is 3 hops, a-x-d is 2 hops -> only a-x-d
    assert [r.path_str for r in out] == ["a->x->d"]
    assert out[0].length == 2


def test_shortest_path_all_shortest_enumerated(spark):
    # diamond: two distinct 3-edge paths, one longer 4-edge path
    e = _edges(spark, [("s", "a"), ("s", "b"), ("a", "m"), ("b", "m"),
                       ("m", "t"), ("s", "c"), ("c", "d"), ("d", "m")])
    out = sorted(r.path_str for r in shortest_path(e, "s", "t", max_depth=6).collect())
    assert out == ["s->a->m->t", "s->b->m->t"]


def test_shortest_path_cycle_pruned_and_unreachable(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c")])
    out = shortest_path(e, "a", "c", max_depth=5).collect()
    assert [r.path_str for r in out] == ["a->b->c"]
    assert shortest_path(e, "c", "a", max_depth=5).count() == 0


def test_shortest_path_max_depth_bound(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert shortest_path(e, "a", "d", max_depth=2).count() == 0
    assert shortest_path(e, "a", "d", max_depth=3).count() == 1


def test_shortest_path_direct_edge(spark):
    e = _edges(spark, [("a", "b"), ("a", "c")])
    out = shortest_path(e, "a", "b", max_depth=3).collect()
    assert [r.path_str for r in out] == ["a->b"]


# --------------------------------------------------------------------------
# gatherNodes — GatherNodesStream/Traversal/Node semantics


def test_gather_single_hop_metrics(spark):
    roots = spark.createDataFrame([("r1",), ("r2",)], "node string")
    e = spark.createDataFrame(
        [("r1", "n1", 10.0), ("r1", "n2", 5.0), ("r2", "n1", 3.0),
         ("zz", "n3", 99.0)],  # zz not in frontier -> ignored
        "src string, dst string, w double")
    out = {r.node: r for r in gather_nodes(
        roots, e, "src", "dst", metrics=[("sum", "w")],
        track_traversal=True).collect()}
    assert set(out) == {"n1", "n2"}
    assert out["n1"]["count"] == 2 and out["n1"]["sum_w"] == 13.0
    assert out["n1"]["ancestors"] == ["r1", "r2"] and out["n1"]["num_ancestors"] == 2
    assert out["n2"]["count"] == 1 and out["n2"]["ancestors"] == ["r1"]
    assert all(r.level == 1 for r in out.values())


def test_gather_visited_not_reemitted_but_accrues(spark):
    # hop1: r -> a ; hop2: a -> r (back-edge) and a -> b.
    # r is visited (level 0): NOT in leaves, but the back-edge accrues to
    # r's ancestors when branches are scattered (Traversal.visited -> Node.add).
    roots = spark.createDataFrame([("r",)], "node string")
    e1 = _edges(spark, [("r", "a")])
    e2 = _edges(spark, [("a", "r"), ("a", "b")])
    t = (Traversal(roots, track_traversal=True)
         .gather(e1, "src", "dst").gather(e2, "src", "dst"))
    leaves = {r.node for r in t.nodes(scatter=("leaves",)).collect()}
    assert leaves == {"b"}
    rows = {r.node: r for r in t.nodes(scatter=("branches", "leaves")).collect()}
    assert rows["r"].level == 0 and rows["r"].ancestors == ["a"]
    assert rows["a"].level == 1 and rows["b"].level == 2


def test_gather_chained_two_hop_business_walk(spark):
    custs = spark.createDataFrame([("c:1",)], "node string")
    orders = _edges(spark, [("c:1", "o:10"), ("c:1", "o:11"), ("c:2", "o:12")])
    items = _edges(spark, [("o:10", "s:7"), ("o:11", "s:7"), ("o:12", "s:8")])
    t = (Traversal(custs, track_traversal=True)
         .gather(orders, "src", "dst").gather(items, "src", "dst"))
    out = t.nodes().collect()
    assert len(out) == 1 and out[0].node == "s:7"
    assert out[0]["count"] == 2  # two edges gathered into s:7
    assert sorted(out[0].ancestors) == ["o:10", "o:11"]


def test_score_nodes_tfidf(spark):
    import math

    from lucene_spark.relational.graph import score_nodes

    nodes = spark.createDataFrame([("x", 3), ("y", 1)], "node string, count long")
    coll = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("z",)], "f string")
    out = {r.node: r for r in score_nodes(nodes, coll, "f").collect()}
    import numpy as np
    for node, tf, df in (("x", 3, 2), ("y", 1, 1)):
        want = np.float32(np.float32(math.log(tf) + 1.0)
                          * np.float32(math.log((4 + 1) / (df + 1.0)) + 1.0))
        assert out[node].docFreq == df and out[node].numDocs == 4
        assert abs(out[node].nodeScore - float(want)) < 1e-7


# --------------------------------------------------------------------------
# collapse / expand


@pytest.fixture()
def cdf(spark):
    rows = [
        (1, "a", 10), (2, "a", 30), (3, "a", 30), (4, "b", 5),
        (5, "b", 7), (6, None, 99), (7, None, 1),
    ]
    return spark.createDataFrame(rows, "id int, grp string, v int")


def test_collapse_max_selector(cdf):
    out = {r.grp: r.id for r in
           collapse(cdf, "grp", sort=[("v", "desc"), ("id", "asc")]).collect()}
    assert out == {"a": 2, "b": 5}  # v=30 tie -> lowest id wins


def test_collapse_null_policies(cdf):
    assert collapse(cdf, "grp", [("v", "desc"), ("id", "asc")],
                    null_policy="ignore").count() == 2
    exp = collapse(cdf, "grp", [("v", "desc"), ("id", "asc")],
                   null_policy="expand")
    assert {r.id for r in exp.collect()} == {2, 5, 6, 7}
    col = collapse(cdf, "grp", [("v", "desc"), ("id", "asc")],
                   null_policy="collapse")
    assert {r.id for r in col.collect()} == {2, 5, 6}
    with pytest.raises(ValueError):
        collapse(cdf, "grp", [("v", "desc")], null_policy="bogus")


def test_expand_returns_next_rows_excluding_head(cdf):
    heads = collapse(cdf, "grp", sort=[("v", "desc"), ("id", "asc")])
    out = expand(cdf, "grp", heads, sort=[("v", "desc"), ("id", "asc")], rows=1)
    got = {(r.grp, r.id, r.expand_rank) for r in out.collect()}
    assert got == {("a", 3, 1), ("b", 4, 1)}


# --------------------------------------------------------------------------
# diversified top-k — DiversifiedTopDocsCollector greedy equivalence


def test_diversified_topk_caps_keys(spark):
    scored = spark.createDataFrame(
        [(1, 10.0), (2, 9.0), (3, 8.0), (4, 7.0), (5, 6.0), (6, 5.0)],
        "doc_id int, score double")
    keys = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "C")],
        "doc_id int, key string")
    out = diversified_topk(scored, keys, k=4, max_per_key=2).collect()
    # doc 3 (third 'A') must be skipped; greedy picks 1,2,4,5
    assert [r.doc_id for r in out] == [1, 2, 4, 5]
    assert [r.rank for r in out] == [1, 2, 3, 4]


def test_diversified_null_keys_share_one_bucket(spark):
    scored = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id int, score double")
    keys = spark.createDataFrame([(1, "A")], "doc_id int, key string")
    # docs 2,3 keyless -> one shared null bucket; cap 1 keeps only doc 2
    out = diversified_topk(scored, keys, k=3, max_per_key=1).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[1].key is None  # key NOT rewritten to 0


def test_traversal_nodes_before_any_gather(spark):
    from lucene_spark.relational.graph import Traversal

    roots = spark.createDataFrame([("r",)], "node string")
    t = Traversal(roots, track_traversal=True)
    rows = t.nodes(scatter=("branches", "leaves")).collect()
    t.close()
    assert len(rows) == 1 and rows[0].node == "r"
    assert rows[0]["count"] == 0 and rows[0].ancestors == []


def test_collapse_expand_null_sort_value_head_excluded(spark):
    # all-NULL sort column in a group: the head must not reappear in expand
    df = spark.createDataFrame(
        [(1, "g", None), (2, "g", None)], "id int, grp string, v int")
    heads = collapse(df, "grp", sort=[("v", "desc"), ("id", "asc")])
    assert [r.id for r in heads.collect()] == [1]
    out = expand(df, "grp", heads, sort=[("v", "desc"), ("id", "asc")], rows=5)
    assert [r.id for r in out.collect()] == [2]


def test_jsonfacets_missing_bucket_subfacet(spark):
    from lucene_spark.relational.jsonfacets import json_facets

    df = spark.createDataFrame(
        [(None, "s1", 5), (None, "s2", 7), ("en", "s1", 3)],
        "lang string, source string, v int")
    spec = {"type": "terms", "field": "lang", "missing": True,
            "facet": {"by_source": {"type": "terms", "field": "source"}}}
    child = json_facets(df, spec)["by_source"]
    null_rows = child.filter(F.col("lang").isNull()).collect()
    assert {r.source for r in null_rows} == {"s1", "s2"}
