"""Index-time sort (index/IndexSorter.java / IndexWriterConfig.
setIndexSort): with IndexConfig(sort_by=...), local doc_ids follow the
sort column within every partition, the docstats parquet is written in
that order (row-group min/max pruning on the column = sorted-segment
early termination), and every query result is identical to the
unsorted build's."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader

    base = str(tmp_path_factory.mktemp("ixsort"))
    pdf = make_corpus(150, seed=31)
    pdf["n_chars"] = pdf["content"].str.len().astype("int64")
    src = spark.createDataFrame(pdf)
    plain_dir, sorted_dir = base + "/plain", base + "/sorted"
    cfg = IndexConfig(partitions=3, num_buckets=4, carry_cols=("n_chars",))
    IndexBuilder(spark, cfg).build(src, plain_dir, overwrite=True)
    scfg = IndexConfig(partitions=3, num_buckets=4, carry_cols=("n_chars",),
                       sort_by=("n_chars",))
    IndexBuilder(spark, scfg).build(src, sorted_dir, overwrite=True)
    return (IndexReader(spark, plain_dir), IndexReader(spark, sorted_dir))


def test_docids_follow_sort_within_partition(corpora):
    _, rs = corpora
    assert rs.index_sort == ("n_chars",)
    rows = rs.docstats().select("doc_id", "n_chars").collect()
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r["doc_id"] >> 40, []).append(
            (r["doc_id"], r["n_chars"]))
    assert len(by_part) > 1
    for part, items in by_part.items():
        items.sort()                      # ascending local doc_id
        vals = [v for _, v in items]
        assert vals == sorted(vals), f"partition {part} not doc-id-sorted"


def test_sorted_and_plain_results_identical(corpora):
    from lucene_spark.search import IndexSearcher, plan as P

    rp, rs = corpora
    sp, ss = IndexSearcher(rp), IndexSearcher(rs)
    # stats invariant under the sort
    assert rp.doc_count == rs.doc_count
    assert rp.sum_doclen == rs.sum_doclen
    for q in ("merge", "index AND writer", "scan OR filter"):
        a = sorted(round(float(r["score"]), 4)
                   for r in sp.matches(q).collect())
        b = sorted(round(float(r["score"]), 4)
                   for r in ss.matches(q).collect())
        assert a == b, q
    # range query over the sorted column: same external result set
    node = P.BooleanNode(clauses=(
        P.Clause(P.Occur.MUST, P.TermNode(term="merge")),
        P.Clause(P.Occur.FILTER, P.DocValuesRangeNode(
            column="n_chars", lower=500, upper=3000)),
    ))
    ka = {r["repo"] + r["path"] for r in
          sp.hydrate(sp.matches(node, with_scores=False)).collect()}
    kb = {r["repo"] + r["path"] for r in
          ss.hydrate(ss.matches(node, with_scores=False)).collect()}
    assert ka == kb


def test_sorted_docstats_rowgroups_prunable(corpora):
    """The physical evidence: parquet footer min/max of the sort column
    per row group must be (near-)disjoint in the sorted build — the
    precondition for row-group pruning / early termination. The plain
    build's groups all overlap (hash order ≈ random)."""
    import pyarrow.parquet as pq
    import os, glob

    def spans(reader):
        out = []
        d = os.path.join(reader.index_dir, "docstats.g0")
        if not os.path.isdir(d):
            d = os.path.join(reader.index_dir, "docstats")
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == "n_chars" and col.statistics:
                        out.append((col.statistics.min, col.statistics.max))
        return out

    _, rs = corpora
    sspans = spans(rs)
    assert sspans, "no n_chars column statistics found"
    # within a file, consecutive row groups of the sorted build do not
    # interleave badly: each file covers a contiguous-ish range — assert
    # global span >> average group span is NOT required (files are
    # per-partition); instead assert each group is internally tight
    # relative to the global range when there are multiple groups
    gmin = min(s for s, _ in sspans)
    gmax = max(e for _, e in sspans)
    if len(sspans) > 1 and gmax > gmin:
        avg_width = np.mean([e - s for s, e in sspans])
        assert avg_width < (gmax - gmin), "sorted groups as wide as the range"


def test_dv_range_on_sort_column_pushes_down(corpora):
    """IndexSortSortedNumericDocValuesRangeQuery role (sandbox/search/
    IndexSortSortedNumericDocValuesRangeQuery.java:60-86: a DV range on
    the index-sort field skips via the sort instead of scanning): in
    Spark shape the range predicate must reach the docstats parquet scan
    as PushedFilters, where the sorted build's (near-)disjoint row-group
    min/max (previous test) turns it into row-group skipping."""
    from lucene_spark.search import IndexSearcher
    import lucene_spark.search.plan as P

    _, rs = corpora
    s = IndexSearcher(rs)
    node = P.BooleanNode(clauses=(
        P.Clause(P.Occur.MUST, P.TermNode(term="index")),
        P.Clause(P.Occur.FILTER, P.DocValuesRangeNode(
            column="n_chars", lower=0, upper=300)),
    ))
    df = s.matches(node, with_scores=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "n_chars" in plan
    import re
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(re.search(r"(GreaterThanOrEqual|LessThanOrEqual)\(n_chars", l)
               for l in pushed), pushed
    # and the result equals the plain build's — compared on the EXTERNAL
    # key (doc_ids differ between builds: the sorted build renumbers)
    def ext(reader, hits):
        ids = {r["doc_id"]: (r["repo"], r["path"]) for r in
               reader.docstats().select("doc_id", "repo", "path").collect()}
        return sorted(ids[r["doc_id"]] for r in hits.collect())

    sp = IndexSearcher(corpora[0])
    assert ext(rs, df) == ext(corpora[0],
                              sp.matches(node, with_scores=False))
