"""FieldExistsQuery (search/DocValuesFieldExistsQuery.java:35,
NormsFieldExistsQuery.java:33): norms-side existence for indexed
fields, non-null doc-values existence for sidecar columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import lucene_spark.search.plan as P


def test_exists_indexed_field_is_norms_check(searcher, reader):
    got = {r["doc_id"] for r in
           searcher.matches(P.FieldExistsNode(field=reader.default_field),
                            with_scores=False).collect()}
    exp = {r["doc_id"] for r in
           reader.docstats().filter(F.col("doclen") > 0)
           .select("doc_id").collect()}
    assert got == exp and got


def test_exists_docvalues_column(searcher, reader):
    got = searcher.matches(P.FieldExistsNode(field="repo"),
                           with_scores=False).count()
    exp = reader.docstats().filter(F.col("repo").isNotNull()).count()
    assert got == exp > 0


def test_exists_as_filter_clause(searcher, reader):
    node = P.BooleanNode(clauses=(
        P.Clause(P.Occur.MUST, P.TermNode(term="index")),
        P.Clause(P.Occur.FILTER, P.FieldExistsNode(field="repo")),
    ))
    got = {r["doc_id"]: r["score"] for r in searcher.matches(node).collect()}
    base = {r["doc_id"]: r["score"] for r in searcher.matches("index").collect()}
    # repo is never null in the corpus → scores identical to the bare term
    assert got == pytest.approx(base)


def test_exists_unknown_field_raises(searcher):
    with pytest.raises(ValueError):
        searcher.matches(P.FieldExistsNode(field="no_such_field"))


def test_exists_multifield_norms(spark, tmp_path_factory):
    """Per-field existence on a multi-field index: a doc whose field
    produced zero tokens does not exist for that field (NormsFieldExists
    semantics — no norm is written for an empty field)."""
    import pandas as pd

    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.index.builder import FieldSpec
    from lucene_spark.search import IndexSearcher

    docs = pd.DataFrame({
        "id": range(4),
        "title": ["apache lucene", "", "engine", ""],
        "body": ["text here", "body only", "", "also body"],
    })
    d = str(tmp_path_factory.mktemp("fex") / "idx")
    cfg = IndexConfig(
        key_cols=("id",), content_col="title", partitions=2, num_buckets=4,
        fields=(FieldSpec(name="title", analyzer="whitespace"),
                FieldSpec(name="body", analyzer="whitespace")))
    IndexBuilder(spark, cfg).build(spark.createDataFrame(docs), d,
                                   overwrite=True)
    r = IndexReader(spark, d)
    s = IndexSearcher(r)
    ids = {row["doc_id"]: row["id"] for row in
           r.docstats().select("doc_id", "id").collect()}

    def ext(node):
        return sorted(ids[x["doc_id"]] for x in
                      s.matches(node, with_scores=False).collect())

    assert ext(P.FieldExistsNode(field="title")) == [0, 2]
    assert ext(P.FieldExistsNode(field="body")) == [0, 1, 3]
