from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from lucene_spark.session import get_spark

    s = get_spark("lucene_spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    from lucene_spark.corpus import make_corpus

    return make_corpus(400, seed=42)


@pytest.fixture(scope="session")
def index_dir(spark, corpus_pdf, tmp_path_factory):
    """Build the test index once per session (4 partitions, 2 groups)."""
    from lucene_spark.index import IndexBuilder, IndexConfig

    d = str(tmp_path_factory.mktemp("idx") / "index")
    cfg = IndexConfig(partitions=4, num_groups=2, num_buckets=8, analyzer="code")
    src = spark.createDataFrame(corpus_pdf)
    IndexBuilder(spark, cfg).build(src, d, overwrite=True)
    return d


@pytest.fixture(scope="session")
def reader(spark, index_dir):
    from lucene_spark.index import IndexReader

    return IndexReader(spark, index_dir)


@pytest.fixture(scope="session")
def searcher(reader):
    from lucene_spark.search import IndexSearcher

    return IndexSearcher(reader)


@pytest.fixture(scope="session")
def oracle(spark, reader, corpus_pdf):
    """Oracle indexing the same docs under the ENGINE's doc_ids (parity is
    then end-to-end over everything downstream of doc_id assignment, whose
    determinism is tested separately)."""
    from lucene_spark.oracle import OracleIndex

    ds = reader.docstats().select("repo", "path", "commit", "doc_id").toPandas()
    key = ds.set_index(["repo", "path", "commit"])["doc_id"]
    ora = OracleIndex(analyzer="code")
    for row in corpus_pdf.itertuples(index=False):
        ora.add(int(key.loc[(row.repo, row.path, row.commit)]), row.content)
    return ora
