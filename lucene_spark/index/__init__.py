from lucene_spark.index.builder import IndexBuilder, IndexConfig  # noqa: F401
from lucene_spark.index.reader import IndexReader  # noqa: F401
from lucene_spark.index.check import check_index  # noqa: F401
from lucene_spark.index.compaction import compact, plan_compaction  # noqa: F401
from lucene_spark.index.split import split_index, split_index_multi  # noqa: F401
from lucene_spark.index.addindexes import add_indexes  # noqa: F401
from lucene_spark.index.snapshot import snapshot_index  # noqa: F401
from lucene_spark.index.info import get_by_keys, index_info  # noqa: F401
from lucene_spark.index.bloom import build_term_bloom, load_term_bloom  # noqa: F401
from lucene_spark.index.docvalues import (  # noqa: F401
    doc_values, fold_doc_values, update_doc_values,
)
from lucene_spark.index.vecgraph import build_vector_graphs  # noqa: F401
