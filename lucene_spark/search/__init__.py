from lucene_spark.search.similarity import BM25Similarity  # noqa: F401
from lucene_spark.search.plan import (  # noqa: F401
    BooleanNode,
    Clause,
    Occur,
    TermNode,
    rewrite,
)
from lucene_spark.search.qparser import parse_query  # noqa: F401
from lucene_spark.search.searcher import IndexSearcher  # noqa: F401
