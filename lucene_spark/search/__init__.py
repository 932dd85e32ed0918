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
from lucene_spark.search.searcher import FilterCache  # noqa: F401
from lucene_spark.search.similarity import SIMILARITIES  # noqa: F401
from lucene_spark.search.sqlbm25 import bm25_topk_sql  # noqa: F401
from lucene_spark.search.highlight import highlight, highlight_regex  # noqa: F401
from lucene_spark.search.suggest import suggest, suggest_fuzzy  # noqa: F401
from lucene_spark.search.explain import explain  # noqa: F401
from lucene_spark.search.quality import evaluate as evaluate_quality, summarize as summarize_quality  # noqa: F401
