"""SQL surface — the Solr `/sql` (Calcite) role, served by Catalyst.

Role analogue: solr/core/src/java/org/apache/solr/handler/sql/
(CalciteSolrDriver.java, SolrRules.java — Calcite plans SQL onto Solr
streams with filter/project/agg/sort pushdown rules). Spark already IS
this: Catalyst plans SQL over DataFrames with all of those pushdowns.
The only work left is registering the engine's tables as views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lucene_spark.index.reader import IndexReader


def register_index_views(reader: IndexReader, prefix: str = "") -> list[str]:
    """Expose termdict / docstats / postings as temp views for spark.sql.
    Returns the view names. Facets, joins, aggregations over the index
    metadata then need zero engine code — e.g.

        SELECT term, df FROM termdict ORDER BY df DESC LIMIT 10
        SELECT avg(doclen) FROM docstats WHERE lang = 'en'
    """
    names = []
    for name, df in [("termdict", reader.termdict()),
                     ("docstats", reader.docstats()),
                     ("postings", reader.postings()),
                     ("fieldstats", reader.fieldstats())]:
        view = prefix + name
        df.createOrReplaceTempView(view)
        names.append(view)
    return names


def register_corpus_view(corpus: DataFrame, name: str = "corpus") -> str:
    corpus.createOrReplaceTempView(name)
    return name


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias so engine users find the SQL door next to the index
    API; Catalyst replaces Calcite wholesale (SURVEY.md §2.8)."""
    return spark.sql(query)
