from lucene_spark.relational import streams  # noqa: F401
from lucene_spark.relational import facets  # noqa: F401
