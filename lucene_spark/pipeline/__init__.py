from lucene_spark.pipeline import dedup, similarity, textstats  # noqa: F401
