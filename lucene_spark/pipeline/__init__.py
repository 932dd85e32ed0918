from lucene_spark.pipeline import ann, dedup, similarity, textstats  # noqa: F401
