from lucene_spark.analysis.analyzers import (  # noqa: F401
    Analyzer,
    ENGLISH_STOP_WORDS,
    analyze_stages,
    get_analyzer,
    register_analyzer,
    tokenize_pandas,
)
