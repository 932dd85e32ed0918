from lucene_spark.streaming.monitor import Monitor, percolate
from lucene_spark.streaming.index_stream import StreamingIndexer
from lucene_spark.streaming.dedup_stream import (streaming_exact_dedup,
                                                 streaming_facet_counts)

__all__ = ["Monitor", "percolate", "StreamingIndexer",
           "streaming_exact_dedup", "streaming_facet_counts"]
