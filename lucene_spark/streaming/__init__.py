from lucene_spark.streaming.monitor import Monitor, percolate
from lucene_spark.streaming.index_stream import StreamingIndexer

__all__ = ["Monitor", "percolate", "StreamingIndexer"]
