"""lucene_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch reimplementation of the *capabilities* of Apache Lucene/Solr
(reference snapshot: rmuir/lucene-solr at /root/reference) on top of the
Spark DataFrame API:

- distributed analysis chain (code-aware tokenization, lowercase/stop
  filtering) via vectorized Arrow/pandas UDFs — no per-row Python
  (analogue of lucene/core .../analysis/Analyzer.java);
- per-partition "segment" posting lists (term, docID-delta, tf) with
  VByte/delta compression and skip/block-max metadata
  (analogue of codecs/lucene84/Lucene84PostingsFormat.java);
- sort-merge segment merge producing a global sorted term dictionary and
  a document-stats sidecar (doclen, avgdl, df)
  (analogue of codecs/blocktree/BlockTreeTermsWriter.java + norms);
- boolean AND/OR and BM25 (k1=1.2, b=0.75, lossy-norm-free exact variant)
  top-k with block-max pruning, rank-identical to the Lucene contract
  (search/similarities/BM25Similarity.java:104-258,
   search/TopScoreDocCollector.java:90-93);
- Solr streaming-expression / facet analogues as thin DataFrame combinators
  (solr/solrj/.../io/stream/*.java — all Spark built-ins);
- training-data pipeline operators (dedup, similarity search, text stats)
  that a 100 TB corpus pipeline needs.

Everything is architected Spark-first: the index structures are plain
DataFrames written as Parquet; Catalyst does predicate pushdown, column
pruning and partition pruning; the only custom compute (postings encode,
block-max scoring) runs as vectorized numpy inside Arrow-batched UDFs.
"""

__version__ = "0.1.0"

from lucene_spark.session import get_spark  # noqa: F401
