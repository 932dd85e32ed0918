"""Stateful streaming dedup + windowed streaming facets.

Role analogues: Solr's SignatureUpdateProcessorFactory (the exact-hash
dedup update-request processor — solr/core/src/java/org/apache/solr/
update/processor/SignatureUpdateProcessorFactory.java) applied to an
ingest STREAM rather than a batch, and Solr streaming-expression
`rollup` over a DaemonStream feed (solr/solrj/.../io/stream/
RollupStream.java) with event-time windows.

Spark-first shape:

- `streaming_exact_dedup` is `applyInPandasWithState` over groups keyed
  by the content hash: the state store holds ONE marker per hash,
  sharded by the hash across executors (no global driver set, no
  broadcast) and persisted in the query checkpoint — so first-seen
  semantics are exactly-once across micro-batch replays. Within a
  micro-batch the lowest key wins; across batches the earlier batch
  wins. At 100 TB-scale ingest the state is bounded by DISTINCT
  hashes, and the RocksDB state backend (a config flip) spills it off
  heap.

- `streaming_facet_counts` is the watermark + windowed-aggregation
  composition (late data beyond the watermark is dropped, the state
  for closed windows is reclaimed) — the streaming twin of
  `relational.facets.facet_counts`.

Both return lazy streaming DataFrames: the caller picks the sink and
trigger (`.writeStream`), same contract as `Monitor.stream()`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_exact_dedup", "streaming_facet_counts"]


def streaming_exact_dedup(stream_df: DataFrame, key_col: str,
                          text_col: str | None = None,
                          hash_col: str | None = None) -> DataFrame:
    """First-seen document filter over an unbounded stream. Pass either
    `text_col` (hash = sha2-256 of the text, the Signature-processor
    convention) or `hash_col` (a precomputed signature column). Emits
    (key, h) for every document that survives; duplicates of an
    already-seen hash — in the same micro-batch or any earlier one —
    are dropped."""
    if (text_col is None) == (hash_col is None):
        raise ValueError("pass exactly one of text_col / hash_col")
    h = F.sha2(F.col(text_col), 256) if text_col is not None \
        else F.col(hash_col).cast("string")
    keyed = stream_df.select(F.col(key_col).alias("key"), h.alias("h"))
    # preserve the caller's key type (long ids, string UUIDs, …) — a
    # forced numeric cast would null out non-numeric keys and corrupt
    # the min-key election
    key_ddl = keyed.schema["key"].dataType.simpleString()

    def first_seen(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # hash already seen in an earlier micro-batch
        best = None
        for pdf in pdfs:
            for v in pdf["key"]:
                if pd.isna(v):
                    continue
                best = v if best is None or v < best else best
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame({"key": [best], "h": [key[0]]})

    return (keyed.groupBy("h").applyInPandasWithState(
        first_seen,
        outputStructType=f"key {key_ddl}, h string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))


def streaming_facet_counts(stream_df: DataFrame, ts_col: str, dim: str,
                           window: str = "10 minutes",
                           watermark: str = "1 hour") -> DataFrame:
    """Event-time windowed facet counts with a watermark: counts per
    (window, dim value); rows later than `watermark` behind the max
    observed event time are dropped and closed-window state is
    reclaimed (the unbounded-state guard)."""
    return (
        stream_df
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"),
                 F.col(dim).alias("value"))
        .agg(F.count("*").alias("count"))
        .select(F.col("win.start").alias("window_start"), "value", "count")
    )
