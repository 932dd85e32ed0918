"""Incremental / streaming index maintenance.

Role analogue: Solr TopicStream/DaemonStream (solr/solrj/.../io/stream/
TopicStream.java — checkpointed `_version_` cursor, incremental pulls) and
Lucene's near-real-time segment appends (new DWPT flushes become segments
without rewriting old ones, index/IndexWriter.java commit loop).

Spark-first restatement: the corpus directory is a Structured Streaming
file source; each micro-batch becomes a NEW independent segment group
(group id = stream batch id + offset), built with the exact same
`_build_group` code path as the batch builder — then the cheap merge
artifacts (term dictionary, collection stats, manifest) are recomputed
over all groups. Postings of earlier groups are NEVER rewritten: doc_ids
embed (group, partition, local), so new groups append disjoint id ranges
exactly like Lucene segment bases. Exactly-once comes from the stream
checkpoint (source offsets) + idempotent per-group manifests — a replayed
batch overwrites its own group deterministically.

At 100 TB the growing small-group population is the TieredMergePolicy
trigger: a separate compaction job (same merge math over partition byte
sizes, SURVEY.md §2.3) folds small groups together; serving never blocks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.analysis.analyzers import analyzer_fingerprint
from lucene_spark.index.layout import (DERIVED_NAMES, gc_derived,
                                        next_derived_name)
from lucene_spark.index.builder import IndexBuilder, IndexConfig, _raw_schema

GROUP_BASE = 1 << 20   # stream groups start here; batch groups sit below


class StreamingIndexer:
    def __init__(self, spark: SparkSession, index_dir: str, cfg: IndexConfig | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.cfg = cfg or IndexConfig()
        self.builder = IndexBuilder(spark, self.cfg)
        # versioned derived dirs (see index/layout.py): fresh indexes
        # start at generation 0; _refresh_derived resolves existing ones
        self._derived: dict[str, str] = {n: f"{n}.g0" for n in DERIVED_NAMES}
        self._refresh_derived()

    def _refresh_derived(self) -> None:
        """Re-read the manifest's derived map: a compaction run BETWEEN
        micro-batches advances the generations, and appending to a stale
        generation would write rows into a directory the next gc
        retires. (Compaction concurrent WITH a running batch remains
        unsupported — single writer at a time, as documented there.)

        A manifest WITHOUT a derived map is a legacy plain-dir index:
        resolve to the PLAIN names — defaulting to .g0 here would append
        the batch into a fresh empty generation and publish a map that
        silently hides every pre-existing document. A manifest that
        exists but cannot be read RAISES (failing the batch so streaming
        retries) — proceeding with a stale map is exactly the
        lost-rows-after-gc failure this refresh prevents."""
        mpath = os.path.join(self.index_dir, "manifest.json")
        if not os.path.exists(mpath):
            return                          # fresh index: keep g0 defaults
        with open(mpath) as fh:             # raises on unreadable manifest
            manifest = json.load(fh)
        derived = manifest.get("derived")
        if derived:
            self._derived = dict(derived)
        else:
            self._derived = {n: n for n in DERIVED_NAMES}

    def _dpath(self, name: str) -> str:
        return os.path.join(self.index_dir, self._derived[name])

    def _bump(self, name: str) -> str:
        """Advance an artifact to its next generation (returned path);
        published by the next manifest swap."""
        self._derived[name] = next_derived_name({"derived": self._derived},
                                                name)
        return self._dpath(name)

    # ---- one micro-batch = one segment group ----------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        if not batch_df.take(1):
            return
        self._refresh_derived()
        os.makedirs(os.path.join(self.index_dir, "parts"), exist_ok=True)
        key_and_carry = [c for c in batch_df.columns
                         if c in cfg.key_cols + cfg.carry_cols]
        field_srcs = [s.source_col for s in cfg.field_specs()]
        cols = list(dict.fromkeys(key_and_carry + field_srcs))
        src = batch_df.select(
            *cols,
            F.sha2(F.col(cfg.content_col), 256).alias("__sha256"),
        )
        schema = _raw_schema(src.schema, cfg)
        group = GROUP_BASE + int(batch_id)
        fp = f"stream-batch-{batch_id}"
        # a replayed batch may legally overwrite ITS OWN group (same
        # fingerprint, idempotent); a group manifest with a different
        # fingerprint means something else owns the id — never clobber it
        mpath = self.builder._manifest_path(self.index_dir, group)
        replayed = os.path.exists(mpath)
        if replayed:
            with open(mpath) as fh:
                existing = json.load(fh)
            if existing.get("source_fingerprint") not in (None, fp):
                raise RuntimeError(
                    f"stream group {group} already owned by "
                    f"{existing.get('source_fingerprint')!r}; refusing to overwrite")
        self.builder._build_group(src, self.index_dir, group, fp, schema, key_and_carry)
        if replayed:
            # a replayed batch may already have appended (possibly
            # partially) its derived artifacts — appending again would
            # duplicate rows, so rebuild everything cleanly (rare path;
            # exactly-once for the common case stays cheap). The group
            # part-manifest is written at the END of the group build and
            # BEFORE publishing, so any crash inside publish leaves it
            # behind and routes the replay here. NOTE (documented crash
            # window): between a crashed publish and the checkpoint
            # replay, readers can see the batch's appended postings rows
            # while doc_count/termdict still exclude the batch — a
            # TRANSIENT stats skew, repaired by this remerge; abandoning
            # a stream permanently after a mid-publish crash (never
            # replaying) is not a supported exit.
            self._remerge()
        else:
            self._publish_incremental(group)

    def _committed_group_paths(self) -> list[str]:
        """raw/ group dirs that are safe for a derived rebuild to read.
        A compaction group (id ≥ COMPACT_BASE) counts only once its part
        manifest is committed: before that it is either an IN-FLIGHT
        merge (its victims still carry the rows — reading both would
        double-count) or an orphan from a crash mid-swap (same double-
        count; compact() itself deletes those at its next entry). The
        streaming side therefore never deletes anything — it just
        refuses to read uncommitted copies, which also removes any race
        against a concurrently running compact()."""
        from lucene_spark.index.compaction import COMPACT_BASE

        raw_dir = os.path.join(self.index_dir, "raw")
        parts_dir = os.path.join(self.index_dir, "parts")
        out = []
        for d in sorted(os.listdir(raw_dir)):
            if not d.startswith("group="):
                continue
            g = int(d.split("=", 1)[1])
            if g >= COMPACT_BASE and not os.path.exists(
                    os.path.join(parts_dir, f"group-{g:05d}.json")):
                continue
            out.append(os.path.join(raw_dir, d))
        return out

    def _published_groups(self) -> set[int]:
        mpath = os.path.join(self.index_dir, "manifest.json")
        if not os.path.exists(mpath):
            return set()
        with open(mpath) as fh:
            return set(json.load(fh).get("published_groups", []))

    def _publish_incremental(self, group: int) -> None:
        """Append-only publish of ONE new segment group — the
        near-real-time segment-append path (Lucene: a DWPT flush adds a
        segment; nothing old is rewritten). Per batch this moves only the
        NEW group's postings/docstats (O(batch)), instead of re-bucketing
        the whole index (O(total)) — the difference between a usable and
        an unusable streaming indexer at scale. Global stats artifacts
        (termdict, fieldstats, manifest) are recomputed from column-pruned
        aggregations over raw/ (no blob columns read). Compaction remains
        the place where the growing group population gets re-merged."""
        cfg = self.cfg
        idx = self.index_dir
        raw_g = self.spark.read.parquet(os.path.join(idx, "raw", f"group={group}"))

        postings = (
            raw_g.filter(F.col("kind") == "posting")
            .select("field", "term", "part_id", "slice", "local_df", "local_cf",
                    "doc_blob", "tf_blob", "dl_blob", "pos_blob",
                    *(["pay_blob"] if "pay_blob" in raw_g.columns else []),
                    "block_last", "block_max_tf", "block_min_dl")
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.num_buckets)).cast("int"))
        )
        (
            postings.repartition(cfg.num_buckets, "bucket")
            .sortWithinPartitions("term", "field", "part_id", "slice")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(self._dpath("postings"))
        )
        key_and_carry = list(cfg.key_cols) + list(cfg.carry_cols)
        docstats = raw_g.filter(F.col("kind") == "docstat").select(
            *[c for c in key_and_carry if c in raw_g.columns],
            "doc_id", "doclen",
            *(["field_lens"] if "field_lens" in raw_g.columns else []),
            "sha256")
        docstats.write.mode("append").parquet(self._dpath("docstats"))

        self._write_stats_and_manifest(published_add=group)

    def _remerge(self) -> None:
        """FULL rebuild of the derived artifacts over ALL groups — the
        recovery / replay path (the common per-batch path is
        _publish_incremental)."""
        cfg = self.cfg
        idx = self.index_dir
        raw = self.spark.read.parquet(*self._committed_group_paths())

        key_and_carry = list(cfg.key_cols) + list(cfg.carry_cols)
        docstats = raw.filter(F.col("kind") == "docstat").select(
            *[c for c in key_and_carry if c in raw.columns], "doc_id", "doclen",
            *(["field_lens"] if "field_lens" in raw.columns else []), "sha256"
        )
        docstats.write.mode("overwrite").parquet(self._bump("docstats"))

        postings = (
            raw.filter(F.col("kind") == "posting")
            .select("field", "term", "part_id", "slice", "local_df", "local_cf",
                    "doc_blob", "tf_blob", "dl_blob", "pos_blob",
                    *(["pay_blob"] if "pay_blob" in raw.columns else []),
                    "block_last", "block_max_tf", "block_min_dl")
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.num_buckets)).cast("int"))
        )
        (
            postings.repartition(cfg.num_buckets, "bucket")
            .sortWithinPartitions("term", "field", "part_id", "slice")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(self._bump("postings"))
        )
        self._write_stats_and_manifest()

    def _write_stats_and_manifest(self, published_add: int | None = None) -> None:
        """Recompute the SMALL global artifacts (termdict, fieldstats,
        manifest) from column-pruned aggregations over raw/ — the blob
        columns are never read, so this stays cheap as the index grows;
        the manifest records every group whose postings/docstats are
        already published (replay guard)."""
        cfg = self.cfg
        idx = self.index_dir
        committed = self._committed_group_paths()
        raw = self.spark.read.parquet(*committed)

        termdict = (
            raw.filter(F.col("kind") == "posting")
            .groupBy("field", "term")
            .agg(F.sum("local_df").alias("df"), F.sum("local_cf").alias("cf"))
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.num_buckets)).cast("int"))
        )
        (
            termdict.repartitionByRange(cfg.termdict_partitions, "field", "term")
            .sortWithinPartitions("field", "term")
            .write.mode("overwrite")
            .parquet(self._bump("termdict"))
        )

        fs = (
            raw.filter(F.col("kind") == "docstat")
            .agg(F.count("*").alias("doc_count"),
                 F.sum("doclen").alias("sum_doclen"),
                 F.max("doc_id").alias("max_doc_id"))
            .collect()[0].asDict()
        )
        fstat_rows = (
            raw.filter(F.col("kind") == "fieldstat")
            .groupBy("field")
            .agg(F.sum("local_df").alias("doc_count"),
                 F.sum("local_cf").alias("sum_ttf"))
            .collect()
        )
        field_stats = {r["field"]: {"doc_count": int(r["doc_count"] or 0),
                                    "sum_ttf": int(r["sum_ttf"] or 0)}
                       for r in fstat_rows}
        self.spark.createDataFrame(
            [(f, v["doc_count"], v["sum_ttf"])
             for f, v in sorted(field_stats.items())]
            or [(cfg.default_field, 0, 0)],
            "field string, doc_count long, sum_ttf long",
        ).write.mode("overwrite").parquet(self._bump("fieldstats"))

        # every COMMITTED on-disk group is published after a full remerge;
        # on the incremental path the new group joins the prior set
        groups = sorted(int(os.path.basename(p).split("=", 1)[1])
                        for p in committed)
        published = groups if published_add is None else sorted(
            self._published_groups() | {published_add})

        manifest = {
            "version": 3,
            "layout": 1,
            "derived": dict(self._derived),
            "analyzer_chains": {
                name: analyzer_fingerprint(name)
                for name in sorted({f.analyzer or cfg.analyzer
                                    for f in cfg.field_specs()}
                                   | {cfg.analyzer})
            },
            "source_fingerprint": "streaming",
            "config": {
                "analyzer": cfg.analyzer,
                "key_cols": list(cfg.key_cols),
                "content_col": cfg.content_col,
                "num_buckets": cfg.num_buckets,
                "block_size": cfg.block_size,
                "partitions": cfg.partitions,
                "num_groups": cfg.num_groups,
                "carry_cols": list(cfg.carry_cols),
                "index_positions": cfg.index_positions,
                "fields": [
                    {"name": s.name, "source_col": s.source_col,
                     "analyzer": s.analyzer, "index_positions": s.index_positions}
                    for s in cfg.field_specs()
                ],
                "default_field": cfg.default_field,
            },
            "doc_count": int(fs["doc_count"] or 0),
            "sum_doclen": int(fs["sum_doclen"] or 0),
            "field_stats": field_stats,
            "published_groups": published,
            "status": "done",
        }
        tmp = os.path.join(idx, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, os.path.join(idx, "manifest.json"))
        gc_derived(idx, manifest)

    # ---- streaming drivers ----------------------------------------------
    def start(self, source_dir: str, schema, checkpoint_dir: str,
              available_now: bool = True, max_files_per_trigger: int | None = None):
        """Watch a directory of parquet drops; each micro-batch appends a
        segment group. available_now=True drains what exists then stops
        (the unit-testable mode); False runs continuously.
        max_files_per_trigger bounds batch size (group granularity)."""
        reader = self.spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.parquet(source_dir)
        writer = (
            stream.writeStream
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
