"""Index splitting — the PKIndexSplitter role.

Role analogue: lucene/misc/src/java/org/apache/lucene/misc/index/
PKIndexSplitter.java — "All documents that match the query are sent to
dir1, remaining ones to dir2."  The reference implements each side as a
full merge with the other side's docs marked deleted
(DocumentFilteredLeafIndexReader wrapping liveDocs); this engine has the
exact same primitive — the compaction delete-fold rewrite
(compaction._rewrite_with_deletes, FreqProxTermsWriter.java:51-79
merge-applies-deletes) — so a split is two delete-fold rewrites into
fresh index directories, each followed by the standard derived-artifact
rebuild that recomputes df/cf/doc_count/sum_doclen/field_stats for the
surviving half.

Spark/scale shape: the match set stays a DataFrame end to end (cogrouped
into the rewrite tasks by doc_id high bits — no driver collect); doc_ids
move VERBATIM (they are globally unique), so no posting re-encode beyond
the masked rewrite and no docID remap; each side's raw output is written
once and derived artifacts rebuild from it with the usual bucketed
shuffle.  Both sides remain fully functional, resumable indexes
(compaction, deletes, streaming appends all keep working on them).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.compaction import (_rebuild_derived,
                                           _rewrite_with_deletes,
                                           config_from_manifest)

__all__ = ["split_index"]


def split_index(spark: SparkSession, index_dir: str, dir1: str, dir2: str,
                matches: DataFrame, overwrite: bool = False) -> dict:
    """Split `index_dir` into dir1 (docs in `matches`) and dir2 (the
    rest).  `matches` is a one-column doc_id DataFrame — typically
    `searcher.matches(query).select("doc_id")`, mirroring the
    reference's docsInFirstIndex Query.

    Returns {"docs1": n, "docs2": n, "seconds": s}."""
    t0 = time.time()
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    if not os.path.isdir(os.path.join(index_dir, "raw")):
        raise ValueError("split_index needs an index with a raw/ store")
    cfg = config_from_manifest(manifest["config"])

    for d in (dir1, dir2):
        if os.path.exists(os.path.join(d, "manifest.json")):
            if not overwrite:
                raise FileExistsError(f"{d} already holds an index")
        if os.path.abspath(d) == os.path.abspath(index_dir):
            raise ValueError("cannot split an index onto itself")

    raw = spark.read.parquet(os.path.join(index_dir, "raw"))
    ids = raw.filter(F.col("kind") == "docstat").select("doc_id")
    m = matches.select(
        F.col(matches.columns[0]).cast("long").alias("doc_id")).distinct()
    # side 1 keeps the matches → delete everything else; side 2 inverse
    dels1 = ids.join(m, "doc_id", "left_anti")
    dels2 = ids.join(m, "doc_id", "left_semi")

    counts = {}
    for out_dir, dels, tag in ((dir1, dels1, "side1"), (dir2, dels2, "side2")):
        side = _rewrite_with_deletes(raw, dels, cfg.block_size)
        raw_out = os.path.join(out_dir, "raw", "group=0")
        (side.coalesce(max(1, cfg.partitions // 4))
         .write.mode("overwrite").parquet(raw_out))

        os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
        ppath = os.path.join(out_dir, "parts", "group-00000.json")
        with open(ppath + ".tmp", "w") as fh:
            json.dump({"group": 0, "status": "done",
                       "source_fingerprint":
                           f"split-{tag}-of-{os.path.abspath(index_dir)}"},
                      fh)
        os.replace(ppath + ".tmp", ppath)

        man = {k: v for k, v in manifest.items() if k != "derived"}
        man["split_from"] = os.path.abspath(index_dir)
        man["split_side"] = tag
        # _rebuild_derived recomputes doc_count/sum_doclen/field_stats
        # from the surviving rows and writes the manifest atomically
        _rebuild_derived(spark, out_dir, cfg, man, gc_min_age_seconds=0.0)
        with open(os.path.join(out_dir, "manifest.json")) as fh:
            counts[tag] = int(json.load(fh)["doc_count"])

    return {"docs1": counts["side1"], "docs2": counts["side2"],
            "seconds": round(time.time() - t0, 3)}
