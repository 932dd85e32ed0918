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

__all__ = ["split_index", "split_index_multi"]


def _write_side(spark: SparkSession, manifest: dict, cfg, raw: DataFrame,
                dels: DataFrame, out_dir: str, tag: str,
                index_dir: str) -> int:
    """Rewrite `raw` minus `dels` into a fresh one-group index at
    `out_dir`; returns the side's live doc count."""
    # `group` is the source's partition-discovery column — never a data
    # column in the output (the new group id comes from the directory)
    if "group" in raw.columns:
        raw = raw.drop("group")
    side = _rewrite_with_deletes(raw, dels, cfg.block_size)
    raw_out = os.path.join(out_dir, "raw", "group=0")
    (side.coalesce(max(1, cfg.partitions // 4))
     .write.mode("overwrite").parquet(raw_out))

    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    ppath = os.path.join(out_dir, "parts", "group-00000.json")
    with open(ppath + ".tmp", "w") as fh:
        json.dump({"group": 0, "status": "done",
                   "source_fingerprint":
                       f"split-{tag}-of-{os.path.abspath(index_dir)}"}, fh)
    os.replace(ppath + ".tmp", ppath)

    man = {k: v for k, v in manifest.items() if k != "derived"}
    man["split_from"] = os.path.abspath(index_dir)
    man["split_side"] = tag
    # _rebuild_derived recomputes doc_count/sum_doclen/field_stats from
    # the surviving rows and writes the manifest atomically
    _rebuild_derived(spark, out_dir, cfg, man, gc_min_age_seconds=0.0)
    with open(os.path.join(out_dir, "manifest.json")) as fh:
        return int(json.load(fh)["doc_count"])


def _check_targets(index_dir: str, out_dirs, overwrite: bool) -> None:
    """Validate and (under overwrite=True) CLEAR the target dirs: a
    leftover index in the target would otherwise contribute stale raw
    groups to the derived rebuild, silently polluting the split."""
    import shutil

    seen = set()
    for d in out_dirs:
        ad = os.path.abspath(d)
        if ad == os.path.abspath(index_dir):
            raise ValueError("cannot split an index onto itself")
        if ad in seen:
            raise ValueError(f"duplicate output dir {d}")
        seen.add(ad)
    for d in out_dirs:
        if os.path.exists(d):
            if not overwrite:
                raise FileExistsError(f"{d} already exists")
            shutil.rmtree(d)


def _doc_ordinals(ids: DataFrame, buckets: int = 32) -> DataFrame:
    """(doc_id, ord) with ord = the document's position in doc_id order —
    the reference's docID sequence over the composite reader. Distributed:
    quantile-bounded buckets + per-bucket windows + driver base offsets
    (the pipeline/pack.py prefix-sum shape), never one global window."""
    from pyspark.sql import Window

    spark = ids.sparkSession
    qs = [i / buckets for i in range(1, buckets)]
    bounds = sorted(set(ids.approxQuantile("doc_id", qs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("doc_id") > F.lit(b), 1).otherwise(0)
    bucketed = ids.withColumn("__bk", bucket.cast("int"))
    w = (Window.partitionBy("__bk").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    local = bucketed.withColumn(
        "__local", F.coalesce(F.count("*").over(w), F.lit(0)))
    totals = bucketed.groupBy("__bk").count().collect()
    base, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["__bk"]):
        base[r["__bk"]] = acc
        acc += r["count"]
    bases = spark.createDataFrame(
        [(bk, b) for bk, b in base.items()], "__bk int, __base long")
    return (local.join(F.broadcast(bases), "__bk")
            .select("doc_id",
                    (F.col("__base") + F.col("__local")).alias("ord")))


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
    _check_targets(index_dir, (dir1, dir2), overwrite)

    raw = spark.read.parquet(os.path.join(index_dir, "raw"))
    ids = raw.filter(F.col("kind") == "docstat").select("doc_id")
    m = matches.select(
        F.col(matches.columns[0]).cast("long").alias("doc_id")).distinct()
    # side 1 keeps the matches → delete everything else; side 2 inverse
    dels1 = ids.join(m, "doc_id", "left_anti")
    dels2 = ids.join(m, "doc_id", "left_semi")

    n1 = _write_side(spark, manifest, cfg, raw, dels1, dir1, "side1",
                     index_dir)
    n2 = _write_side(spark, manifest, cfg, raw, dels2, dir2, "side2",
                     index_dir)
    return {"docs1": n1, "docs2": n2,
            "seconds": round(time.time() - t0, 3)}


def split_index_multi(spark: SparkSession, index_dir: str,
                      out_dirs: list[str], seq: bool = False,
                      overwrite: bool = False) -> dict:
    """MultiPassIndexSplitter (lucene/misc/index/
    MultiPassIndexSplitter.java:70-110): split into len(out_dirs) equal
    parts by docID sequence — round-robin by default (doc j → part
    j mod n), or `seq` contiguous ranges of partLen = maxDoc // n with
    the LAST part collecting the integer-rounding remainder.  Like the
    reference, the source is read once per output part ("multi-pass"),
    each pass with the other parts' docs as fake deletes.

    Doc ordinals (the docID sequence) are computed with a distributed
    prefix sum, never a global window.  Returns {"docs": [n...],
    "seconds": s}."""
    t0 = time.time()
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    if not os.path.isdir(os.path.join(index_dir, "raw")):
        raise ValueError("split_index_multi needs an index with raw/")
    n = len(out_dirs)
    if n < 2:
        raise ValueError("need at least 2 output dirs")
    cfg = config_from_manifest(manifest["config"])
    _check_targets(index_dir, out_dirs, overwrite)

    raw = spark.read.parquet(os.path.join(index_dir, "raw"))
    ids = raw.filter(F.col("kind") == "docstat").select("doc_id")
    ords = _doc_ordinals(ids)
    if seq:
        max_doc = ids.count()
        if max_doc < n:
            raise ValueError(f"cannot seq-split {max_doc} docs {n} ways")
        part_len = max_doc // n
        part = F.least(F.floor(F.col("ord") / F.lit(part_len)),
                       F.lit(n - 1)).cast("int")
    else:
        part = F.pmod(F.col("ord"), F.lit(n)).cast("int")
    assigned = ords.select("doc_id", part.alias("part"))

    docs = []
    for i, out_dir in enumerate(out_dirs):
        dels = assigned.filter(F.col("part") != i).select("doc_id")
        docs.append(_write_side(spark, manifest, cfg, raw, dels, out_dir,
                                f"part{i}", index_dir))
    return {"docs": docs, "seconds": round(time.time() - t0, 3)}
