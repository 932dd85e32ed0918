"""Segment-group compaction — the TieredMergePolicy analogue.

Role analogue: index/TieredMergePolicy.java:74,85-92,399-414 — merges are
budgeted per size tier (allowedSegCount = segsPerTier per tier, tiers are
×tier_factor size levels above floor_bytes) and candidates are scored so
small, similarly-sized segments merge first; maxMergeAtOnce caps a merge.
index/SegmentMerger.java does the data movement.

Spark restatement: a "segment" is a raw/group=G directory (one resumable
build unit or one streaming micro-batch). Compaction:

1. sizes all groups from the filesystem (the byte-size tier math carries
   over unchanged),
2. picks the candidate set: while the group count exceeds the tier
   budget, take up to `max_merge_at_once` of the SMALLEST groups,
3. rewrites just those groups' raw rows into one new group directory
   (posting rows and docstats move VERBATIM — doc_ids are global, so no
   posting re-encoding or docID remap is ever needed; this is cheaper
   than Lucene's merge, which must remap per-segment ids),
4. atomically swaps lineage manifests, then rebuilds the derived
   artifacts (postings buckets, termdict, fieldstats).

The raw/ swap is the IndexWriter.commit() two-phase publish and is
crash-safe (see _recover_incomplete_merges). Serving never blocks: the
derived artifacts are rebuilt into NEW generation directories
(index/layout.py — the segments_N files-pointer analogue) and published
by the atomic manifest swap; readers pinned to the previous manifest
keep scanning the previous generation, which survives one further
rebuild (one-generation gc grace). Compaction assumes a single writer.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.layout import (DERIVED_NAMES, gc_derived,
                                        next_derived_name)
from lucene_spark.index.builder import FieldSpec, IndexBuilder, IndexConfig

# Compacted groups get ids from a range disjoint from both batch groups
# (small ints) and streaming micro-batch groups (GROUP_BASE = 1<<20 +
# batch_id, streaming/index_stream.py): a compacted id can therefore never
# be clobbered by the next micro-batch's overwrite-mode group write.
COMPACT_BASE = 1 << 30


def _recover_incomplete_merges(index_dir: str) -> bool:
    """Crash recovery for the two-phase swap: if a merged group manifest
    exists whose `merged_from` victims are still on disk, the previous
    compaction died between writing the merged copy and retiring the
    victims — both copies of those rows exist and every derived rebuild
    would double-count postings. If ALL victims survive, roll BACK (drop
    the merged copy — victims are intact). If only SOME survive the crash
    hit mid-retirement: the merged copy is then the only complete copy, so
    roll FORWARD (finish deleting the remaining victims).

    Returns True when a roll-FORWARD happened: the derived artifacts
    were never rebuilt after the interrupted merge (the rebuild runs
    after victim retirement), so the caller must rebuild them even if no
    new merge is planned — otherwise folded deletes would stay visible
    in postings/docstats indefinitely."""
    rolled_forward = False
    parts_dir = os.path.join(index_dir, "parts")
    raw_dir = os.path.join(index_dir, "raw")
    if not os.path.isdir(parts_dir):
        return False
    # Orphan detection: a crash between the merged group's parquet write
    # and the part-manifest os.replace leaves raw/group=G (G in the
    # compaction id range) fully written but with NO manifest recording
    # merged_from — the victims are still intact, so the safe move is
    # always rollback: drop the orphan copy (and any manifest .tmp).
    if os.path.isdir(raw_dir):
        for d in os.listdir(raw_dir):
            if not d.startswith("group="):
                continue
            g = int(d.split("=", 1)[1])
            if g >= COMPACT_BASE and not os.path.exists(
                    os.path.join(parts_dir, f"group-{g:05d}.json")):
                shutil.rmtree(os.path.join(raw_dir, d), ignore_errors=True)
                tmp = os.path.join(parts_dir, f"group-{g:05d}.json.tmp")
                if os.path.exists(tmp):
                    os.remove(tmp)
    for name in os.listdir(parts_dir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(parts_dir, name)) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        victims = m.get("merged_from")
        if not victims:
            continue
        alive = [g for g in victims
                 if os.path.isdir(os.path.join(raw_dir, f"group={g}"))]
        if not alive:
            if m.get("derived_pending"):
                # victims fully retired but the derived rebuild never ran
                # (crash in the window between retirement and rebuild)
                rolled_forward = True
            continue
        if len(alive) == len(victims):
            # roll back: drop the merged copy, keep the intact victims
            g = int(m["group"])
            shutil.rmtree(os.path.join(raw_dir, f"group={g}"), ignore_errors=True)
            os.remove(os.path.join(parts_dir, name))
        else:
            # roll forward: some victims already retired — finish the job
            rolled_forward = True
            for g in alive:
                shutil.rmtree(os.path.join(raw_dir, f"group={g}"), ignore_errors=True)
                p = os.path.join(parts_dir, f"group-{g:05d}.json")
                if os.path.exists(p):
                    os.remove(p)
    return rolled_forward


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def plan_compaction(
    group_bytes: dict[int, int],
    floor_bytes: int = 2 << 20,
    tier_factor: int = 10,
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
) -> list[int]:
    """Pure policy math (unit-testable): which groups to merge now.
    Mirrors TieredMergePolicy's allowed-count budget: counting each group
    into its size tier (size < floor counts at floor), the index is
    allowed segs_per_tier groups per tier; when over budget, merge the
    smallest max_merge_at_once groups."""
    if len(group_bytes) <= 1:
        return []
    import math

    total = sum(max(b, floor_bytes) for b in group_bytes.values())
    # allowed count: segs_per_tier at each tier from total down to floor
    allowed = 0.0
    level_size = float(floor_bytes)
    remaining = float(total)
    while remaining > 0:
        seg_count_level = remaining / level_size
        if seg_count_level < segs_per_tier:
            allowed += math.ceil(seg_count_level)
            break
        allowed += segs_per_tier
        remaining -= segs_per_tier * level_size
        level_size *= tier_factor
    if len(group_bytes) <= max(2, int(allowed)):
        return []
    smallest = sorted(group_bytes, key=lambda g: (group_bytes[g], g))
    return smallest[:max_merge_at_once]


def config_from_manifest(mcfg: dict) -> IndexConfig:
    """Reconstruct the build-time IndexConfig from a manifest's `config`
    block — used by every index-rewriting job (compaction, splitting)."""
    return IndexConfig(
        key_cols=tuple(mcfg["key_cols"]), content_col=mcfg["content_col"],
        analyzer=mcfg["analyzer"], num_buckets=mcfg["num_buckets"],
        block_size=mcfg["block_size"], partitions=mcfg["partitions"],
        carry_cols=tuple(mcfg.get("carry_cols", ())),
        index_positions=mcfg.get("index_positions", False),
        termdict_partitions=mcfg.get("termdict_partitions", 4)
        if isinstance(mcfg.get("termdict_partitions", 4), int) else 4,
        fields=tuple(FieldSpec(**f) for f in mcfg.get("fields", [])),
        sort_by=tuple(mcfg.get("sort_by", ())),
    )


def _rewrite_with_deletes(src: DataFrame, deletes_df: DataFrame, block_size: int):
    """Rewrite victim-group raw rows dropping tombstoned docs — the
    merge-applies-deletes semantic (index/FreqProxTermsWriter.java:51-79):
    postings decoded, masked, re-encoded with fresh block metadata; empty
    posting rows dropped; per-(field, partition) collection stats
    recomputed from the surviving postings so df/cf/docCount/sumTTF
    recover; docstat rows of deleted docs removed.

    deletes_df: one-column (doc_id long) DataFrame. The delete set is
    DISTRIBUTED by cogrouping on part_id (doc_id >> PART_ID_SHIFT): each
    rewrite task sees only its own partition's tombstones — no driver
    collect, no task-closure ride-along, so a 100M-row delete set costs
    one shuffle of the deletes, not 100M ids × every task."""
    from lucene_spark.codec.blocks import build_block_meta
    from lucene_spark.codec.vbyte import delta_decode, delta_encode, vbyte_decode, vbyte_encode
    from lucene_spark.index.builder import PART_ID_SHIFT

    schema = src.schema
    cols = [f.name for f in schema.fields]
    dels_by_part = deletes_df.select(
        F.col(deletes_df.columns[0]).cast("long").alias("doc_id")
    ).withColumn("part_id", F.shiftright("doc_id", PART_ID_SHIFT).cast("int"))

    def _empty() -> pd.DataFrame:
        # object dtype so Arrow maps empty columns onto array/binary
        # fields (an empty float64 column cannot convert to list<long>)
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})

    def _is_deleted(doc_ids: np.ndarray, dels: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(dels, doc_ids)
        idx_c = np.clip(idx, 0, dels.size - 1)
        return (idx < dels.size) & (dels[idx_c] == doc_ids) if dels.size else \
            np.zeros(doc_ids.size, dtype=bool)

    def rewrite_postings(pdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return _empty()
        dels = np.sort(dpdf["doc_id"].to_numpy(np.int64)) if len(dpdf) else \
            np.empty(0, dtype=np.int64)
        out_rows = []
        fstats: dict[str, tuple[set, int]] = {}
        part_id = int(pdf["part_id"].iloc[0])
        for r in pdf.itertuples(index=False):
            docs = delta_decode(vbyte_decode(r.doc_blob))
            tfs = vbyte_decode(r.tf_blob)
            dls = vbyte_decode(r.dl_blob)
            dead = _is_deleted(docs, dels)
            pos_delta = vbyte_decode(r.pos_blob) if r.pos_blob is not None else None
            pay = (np.frombuffer(r.pay_blob, dtype=np.float32)
                   if getattr(r, "pay_blob", None) is not None else None)
            if dead.any():
                keep = ~dead
                if pos_delta is not None:
                    # re-absolutize positions then re-delta over survivors
                    starts = np.cumsum(tfs) - tfs
                    cs = np.cumsum(pos_delta)
                    base = cs[starts] - pos_delta[starts]
                    pos_abs = cs - np.repeat(base, tfs)
                    pos_abs = pos_abs[np.repeat(keep, tfs)]
                if pay is not None:
                    # payloads are position-parallel — mask identically
                    pay = pay[np.repeat(keep, tfs)]
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                if docs.size == 0:
                    continue
                if pos_delta is not None:
                    run_starts = np.cumsum(tfs) - tfs
                    pos_delta = np.diff(pos_abs, prepend=np.int64(0))
                    pos_delta[run_starts] = pos_abs[run_starts]
            d = dict(zip(cols, r))
            bl, bmt, bmd = build_block_meta(docs, tfs, dls, block_size)
            d.update(
                local_df=int(docs.size), local_cf=int(tfs.sum()),
                doc_blob=vbyte_encode(delta_encode(docs)),
                tf_blob=vbyte_encode(tfs), dl_blob=vbyte_encode(dls),
                pos_blob=vbyte_encode(pos_delta) if pos_delta is not None else None,
                block_last=bl.tolist(), block_max_tf=bmt.tolist(),
                block_min_dl=bmd.tolist(),
            )
            if "pay_blob" in cols:
                d["pay_blob"] = pay.tobytes() if pay is not None else None
            out_rows.append(d)
            live_docs, ttf = fstats.get(r.field, (set(), 0))
            live_docs.update(docs.tolist())
            fstats[r.field] = (live_docs, ttf + int(tfs.sum()))
        frames = [pd.DataFrame(out_rows, columns=cols)] if out_rows else []
        if fstats:
            fr = pd.DataFrame([
                {"kind": "fieldstat", "field": f, "part_id": np.int32(part_id),
                 "local_df": len(docs), "local_cf": ttf}
                for f, (docs, ttf) in sorted(fstats.items())
            ])
            for c in cols:
                if c not in fr.columns:
                    fr[c] = None
            frames.append(fr[cols])
        if not frames:
            return _empty()
        return pd.concat(frames, ignore_index=True)

    def filter_docstats(pdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return _empty()
        if len(dpdf):
            dels = np.sort(dpdf["doc_id"].to_numpy(np.int64))
            pdf = pdf[~pd.Series(_is_deleted(pdf["doc_id"].to_numpy(np.int64), dels),
                                 index=pdf.index)]
        return pdf

    # cogroup distributes the tombstones: postings rows carry part_id,
    # docstat rows derive it from the doc_id's high bits
    posts = (src.filter(F.col("kind") == "posting").groupBy("part_id")
             .cogroup(dels_by_part.groupBy("part_id"))
             .applyInPandas(rewrite_postings, schema))
    docs = (src.filter(F.col("kind") == "docstat")
            .groupBy(F.shiftright("doc_id", PART_ID_SHIFT).cast("int").alias("part_id"))
            .cogroup(dels_by_part.groupBy("part_id"))
            .applyInPandas(filter_docstats, schema))
    # old fieldstat rows intentionally dropped — regenerated above
    return posts.unionByName(docs)


def compact(
    spark: SparkSession,
    index_dir: str,
    cfg: IndexConfig | None = None,
    floor_bytes: int = 2 << 20,
    tier_factor: int = 10,
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
    deletes=None,
    gc_min_age_seconds: float = 300.0,
) -> dict:
    """One compaction round. Returns {'merged': [...], 'into': G or None}.

    deletes: optional iterable/DataFrame of tombstoned doc_ids — applied
    to the groups being merged (and ONLY those: Lucene's merge-applies-
    deletes semantics, index/FreqProxTermsWriter.java:51-79 — stats and
    scan cost recover for rewritten segments; untouched groups keep their
    tombstones until their own merge)."""
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    mcfg = manifest["config"]
    cfg = cfg or config_from_manifest(mcfg)
    recovered = _recover_incomplete_merges(index_dir)
    raw_dir = os.path.join(index_dir, "raw")
    groups = {
        int(d.split("=", 1)[1]): _dir_bytes(os.path.join(raw_dir, d))
        for d in os.listdir(raw_dir) if d.startswith("group=")
    }
    victims = plan_compaction(groups, floor_bytes, tier_factor,
                              segs_per_tier, max_merge_at_once)
    if not victims:
        if recovered:
            # a rolled-forward crash recovery retired victims whose
            # derived artifacts were never rebuilt — rebuild now or the
            # interrupted merge's effects (e.g. folded deletes) never
            # reach postings/docstats
            _rebuild_derived(spark, index_dir, cfg, manifest,
                             gc_min_age_seconds)
            return {"merged": [], "into": None, "recovered_rebuild": True}
        return {"merged": [], "into": None}

    # allocate from the dedicated compaction range — never max(groups)+1,
    # which would collide with the NEXT streaming micro-batch's group id
    # (GROUP_BASE + batch_id) and be silently clobbered by its overwrite
    new_group = max((g for g in groups if g >= COMPACT_BASE),
                    default=COMPACT_BASE - 1) + 1
    t0 = time.time()
    src = spark.read.parquet(*[os.path.join(raw_dir, f"group={g}") for g in victims])
    n_deleted = 0
    if deletes is not None:
        # normalize to a one-column DataFrame; the delete set itself is
        # never collected to the driver (see _rewrite_with_deletes)
        if isinstance(deletes, DataFrame):
            dels_df = deletes.select(
                F.col(deletes.columns[0]).cast("long").alias("doc_id"))
        else:
            vals = [(int(d),) for d in deletes]
            dels_df = spark.createDataFrame(vals, "doc_id long") if vals else None
        n_deleted = int(dels_df.count()) if dels_df is not None else 0
        if n_deleted:
            src = _rewrite_with_deletes(src, dels_df,
                                        int(mcfg.get("block_size", 128)))
    # rows move verbatim (or rewritten sans tombstones); coalesce bounds
    # the output file count
    out = os.path.join(raw_dir, f"group={new_group}")
    src.coalesce(max(1, cfg.partitions // 4)).write.mode("overwrite").parquet(out)

    # two-phase swap: new manifest first, then retire victims
    mpath = os.path.join(index_dir, "parts", f"group-{new_group:05d}.json")
    with open(mpath + ".tmp", "w") as fh:
        json.dump({"group": new_group, "status": "done",
                   "merged_from": sorted(victims),
                   # cleared by _rebuild_derived AFTER the manifest swap:
                   # a crash anywhere between this commit and the rebuild
                   # leaves the flag set, and recovery then forces the
                   # rebuild even when all victims were already retired
                   # (that state is otherwise indistinguishable from a
                   # fully committed merge)
                   "derived_pending": True,
                   "deletes_applied": n_deleted,
                   "seconds": round(time.time() - t0, 3),
                   "source_fingerprint": f"compaction-of-{sorted(victims)}"}, fh)
    os.replace(mpath + ".tmp", mpath)
    for g in victims:
        shutil.rmtree(os.path.join(raw_dir, f"group={g}"), ignore_errors=True)
        p = os.path.join(index_dir, "parts", f"group-{g:05d}.json")
        if os.path.exists(p):
            os.remove(p)

    # rebuild derived artifacts (postings buckets / termdict / fieldstats)
    _rebuild_derived(spark, index_dir, cfg, manifest, gc_min_age_seconds)
    return {"merged": sorted(victims), "into": new_group}


def _rebuild_derived(spark: SparkSession, index_dir: str, cfg: IndexConfig,
                     manifest: dict, gc_min_age_seconds: float = 300.0) -> None:
    # versioned rebuild: every artifact goes to a NEW generation dir; the
    # manifest swap at the end publishes them atomically and pinned
    # readers keep the previous generation (gc keeps one spare)
    new_names = {n: next_derived_name(manifest, n) for n in DERIVED_NAMES}
    raw = spark.read.parquet(os.path.join(index_dir, "raw"))
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
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(index_dir, new_names["postings"]))
    )
    termdict = (
        raw.filter(F.col("kind") == "posting")
        .groupBy("field", "term")
        .agg(F.sum("local_df").alias("df"), F.sum("local_cf").alias("cf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(cfg.num_buckets)).cast("int"))
    )
    (
        termdict.repartitionByRange(cfg.termdict_partitions, "field", "term")
        .sortWithinPartitions("field", "term")
        .write.mode("overwrite").parquet(os.path.join(index_dir, new_names["termdict"]))
    )
    key_and_carry = [c for c in (list(cfg.key_cols) + list(cfg.carry_cols)) if c in raw.columns]
    docstats = raw.filter(F.col("kind") == "docstat").select(
        *key_and_carry, "doc_id", "doclen",
        *(["field_lens"] if "field_lens" in raw.columns else []), "sha256")
    if cfg.sort_by:
        # restore the index-time sort the delete-fold cogroup shuffled
        # away: doc_ids were ASSIGNED in sort order at build time, so
        # sorting by doc_id within partitions re-establishes the sort
        # column's row-group min/max pruning (per original part) that
        # reader.index_sort advertises
        docstats = docstats.sortWithinPartitions("doc_id")
    docstats.write.mode("overwrite").parquet(os.path.join(index_dir, new_names["docstats"]))

    # recompute collection stats — after a delete-folding merge the global
    # doc_count/sum_doclen and per-field stats must reflect live docs
    gs = (raw.filter(F.col("kind") == "docstat")
          .agg(F.count("*").alias("n"), F.sum("doclen").alias("s")).collect()[0])
    fs_rows = (raw.filter(F.col("kind") == "fieldstat")
               .groupBy("field")
               .agg(F.sum("local_df").alias("doc_count"),
                    F.sum("local_cf").alias("sum_ttf")).collect())
    field_stats = {r["field"]: {"doc_count": int(r["doc_count"] or 0),
                                "sum_ttf": int(r["sum_ttf"] or 0)}
                   for r in fs_rows}
    spark.createDataFrame(
        [(f, v["doc_count"], v["sum_ttf"]) for f, v in sorted(field_stats.items())]
        or [(cfg.default_field, 0, 0)],
        "field string, doc_count long, sum_ttf long",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, new_names["fieldstats"]))

    manifest["derived"] = new_names
    manifest["doc_count"] = int(gs["n"] or 0)
    manifest["sum_doclen"] = int(gs["s"] or 0)
    if field_stats:
        manifest["field_stats"] = field_stats
    manifest["compacted_at"] = time.time()
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    # the rebuild is now visible: clear the pending markers (see compact)
    parts_dir = os.path.join(index_dir, "parts")
    if os.path.isdir(parts_dir):
        for name in os.listdir(parts_dir):
            if not name.endswith(".json"):
                continue
            gp = os.path.join(parts_dir, name)
            try:
                with open(gp) as fh:
                    gm = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
            if gm.get("derived_pending"):
                gm["derived_pending"] = False
                with open(gp + ".tmp", "w") as fh:
                    json.dump(gm, fh)
                os.replace(gp + ".tmp", gp)
    gc_derived(index_dir, manifest, gc_min_age_seconds)
    # vector-graph sidecars (index/vecgraph.py) are keyed to the docstats
    # generation that just changed — rebuild them so queries keep riding
    # stored graphs (Lucene rebuilds the .vec graph at merge too)
    vg_dir = os.path.join(index_dir, "vecgraph")
    if os.path.isdir(vg_dir):
        from lucene_spark.index.reader import IndexReader
        from lucene_spark.index.vecgraph import (build_vector_graphs,
                                                 load_manifest)

        r = IndexReader(spark, index_dir)
        for name in os.listdir(vg_dir):
            if not name.endswith(".json"):
                continue
            vman = load_manifest(index_dir, name[:-5])
            if vman:
                build_vector_graphs(r, vman["field"],
                                    m_neighbors=vman["m_neighbors"],
                                    ef_construction=vman["ef_construction"])
