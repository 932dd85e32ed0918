"""addIndexes — merging independently-built indexes into one.

Role analogue: IndexWriter.addIndexes(Directory...) (lucene/core/src/java/
org/apache/lucene/index/IndexWriter.java addIndexes(Directory…) — copies
incoming segments wholesale, remapping their docIDs into the
destination's docID space; no re-analysis, no re-tokenization).

Spark restatement: a doc_id here is ``part_id << 40 | local_id``
(builder.py:60), so remapping a whole incoming index = bumping every
part_id by a constant offset — which shifts EVERY doc_id in a posting
row by the same ``K = offset << 40``.  Because doc blobs store
first-absolute + deltas (codec/vbyte.delta_encode), the shift touches
exactly ONE integer per posting row (deltas[0] += K) plus the
block_last skip metadata; tf/dl/positions/payload blobs move verbatim.
Each incoming index lands as one new raw/ group in the destination (a
segment append, like the reference's segment copy), then the standard
derived rebuild recomputes postings buckets / termdict / docstats /
collection stats for the union.

Safety: the destination and every source must agree on the document
schema and analysis chains (key_cols/content_col/fields/positions and
the manifest's analyzer fingerprints) — the same check the reference
performs implicitly by failing queries when analyzers diverge, made
explicit here because term spaces must be compatible to share one
termdict.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.builder import PART_ID_SHIFT
from lucene_spark.index.compaction import (COMPACT_BASE, _rebuild_derived,
                                           config_from_manifest)

__all__ = ["add_indexes"]

_COMPAT_KEYS = ("key_cols", "content_col", "index_positions", "fields",
                "analyzer")


def _load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        return json.load(fh)


def _check_compatible(dst: dict, src: dict, src_dir: str) -> None:
    for k in _COMPAT_KEYS:
        a, b = dst["config"].get(k), src["config"].get(k)
        if a != b:
            raise ValueError(
                f"addIndexes: {src_dir} config[{k!r}] = {b!r} "
                f"differs from destination {a!r}")
    da, db = dst.get("analyzer_chains") or {}, src.get("analyzer_chains") or {}
    for name in set(da) & set(db):
        if da[name] != db[name]:
            raise ValueError(
                f"addIndexes: analyzer chain {name!r} fingerprint differs "
                f"between destination and {src_dir} — term spaces are "
                f"incompatible")


def _shift_first_vbyte(blob: bytes, k: int) -> bytes:
    """Add `k` to the FIRST value of a VByte blob without touching the
    rest: VByte is self-delimiting (high bit = continuation), so the
    first value ends at the first byte with the high bit clear; the tail
    bytes (all the deltas) concatenate back verbatim.  Plain-int ops —
    no numpy fixed cost per tiny blob."""
    v, shift, i = 0, 0, 0
    while True:
        b = blob[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            break
        shift += 7
    v += k
    out = bytearray()
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out.append(b7 | 0x80)
        else:
            out.append(b7)
            break
    return bytes(out) + blob[i:]


def _shift_rows(shift_parts: int):
    """mapInPandas rewriter: bump part ids (and therefore doc_ids) by
    `shift_parts` across posting, docstat and fieldstat rows."""
    k = np.int64(shift_parts) << np.int64(PART_ID_SHIFT)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            pdf = pdf.copy()
            # nullable Int64 keeps the NULLs that non-posting / non-
            # docstat rows carry in these columns
            pdf["part_id"] = pdf["part_id"].astype("Int64") + shift_parts
            if "doc_id" in pdf.columns:
                pdf["doc_id"] = pdf["doc_id"].astype("Int64") + int(k)
            post = pdf["kind"] == "posting"
            if post.any():
                ki = int(k)
                new_blobs = [_shift_first_vbyte(bytes(blob), ki)
                             for blob in pdf.loc[post, "doc_blob"]]
                pdf.loc[post, "doc_blob"] = pd.Series(
                    new_blobs, index=pdf.index[post], dtype=object)
                pdf.loc[post, "block_last"] = pdf.loc[post, "block_last"].map(
                    lambda bl: [int(x) + int(k) for x in bl])
            yield pdf

    return run


def add_indexes(spark: SparkSession, dst_dir: str,
                src_dirs: list[str]) -> dict:
    """Append every index in `src_dirs` into `dst_dir`, remapping
    incoming docIDs past the destination's partition range.  Returns
    {"added_groups": [...], "doc_count": n, "seconds": s}.

    Single-writer, like compaction: the derived artifacts are rebuilt
    once at the end into new generation directories and published by
    the atomic manifest swap (pinned readers keep the old generation).
    """
    t0 = time.time()
    manifest = _load_manifest(dst_dir)
    cfg = config_from_manifest(manifest["config"])
    raw_dir = os.path.join(dst_dir, "raw")
    for s in src_dirs:
        if os.path.abspath(s) == os.path.abspath(dst_dir):
            raise ValueError("cannot add an index to itself")
        _check_compatible(manifest, _load_manifest(s), s)

    # `group` is partition-discovery metadata, never a data column in
    # the appended files (the directory name carries the new group id)
    dst_raw = spark.read.parquet(raw_dir).drop("group")
    next_part = int(
        dst_raw.filter(F.col("kind") == "docstat")
        .agg(F.max(F.shiftright("doc_id", PART_ID_SHIFT))).collect()[0][0]
        or 0) + 1
    groups = [int(d.split("=", 1)[1]) for d in os.listdir(raw_dir)
              if d.startswith("group=")]
    next_group = max([g for g in groups if g >= COMPACT_BASE],
                     default=COMPACT_BASE - 1) + 1

    added = []
    for s in src_dirs:
        src_raw = spark.read.parquet(os.path.join(s, "raw")).drop("group")
        parts = src_raw.filter(F.col("kind") == "docstat").agg(
            F.min(F.shiftright("doc_id", PART_ID_SHIFT)),
            F.max(F.shiftright("doc_id", PART_ID_SHIFT))).collect()[0]
        lo, hi = int(parts[0] or 0), int(parts[1] or 0)
        shift = next_part - lo
        # schema alignment: a payload-less source meets a payload dst
        for c in set(dst_raw.columns) - set(src_raw.columns):
            src_raw = src_raw.withColumn(c, F.lit(None))
        missing_in_dst = set(src_raw.columns) - set(dst_raw.columns)
        if missing_in_dst:
            raise ValueError(
                f"addIndexes: {s} carries columns {sorted(missing_in_dst)} "
                f"the destination lacks (e.g. payloads) — rebuild the "
                f"destination with the richer schema first")
        shifted = src_raw.select(*dst_raw.columns).mapInPandas(
            _shift_rows(shift), dst_raw.schema)
        g = next_group
        next_group += 1
        out = os.path.join(raw_dir, f"group={g}")
        (shifted.coalesce(max(1, cfg.partitions // 4))
         .write.mode("overwrite").parquet(out))
        ppath = os.path.join(dst_dir, "parts", f"group-{g:05d}.json")
        with open(ppath + ".tmp", "w") as fh:
            json.dump({"group": g, "status": "done",
                       "source_fingerprint":
                           f"addIndexes-of-{os.path.abspath(s)}",
                       "part_shift": shift}, fh)
        os.replace(ppath + ".tmp", ppath)
        added.append(g)
        next_part = hi + shift + 1

    _rebuild_derived(spark, dst_dir, cfg, manifest, gc_min_age_seconds=300.0)
    final = _load_manifest(dst_dir)
    return {"added_groups": added, "doc_count": int(final["doc_count"]),
            "seconds": round(time.time() - t0, 3)}
