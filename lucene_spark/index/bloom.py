"""Bloom-filter term-existence sidecar — fast negative term checks.

Role analogue: lucene/codecs/src/java/org/apache/lucene/codecs/bloom/
BloomFilteringPostingsFormat.java — "A PostingsFormat useful for low
doc-frequency fields such as primary keys. Bloom filters offer 'fast-
fail' for reads in segments known to have no record of the key" — the
same trade here: a query term that does NOT exist in the dictionary is
answered from a driver-held bitset with zero Spark jobs (misspellings,
cold vocabulary misses), while a positive answer (maybe-present) falls
through to the normal memoized termdict probe.  No false negatives, so
correctness is untouched.

Spark shape of the BUILD: k seeded xxhash64 expressions per term →
explode → ONE groupBy(word index) with bit_or — the bitset is
assembled distributedly as packed 64-bit words and collected as at
most m/64 rows (a 10M-term field at 16 bits/term is ~20 MB of words —
driver-trivial, and the parquet sidecar is partition-parallel to
write/read).  Membership tests use the pure-Python XXH64 twin
(codec/xxhash.py, parity-asserted against Spark's) so a probe costs
microseconds.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
from pyspark.sql import functions as F

from lucene_spark.codec.xxhash import xxhash64

__all__ = ["build_term_bloom", "TermBloom", "load_term_bloom"]

_DIR = "term_bloom"
_META = "term_bloom_meta.json"


def build_term_bloom(reader, bits_per_term: int = 16) -> dict:
    """Build + persist the sidecar for every field. Returns the meta
    map {field: {m, k, n_terms}}. k = ln2 · bits_per_term (the optimal
    hash count; fp ≈ 0.618^bits_per_term ≈ 5e-4 at the default 16)."""
    td = reader.termdict().select("field", "term")
    counts = {r["field"]: int(r["n"]) for r in
              td.groupBy("field").agg(F.count("*").alias("n")).collect()}
    k = max(1, round(0.6931 * bits_per_term))
    # staleness fingerprint: any rebuild (compaction, addIndexes,
    # streaming publish) swaps the termdict generation name, so a
    # sidecar built against an older dictionary is detectably stale
    fingerprint = {
        "termdict_gen": (reader.manifest.get("derived") or {}).get(
            "termdict", "termdict"),
        "doc_count": reader.doc_count,
        "sum_doclen": reader.sum_doclen,
    }
    meta = {"_fingerprint": fingerprint}
    outs = []
    for fld, n in sorted(counts.items()):
        m = max(64, ((bits_per_term * n + 63) // 64) * 64)
        meta[fld] = {"m": m, "k": k, "n_terms": n}
        pos = F.explode(F.array(*[
            F.pmod(F.xxhash64(F.concat(F.col("term"), F.lit(f"#{i}"))),
                   F.lit(m))
            for i in range(k)])).alias("pos")
        words = (td.filter(F.col("field") == fld).select(pos)
                 .groupBy((F.col("pos") / 64).cast("long").alias("word_idx"))
                 .agg(F.bit_or(F.expr(
                     "shiftleft(cast(1 as bigint), "
                     "cast(pmod(pos, 64) as int))")).alias("bits"))
                 .select(F.lit(fld).alias("field"), "word_idx", "bits"))
        outs.append(words)
    if outs:
        allw = outs[0]
        for w in outs[1:]:
            allw = allw.unionByName(w)
    else:                              # empty termdict: empty sidecar
        allw = reader.spark.createDataFrame(
            [], "field string, word_idx long, bits long")
    path = os.path.join(reader.index_dir, _DIR)
    allw.write.mode("overwrite").parquet(path)
    tmp = os.path.join(reader.index_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(reader.index_dir, _META))
    return meta


class TermBloom:
    def __init__(self, meta: dict, words: dict):
        self.meta = meta
        self.words = words                   # field -> np.uint64[m/64]

    def might_contain(self, field: str, term: str) -> bool:
        fm = self.meta.get(field)
        if fm is None or field == "_fingerprint":
            return True                      # unknown field: no claim
        w = self.words[field]
        m = fm["m"]
        for i in range(fm["k"]):
            pos = xxhash64(term + f"#{i}") % m
            if not (int(w[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True


def load_term_bloom(reader) -> TermBloom | None:
    """Load the sidecar (None when never built). One small parquet read;
    the dense word arrays live on the driver."""
    mpath = os.path.join(reader.index_dir, _META)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        meta = json.load(fh)
    # STALENESS GUARD: a sidecar built against an older term dictionary
    # would fast-fail terms that now exist — a false negative. Any
    # rebuild (compaction / addIndexes / streaming publish) swaps the
    # termdict generation, so comparing the fingerprint catches it;
    # treat stale as never-built.
    fp = meta.get("_fingerprint") or {}
    cur = {
        "termdict_gen": (reader.manifest.get("derived") or {}).get(
            "termdict", "termdict"),
        "doc_count": reader.doc_count,
        "sum_doclen": reader.sum_doclen,
    }
    if fp != cur:
        return None
    fields = {f: v for f, v in meta.items() if f != "_fingerprint"}
    rows = reader.spark.read.parquet(
        os.path.join(reader.index_dir, _DIR)).collect()
    words = {f: np.zeros(fields[f]["m"] // 64, dtype=np.uint64)
             for f in fields}
    for r in rows:
        words[r["field"]][int(r["word_idx"])] = np.uint64(
            np.int64(r["bits"]).astype(np.uint64))
    return TermBloom(meta, words)
