"""Index invariant verification — the CheckIndex analogue.

Role analogue: index/CheckIndex.java:80 — validates postings ordering,
stat consistency and checksums for every segment. Restated as DataFrame
assertions (SURVEY.md §5.2 item 3):

  1. per (term, part, slice): doc_ids strictly increasing,
     local_df == len(doc_ids), local_cf == Σ tf
  2. termdict df/cf == Σ over partition rows
  3. fieldstats: doc_count == docstats rows; sum_doclen == Σ doclen;
     Σ cf over termdict == sum_doclen (every token counted exactly once)
  4. doc_ids unique; every posted doc exists in docstats
  5. sha256(content) invariant vs the source table (end-to-end content
     integrity, BASELINE.json input_hint)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.codec.vbyte import vbyte_decode, delta_decode
from lucene_spark.index.reader import IndexReader


def check_index(reader: IndexReader, source: DataFrame | None = None, content_col: str = "content") -> dict:
    """Raises AssertionError on any violated invariant; returns stats."""
    post = reader.postings()
    td = reader.termdict()
    ds = reader.docstats()
    block_size = int(reader.manifest["config"].get("block_size", 128))

    # 1. decode-level invariants, distributed via mapInPandas
    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bad = 0
        rows = 0
        for pdf in batches:
            has_pos = "pos_blob" in pdf.columns
            for r in pdf.itertuples(index=False):
                docs = delta_decode(vbyte_decode(r.doc_blob))
                tfs = vbyte_decode(r.tf_blob)
                dls = vbyte_decode(r.dl_blob)
                ok = (
                    docs.size == r.local_df
                    and tfs.size == r.local_df
                    and dls.size == r.local_df
                    and int(tfs.sum()) == r.local_cf
                    and (docs.size < 2 or bool(np.all(np.diff(docs) > 0)))
                    and bool(np.all(tfs >= 1))
                    # (0 + bs - 1)//bs == 0, so the empty case needs no guard
                    and len(r.block_last) ==
                    (docs.size + block_size - 1) // block_size
                )
                if ok and docs.size:
                    # block-max metadata must be an admissible bound:
                    # per block, max_tf ≥ every tf and min_dl ≤ every dl
                    # (the Impacts.java:43-45 contract CheckIndex enforces).
                    # Blocks are FIXED-size (block_size) with a short tail
                    # — the same layout the kernel's pruning reconstructs
                    # (codec/blocks.py); an equal-split reconstruction
                    # here would misalign every boundary.
                    bl = np.asarray(r.block_last, dtype=np.int64)
                    bmt = np.asarray(r.block_max_tf, dtype=np.int64)
                    bmd = np.asarray(r.block_min_dl, dtype=np.int64)
                    nb = bl.size
                    bs = block_size
                    for b in range(nb):
                        lo, hi = b * bs, min((b + 1) * bs, docs.size)
                        if hi <= lo:
                            continue
                        if not (bl[b] == docs[hi - 1]
                                and bmt[b] >= tfs[lo:hi].max()
                                and bmd[b] <= dls[lo:hi].min()):
                            ok = False
                            break
                if ok and has_pos and r.pos_blob is not None and docs.size:
                    # positions: per posting, strictly increasing, count==tf,
                    # within [0, some sane bound]
                    pos_delta = vbyte_decode(r.pos_blob)
                    if pos_delta.size != int(tfs.sum()):
                        ok = False
                    else:
                        starts = np.cumsum(tfs) - tfs
                        cs = np.cumsum(pos_delta)
                        base = cs[starts] - pos_delta[starts]
                        pos = cs - np.repeat(base, tfs)
                        # within-posting strict increase ⇔ deltas>0 except
                        # at posting starts (absolute, ≥0)
                        m = np.ones(pos_delta.size, dtype=bool)
                        m[starts] = False
                        if not (np.all(pos_delta[m] > 0) and np.all(pos[starts] >= 0)):
                            ok = False
                bad += 0 if ok else 1
                rows += 1
        yield pd.DataFrame({"rows": [rows], "bad": [bad]})

    rep = post.mapInPandas(verify, "rows long, bad long").agg(
        F.sum("rows").alias("rows"), F.sum("bad").alias("bad")
    ).collect()[0]
    assert rep["bad"] == 0, f"{rep['bad']} corrupt posting rows"

    # 2. termdict consistency (terms are (field, term) pairs)
    agg = post.groupBy("field", "term").agg(
        F.sum("local_df").alias("df2"), F.sum("local_cf").alias("cf2")
    )
    mism = (
        td.join(agg, ["field", "term"], "full")
        .filter((F.col("df") != F.col("df2")) | (F.col("cf") != F.col("cf2"))
                | F.col("df").isNull() | F.col("df2").isNull())
        .count()
    )
    assert mism == 0, f"{mism} termdict rows disagree with postings"

    # 3. fieldstats
    stats = ds.agg(F.count("*").alias("n"), F.sum("doclen").alias("s")).collect()[0]
    assert int(stats["n"]) == reader.doc_count
    assert int(stats["s"] or 0) == reader.sum_doclen
    cf_sum = td.agg(F.sum("cf")).collect()[0][0] or 0
    assert int(cf_sum) == reader.sum_doclen, "Σcf != Σdoclen"

    # 4. doc_id uniqueness
    dup = ds.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    assert dup == 0, f"{dup} duplicate doc_ids"

    out = {"posting_rows": int(rep["rows"]), "docs": reader.doc_count,
           "terms": td.count(), "sum_doclen": reader.sum_doclen}

    # 5. sha256 end-to-end invariant
    if source is not None:
        src_hash = source.select(F.sha2(F.col(content_col), 256).alias("h"))
        idx_hash = ds.select(F.col("sha256").alias("h"))
        diff = src_hash.exceptAll(idx_hash).count() + idx_hash.exceptAll(src_hash).count()
        assert diff == 0, "sha256(content) multiset mismatch vs source"
        out["sha256_ok"] = True
    return out
