"""Block-max (skip/impacts) metadata over a posting list.

Role analogue: Lucene's skip list + competitive impacts — per 128-doc
block, the skip entry (last docID) plus the impact pair that upper-bounds
any BM25 score inside the block:
  - skip entries: codecs/lucene84/Lucene84SkipWriter.java:48,181-217
  - impacts: codecs/CompetitiveImpactAccumulator.java:71-118,
    index/Impact.java:20-32
Lucene stores the Pareto frontier of (freq, norm) pairs; with *exact*
doclens and fixed (k1, b) the BM25 upper bound of a block is attained at
(max tf, min doclen) — a single admissible pair (score monotone increasing
in tf, decreasing in doclen). Lucene's own contract only requires the bound
to be >= the true impacts (index/Impacts.java:43-45), so this simpler bound
is valid and never changes results, only pruning effectiveness.

We do not need multi-level skip lists (MultiLevelSkipListWriter.java:53-70):
block metadata is an in-memory numpy array per posting list, so "skipping"
is O(log B) np.searchsorted on block last-docs.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene84PostingsFormat BLOCK_SIZE (ForUtil.java:32)


def build_block_meta(
    doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (block_last_doc, block_max_tf, block_min_dl) arrays, one entry
    per block of `block_size` postings (tail block included)."""
    n = doc_ids.size
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    nb = (n + block_size - 1) // block_size
    pad = nb * block_size - n
    if pad:
        doc_pad = np.concatenate([doc_ids, np.full(pad, doc_ids[-1], dtype=np.int64)])
        tf_pad = np.concatenate([tfs, np.zeros(pad, dtype=np.int64)])
        dl_pad = np.concatenate([doclens, np.full(pad, np.iinfo(np.int64).max, dtype=np.int64)])
    else:
        doc_pad, tf_pad, dl_pad = doc_ids, tfs, doclens
    doc_r = doc_pad.reshape(nb, block_size)
    tf_r = tf_pad.reshape(nb, block_size)
    dl_r = dl_pad.reshape(nb, block_size)
    return (
        doc_r[:, -1].astype(np.int64),
        tf_r.max(axis=1).astype(np.int64),
        dl_r.min(axis=1).astype(np.int64),
    )
