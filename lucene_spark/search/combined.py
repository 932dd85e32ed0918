"""CombinedFieldQuery (BM25F) — the sandbox combined-field scorer.

Reference: lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
CombinedFieldQuery.java — treats a set of terms across a set of weighted
fields as if they had been indexed as ONE term in ONE synthetic field
(the "simple BM25F" of Robertson/Zaragoza):

  pseudo term stats       df  = max over (field, term) of df
                          ttf = max(1, Σ w_f · ttf(f, t))
                          (CombinedFieldWeight ctor, CombinedFieldQuery.java:286-311)
  pseudo collection stats docCount = max_f docCount(f)
                          sumTTF   = Σ_f w_f · sumTTF(f)
                          (mergeCollectionStatistics, CombinedFieldQuery.java:317-334)
  per-doc freq            Σ over matching (field, term) of w_f · tf
                          (WeightedDisiWrapper.freq / CombinedFieldScorer,
                          CombinedFieldQuery.java:425-470)
  per-doc doclen          Σ_f w_f · dl_f from the per-field norms sidecar.
                          The reference re-encodes round(Σ w·len) through the
                          lossy byte4 table (MultiNormsLeafSimScorer.java:128-139);
                          this engine is the lossy-norm-free EXACT variant
                          throughout (per the engine-wide norms contract), so
                          the weighted sum is used unrounded.

Field weights must be ≥ 1 (Builder.addField contract,
CombinedFieldQuery.java:116-120). Any registered similarity with the
additive-norm shape works (the reference requires SimilarityBase-style
norms — BM25, DFR, IB; CombinedFieldQuery.java:80-86).

Spark shape (scale path): bucket-pruned postings scan for the
(field, term) set → vectorized vbyte decode in mapInPandas → JVM-side
weighted-freq aggregation (map-side combined) → join with the docstats
norms sidecar on doc_id (both sides can be large at scale; AQE picks the
join strategy) → Arrow-batched float32 scoring. No driver-side collection
of any unbounded set.
"""

from __future__ import annotations

from typing import Iterator, Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.codec.vbyte import delta_decode, vbyte_decode


def _decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Posting rows → exploded (field, doc_id, tf); vectorized per row."""
    for pdf in batches:
        if not len(pdf):
            continue
        fields: list[np.ndarray] = []
        docs: list[np.ndarray] = []
        tfs: list[np.ndarray] = []
        for fld, dblob, tblob in zip(pdf["field"], pdf["doc_blob"], pdf["tf_blob"]):
            d = delta_decode(vbyte_decode(bytes(dblob)))
            t = vbyte_decode(bytes(tblob))
            docs.append(d)
            tfs.append(t)
            fields.append(np.repeat(np.array([fld], dtype=object), d.size))
        yield pd.DataFrame({
            "field": np.concatenate(fields),
            "doc_id": np.concatenate(docs),
            "tf": np.concatenate(tfs).astype(np.int64),
        })


def combined_field_matches(
    searcher,
    terms: Sequence[str],
    fields: Mapping[str, float],
    boost: float = 1.0,
) -> DataFrame:
    """All matching (doc_id, score float32) rows for a CombinedFieldQuery.

    `terms` are raw index terms (the reference's Builder.addTerm takes
    bytes, not analyzed text). `fields` maps field name → weight ≥ 1.
    """
    reader = searcher.reader
    sim = searcher.sim
    fields = dict(fields)
    if not fields or not terms:
        return searcher._empty_result()
    for f, w in fields.items():
        if w < 1:
            # Builder.addField: "weight must be greater or equal to 1"
            raise ValueError(f"combined-field weight for {f!r} must be >= 1, got {w}")
        if f not in reader.field_by_name:
            raise ValueError(f"unknown field {f!r}; index has "
                             f"{sorted(reader.field_by_name)}")

    pairs = [(f, t) for f in sorted(fields) for t in dict.fromkeys(terms)]
    stats = reader.term_stats(pairs)  # (field, term) -> (df, cf); absent if df=0
    if not stats:
        return searcher._empty_result()
    df_pseudo = max(df for df, _ in stats.values())
    ttf_pseudo = max(1.0, sum(fields[f] * cf for (f, _), (_, cf) in stats.items()))

    doc_count = max(searcher._field_N(f)[0] for f in fields)
    sum_ttf = sum(fields[f] * searcher._field_N(f)[1] for f in fields)
    avgdl = np.float32(sum_ttf / float(doc_count))
    weight = sim.weight(df_pseudo, doc_count, boost,
                        cf=int(ttf_pseudo), sum_ttf=int(sum_ttf))

    post = reader.postings_for_terms([p for p in pairs if p in stats]).select(
        "field", "doc_blob", "tf_blob")
    decoded = post.mapInPandas(_decode_partition,
                               schema="field string, doc_id long, tf long")
    wmap = F.create_map(*[F.lit(x) for f in sorted(fields)
                          for x in (f, float(fields[f]))])
    freq = (
        decoded.withColumn("wtf", wmap[F.col("field")] * F.col("tf"))
        .groupBy("doc_id")
        .agg(F.sum("wtf").alias("freq"))
    )

    ds = reader.docstats()
    field_order = [f["name"] for f in reader.fields]
    if len(field_order) == 1:
        # single-field index: doclen IS the field length (no sidecar column)
        dlc = F.lit(float(fields[field_order[0]])) * F.col("doclen")
    else:
        if "field_lens" not in ds.columns:
            raise ValueError(
                "index has no per-field norms sidecar (field_lens) — built "
                "before combined-field support; rebuild to use combined_field")
        dlc = None
        for f, w in fields.items():
            term = F.lit(float(w)) * F.element_at(
                F.col("field_lens"), field_order.index(f) + 1)
            dlc = term if dlc is None else (dlc + term)
    cand = freq.join(ds.select("doc_id", dlc.cast("double").alias("dlc")), "doc_id")
    cand = searcher._mask_deleted(cand)

    @F.pandas_udf("float")
    def _score(fr: pd.Series, dl: pd.Series) -> pd.Series:
        s = sim.score(fr.to_numpy(np.float64), dl.to_numpy(np.float64),
                      weight, avgdl)
        return pd.Series(np.asarray(s, dtype=np.float32))

    return cand.select("doc_id", _score("freq", "dlc").alias("score"))
