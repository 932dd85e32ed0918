"""Term vectors — the per-document mini inverted index.

Role analogue: lucene/core/.../codecs/TermVectorsWriter.java and the
TermVectorsFormat: for each document, the list of its (term, tf,
positions) entries, used for MoreLikeThis, highlighting and
"explain this doc" flows without re-analysis.

Spark-first: a derived DataFrame (key, term, tf, positions) produced by
the SAME vectorized analyzer chain the index build uses (one mapInPandas
over Arrow batches; flattened-numpy inversion, no per-row Python), or its
nested form (key, tv: array<struct<term, tf, positions>>). At 100 TB this
is a column you materialize next to the corpus once — no shuffle at all
(purely map-side), partitioned like the source.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.analysis import get_analyzer


def term_vectors(df: DataFrame, text_col: str, key_col: str,
                 analyzer: str = "whitespace") -> DataFrame:
    """Flat term-vector rows: (key, term, tf, positions array<int>).
    Positions use the analyzer's position semantics (stop-filter gaps
    preserved, like the index build)."""
    an = get_analyzer(analyzer)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            toks, poss = an.tokenize_with_positions(pdf[text_col])
            keys_out, terms_out, tfs_out, pos_out = [], [], [], []
            for key, ts, ps in zip(pdf[key_col], toks, poss):
                if not ts:
                    continue
                arr = np.asarray(ts, dtype=object)
                codes, uniq = pd.factorize(arr, sort=True)
                ps = np.asarray(ps, dtype=np.int64)
                for ui, term in enumerate(uniq):
                    sel = ps[codes == ui]
                    keys_out.append(key)
                    terms_out.append(term)
                    tfs_out.append(int(sel.size))
                    pos_out.append(sorted(int(x) for x in sel))
            yield pd.DataFrame({"key": keys_out, "term": terms_out,
                                "tf": tfs_out, "positions": pos_out})

    key_type = df.schema[key_col].dataType.simpleString()
    return df.select(key_col, text_col).mapInPandas(
        run, f"key {key_type}, term string, tf int, positions array<int>")


def term_vectors_nested(df: DataFrame, text_col: str, key_col: str,
                        analyzer: str = "whitespace") -> DataFrame:
    """Nested form: one row per doc with tv = array<struct<term, tf,
    positions>> sorted by term — the shape a stored term-vector column
    takes next to the corpus table."""
    flat = term_vectors(df, text_col, key_col, analyzer)
    return (
        flat.groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct("term", "tf", "positions")))
             .alias("tv"))
    )


def term_vectors_with_offsets(df: DataFrame, text_col: str, key_col: str,
                              analyzer: str = "whitespace") -> DataFrame:
    """Offset-bearing term vectors — the storeTermVectorOffsets channel
    (TermVectorsWriter with FieldType.setStoreTermVectorOffsets(true)):
    per document, the ORDERED token stream with character offsets into
    the stored text, as parallel arrays (key, tv_terms, tv_starts,
    tv_ends). Built once at index time by the same offset-aware
    tokenization FVH would otherwise run per query
    (search/fvh.tokens_with_offsets); query-time highlighting then reads
    the arrays (fvh_highlight_from_vectors) — no re-analysis, exactly
    FieldTermStack's contract. Purely map-side, partitioned like the
    source."""
    from lucene_spark.search.fvh import tokens_with_offsets

    an = get_analyzer(analyzer)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, terms, starts, ends = [], [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                toks = tokens_with_offsets(text, an) \
                    if isinstance(text, str) and text else []
                keys.append(key)
                terms.append([t for t, _, _ in toks])
                starts.append([s for _, s, _ in toks])
                ends.append([e for _, _, e in toks])
            yield pd.DataFrame({"key": keys, "tv_terms": terms,
                                "tv_starts": starts, "tv_ends": ends})

    key_type = df.schema[key_col].dataType.simpleString()
    return df.select(key_col, text_col).mapInPandas(
        run, f"key {key_type}, tv_terms array<string>, "
             "tv_starts array<int>, tv_ends array<int>")
