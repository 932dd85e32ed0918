"""Deduplication operators for large-scale corpus/training-data pipelines.

Exact dedup, MinHash+LSH, SimHash and n-gram Jaccard near-dup — the
operations a 100 TB text pipeline runs before anything else. All hashing
is computed JVM-side (xxhash64/sha2/shingles via built-in functions) or in
vectorized numpy; the only shuffles are the final hash/band groupBys.

Scale notes:
- exact dedup: one groupBy on a 64/256-bit digest — skew-free (digests
  are uniform), map-side combine applies.
- MinHash LSH: signatures via posexplode + groupBy(doc) min-agg, then
  band-bucket join; candidate pairs are bounded by bucket sizes, and giant
  buckets (boilerplate docs) are capped explicitly — the documented guard
  against quadratic blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def exact_duplicates(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Exact dedup by content digest: groups with >1 member.
    Returns (digest, n_dups, keys array<key>)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("digest"), F.col(key_col))
        .groupBy("digest")
        .agg(F.count("*").alias("n_dups"), F.sort_array(F.collect_list(key_col)).alias("keys"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_keep_first(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Keep the lowest-key row per exact-content group (deterministic)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(key_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def shingles(df: DataFrame, text_col: str, key_col: str, n: int = 3) -> DataFrame:
    """Word n-gram shingles per doc — JVM-side: split + transform over a
    sequence (no UDF). Returns (key, shingle)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return (
        df.select(F.col(key_col).alias("key"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 64) -> DataFrame:
    """MinHash signature per key via ONE-PERMUTATION HASHING (Li,
    Owen & Zhang 2012; Shrivastava & Li densification): ONE xxhash64
    per shingle (vs num_hashes evaluations in vanilla minhash — the
    dominant CPU of this operator at 100 TB), binned by its top
    log2(num_hashes) bits, per-bin minima in ONE map-side-combined
    groupBy, then rotation densification (an empty bin borrows the next
    non-empty bin circularly, offset per hop so borrowed values stay
    distinct) in a vectorized Arrow-batched UDF over the SIGNATURE rows
    (docs, not shingles — ~1000x smaller). Statistically equivalent to
    vanilla minhash for LSH banding; tests/test_relational.py pins 100%
    recall vs exact Jaccard on the fixture.

    num_hashes must be a power of two. Returns (key, sig array<long>)."""
    bits = num_hashes.bit_length() - 1
    if 1 << bits != num_hashes:
        raise ValueError("num_hashes must be a power of two")
    h = F.xxhash64("shingle")
    b = F.shiftrightunsigned(h, 64 - bits).cast("int")
    # bin on the TOP bits, store the LOW 53 bits — every stored value is
    # exactly representable in the densify pass's float64 matrix, so the
    # NaN-based rotation is bit-exact (no mantissa rounding)
    hv = h.bitwiseAND(F.lit((1 << 53) - 1))
    g = (
        sh.select("key", b.alias("b"), hv.alias("h"))
        .groupBy("key")
        .agg(*[F.min(F.when(F.col("b") == i, F.col("h"))).alias(f"m{i}")
               for i in range(num_hashes)])
        .select("key", F.array(*[F.col(f"m{i}")
                                 for i in range(num_hashes)]).alias("raw"))
    )

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def densify(raw: pd.Series) -> pd.Series:
        mat = np.array([np.array(a, dtype=np.float64) for a in raw])
        if mat.size == 0:
            return pd.Series([], dtype=object)
        k = mat.shape[1]
        offset = float(1 << 40)          # per-hop disambiguation step
        for s_ in range(1, k):
            empty = np.isnan(mat)
            if not empty.any():
                break
            cand = np.roll(mat, -s_, axis=1) + s_ * offset
            mat = np.where(empty, cand, mat)
        # all-empty rows impossible (a key exists only with >=1 shingle)
        return pd.Series([np.asarray(row, dtype=np.int64) for row in mat])

    return g.select("key", densify("raw").alias("sig"))


def minhash_lsh_pairs(
    sig: DataFrame, bands: int = 16, rows_per_band: int = 4, max_bucket: int = 50
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.
    Buckets larger than max_bucket are dropped (boilerplate guard — at
    100 TB a license-header bucket would otherwise go quadratic).
    Returns distinct (key_a, key_b) with key_a < key_b."""
    band_hashes = F.array(*[
        F.xxhash64(F.concat_ws(",", *[F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                      for r in range(rows_per_band)]), F.lit(b))
        for b in range(bands)
    ])
    buckets = sig.select("key", F.posexplode(band_hashes).alias("band", "bh"))
    sized = buckets.groupBy("band", "bh").agg(
        F.count("*").alias("sz"), F.sort_array(F.collect_list("key")).alias("ks")
    ).filter((F.col("sz") > 1) & (F.col("sz") <= max_bucket))
    pairs = sized.select(
        F.explode(
            F.filter(
                F.flatten(F.transform("ks", lambda a: F.transform("ks", lambda b: F.struct(a.alias("key_a"), b.alias("key_b"))))),
                lambda s: s["key_a"] < s["key_b"],
            )
        ).alias("p")
    ).select("p.key_a", "p.key_b").distinct()
    return pairs


def exact_jaccard_pairs(
    df: DataFrame, text_col: str, key_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs: candidate pairs = docs sharing
    ≥1 shingle (complete — any pair with jaccard > 0 shares a shingle),
    then |A∩B|/|A∪B| over distinct shingle sets. All JVM-side; the shingle
    self-join is the only shuffle. This is the small/medium-scale exact
    path; at 100 TB run minhash_lsh_pairs first and jaccard_verify after.
    Returns (key_a, key_b, jaccard) with key_a < key_b, jaccard ≥ threshold."""
    sh = shingles(df, text_col, key_col, n)
    sizes = sh.groupBy("key").agg(F.count("*").alias("sz"))
    inter = (
        sh.withColumnRenamed("key", "key_a")
        .join(sh.withColumnRenamed("key", "key_b"), "shingle")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("key").alias("key_a"), F.col("sz").alias("sz_a")), "key_a")
        .join(sizes.select(F.col("key").alias("key_b"), F.col("sz").alias("sz_b")), "key_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (verification pass):
    |A∩B| / |A∪B| via two joins + counts. Returns pairs ≥ threshold."""
    sizes = sh.groupBy("key").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("key").alias("key_a"), "shingle")
    b = sh.select(F.col("key").alias("key_b"), F.col("shingle").alias("shingle"))
    inter = (
        pairs.join(a, "key_a").join(b, ["key_b", "shingle"])
        .groupBy("key_a", "key_b").agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("key", "key_a").withColumnRenamed("sz", "sz_a"), "key_a")
        .join(sizes.withColumnRenamed("key", "key_b").withColumnRenamed("sz", "sz_b"), "key_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )
    return out


def simhash(df: DataFrame, text_col: str, key_col: str, bits: int = 64) -> DataFrame:
    """SimHash fingerprint per doc — 100% JVM-side (no Python in the hot
    path): tokens exploded, hashed with xxhash64, then per-bit ±1 sums as
    `bits` aggregate expressions in ONE groupBy (map-side combined); the
    sign vector reassembles into a long via bitwise OR of shifted bits.
    Token multiplicity counts (each occurrence votes), matching the
    classic SimHash definition. Docs with no tokens get simhash 0.
    Returns (key, simhash long)."""
    tok = (
        df.select(F.col(key_col).alias("key"),
                  F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    h = tok.select("key", F.xxhash64("tok").alias("h"))
    aggs = [
        F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1))
        .alias(f"s{b}")
        for b in range(bits)
    ]
    g = h.groupBy("key").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"s{b}") > 0,
                   F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long")))
    out = g.select("key", sig.alias("simhash"))
    # keep every input row (empty docs → 0), like a norms column would
    keys = df.select(F.col(key_col).alias("key"))
    return (keys.join(out, "key", "left")
            .select("key", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash")))


def simhash_sha(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """SimHash with sha256-derived token hashes — the externally
    reproducible twin of simhash() (xxhash64 is the scale path; identical
    plan shape). Token hash = first 64 bits of sha256(token) hex, split
    into two 32-bit halves so every engine can parse it without unsigned
    64-bit arithmetic: bits 0..31 from hex[9:16] (lo), 32..63 from
    hex[1:8] (hi). Same ±1 bit-vote + sign assembly, all JVM-side."""
    tok = (
        df.select(F.col(key_col).alias("key"),
                  F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    hexh = F.sha2(F.col("tok"), 256)
    h = tok.select(
        "key",
        F.conv(F.substring(hexh, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(hexh, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    aggs = []
    for b in range(64):
        src = F.col("lo") if b < 32 else F.col("hi")
        sh = b if b < 32 else b - 32
        aggs.append(F.sum(
            F.when(F.shiftright(src, sh).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}"))
    g = h.groupBy("key").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"s{b}") > 0,
                   F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long")))
    out = g.select("key", sig.alias("simhash"))
    keys = df.select(F.col(key_col).alias("key"))
    return (keys.join(out, "key", "left")
            .select("key", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash")))


def duplicate_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs — the training-data
    primitive behind "keep ONE doc per duplicate cluster" (pair lists
    alone under-delete: A~B and B~C must collapse A,B,C together even
    when A~C missed the similarity cut).

    Algorithm: iterative min-label propagation (the Spark-standard CC
    shape; equivalent to the large-star step of Kiveris et al.
    "Connected Components in MapReduce and Beyond", SOCC'14): every key
    starts labeled with itself; each round every key takes the min of
    its own and its neighbors' labels; converges in O(component
    diameter) rounds. Near-dup clusters have tiny diameters (dups of a
    dup are dups), so 3-5 rounds is typical. Each round is ONE shuffle
    (edge join + groupBy-min); labels are localCheckpoint()ed every
    round to truncate the lineage — without it the plan doubles per
    iteration and the job dies at scale long before the data does.

    pairs: (key_a, key_b [, ...]) — undirected edges.
    Returns (key, cluster) for every key that appears in a pair, with
    cluster = min key of its component. Singletons (docs in no pair)
    are their own cluster by definition and are simply absent."""
    edges = (pairs.select(F.col("key_a").alias("a"), F.col("key_b").alias("b"))
             .unionByName(pairs.select(F.col("key_b").alias("a"),
                                       F.col("key_a").alias("b")))
             .distinct())
    labels = edges.select(F.col("a").alias("key")).distinct() \
                  .withColumn("cluster", F.col("key"))
    for _ in range(max_iter):
        # neighbor labels: for key a, the labels of every neighbor b
        nbr = (edges.join(labels.withColumnRenamed("key", "b"), "b")
               .groupBy("a").agg(F.min("cluster").alias("nbr_min")))
        new_labels = (labels.join(nbr.withColumnRenamed("a", "key"),
                                  "key", "left")
                      .select("key",
                              F.least(F.col("cluster"),
                                      F.coalesce(F.col("nbr_min"),
                                                 F.col("cluster")))
                              .alias("cluster")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "key")
                   .filter(F.col("n.cluster") != F.col("o.cluster")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_representative(
    df: DataFrame, clusters: DataFrame, key_col: str,
    quality_col: str | None = None,
) -> DataFrame:
    """Keep one row per duplicate cluster: the highest-`quality_col` row
    (ties → min key), or min key when no quality column is given. Rows
    absent from `clusters` are singletons and always kept."""
    withc = df.join(clusters.withColumnRenamed("key", key_col), key_col, "left") \
              .withColumn("__c", F.coalesce(F.col("cluster"), F.col(key_col)))
    order = ([F.col(quality_col).desc()] if quality_col else []) + \
        [F.col(key_col).asc()]
    w = Window.partitionBy("__c").orderBy(*order)
    return (withc.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__c", "__rn", "cluster"))


def duplicate_spans(df: DataFrame, text_col: str, key_col: str,
                    min_len: int = 50) -> DataFrame:
    """Exact substring deduplication (the ExactSubstr operator of Lee et
    al., "Deduplicating Training Data Makes Language Models Better" —
    no Lucene analogue): find every maximal token span that is part of a
    substring of ≥ min_len tokens occurring at least twice in the corpus
    (any second occurrence counts, including within the same document).

    Identity that makes it distributed: a position lies inside a
    duplicated substring of length ≥ L  ⟺  it is covered by some
    corpus-duplicated L-gram (every length-≥L duplicate's L-grams are
    duplicated; a duplicated L-gram IS a length-L duplicate). So the
    removal set is exactly the merged union of [start, start+L) windows
    of L-grams with corpus count ≥ 2.

    Scale shape: narrow L-gram generation (transform over token arrays,
    no shuffle), ONE map-side-combined count shuffle keyed by the gram
    text (exact strings — no hash-collision false positives), one
    semi-join of occurrences against the duplicated-gram set, then a
    per-document sort + single-pass interval merge executed as an
    `aggregate` lambda over the sorted start array — JVM expressions
    throughout, no per-position explosion (a covered gram contributes
    one array element, not L rows), no UDF, no driver state.

    Returns (key_col, span_start, span_end): merged half-open token
    intervals, tokens being the whitespace tokens of ``text_col``."""
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = int(min_len)
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: F.length(x) > 0)
    grams = (df
             .withColumn("__toks", toks)
             .withColumn("__grams", F.expr(
                 # greatest(..., 0): docs shorter than L tokens have no
                 # L-grams; a negative slice length is a runtime error
                 f"transform(slice(__toks, 1,"
                 f"  greatest(size(__toks) - {L - 1}, 0)),"
                 f" (x, i) -> array_join(slice(__toks, i + 1, {L}), ' '))"))
             .select(F.col(key_col),
                     F.posexplode("__grams").alias("pos", "gram")))
    dup = (grams.groupBy("gram").agg(F.count("*").alias("__c"))
           .filter(F.col("__c") >= 2).select("gram"))
    occ = grams.join(dup, "gram", "left_semi")
    starts = F.array_sort(F.collect_list("pos"))
    empty = F.expr("CAST(array() AS array<struct<s:int,e:int>>)")
    merged = F.aggregate(
        starts, empty,
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (x <= F.element_at(acc, -1).getField("e")),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1).getField("s").alias("s"),
                    F.greatest(F.element_at(acc, -1).getField("e"),
                               x + F.lit(L)).alias("e")))),
        ).otherwise(
            F.concat(acc, F.array(F.struct(
                x.alias("s"), (x + F.lit(L)).alias("e"))))))
    return (occ.groupBy(key_col)
            .agg(merged.alias("__spans"))
            .select(F.col(key_col), F.explode("__spans").alias("__sp"))
            .select(key_col,
                    F.col("__sp.s").alias("span_start"),
                    F.col("__sp.e").alias("span_end")))


def strip_duplicate_spans(df: DataFrame, text_col: str, key_col: str,
                          min_len: int = 50) -> DataFrame:
    """Remove every duplicated span found by `duplicate_spans` — the cut
    step of ExactSubstr dedup. Returns (key_col, text_clean) for every
    input document (docs that were entirely duplicated text get an empty
    string — callers typically drop those). Reassembly mirrors
    line_dedup: anti-join of token positions against the covered set,
    order restored with array_sort — no UDF."""
    spans = duplicate_spans(df, text_col, key_col, min_len=min_len)
    covered = spans.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("span_start"),
                             F.col("span_end") - 1)).alias("pos"))
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: F.length(x) > 0)
    positions = df.select(
        F.col(key_col),
        F.posexplode(toks).alias("pos", "tok"))
    kept = positions.join(covered, [key_col, "pos"], "left_anti")
    return (kept.groupBy(key_col)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.getField("tok")),
                " ").alias("text_clean"))
            .join(df.select(key_col), key_col, "right")
            .fillna({"text_clean": ""}))


def line_dedup(df: DataFrame, text_col: str, key_col: str,
               min_docs: int = 2, min_line_len: int = 0) -> DataFrame:
    """C4-style boilerplate line removal (training-data op; the
    three-sentence-dedup rule of the C4 pipeline, no Lucene analogue):
    a LINE occurring in ≥ min_docs distinct documents is boilerplate
    (nav bars, license footers, cookie banners) and is dropped from
    every document; lines shorter than min_line_len are kept as-is
    (too short to be meaningful boilerplate). Returns (key, text_clean)
    for documents with ≥1 surviving line, lines rejoined in original
    order.

    Scale shape: one map-side-combined count-distinct shuffle keyed by
    the line text, one shuffle-join of the exploded lines against the
    (small) boilerplate set, one per-doc re-aggregation; order is
    restored with array_sort over (pos, line) structs — all JVM
    expressions, no UDF, no driver collection."""
    lines = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    boiler = (
        lines.filter(F.length("line") >= min_line_len)
        .groupBy("line")
        .agg(F.countDistinct(key_col).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    return (
        kept.groupBy(key_col)
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line")),
            "\n").alias("text_clean"))
    )
