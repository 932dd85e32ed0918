"""Byte-pair-encoding tokenizer training and encoding over a corpus —
the tokenizer-training primitive of a training-data pipeline (BPE per
Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — a public algorithm; the reference engine's analysis
chains stop at stemming, so this extends the §2.2 analysis surface the
way a 100 TB pretraining pipeline needs).

Scale shape: the corpus collapses to a WORD-FREQUENCY table in one
shuffle (distinct words ≪ corpus — the standard trick every BPE trainer
uses); every merge iteration is then

  pair counts  = explode adjacent symbol pairs weighted by word count
                 → groupBy(pair).sum (map-side combinable, one shuffle
                 over the word table, never the corpus)
  best pair    = top-1 by (count desc, left asc, right asc) — ties pinned
                 lexicographically (public implementations tie-break by
                 insertion order, which is not reproducible across
                 engines; we document the divergence)
  apply        = greedy left-to-right merge per word, a NARROW
                 mapInPandas over the dictionary-sized word table

`local=True` collects the word table (bounded by distinct words) and
trains in-process with DELTA COUNTING (the fastBPE/Sennrich trick: a
pair→words inverted index; each merge touches only the words containing
the merged pair, so K merges cost O(affected symbols), not O(K·V)) —
producing byte-identical merges to the naive loop (tested). This is how
production BPE trainers run at 100 TB: the CORPUS pass (word counting)
is the distributed part; training is dictionary-scale. `local="auto"`
(the default) collects when the distinct-word count fits
`max_local_words` and falls back to the distributed per-merge loop
(2 Spark jobs per merge — the documented bound) only beyond it.

Encoding applies the merge list in rank order greedily per DISTINCT
word (dictionary-scale work), then joins tokens back to documents — the
cost is O(distinct words × merges) regardless of corpus size.

Symbols are the word's characters plus a standalone end-of-word marker
symbol (Sennrich's '</w>', kept as ONE list element so it never
collides with character symbols).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def _words(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )


def _greedy_merge(syms: list[str], left: str, right: str) -> list[str]:
    """One greedy left-to-right merge pass (the BPE apply step)."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_rounds(pairs_of, apply_merge, num_merges: int,
                  min_pair_count: int) -> list[tuple[str, str, int]]:
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = pairs_of()
        if best is None or best[2] < min_pair_count:
            break
        merges.append(best)
        apply_merge(best[0], best[1])
    return merges


def _train_local_delta(tab: list[tuple[list[str], int]], num_merges: int,
                       min_pair_count: int) -> list[tuple[str, str, int]]:
    """Delta-counting in-memory BPE training (fastBPE-style): maintain
    pair counts plus a pair→word-indexes inverted index; each merge
    re-counts ONLY the words that contain the merged pair. Byte-identical
    to recount-everything training (path-identity tested) at
    O(affected symbols) per merge instead of O(dictionary)."""
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}

    def add_word(i: int, sign: int) -> None:
        syms, cnt = tab[i]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            counts[p] = counts.get(p, 0) + sign * cnt
            if sign > 0:
                where.setdefault(p, set()).add(i)
        if sign < 0:
            for a, b in zip(syms, syms[1:]):
                p = (a, b)
                s = where.get(p)
                if s is not None:
                    s.discard(i)
                if counts.get(p) == 0:
                    counts.pop(p, None)
                    where.pop(p, None)

    for i in range(len(tab)):
        add_word(i, +1)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((l, r, c))
        touched = list(where.get((l, r), ()))
        for i in touched:
            add_word(i, -1)                       # retract old pair counts
            syms, cnt = tab[i]
            tab[i] = (_greedy_merge(syms, l, r), cnt)
        for i in touched:
            add_word(i, +1)                       # add the merged form's
        # the merged pair may survive with count 0 bookkeeping residue
        if counts.get((l, r)) == 0:
            counts.pop((l, r), None)
            where.pop((l, r), None)
        # drop stale membership: words that no longer hold a pair keep a
        # set entry; add_word(-1) already pruned zero-count pairs, and a
        # stale index entry is harmless (retract/re-add is idempotent)
    return merges


def bpe_train(df: DataFrame, text_col: str, num_merges: int,
              min_pair_count: int = 2, word_limit: int | None = None,
              local: bool | str = "auto", eow: str = EOW,
              max_local_words: int = 2_000_000) -> list[tuple[str, str, int]]:
    """Train `num_merges` BPE merges on the corpus; returns
    [(left, right, pair_count), ...] in rank order. `word_limit` keeps
    only the top-N words by (count desc, word asc) before training (the
    standard dictionary truncation for web-scale corpora).

    `local` — "auto" (default): collect the word table and train
    in-process with delta counting when the distinct-word count fits
    `max_local_words` (the production shape: one distributed corpus
    pass, dictionary-scale training); True forces collection; False
    forces the distributed per-merge loop (2 Spark jobs per merge —
    correct at any dictionary size, priced for small merge counts)."""
    words = _words(df, text_col)
    if word_limit is not None:
        words = (words.orderBy(F.col("cnt").desc(), F.col("word").asc())
                 .limit(int(word_limit)))

    if local == "auto":
        n_words = words.count()
        local = n_words <= max_local_words

    if local:
        rows = words.collect()
        tab = [(list(r["word"]) + [eow], int(r["cnt"])) for r in rows]
        return _train_local_delta(tab, num_merges, min_pair_count)

    syms = words.withColumn(
        "syms", F.concat(F.split("word", ""), F.array(F.lit(eow)))
    ).select("cnt", "syms").persist()
    syms.count()
    state = {"syms": syms}

    def pairs_of():
        cur = state["syms"]
        pairs = (
            cur.withColumn("a", F.expr("slice(syms, 1, size(syms)-1)"))
            .withColumn("b", F.expr("slice(syms, 2, size(syms)-1)"))
            .select("cnt", F.explode(F.arrays_zip("a", "b")).alias("p"))
            .select("cnt", F.col("p.a").alias("l"), F.col("p.b").alias("r"))
            .groupBy("l", "r").agg(F.sum("cnt").alias("c"))
        )
        row = pairs.orderBy(F.col("c").desc(), F.col("l").asc(),
                            F.col("r").asc()).head()
        return (row["l"], row["r"], int(row["c"])) if row else None

    def apply_merge(l, r):
        cur = state["syms"]

        def run(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [ _greedy_merge(list(s), l, r)
                                for s in pdf["syms"] ]
                yield pdf

        nxt = cur.mapInPandas(run, "cnt long, syms array<string>").persist()
        nxt.count()
        cur.unpersist()
        state["syms"] = nxt

    try:
        return _train_rounds(pairs_of, apply_merge, num_merges, min_pair_count)
    finally:
        state["syms"].unpersist()


def bpe_encode(df: DataFrame, text_col: str, key_col: str,
               merges: list[tuple[str, str, int]] | list[tuple[str, str]],
               eow: str = EOW) -> DataFrame:
    """Tokenize each document with a trained merge list: merges applied
    in rank order, each greedily left-to-right (identical to how
    training saw the words). Work is per DISTINCT word (mapInPandas over
    the dictionary), joined back positionally — corpus-size-independent
    apart from the word join. Returns (key, tokens array<string>)."""
    ms = [(m[0], m[1]) for m in merges]

    wd = (df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
          .filter(F.col("word") != "").distinct())

    def run(batches):
        for pdf in batches:
            toks = []
            for w in pdf["word"]:
                syms = list(w) + [eow]
                for l, r in ms:
                    syms = _greedy_merge(syms, l, r)
                toks.append(syms)
            pdf = pdf.copy()
            pdf["toks"] = toks
            yield pdf

    wtok = wd.mapInPandas(run, "word string, toks array<string>")
    exploded = (
        df.select(F.col(key_col).alias("key"),
                  F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+"))
                  .alias("pos", "word"))
        .filter(F.col("word") != "")
    )
    encoded = (
        exploded.join(wtok, "word")
        .groupBy("key")
        .agg(F.flatten(F.array_sort(F.collect_list(F.struct("pos", "toks")))
                       .getField("toks")).alias("tokens"))
    )
    # Empty / whitespace-only documents have no exploded rows and would
    # vanish from the keyed output; left-join the key universe back so
    # every input doc survives with tokens = [] (same convention as
    # perceptron_classify's zero-token handling).
    keys = df.select(F.col(key_col).alias("key")).distinct()
    return keys.join(encoded, "key", "left").select(
        "key",
        F.coalesce(F.col("tokens"),
                   F.array().cast("array<string>")).alias("tokens"))
