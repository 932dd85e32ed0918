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
`max_local_words`.

`local=False` (word table beyond driver RAM) now runs DISTRIBUTED
DELTA training (r5, VERDICT r4 item 7): pair COUNTS live on the driver
(pair TYPES ≪ words — the reference-style in-RAM stats bound, like the
tagger's dictionary cap), the word table stays partitioned, and merges
commit in OPTIMISTIC BATCHES of `batch_merges`:

  1. candidates = top-B pairs of the driver counts (rank order)
  2. ONE job applies the candidates sequentially inside every
     partition through the same pair→words inverted index the local
     trainer uses (only affected words are touched) and emits the
     per-step count DELTAS (small: pairs touched per step)
  3. the driver VALIDATES the batch exactly: replaying the deltas,
     candidate i must still be the argmax (count desc, pair asc) when
     its turn comes — a merge that created a better pair, or deflated
     a later candidate, truncates the batch to the longest valid
     prefix (exactness is never sacrificed; misprediction only costs
     a shorter batch)
  4. a fully-valid batch's merged table came out of the SAME job (tag
     rows); only a truncated batch pays one extra map-only apply

so K merges cost ~2·R jobs where R is the round count (R → K/B on
flat-tailed corpora where batches validate; R → K on adversarially
chained ones — exactness is the invariant, batching the optimization),
byte-identical to the sequential trainer (path-identity tested against
both the local delta trainer and the naive recount loop). Batch size
adapts AIMD-style between rounds.

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


def _apply_batch_with_deltas(tab: list[tuple[list[str], int]],
                             seq: list[tuple[str, str]]):
    """Apply a merge sequence to a word table through the pair→words
    inverted index (only affected words touched), recording the pair
    count DELTA of every step. Returns (deltas, tab) where deltas[i] is
    {pair: delta} for step i. The per-word work is byte-identical to
    _train_local_delta's — this is the same delta trick, parameterized
    by an externally chosen merge sequence (the distributed batch)."""
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, _) in enumerate(tab):
        for a, b in zip(syms, syms[1:]):
            where.setdefault((a, b), set()).add(i)

    deltas: list[dict] = []
    for l, r in seq:
        d: dict[tuple[str, str], int] = {}
        touched = list(where.get((l, r), ()))
        for i in touched:
            syms, cnt = tab[i]
            for a, b in zip(syms, syms[1:]):
                p = (a, b)
                d[p] = d.get(p, 0) - cnt
                s = where.get(p)
                if s is not None:
                    s.discard(i)
            merged = _greedy_merge(syms, l, r)
            tab[i] = (merged, cnt)
            for a, b in zip(merged, merged[1:]):
                p = (a, b)
                d[p] = d.get(p, 0) + cnt
                where.setdefault(p, set()).add(i)
        deltas.append({p: v for p, v in d.items() if v != 0})
    return deltas, tab


def _best_pair(counts: dict) -> tuple | None:
    if not counts:
        return None
    (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return (l, r, c)


#: stats of the last _train_distributed_delta run (tests/bench
#: introspection): {"rounds": n, "committed": [per-round counts]}
LAST_DISTRIBUTED_STATS: dict = {}


def _train_distributed_delta(words: DataFrame, num_merges: int,
                             min_pair_count: int, eow: str,
                             batch_merges: int = 32
                             ) -> list[tuple[str, str, int]]:
    """Distributed delta training (see module docstring): driver-resident
    pair counts + optimistic batches validated exactly against the
    per-step deltas. Two jobs per round (eager checkpoint of the
    delta+merged-table frame, then the small delta collect) — the delta
    job emits the merged word table alongside the deltas (tag rows), so
    a fully-valid batch needs no separate apply; truncation adds one
    map-only job for the committed prefix."""
    syms = words.withColumn(
        "syms", F.concat(F.split("word", ""), F.array(F.lit(eow)))
    ).select("cnt", "syms").persist()
    syms.count()

    # initial pair counts: ONE explode+groupBy over the word table;
    # pair TYPES are the driver bound (documented in-RAM stats table,
    # like the tagger's dictionary cap)
    init = (
        syms.withColumn("a", F.expr("slice(syms, 1, size(syms)-1)"))
        .withColumn("b", F.expr("slice(syms, 2, size(syms)-1)"))
        .select("cnt", F.explode(F.arrays_zip("a", "b")).alias("p"))
        .select(F.col("p.a").alias("l"), F.col("p.b").alias("r"), "cnt")
        .groupBy("l", "r").agg(F.sum("cnt").alias("c")).collect())
    counts: dict[tuple[str, str], int] = {
        (row["l"], row["r"]): int(row["c"]) for row in init}

    schema = ("step int, l string, r string, d long, "
              "cnt long, syms array<string>")
    merges: list[tuple[str, str, int]] = []
    cur = syms
    # AIMD batch sizing: a fully-valid batch doubles the next one (up
    # to 8x the requested size), a truncated batch halves it — natural
    # corpora converge to long batches, adversarially interactive ones
    # to short exact steps
    bsz = max(int(batch_merges), 1)
    bmax = max(bsz * 8, 64)
    stats = LAST_DISTRIBUTED_STATS
    stats.clear()
    stats.update({"rounds": 0, "committed": []})
    try:
        while len(merges) < num_merges:
            want = min(bsz, num_merges - len(merges))
            cands = sorted(counts.items(),
                           key=lambda kv: (-kv[1], kv[0]))[:want]
            cands = [(p, c) for p, c in cands if c >= min_pair_count]
            if not cands:
                break
            seq = [p for p, _ in cands]

            def delta_job(batches, seq=seq):
                import pandas as pd

                tab = []
                for pdf in batches:
                    tab.extend((list(s), int(c))
                               for s, c in zip(pdf["syms"], pdf["cnt"]))
                if not tab:
                    return
                deltas, tab = _apply_batch_with_deltas(tab, seq)
                rows = [(i, l, r, v, None, None)
                        for i, d in enumerate(deltas)
                        for (l, r), v in d.items()]
                rows.extend((-1, None, None, 0, c, s) for s, c in tab)
                yield pd.DataFrame(rows, columns=[
                    "step", "l", "r", "d", "cnt", "syms"])

            # eager localCheckpoint: materializes the round AND truncates
            # lineage — iterative plans otherwise grow unboundedly (the
            # dup-clusters pattern)
            both = (cur.mapInPandas(delta_job, schema)
                    .localCheckpoint(eager=True))
            drows = (both.filter(F.col("step") >= 0)
                     .groupBy("step", "l", "r").agg(F.sum("d").alias("d"))
                     .collect())
            step_deltas: list[dict] = [dict() for _ in seq]
            for row in drows:
                step_deltas[int(row["step"])][(row["l"], row["r"])] = \
                    int(row["d"])

            # exact validation: candidate i must still be the argmax
            # (count desc, pair asc) when its turn comes under the
            # accumulated deltas — a pair a previous step created or
            # deflated wins instead, truncating the batch there
            valid = 0
            snapshot = dict(counts)
            for i, (p, _) in enumerate(cands):
                best = _best_pair(snapshot)
                if best is None or best[2] < min_pair_count:
                    break
                if (best[0], best[1]) != p:
                    break
                merges.append(best)
                for q, v in step_deltas[i].items():
                    nv = snapshot.get(q, 0) + v
                    if nv:
                        snapshot[q] = nv
                    else:
                        snapshot.pop(q, None)
                valid += 1
            if valid == 0:
                # cands[0] is counts' argmax under the same ordering;
                # only min_pair_count can stop it
                break

            if valid == len(seq):
                counts = snapshot
                cur = both.filter(F.col("step") == -1).select("cnt", "syms")
            else:
                # replay only the committed prefix onto the driver
                # counts, then one map-only apply job
                for i in range(valid):
                    for q, v in step_deltas[i].items():
                        nv = counts.get(q, 0) + v
                        if nv:
                            counts[q] = nv
                        else:
                            counts.pop(q, None)
                committed = seq[:valid]

                def apply_job(batches, committed=committed):
                    for pdf in batches:
                        pdf = pdf.copy()
                        out = []
                        for s in pdf["syms"]:
                            w = list(s)
                            for l, r in committed:
                                w = _greedy_merge(w, l, r)
                            out.append(w)
                        pdf["syms"] = out
                        yield pdf

                cur = (cur.mapInPandas(
                    apply_job, "cnt long, syms array<string>")
                    .localCheckpoint(eager=True))
            stats["rounds"] += 1
            stats["committed"].append(valid)
            bsz = min(bsz * 2, bmax) if valid == len(seq) else \
                max(max(valid, 1), bsz // 2)
    finally:
        syms.unpersist()
    return merges


def bpe_train(df: DataFrame, text_col: str, num_merges: int,
              min_pair_count: int = 2, word_limit: int | None = None,
              local: bool | str = "auto", eow: str = EOW,
              max_local_words: int = 2_000_000,
              batch_merges: int = 32) -> list[tuple[str, str, int]]:
    """Train `num_merges` BPE merges on the corpus; returns
    [(left, right, pair_count), ...] in rank order. `word_limit` keeps
    only the top-N words by (count desc, word asc) before training (the
    standard dictionary truncation for web-scale corpora).

    `local` — "auto" (default): collect the word table and train
    in-process with delta counting when the distinct-word count fits
    `max_local_words` (the production shape: one distributed corpus
    pass, dictionary-scale training); True forces collection; False
    forces the DISTRIBUTED DELTA trainer (optimistic validated batches,
    ~1-2 jobs per `batch_merges` merges — correct at any dictionary
    size, byte-identical to the sequential trainer)."""
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

    return _train_distributed_delta(words, num_merges, min_pair_count,
                                    eow, batch_merges=batch_merges)


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
