"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the per-document scoring passes of a training-
data pipeline. Everything is built-in pyspark.sql.functions (JVM-side,
whole-stage codegen); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword profiles for the n-gram/stopword-ratio
# language heuristic (deterministic, dependency-free)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "una", "por", "que"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap len(text.split()) analogue)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper-bound token estimate: word-piece boundaries at
    non-alphanumerics plus length/4 continuation pieces for long words."""
    words = F.split(F.lower(text), r"[^a-z0-9]+")
    pieces = F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.when(F.length(w) == 0, 0).otherwise(
            F.greatest(F.ceil(F.length(w) / 4).cast("int"), F.lit(1))),
    )
    return pieces


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a combined
    [0,1] score (the Gopher/C4-style rule family, public heuristics)."""
    t = F.col(text_col)
    words = F.split(F.lower(t), r"\s+")
    n_tok = token_count(t)
    stop_arr = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stop_arr))
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    out = (
        df.withColumn("n_chars_q", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len", (alpha / F.greatest(n_tok, F.lit(1))).cast("double"))
        .withColumn("punct_ratio", (punct / F.greatest(F.length(t), F.lit(1))).cast("double"))
        .withColumn("stopword_hits", n_stop)
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .otherwise(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
            + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.3
            + F.least(F.col("stopword_hits") / F.lit(4.0), F.lit(1.0)) * 0.3
        )
    )
    return out.withColumn("quality_score", F.round(score, 6))


# writing-system detection for languages whitespace stopwords can't see:
# a text dominated by one of these script ranges is classified by script
# before the stopword profile runs (CJK/Cyrillic text has no whitespace-
# delimited stopwords to count)
_SCRIPT_RANGES: dict[str, str] = {
    "ja": "[぀-ヿ]",   # Hiragana + Katakana (checked before Han:
                               # Japanese text mixes kana WITH kanji)
    "ko": "[가-힣]",   # Hangul syllables
    "zh": "[一-鿿]",   # CJK Unified Ideographs
    "ru": "[Ѐ-ӿ]",   # Cyrillic
}
_SCRIPT_MIN_RATIO = 0.25


def detect_language(df: DataFrame, text_col: str) -> DataFrame:
    """Language ID, two tiers of the same cheap-heuristic family fastText
    replaces at scale: (1) writing-system ratio — ≥25% of characters in
    one script range decides CJK/Cyrillic immediately (kana checked
    before Han so Japanese kanji+kana text is 'ja'); (2) stopword-profile
    argmax for the Latin-script languages; 'und' when nothing matches.
    Pure JVM expressions (regexp_count + array ops), no Python."""
    t = F.col(text_col)
    chars = F.greatest(F.length(t), F.lit(1))
    words = F.array_distinct(F.split(F.lower(t), r"\s+"))
    scores = [
        F.struct(
            F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in ms]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ms in _LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*scores))
    stopword_pick = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    pick = stopword_pick
    for lang, rng in reversed(list(_SCRIPT_RANGES.items())):
        ratio = F.regexp_count(t, F.lit(rng)) / chars
        pick = F.when(ratio >= F.lit(_SCRIPT_MIN_RATIO), F.lit(lang)).otherwise(pick)
    return df.withColumn("detected_lang", pick)


def fingerprint(df: DataFrame, text_col: str, key_col: str, ngram: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: min/max xxhash64 over character
    n-gram windows (winnowing-style, public technique) + full digest.
    Returns (key, fp_min, fp_max, digest). This is the SCALE path —
    xxhash64 is the cheapest JVM hash; see fingerprint_sha for the
    externally-reproducible variant."""
    # dynamic-start substr needs SQL expr (F.substring takes literal start)
    win_hashes = F.expr(
        f"transform(sequence(1, greatest(length(lower({text_col})) - {ngram} + 1, 1)), "
        f"i -> xxhash64(substr(lower({text_col}), i, {ngram})))"
    )
    return df.select(
        F.col(key_col).alias("key"),
        F.array_min(win_hashes).alias("fp_min"),
        F.array_max(win_hashes).alias("fp_max"),
        F.sha2(F.col(text_col), 256).alias("digest"),
    )


def fingerprint_sha(df: DataFrame, text_col: str, key_col: str, ngram: int = 8) -> DataFrame:
    """Winnowing-style fingerprint with sha256 window hashes (hex strings,
    lexicographic min/max) — same plan shape as fingerprint() but every
    hash is reproducible by any external engine (the oracle-checkable
    twin; sha256 per window costs more than xxhash64, so prefer
    fingerprint() at scale). Returns (key, fp_min, fp_max, digest)."""
    win_hashes = F.expr(
        f"transform(sequence(1, greatest(length(lower({text_col})) - {ngram} + 1, 1)), "
        f"i -> sha2(substr(lower({text_col}), i, {ngram}), 256))"
    )
    return df.select(
        F.col(key_col).alias("key"),
        F.array_min(win_hashes).alias("fp_min"),
        F.array_max(win_hashes).alias("fp_max"),
        F.sha2(F.col(text_col), 256).alias("digest"),
    )


def strip_html(text: Column) -> Column:
    """HTML → text (the HTMLStripCharFilter role,
    lucene/analysis/common/.../charfilter/HTMLStripCharFilter.java —
    that one is a generated scanner; this is a documented regex
    approximation that covers the training-data cases: script/style
    blocks, comments, tags, the common entities, whitespace collapse).
    Deterministic and reproducible by any regex engine, so it is
    oracle-checkable. Pure JVM expression — usable inside codegen."""
    s = text
    # script/style blocks including their content
    s = F.regexp_replace(s, r"(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style>", " ")
    # comments, then any remaining tag
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    # common entities; &amp; LAST so &amp;lt; decodes once, not twice
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def repetition_features(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the
    published repetition-filter family; no Lucene analogue): fraction of
    duplicate lines, and the fraction of words covered by the most
    frequent word bigram. Shapes:

    - dup_line_frac: pure array expressions (JVM, no shuffle).
    - top_bigram_frac: explode → map-side-combined groupBy count → max
      per doc — one shuffle of (doc, gram) pairs, the same plan as the
      engine's term-stats aggregation; scale-safe at 100 TB.

    Returns (key, n_words, dup_line_frac, top_bigram_frac)."""
    lines = F.split(F.col(text_col), r"\n")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(
        F.col(key_col).alias("key"),
        F.size(words).alias("n_words"),
        F.when(F.size(lines) > 0,
               1.0 - F.size(F.array_distinct(lines)) / F.size(lines))
         .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        words.alias("w"),
    )
    grams = base.select(
        "key", "n_words", "dup_line_frac",
        F.explode(F.when(F.size("w") >= 2, F.transform(
            F.sequence(F.lit(0), F.size("w") - 2),
            lambda i: F.concat_ws(" ", F.slice("w", i + 1, 2)),
        )).otherwise(F.array(F.lit("")))).alias("g"),
    )
    counts = grams.groupBy("key", "n_words", "dup_line_frac", "g").agg(
        F.count("*").alias("c"))
    top = counts.groupBy("key", "n_words", "dup_line_frac").agg(
        F.max(F.when(F.col("g") != "", F.col("c")).otherwise(0)).alias("maxc"))
    return top.select(
        "key", "n_words", "dup_line_frac",
        F.when(F.col("n_words") >= 2,
               (2.0 * F.col("maxc")) / F.col("n_words"))
         .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )


# PII patterns shared by redact_pii/pii_counts — written in the common
# subset of Java regex (Spark) and RE2 (DuckDB oracle): no lookaround,
# no backreferences, \b and \d behave identically in both engines.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """PII redaction (training-data op — the standard email/IP/phone
    scrub applied before LLM pretraining; no Lucene analogue): replace
    each match with a typed placeholder. Pattern order matters (emails
    before phones so digits inside a redacted email can't re-match).
    Pure JVM regexp_replace chain — whole-stage codegen, no UDF."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Per-document PII match counts (key, n_email, n_ipv4, n_phone) —
    the audit twin of redact_pii, same patterns, counted on the
    PROGRESSIVELY redacted text so categories never double-count the
    same characters (an email's digits are not also a phone)."""
    cur = F.col(text_col)
    cols = [F.col(key_col)]
    for name, pat, token in PII_PATTERNS:
        cols.append(F.size(F.split(cur, pat)) - F.lit(1))
        cur = F.regexp_replace(cur, pat, token)
    named = [cols[0]] + [c.alias(f"n_{n}") for c, (n, _, _) in
                         zip(cols[1:], PII_PATTERNS)]
    return df.select(*named)


def chunk_tokens(df: DataFrame, text_col: str, key_col: str,
                 size: int = 512, overlap: int = 0) -> DataFrame:
    """Token-window chunking (training-data op — fixed-size shard prep
    for LLM pretraining; no Lucene analogue): split each document's
    whitespace tokens into windows of `size` tokens starting every
    `size − overlap` tokens (the last window may be shorter). Returns
    (key, chunk_id, chunk_text, n_tokens). Pure JVM expressions:
    split → transform over a chunk-start sequence → slice/array_join →
    posexplode — no UDF, no shuffle at all (narrow transform; chunk
    rows stay in their document's partition)."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil(n.cast("double") / F.lit(stride)).cast("int"),
                          F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, size))
    return (
        df.select(F.col(key_col), F.posexplode(chunks).alias("chunk_id", "c"))
        .select(key_col, "chunk_id",
                F.array_join("c", " ").alias("chunk_text"),
                F.size("c").alias("n_tokens"))
    )
