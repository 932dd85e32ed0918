"""Analysis chain — tokenizer + filters as vectorized pandas operations.

Role analogue: lucene/core .../analysis/Analyzer.java (TokenStream =
Tokenizer + TokenFilter chain), StandardTokenizer/StandardAnalyzer
(analysis/standard/StandardAnalyzer.java:85-90: StandardTokenizer →
LowerCaseFilter → StopFilter), and the SPI analyzer registry
(analysis/TokenizerFactory.java).

Design (Spark-first): an Analyzer here is *configuration*; the hot path is
`tokenize_pandas`, a pure pandas/regex function applied inside a
`pandas_udf` over Arrow batches — no per-row Python authored by us. The
stop filter and max-token-length filter are additionally expressible as
JVM-side DataFrame filters after explode (see index/builder.py), keeping
the heaviest filtering inside whole-stage codegen.

Semantics pinned to the reference:
- default English stop set (33 words) — analysis/en/EnglishAnalyzer.java:43-52
- tokens longer than maxTokenLength (255) are DROPPED —
  StandardAnalyzer.java:37 (DEFAULT_MAX_TOKEN_LENGTH)
- doclen (the BM25 norm input) = token count AFTER stop/length filtering,
  overlap-free — BM25Similarity.java:142-143 with discountOverlaps=true
- the code analyzer splits camelCase / snake_case deterministically
  (north star: "code-aware tokenization"); the standard analyzer keeps
  `_`-joined runs whole (UAX#29 ExtendNumLet behavior of StandardTokenizer)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

# analysis/en/EnglishAnalyzer.java:43-52
ENGLISH_STOP_WORDS: frozenset[str] = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

DEFAULT_MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:37

_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z]+)([A-Z][a-z])")


@dataclass(frozen=True)
class Analyzer:
    name: str
    token_pattern: str = r"[A-Za-z0-9_]+"
    lowercase: bool = True
    stopwords: frozenset[str] = field(default_factory=frozenset)
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
    split_camel: bool = False
    stemmer: str | None = None   # "porter" → PorterStemFilter analogue
                                 # (analysis/en/PorterStemFilter.java:51);
                                 # applied AFTER stop/length filtering, as
                                 # Lucene chains it after StopFilter
    custom_tokenizer: str | None = None  # CUSTOM_TOKENIZERS key; replaces
                                 # the split_camel/lowercase/findall stages
                                 # with a bespoke Series[str]→Series[list]
                                 # tokenizer (owning its own case/width
                                 # handling); stop/length/stem/shingle
                                 # stages still apply after. Used by the
                                 # CJK bigram chain (cjk/CJKAnalyzer.java)
    normalizer: str | None = None  # stem.NORMALIZERS key; per-token
                                 # normalization BEFORE the stop filter —
                                 # the {Persian,Sorani,Indic}Normalization-
                                 # Filter position in the reference chains
                                 # (fa/PersianAnalyzer.java etc.: normalize
                                 # runs pre-StopFilter so stop entries match
                                 # normalized forms)
    payload_delimiter: str | None = None  # DelimitedPayloadTokenFilter
                                 # analogue (analysis/payloads/
                                 # DelimitedPayloadTokenFilter.java:30 +
                                 # FloatEncoder): raw token "tok<delim>1.5"
                                 # splits (rightmost delimiter) into term
                                 # "tok" carrying float payload 1.5;
                                 # tokens without the delimiter carry NO
                                 # payload (NaN sentinel — PayloadFunction
                                 # skips them). Payloads ride the
                                 # positions channel, so the field must
                                 # index positions. Incompatible with
                                 # shingles (a shingle spans tokens with
                                 # distinct payloads; Lucene's filter has
                                 # the same single-token scope).
    word_delimiter: int = 0      # nonzero → WhitespaceTokenizer +
                                 # WordDelimiterGraphFilter chain
                                 # (miscellaneous/WordDelimiterGraphFilter
                                 # .java; flags from analysis/
                                 # worddelimiter.py). Replaces the
                                 # token_pattern/split_camel tokenizer
                                 # stage (the reference recommends WDGF
                                 # after a whitespace tokenizer, which
                                 # preserves the intra-word delimiters it
                                 # splits on); case analysis happens on
                                 # the RAW text, lowercase applies to the
                                 # emitted subwords after. Catenated /
                                 # preserved-original tokens count toward
                                 # doclen (same documented divergence as
                                 # shingles vs discountOverlaps).
    protected_words: frozenset[str] = field(default_factory=frozenset)
                                 # WDGF protWords: tokens never delimited
    common_grams: frozenset[str] = field(default_factory=frozenset)
                                 # nonempty → CommonGramsFilter analogue
                                 # (analysis/commongrams/CommonGramsFilter
                                 # .java:97-121): for every adjacent pair
                                 # where either member is a common word,
                                 # emit "left_right" ALONGSIDE the
                                 # unigrams, positioned at the left
                                 # member (posInc 0 in the reference
                                 # stream). Runs after stop/length/stem,
                                 # before shingles; typically used with
                                 # an EMPTY stopword set (the common
                                 # words stay indexed as unigrams).
    common_grams_query: bool = False
                                 # CommonGramsQueryFilter analogue
                                 # (commongrams/CommonGramsQueryFilter
                                 # .java:84-130): the QUERY-side chain —
                                 # one token per position: each bigram
                                 # replaces its left member, and a final
                                 # unigram already covered by the
                                 # preceding bigram is dropped. Only
                                 # meaningful with common_grams set.
    shingle_size: int = 0        # >1 → ShingleFilter analogue (analysis/
                                 # shingle/ShingleFilter.java): word
                                 # n-grams (space-joined) emitted ALONGSIDE
                                 # unigrams, positioned at their first
                                 # member. Divergence note: emitted
                                 # shingles count toward doclen (Lucene's
                                 # discountOverlaps would exclude them
                                 # from norms) — documented, mirrored by
                                 # the SQL oracles

    def tokenize_series(self, content: pd.Series) -> pd.Series:
        """Series[str] -> Series[list[str]] — the full chain, vectorized."""
        return tokenize_pandas(content, self)

    def tokenize_one(self, text: str | None) -> list[str]:
        """One string through the full chain — scalar twin of
        tokenize_series, output-identical (property-tested in
        tests/test_analysis.py). Query PARSING analyzes one short string
        per term; routing that through a 1-row pandas Series costs ~3 ms
        of accessor machinery per call, which becomes the driver's
        dominant serial cost in large serving batches (measured: 60 s of
        a 24k-query batch pass). This path is ~100x cheaper."""
        return tokenize_scalar(text, self)

    def tokenize_with_positions(self, content: pd.Series) -> tuple[pd.Series, pd.Series]:
        """(Series[list[str]], Series[list[int]]) — tokens plus their
        positions in the PRE-filter token stream: dropped stopwords /
        over-long tokens leave position gaps, exactly the accumulated
        position-increment behavior of FilteringTokenFilter.java:49-63
        (StopFilter keeps gaps; matters for phrase matching across stops)."""
        return tokenize_pandas_positions(content, self)[:2]

    def tokenize_with_positions_payloads(
        self, content: pd.Series
    ) -> tuple[pd.Series, pd.Series, pd.Series]:
        """(tokens, positions, payloads) — payloads is a Series of
        float32 lists aligned 1:1 with tokens; NaN = no payload on that
        token (no delimiter present). Only meaningful when
        payload_delimiter is set."""
        t, p, y = tokenize_pandas_positions(content, self, want_payloads=True)
        return t, p, y


def _stem_lists(toks: pd.Series, stemmer: str = "porter") -> pd.Series:
    """Stem token lists; the batch's UNIQUE tokens are stemmed once
    and mapped back (per-token cost = one dict lookup — vocabulary-bounded
    like Lucene's per-instance stem reuse). `stemmer` selects from the
    stem.STEMMERS registry (porter + per-language light stemmers)."""
    import itertools

    from lucene_spark.analysis.stem import STEMMERS

    stem_fn = STEMMERS[stemmer]
    vocab = set(itertools.chain.from_iterable(toks))
    table = {t: stem_fn(t) for t in vocab}
    return toks.map(lambda ts: [table[t] for t in ts])


def _normalize_lists(toks: pd.Series, normalizer: str) -> pd.Series:
    """Per-token normalization (NORMALIZERS registry) with the same
    unique-vocab table trick as _stem_lists."""
    import itertools

    from lucene_spark.analysis.stem import NORMALIZERS

    fn = NORMALIZERS[normalizer]
    vocab = set(itertools.chain.from_iterable(toks))
    table = {t: fn(t) for t in vocab}
    return toks.map(lambda ts: [table[t] for t in ts])


# custom whole-tokenizer registry (Series[str] -> Series[list[str]])
CUSTOM_TOKENIZERS: dict = {}


def _wd_pairs(tokens: list[str], a: Analyzer) -> tuple[list[str], list[int]]:
    """WhitespaceTokenizer → WordDelimiterGraphFilter → LowerCaseFilter
    for one raw whitespace-token list: (terms, positions) with the graph
    flattened to absolute positions (catenations share their first
    subword's position, exactly like index-time Lucene)."""
    from lucene_spark.analysis.worddelimiter import expand_tokens

    t, p = expand_tokens(tokens, a.word_delimiter, a.protected_words)
    if a.lowercase:
        t = [x.lower() for x in t]
    return t, p


def _raw_token_lists(content: pd.Series, a: Analyzer) -> pd.Series:
    """The tokenizer stage shared by both chain entry points."""
    s = content.fillna("")
    if a.word_delimiter:
        # case analysis must see the raw text: split on whitespace first,
        # WDGF per token, lowercase the emitted subwords after
        return s.str.split().map(lambda ts: _wd_pairs(ts, a)[0])
    if a.custom_tokenizer:
        return CUSTOM_TOKENIZERS[a.custom_tokenizer](s)
    if a.split_camel:
        # deterministic camelCase boundaries: fooBar -> foo Bar, HTTPServer -> HTTP Server
        s = s.str.replace(_CAMEL_1, r"\1 \2", regex=True)
        s = s.str.replace(_CAMEL_2, r"\1 \2", regex=True)
    if a.lowercase:
        s = s.str.lower()
    return s.str.findall(a.token_pattern)


def _common_grams(toks: list[str], common: frozenset,
                  query: bool) -> list[str]:
    """CommonGramsFilter / CommonGramsQueryFilter stream shapes
    (commongrams/CommonGramsFilter.java:97-121, CommonGramsQueryFilter
    .java:84-130), validated against every TestCommonGramsFilter vector.

    Index mode: unigrams in order, each gram "l_r" inserted right after
    its left member (the reference emits it with posInc 0 before the
    right member). Query mode: one token per position — the gram
    replaces its left member; a final unigram covered by the preceding
    gram is dropped."""
    n = len(toks)
    pair = [i < n - 1 and (toks[i] in common or toks[i + 1] in common)
            for i in range(n)]
    if not query:
        out = []
        for i, t in enumerate(toks):
            out.append(t)
            if pair[i]:
                out.append(f"{t}_{toks[i + 1]}")
        return out
    out = []
    for i, t in enumerate(toks):
        if pair[i]:
            out.append(f"{t}_{toks[i + 1]}")
        elif not (i == n - 1 and n > 1 and pair[i - 1]):
            out.append(t)
    return out


def _common_grams_positions(toks: list[str], ps: list[int],
                            common: frozenset,
                            query: bool) -> tuple[list[str], list[int]]:
    """Position-carrying twin of _common_grams: index-mode grams take
    their LEFT member's position (the posInc-0 stream), query-mode
    output renumbers one position per emitted token."""
    n = len(toks)
    pair = [i < n - 1 and (toks[i] in common or toks[i + 1] in common)
            for i in range(n)]
    if not query:
        out_t, out_p = [], []
        for i, t in enumerate(toks):
            out_t.append(t)
            out_p.append(ps[i])
            if pair[i]:
                out_t.append(f"{t}_{toks[i + 1]}")
                out_p.append(ps[i])
        return out_t, out_p
    out_t = _common_grams(toks, common, True)
    return out_t, list(range(len(out_t)))


def tokenize_scalar(text: str | None, a: Analyzer) -> list[str]:
    """Scalar twin of tokenize_pandas: same stages, same order, same
    output for any input (the pandas .str ops below are per-element
    str.lower/re.findall under the hood, so plain-Python equivalents are
    exact). Custom tokenizers are Series->Series by contract, so that
    branch wraps a 1-row Series — correctness over speed there."""
    s = "" if text is None or (isinstance(text, float) and pd.isna(text)) else text
    if a.word_delimiter:
        toks = _wd_pairs(s.split(), a)[0]
    elif a.custom_tokenizer:
        toks = list(CUSTOM_TOKENIZERS[a.custom_tokenizer](pd.Series([s])).iloc[0])
    else:
        if a.split_camel:
            s = _CAMEL_1.sub(r"\1 \2", s)
            s = _CAMEL_2.sub(r"\1 \2", s)
        if a.lowercase:
            s = s.lower()
        toks = re.findall(a.token_pattern, s)
    if a.normalizer:
        from lucene_spark.analysis.stem import NORMALIZERS

        fn = NORMALIZERS[a.normalizer]
        toks = [fn(t) for t in toks]
    stop = a.stopwords
    maxlen = a.max_token_length
    if stop or maxlen:
        toks = [t for t in toks if len(t) <= maxlen and t not in stop]
    if a.stemmer:
        from lucene_spark.analysis.stem import STEMMERS

        stem_fn = STEMMERS[a.stemmer]
        toks = [stem_fn(t) for t in toks]
    if a.common_grams:
        toks = _common_grams(toks, a.common_grams, a.common_grams_query)
    if a.shingle_size > 1:
        n = a.shingle_size
        toks = toks + [" ".join(toks[i:i + n])
                       for i in range(len(toks) - n + 1)]
    return toks


def analyze_stages(text: str | None, a: Analyzer) -> list[tuple[str, list[str]]]:
    """Per-stage token traces — Solr's field-analysis debugging surface
    (/analysis/field, solr/core/src/java/org/apache/solr/handler/
    AnalysisRequestHandlerBase.java: the response carries one entry per
    tokenizer/filter with the token stream AS OF that stage). Returns
    [(stage_name, tokens), ...] in chain order; the LAST stage's tokens
    are exactly `tokenize_one(text)` (asserted by the test suite, so the
    trace can never drift from the real chain).

    Stage granularity note: this chain case-folds the raw STRING before
    pattern tokenization (output-identical to Lucene's tokenizer →
    LowerCaseFilter for word-character patterns), so the case fold is
    reported as part of the tokenizer stage rather than as a separate
    filter entry."""
    stages: list[tuple[str, list[str]]] = []
    s = "" if text is None or (isinstance(text, float) and pd.isna(text)) else text
    if a.word_delimiter:
        toks = _wd_pairs(s.split(), a)[0]
        stages.append(("whitespace_tokenizer+word_delimiter_graph", list(toks)))
    elif a.custom_tokenizer:
        toks = list(CUSTOM_TOKENIZERS[a.custom_tokenizer](pd.Series([s])).iloc[0])
        stages.append((f"tokenizer:{a.custom_tokenizer}", list(toks)))
    else:
        if a.split_camel:
            s = _CAMEL_1.sub(r"\1 \2", s)
            s = _CAMEL_2.sub(r"\1 \2", s)
        if a.lowercase:
            s = s.lower()
        toks = re.findall(a.token_pattern, s)
        name = "pattern_tokenizer"
        if a.split_camel:
            name = "code_tokenizer(camel_split+" + name + ")"
        if a.lowercase:
            name += "+lowercase"
        stages.append((name, list(toks)))
    if a.normalizer:
        from lucene_spark.analysis.stem import NORMALIZERS

        fn = NORMALIZERS[a.normalizer]
        toks = [fn(t) for t in toks]
        stages.append((f"normalizer:{a.normalizer}", list(toks)))
    if a.stopwords or a.max_token_length:
        stop, maxlen = a.stopwords, a.max_token_length
        toks = [t for t in toks if len(t) <= maxlen and t not in stop]
        stages.append(("stop+length_filter", list(toks)))
    if a.stemmer:
        from lucene_spark.analysis.stem import STEMMERS

        stem_fn = STEMMERS[a.stemmer]
        toks = [stem_fn(t) for t in toks]
        stages.append((f"stemmer:{a.stemmer}", list(toks)))
    if a.common_grams:
        toks = _common_grams(toks, a.common_grams, a.common_grams_query)
        kind = "common_grams_query" if a.common_grams_query else "common_grams"
        stages.append((f"{kind}_filter", list(toks)))
    if a.shingle_size > 1:
        n = a.shingle_size
        toks = toks + [" ".join(toks[i:i + n])
                       for i in range(len(toks) - n + 1)]
        stages.append((f"shingle_filter(n={n})", list(toks)))
    return stages


def tokenize_pandas(content: pd.Series, a: Analyzer) -> pd.Series:
    toks = _raw_token_lists(content, a)
    if a.normalizer:
        toks = _normalize_lists(toks, a.normalizer)
    # stop + length filters; stopwords are lowercase so filter after lowering.
    # Measured note: this per-row comprehension IS the fast path — flattening
    # to one array and using pandas .str.len()/.isin() was benchmarked at
    # 7-16x SLOWER on 6M tokens (pandas str-accessor overhead on object
    # dtype dwarfs a tight comprehension); don't "vectorize" this.
    stop = a.stopwords
    maxlen = a.max_token_length
    if stop or maxlen:
        toks = toks.map(lambda ts: [t for t in ts if len(t) <= maxlen and t not in stop])
    if a.stemmer:
        toks = _stem_lists(toks, a.stemmer)
    if a.common_grams:
        cg, q = a.common_grams, a.common_grams_query
        toks = toks.map(lambda ts: _common_grams(ts, cg, q))
    if a.shingle_size > 1:
        n = a.shingle_size
        toks = toks.map(lambda ts: ts + [
            " ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)])
    return toks


def tokenize_pandas_positions(
    content: pd.Series, a: Analyzer, want_payloads: bool = False,
) -> tuple[pd.Series, pd.Series, pd.Series | None]:
    prepos = None  # tokenizer-supplied positions (WDGF graph flattening)
    if a.word_delimiter:
        if a.payload_delimiter:
            raise ValueError(
                "payload_delimiter is incompatible with word_delimiter")
        both_wd = content.fillna("").str.split().map(
            lambda ts: _wd_pairs(ts, a))
        toks = both_wd.map(lambda p: p[0])
        prepos = both_wd.map(lambda p: p[1])
    else:
        toks = _raw_token_lists(content, a)
    pays = None
    if a.payload_delimiter:
        # DelimitedPayloadTokenFilter position in the chain: right after
        # the tokenizer, BEFORE stop/length/stem (the bare term is what
        # downstream filters see — DelimitedPayloadTokenFilter.java:30)
        if a.shingle_size > 1:
            raise ValueError("payload_delimiter is incompatible with shingles")
        if a.common_grams:
            # a gram spans two tokens with distinct payloads — the same
            # single-token-scope restriction as shingles; silently
            # emitting grams would shift every later payload onto the
            # wrong token
            raise ValueError(
                "payload_delimiter is incompatible with common_grams")
        delim = a.payload_delimiter

        def split_pay(ts: list[str]) -> tuple[list[str], list[float]]:
            out_t, out_y = [], []
            for t in ts:
                j = t.rfind(delim)
                if j > 0:
                    try:
                        y = float(t[j + 1:])
                    except ValueError:
                        pass
                    else:
                        out_t.append(t[:j])
                        out_y.append(y)
                        continue
                out_t.append(t)
                out_y.append(float("nan"))   # no payload on this token
            return out_t, out_y

        both = toks.map(split_pay)
        toks = both.map(lambda p: p[0])
        pays = both.map(lambda p: p[1])
    if a.normalizer:
        toks = _normalize_lists(toks, a.normalizer)
    stop = a.stopwords
    maxlen = a.max_token_length

    def filt(ts: list[str], ps: list[int] | None = None
             ) -> tuple[list[str], list[int]]:
        out_t, out_p = [], []
        for i, t in enumerate(ts):
            if len(t) <= maxlen and t not in stop:
                out_t.append(t)
                out_p.append(i if ps is None else ps[i])
        return out_t, out_p

    if prepos is not None:
        pairs = pd.Series(
            [filt(ts, ps) for ts, ps in zip(toks, prepos)],
            index=toks.index)
    else:
        pairs = toks.map(filt)
    out_t = pairs.map(lambda p: p[0])
    out_p = pairs.map(lambda p: p[1])
    if pays is not None:
        # align payloads with the surviving positions (dropped tokens
        # drop their payloads with them)
        pays = pd.Series(
            [[ys[i] for i in ps] for ys, ps in zip(pays, out_p)],
            index=out_p.index)
    out_y = pays if want_payloads else None
    if a.stemmer:
        out_t = _stem_lists(out_t, a.stemmer)
    if a.common_grams:
        cg, q = a.common_grams, a.common_grams_query
        both_cg = pd.Series(list(zip(out_t, out_p)), index=out_t.index).map(
            lambda tp: _common_grams_positions(list(tp[0]), list(tp[1]), cg, q))
        out_t = both_cg.map(lambda p: p[0])
        out_p = both_cg.map(lambda p: p[1])
    if a.shingle_size > 1:
        n = a.shingle_size
        both = pd.Series(list(zip(out_t, out_p)), index=out_t.index)

        def sh(tp):
            ts, ps = tp
            grams = [" ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)]
            gpos = [ps[i] for i in range(len(ts) - n + 1)]  # first member's pos
            return ts + grams, list(ps) + gpos

        both = both.map(sh)
        out_t = both.map(lambda p: p[0])
        out_p = both.map(lambda p: p[1])
    return out_t, out_p, out_y


_REGISTRY: dict[str, Analyzer] = {}


def register_analyzer(a: Analyzer) -> Analyzer:
    """Add an analyzer to the process-local registry. NOTE: analyzer
    names are resolved INSIDE executor python workers (the tokenize
    pandas UDF), so a custom analyzer must be registered at module
    import time in code shipped to the workers (--py-files) — a
    driver-only runtime registration raises KeyError in the workers."""
    _REGISTRY[a.name] = a
    return a


def get_analyzer(name: str) -> Analyzer:
    return _REGISTRY[name]


def analyzer_fingerprint(name: str) -> str:
    """Stable fingerprint of an analyzer chain's OBSERVABLE behavior
    (tokenizer pattern, case handling, stop set, normalizer/stemmer
    names, shingles). Stored in index manifests so a reader can detect
    that the registry's chain for this name changed since the index was
    built (e.g. a default stemmer swap) — such a change silently breaks
    index/query term symmetry otherwise."""
    import hashlib

    a = _REGISTRY[name]
    ident = "|".join([
        a.token_pattern, str(a.lowercase), str(a.max_token_length),
        str(a.split_camel), str(a.stemmer), str(a.normalizer),
        str(a.custom_tokenizer), str(a.shingle_size),
        str(a.payload_delimiter),
        ",".join(sorted(a.stopwords)),
    ])
    if a.word_delimiter or a.protected_words:
        # appended only when non-default so every pre-existing chain's
        # fingerprint (stored in index manifests) stays stable — adding
        # a field must not make old indexes warn "chain has changed"
        ident += "|wd=%s|prot=%s" % (
            a.word_delimiter, ",".join(sorted(a.protected_words)))
    if a.common_grams:
        # same non-default-only rule: the gram word SET and the
        # index/query mode are both observable term-stream behavior
        ident += "|cg=%s|cgq=%s" % (
            ",".join(sorted(a.common_grams)), a.common_grams_query)
    return hashlib.sha256(ident.encode("utf-8")).hexdigest()[:16]


# StandardAnalyzer analogue: word runs (underscore-joined, per UAX#29
# ExtendNumLet), lowercase, English stops.
register_analyzer(
    Analyzer(name="standard", token_pattern=r"[A-Za-z0-9_]+", stopwords=ENGLISH_STOP_WORDS)
)

# Code analyzer (north star "code-aware"): camelCase/snake_case split into
# sub-identifiers; no stopword removal (code keywords are signal).
register_analyzer(
    Analyzer(name="code", token_pattern=r"[A-Za-z0-9]+", split_camel=True)
)

# Whitespace analyzer: exact split on runs of whitespace; used where an
# external SQL oracle must reproduce tokenization exactly.
register_analyzer(
    Analyzer(name="whitespace", token_pattern=r"\S+", lowercase=False, stopwords=frozenset(), max_token_length=1 << 20)
)

# Whitespace + delimited payloads ("tok|1.5" → term "tok", payload 1.5):
# the WhitespaceTokenizer → DelimitedPayloadTokenFilter chain
# (analysis/payloads/DelimitedPayloadTokenFilter.java + FloatEncoder).
register_analyzer(
    Analyzer(name="whitespace_payload", token_pattern=r"\S+", lowercase=False,
             stopwords=frozenset(), max_token_length=1 << 20,
             payload_delimiter="|")
)

# Simple analyzer: letter/digit runs + lowercase, no stops (Lucene
# SimpleAnalyzer ~ analysis/core/SimpleAnalyzer.java but keeping digits).
register_analyzer(Analyzer(name="simple", token_pattern=r"[a-z0-9]+"))

# WhitespaceTokenizer → WordDelimiterGraphFilter → LowerCaseFilter — the
# classic product-code / identifier chain ("Wi-Fi", "PowerShot", "j2se"
# all match their parts; CATENATE_WORDS also matches "wifi"). Flags =
# factory defaults + CATENATE_WORDS; see analysis/worddelimiter.py.
def _wdgf_flags():
    from lucene_spark.analysis.worddelimiter import (CATENATE_WORDS,
                                                     WDGF_DEFAULT_FLAGS)
    return WDGF_DEFAULT_FLAGS | CATENATE_WORDS


register_analyzer(Analyzer(name="wdgf", word_delimiter=_wdgf_flags()))

# Language analyzers (the analysis/{de,fr,es,it,pt,nl,sv}/ *Analyzer
# role): language stop set + light stemmer over the standard chain, the
# same shape as Lucene's per-language analyzers (tokenize → lowercase →
# stop → *LightStemFilter). Stop lists are the common public
# function-word sets; light stemmers implement the published Savoy/RSLP
# suffix-stripping rules (see stem.py) — inflectional conflation only.
GERMAN_STOP_WORDS = frozenset(
    """der die das den dem des ein eine einer eines einem einen und oder
    aber doch wenn dann dass weil wie was wer wo ist sind war waren sein
    hat haben wird werden nicht kein keine mit von zu im in am an auf
    für aus bei nach über unter auch noch nur schon sich es ich du er
    sie wir ihr man""".split()
)
FRENCH_STOP_WORDS = frozenset(
    """le la les un une des du de au aux et ou mais donc or ni car que
    qui quoi dont où si ne pas plus moins très est sont était été être
    avoir a ont dans sur sous avec sans pour par ce cette ces cet il
    elle ils elles nous vous je tu on se sa son ses leur leurs""".split()
)
SPANISH_STOP_WORDS = frozenset(
    """el la los las un una unos unas y o pero si no que quien cuyo
    donde como cuando es son era eran ser estar fue han ha con sin para
    por en de del al este esta estos estas ese esa esos esas lo le les
    se su sus nos os yo tu él ella ellos ellas nosotros""".split()
)

ITALIAN_STOP_WORDS = frozenset(
    """il lo la i gli le un uno una e o ma se che chi cui non più di a da
    in con su per tra fra è sono era erano essere avere ha hanno questo
    questa questi queste quello quella io tu lui lei noi voi loro si mi
    ti ci vi ne al allo alla agli alle del dello della degli delle nel
    nello nella sul sullo sulla come quando dove anche ancora già""".split()
)
PORTUGUESE_STOP_WORDS = frozenset(
    """o a os as um uma uns umas e ou mas se que quem qual onde como
    quando não mais menos muito é são era eram ser estar foi foram tem
    têm com sem para por em de do da dos das no na nos nas ao à aos às
    este esta estes estas esse essa isso isto ele ela eles elas nós vós
    eu tu me te lhe nos vos seu sua seus suas já também""".split()
)
DUTCH_STOP_WORDS = frozenset(
    """de het een en of maar als dat die dit deze wie wat waar niet geen
    meer is zijn was waren wordt worden heeft hebben had met van tot in
    aan op voor uit bij naar over onder ook nog al ik jij hij zij wij
    jullie ze je u men er hier daar dan toen want dus om te zich""".split()
)
SWEDISH_STOP_WORDS = frozenset(
    """och det att i en jag hon som han på den med var sig för så till
    är men ett om hade de av icke mig du henne då sin nu har inte hans
    honom skulle hennes där min man ej vid kunde något från ut när
    efter upp vi dem vara vad över än dig kan sina här ha mot alla
    under någon eller allt mycket sedan ju denna själv detta åt utan
    varit hur ingen mitt ni bli blev oss din dessa några deras blir
    mina samma vilken er sådan vår blivit dess inom mellan sådant
    varför varje vilka ditt vem vilket sitta sådana vart dina vars
    vårt våra ert era vilkas""".split()
)

register_analyzer(Analyzer(name="german", token_pattern=r"[A-Za-zÀ-ÿß0-9_]+",
                           stopwords=GERMAN_STOP_WORDS,
                           stemmer="german_light_norm"))
register_analyzer(Analyzer(name="french", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=FRENCH_STOP_WORDS,
                           stemmer="french_light"))
register_analyzer(Analyzer(name="spanish", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=SPANISH_STOP_WORDS,
                           stemmer="spanish_light"))
register_analyzer(Analyzer(name="italian", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=ITALIAN_STOP_WORDS,
                           stemmer="italian_light"))
register_analyzer(Analyzer(name="portuguese", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=PORTUGUESE_STOP_WORDS,
                           stemmer="portuguese_light"))
# Dutch: nl/DutchAnalyzer.java uses the Snowball DutchStemmer (plus its
# 4-entry stem-override dict, folded into dutch_stem); the light stemmer
# remains available as the dutch_light variant.
register_analyzer(Analyzer(name="dutch", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=DUTCH_STOP_WORDS,
                           stemmer="dutch"))
register_analyzer(Analyzer(name="dutch_light",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=DUTCH_STOP_WORDS,
                           stemmer="dutch_light"))
register_analyzer(Analyzer(name="swedish_light",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=SWEDISH_STOP_WORDS,
                           stemmer="swedish_light"))
# sv/SwedishAnalyzer.java chains SnowballFilter(SwedishStemmer) — the
# Snowball stemmer is the reference DEFAULT (likewise no/ru/fi/hu below);
# the *_light analyzers keep the factory-selectable light variants.
register_analyzer(Analyzer(name="swedish",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=SWEDISH_STOP_WORDS,
                           stemmer="swedish_snowball"))
# Snowball variants for the light-stemmed defaults (the classic
# SnowballPorterFilterFactory languages; the de/fr/es/it/pt DEFAULTS
# stay light, matching each reference analyzer's createComponents)
register_analyzer(Analyzer(name="german_snowball",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=GERMAN_STOP_WORDS,
                           stemmer="german_snowball"))
register_analyzer(Analyzer(name="french_snowball",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=FRENCH_STOP_WORDS,
                           stemmer="french_snowball"))
register_analyzer(Analyzer(name="spanish_snowball",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=SPANISH_STOP_WORDS,
                           stemmer="spanish_snowball"))
register_analyzer(Analyzer(name="italian_snowball",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=ITALIAN_STOP_WORDS,
                           stemmer="italian_snowball"))
register_analyzer(Analyzer(name="portuguese_snowball",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=PORTUGUESE_STOP_WORDS,
                           stemmer="portuguese_snowball"))
# historical / alternative stemmers selectable via the same factory
register_analyzer(Analyzer(name="english_lovins",
                           stopwords=ENGLISH_STOP_WORDS, stemmer="lovins"))
# ICU folding analyzer (icu/ICUFoldingFilter.java chain: tokenize →
# UTR#30 fold; casefold lives inside the normalizer, so lowercase=False)
register_analyzer(Analyzer(name="icu", token_pattern=r"\w+",
                           lowercase=False, normalizer="icu_folding"))
register_analyzer(Analyzer(name="dutch_kp",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+(?:'\w+)*",
                           stopwords=DUTCH_STOP_WORDS, stemmer="kp"))

# Light-stemmed analyzers for the CLEF/UniNE language set (role:
# {fi,ru,hu,no}/FinnishAnalyzer.java etc. — stop set + *LightStemFilter;
# stemmers validated 0-mismatch vs the reference golden vocabularies).
FINNISH_STOP_WORDS = frozenset(
    """olla olen olet on olemme olette ovat ole oli olisi olisit olisin
    olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
    en et ei emme ette eivät minä minun minut minua minussa minusta minuun
    minulla minulta minulle sinä sinun sinut sinua hän hänen hänet häntä
    se sen sitä siinä siitä siihen sillä me te he ja jos koska kuin mutta
    niin sekä sitten tai vaan vai vaikka kanssa mukaan myös että tämä
    tämän tätä tässä tästä tähän nyt itse""".split()
)
RUSSIAN_STOP_WORDS = frozenset(
    """и в во не что он на я с со как а то все она так его но да ты к у же
    вы за бы по только ее мне было вот от меня еще нет о из ему теперь
    когда даже ну вдруг ли если уже или ни быть был него до вас нибудь
    опять уж вам сказал ведь там потом себя ничего ей может они тут где
    есть надо ней для мы тебя их чем была сам чтоб без будто человек чего
    раз тоже себе под жизнь будет ж тогда кто этот""".split()
)
HUNGARIAN_STOP_WORDS = frozenset(
    """a ahogy ahol aki akik akkor alatt által általában amely amelyek
    ami amit amolyan amíg amikor át abban azok azon azt azzal azért aztán
    azután azonban bár be belül benne cikk de e eddig egész egy egyes
    egyetlen egyéb egyik egyre ekkor el elég ellen elõ elõször elõtt elsõ
    én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen ezzel ezért
    és fel felé hanem hiszen hogy hogyan igen így illetve ill ilyen
    ilyenkor ison ismét itt jó jól jobban kell kellett keresztül ki kívül
    között közül legalább lehet lehetett legyen lenne lenni lesz lett
    maga magát majd már más másik meg még mellett mert mely melyek mi mit
    míg miért milyen mikor minden mindent mindenki mindig mint mintha mivel
    most nagy nagyobb nagyon ne néha nekem neki nem néhány nélkül nincs
    olyan ott össze õ õk õket pedig persze rá s saját sem semmi sok sokat
    sokkal számára szemben szerint szinte talán tehát teljes tovább
    továbbá több úgy ugyanis új újabb újra után utána utolsó vagy vagyis
    valaki valami valamint való vagyok van vannak volt voltam voltak
    voltunk vissza vele viszont volna""".split()
)
NORWEGIAN_STOP_WORDS = frozenset(
    """og i jeg det at en et den til er som på de med han av ikke ikkje
    der så var meg seg men ett har om vi min mitt ha hadde hun nå over da
    ved fra du ut sin dem oss opp man kan hans hvor eller hva skal selv
    sjøl her alle vil bli ble blei bli som hvilken hvilke sånn inni mellom
    vår hver hvem vors hvis både bare enn fordi før mange også slik vært
    være båe begge siden dykk dykkar dei deira deires deim di då eg ein
    eit eitt elles honom hjå ho hoe henne hennar hennes hoss hossen ikkje
    ingi inkje korleis korso kva kvar kvarhelst kven kvi kvifor me medan
    mi mine mykje no nokon noka nokor noko nokre si sia sidan so somt
    somme um upp vere vort varte vart""".split()
)

register_analyzer(Analyzer(name="finnish", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=FINNISH_STOP_WORDS,
                           stemmer="finnish_snowball"))
register_analyzer(Analyzer(name="finnish_light",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=FINNISH_STOP_WORDS,
                           stemmer="finnish_light"))
register_analyzer(Analyzer(name="russian",
                           token_pattern=r"[А-Яа-яЁёA-Za-z0-9_]+",
                           stopwords=RUSSIAN_STOP_WORDS,
                           stemmer="russian_snowball"))
register_analyzer(Analyzer(name="russian_light",
                           token_pattern=r"[А-Яа-яЁёA-Za-z0-9_]+",
                           stopwords=RUSSIAN_STOP_WORDS,
                           stemmer="russian_light"))
register_analyzer(Analyzer(name="hungarian",
                           token_pattern=r"[A-Za-zÀ-ÿŐőŰű0-9_]+",
                           stopwords=HUNGARIAN_STOP_WORDS,
                           stemmer="hungarian_snowball"))
register_analyzer(Analyzer(name="hungarian_light",
                           token_pattern=r"[A-Za-zÀ-ÿŐőŰű0-9_]+",
                           stopwords=HUNGARIAN_STOP_WORDS,
                           stemmer="hungarian_light"))
register_analyzer(Analyzer(name="norwegian", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=NORWEGIAN_STOP_WORDS,
                           stemmer="norwegian_snowball"))
register_analyzer(Analyzer(name="norwegian_light",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=NORWEGIAN_STOP_WORDS,
                           stemmer="norwegian_light"))
register_analyzer(Analyzer(name="nynorsk", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=NORWEGIAN_STOP_WORDS,
                           stemmer="nynorsk_light"))

# i18n analyzer set — roles: ar/ArabicAnalyzer.java, fa/PersianAnalyzer.java,
# ckb/SoraniAnalyzer.java, cz/CzechAnalyzer.java, bg/BulgarianAnalyzer.java,
# hi/HindiAnalyzer.java, bn/BengaliAnalyzer.java, id/IndonesianAnalyzer.java,
# lv/LatvianAnalyzer.java, gl/GalicianAnalyzer.java, br/BrazilianAnalyzer.java.
# Chain order per analyzer matches createComponents: where the reference
# normalizes BEFORE StopFilter (fa/ckb/hi/bn) we set `normalizer`; where it
# normalizes after (ar), normalization lives inside the stemmer. Stop sets
# generated verbatim from the reference's stopword resources
# (stopwords_i18n.py). ‌ (ZWNJ) is token-internal for fa/ckb — the
# Sorani normalizer consumes it (heh+ZWNJ → ae).
from lucene_spark.analysis.stopwords_i18n import (  # noqa: E402
    ARABIC_STOP_WORDS, BENGALI_STOP_WORDS, BRAZILIAN_STOP_WORDS,
    BULGARIAN_STOP_WORDS, CZECH_STOP_WORDS, GALICIAN_STOP_WORDS,
    HINDI_STOP_WORDS, INDONESIAN_STOP_WORDS, LATVIAN_STOP_WORDS,
    PERSIAN_STOP_WORDS, SORANI_STOP_WORDS,
)

# Python's re \w excludes combining marks (Mn/Mc) — unlike the reference's
# UAX#29 StandardTokenizer, which keeps them token-internal. Without this
# class, Devanagari nukta/matras and Arabic harakat SPLIT the token
# (re.findall(r'\w+', 'लड़के') == ['लड','क']). Ranges: Latin/Cyrillic
# combining, Hebrew points, Arabic harakat + superscript alef + Koranic
# marks, Devanagari signs/matras/virama, Bengali equivalents.
_MN = ("\u0300-\u036f\u0483-\u0489\u0591-\u05bd\u05bf\u05c1\u05c2\u05c4\u05c5\u05c7"
       "\u0610-\u061a\u064b-\u065f\u0670\u06d6-\u06dc\u06df-\u06e8\u06ea-\u06ed"
       "\u0900-\u0903\u093a-\u093c\u093e-\u094f\u0951-\u0957\u0962\u0963"
       "\u0981-\u0983\u09bc\u09be-\u09c4\u09c7\u09c8\u09cb-\u09cd\u09d7\u09e2\u09e3")
_W = rf"[\w{_MN}]+"

register_analyzer(Analyzer(name="arabic", token_pattern=_W,
                           stopwords=ARABIC_STOP_WORDS,
                           normalizer="fold_digits", stemmer="arabic"))
register_analyzer(Analyzer(name="persian",
                           token_pattern=rf"{_W}(?:‌{_W})*",
                           stopwords=PERSIAN_STOP_WORDS,
                           normalizer="persian"))
register_analyzer(Analyzer(name="sorani",
                           token_pattern=rf"{_W}(?:‌{_W})*",
                           stopwords=SORANI_STOP_WORDS,
                           normalizer="sorani", stemmer="sorani"))
register_analyzer(Analyzer(name="czech", token_pattern=r"\w+",
                           stopwords=CZECH_STOP_WORDS, stemmer="czech"))
register_analyzer(Analyzer(name="bulgarian", token_pattern=r"\w+",
                           stopwords=BULGARIAN_STOP_WORDS,
                           stemmer="bulgarian"))
register_analyzer(Analyzer(name="hindi", token_pattern=_W,
                           stopwords=HINDI_STOP_WORDS,
                           normalizer="hindi", stemmer="hindi"))
register_analyzer(Analyzer(name="bengali", token_pattern=_W,
                           stopwords=BENGALI_STOP_WORDS,
                           normalizer="bengali", stemmer="bengali"))
register_analyzer(Analyzer(name="indonesian", token_pattern=r"\w+",
                           stopwords=INDONESIAN_STOP_WORDS,
                           stemmer="indonesian"))
register_analyzer(Analyzer(name="latvian", token_pattern=r"\w+",
                           stopwords=LATVIAN_STOP_WORDS, stemmer="latvian"))
register_analyzer(Analyzer(name="galician", token_pattern=r"\w+",
                           stopwords=GALICIAN_STOP_WORDS, stemmer="galician"))
# Brazilian Portuguese: the reference's BrazilianStemmer is its own legacy
# suffix stemmer; we ship the published RSLP algorithm (the modern stemmer
# for pt-BR, also what pt/PortugueseStemmer implements) — documented
# divergence, same conflation role.
register_analyzer(Analyzer(name="brazilian", token_pattern=r"\w+",
                           stopwords=BRAZILIAN_STOP_WORDS,
                           stemmer="portuguese_rslp"))
# Full-RSLP Portuguese variant alongside the default light chain
# (pt/PortugueseAnalyzer.java uses PortugueseLightStemFilter; the RSLP
# filter is opt-in there too).
register_analyzer(Analyzer(name="portuguese_rslp",
                           token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=PORTUGUESE_STOP_WORDS,
                           stemmer="portuguese_rslp"))

# Snowball-stemmed analyzers (analysis/snowball/SnowballFilter.java with
# the tartarus ext stemmers; chains per each reference analyzer's
# createComponents). Stemmers in snowball.py, all validated to 0
# mismatches against the reference's golden vocabularies.
from lucene_spark.analysis.stopwords_i18n import (  # noqa: E402
    ARMENIAN_STOP_WORDS, BASQUE_STOP_WORDS, CATALAN_STOP_WORDS,
    DANISH_STOP_WORDS, ESTONIAN_STOP_WORDS, GREEK_STOP_WORDS,
    IRISH_STOP_WORDS, LITHUANIAN_STOP_WORDS, ROMANIAN_STOP_WORDS,
    SERBIAN_STOP_WORDS, TURKISH_STOP_WORDS,
)

register_analyzer(Analyzer(name="danish", token_pattern=r"[A-Za-zÀ-ÿ0-9_]+",
                           stopwords=DANISH_STOP_WORDS, stemmer="danish"))
# Greek (el/GreekAnalyzer.java): GreekLowerCaseFilter (tonos/dialytika
# fold + final-sigma) runs before the stop filter — the stop file is
# σ-normalized for exactly this order — then the Ntais stemmer.
register_analyzer(Analyzer(name="greek", token_pattern=r"\w+",
                           lowercase=False, normalizer="greek",
                           stopwords=GREEK_STOP_WORDS, stemmer="greek"))
register_analyzer(Analyzer(name="romanian", token_pattern=r"\w+",
                           stopwords=ROMANIAN_STOP_WORDS, stemmer="romanian"))
# Irish (ga/IrishAnalyzer.java): hyphenation particles h/n/t are dropped by
# a pre-stop StopFilter in the reference — folded into the stop set here
# (same effect: both run before the stemmer). The irish normalizer owns
# elision (d'/m'/b') and the n-/t- eclipsis lowercase rule.
register_analyzer(Analyzer(name="irish",
                           token_pattern=r"\w+(?:['’]\w+)*", lowercase=False,
                           normalizer="irish",
                           stopwords=IRISH_STOP_WORDS | frozenset("hnt"),
                           stemmer="irish"))
# Turkish (tr/TurkishAnalyzer.java): apostrophe truncation + Turkish
# dotted/dotless-i lowering live in the turkish normalizer.
register_analyzer(Analyzer(name="turkish",
                           token_pattern=r"\w+(?:['’]\w+)*", lowercase=False,
                           normalizer="turkish",
                           stopwords=TURKISH_STOP_WORDS, stemmer="turkish"))
# Catalan (ca/CatalanAnalyzer.java): ElisionFilter(d l m n s t) before
# lowercase/stop — here the elision normalizer runs on lowercased tokens,
# equivalent because articles match case-insensitively.
register_analyzer(Analyzer(name="catalan",
                           token_pattern=r"\w+(?:['’]\w+)*",
                           normalizer="catalan",
                           stopwords=CATALAN_STOP_WORDS, stemmer="catalan"))
# hy/eu/lt/et analyzers (ArmenianAnalyzer.java etc.): StandardTokenizer →
# LowerCase → Stop → SnowballFilter, no language-specific normalizers.
register_analyzer(Analyzer(name="armenian", token_pattern=r"\w+",
                           stopwords=ARMENIAN_STOP_WORDS,
                           stemmer="armenian"))
register_analyzer(Analyzer(name="basque", token_pattern=r"\w+",
                           stopwords=BASQUE_STOP_WORDS, stemmer="basque"))
register_analyzer(Analyzer(name="lithuanian", token_pattern=r"\w+",
                           stopwords=LITHUANIAN_STOP_WORDS,
                           stemmer="lithuanian"))
register_analyzer(Analyzer(name="estonian", token_pattern=r"\w+",
                           stopwords=ESTONIAN_STOP_WORDS,
                           stemmer="estonian"))
# Nepali: the reference ships the Snowball stemmer (tartarus ext) but no
# dedicated analyzer; chain = standard tokenizer (combining-mark aware)
# + stemmer, no stop set.
register_analyzer(Analyzer(name="nepali", token_pattern=_W,
                           stopwords=frozenset(), stemmer="nepali"))
# Serbian (sr/SerbianAnalyzer.java): lowercase → stop → SerbianStemmer →
# SerbianNormalizationFilter. The Snowball SerbianStemmer has no golden
# vocabulary in the reference; we ship the normalization filter (Cyrillic→
# Latin + diacritic folding) and DOCUMENT the missing Snowball stage as a
# divergence until it can be validated.
register_analyzer(Analyzer(name="serbian", token_pattern=r"\w+",
                           stopwords=SERBIAN_STOP_WORDS,
                           stemmer="serbian_norm"))

# CJK analyzer (cjk/CJKAnalyzer.java: StandardTokenizer → CJKWidthFilter →
# LowerCaseFilter → CJKBigramFilter → StopFilter). The whole tokenizer
# stage is custom (cjk.cjk_token_lists: width fold + lowercase + sliding
# bigrams over CJK runs); the shared stop filter then drops the English
# function words from cjk/stopwords.txt among the non-CJK passthrough
# tokens. Golden vectors: tests/test_cjk.py vs TestCJKAnalyzer.java.
from lucene_spark.analysis.cjk import cjk_token_lists  # noqa: E402
from lucene_spark.analysis.stopwords_i18n import CJK_STOP_WORDS  # noqa: E402

CUSTOM_TOKENIZERS["cjk_bigram"] = cjk_token_lists
register_analyzer(Analyzer(name="cjk", custom_tokenizer="cjk_bigram",
                           stopwords=CJK_STOP_WORDS))

# Japanese dictionary segmentation (kuromoji JapaneseAnalyzer role):
# Viterbi lattice over a seeded MeCab-style lexicon + exact unknown-word
# semantics (analysis/ja.py, JapaneseTokenizer.java:494-1013). `japanese`
# = NORMAL mode (compounds kept), `japanese_search` = SEARCH mode
# (decomposition penalty splits long compounds, JapaneseAnalyzer's
# default mode). Golden vectors: tests/test_ja.py incl. a brute-force
# all-segmentations oracle.
from lucene_spark.analysis.ja import (  # noqa: E402
    ja_extended_token_lists,
    ja_search_token_lists,
    ja_token_lists,
)

CUSTOM_TOKENIZERS["ja_normal"] = ja_token_lists
CUSTOM_TOKENIZERS["ja_search"] = ja_search_token_lists
CUSTOM_TOKENIZERS["ja_extended"] = ja_extended_token_lists
register_analyzer(Analyzer(name="japanese", custom_tokenizer="ja_normal"))
register_analyzer(Analyzer(name="japanese_search",
                           custom_tokenizer="ja_search"))
register_analyzer(Analyzer(name="japanese_extended",
                           custom_tokenizer="ja_extended"))
# the COMPLETE JapaneseAnalyzer chain (JapaneseAnalyzer.java:95-101:
# tokenizer SEARCH → base form → POS stop (reference stoptags.txt) →
# CJK width → stop words (reference stopwords.txt) → katakana stem →
# lowercase) over the large seeded lexicon
from lucene_spark.analysis.ja import ja_full_token_lists  # noqa: E402

CUSTOM_TOKENIZERS["ja_full"] = ja_full_token_lists
register_analyzer(Analyzer(name="japanese_full",
                           custom_tokenizer="ja_full"))

# JapaneseIterationMarkCharFilter (odoriji 々ゝゞヽヾ expansion,
# analysis/jaiteration.py) composed before the full chain — the
# reference's char-filter + JapaneseAnalyzer stack
from lucene_spark.analysis.ja import ja_iteration_token_lists  # noqa: E402

CUSTOM_TOKENIZERS["ja_iteration"] = ja_iteration_token_lists
register_analyzer(Analyzer(name="japanese_iteration",
                           custom_tokenizer="ja_iteration"))

# Thai (th/ThaiAnalyzer.java:93-100: ThaiTokenizer → LowerCase →
# DecimalDigitFilter → Stop(th list)). analysis/th.py: dictionary
# maximal-matching over a seeded lexicon (the ICU Thai engine's own
# baseline algorithm); reference vectors incl. offsets in tests/test_th.py.
from lucene_spark.analysis.th import th_token_lists  # noqa: E402
from lucene_spark.analysis.stopwords_i18n import THAI_STOP_WORDS  # noqa: E402

CUSTOM_TOKENIZERS["thai_dict"] = th_token_lists
register_analyzer(Analyzer(name="thai", custom_tokenizer="thai_dict",
                           stopwords=THAI_STOP_WORDS))

# Korean (nori/ko/KoreanAnalyzer.java:72-79: KoreanTokenizer DISCARD
# decompound → KoreanPartOfSpeechStopFilter(default tags) → reading form
# → lowercase). Same lattice family as `japanese`; analysis/ko.py maps
# the reference semantics (script-grouped unknowns, compound morpheme
# emission, POS stop set) over a seeded lexicon.
from lucene_spark.analysis.ko import ko_token_lists  # noqa: E402

CUSTOM_TOKENIZERS["ko_nori"] = ko_token_lists
register_analyzer(Analyzer(name="korean", custom_tokenizer="ko_nori"))
# the COMPLETE KoreanAnalyzer chain over the LARGE seeded lexicon with
# hanja readings (KoreanAnalyzer.java:72-79: tokenizer DISCARD → POS
# stop → KoreanReadingFormFilter → lowercase)
from lucene_spark.analysis.ko import ko_full_token_lists  # noqa: E402

CUSTOM_TOKENIZERS["ko_full"] = ko_full_token_lists
register_analyzer(Analyzer(name="korean_full",
                           custom_tokenizer="ko_full"))

# Chinese (smartcn SmartChineseAnalyzer role): HHMM bigram segmentation
# with the reference's exact smoothing formula (BiSegGraph.java:101-107)
# over a seeded coredict/bigramdict — analysis/smartcn.py; brute-force
# all-paths oracle in tests/test_smartcn.py.
from lucene_spark.analysis.smartcn import cn_token_lists  # noqa: E402

CUSTOM_TOKENIZERS["cn_hhmm"] = cn_token_lists
register_analyzer(Analyzer(name="smartcn", custom_tokenizer="cn_hhmm"))
# the COMPLETE SmartChineseAnalyzer chain (:123-133: HHMM tokenizer →
# PorterStemFilter → punctuation StopFilter) over the large model
from lucene_spark.analysis.smartcn import cn_full_token_lists  # noqa: E402

CUSTOM_TOKENIZERS["cn_full"] = cn_full_token_lists
register_analyzer(Analyzer(name="smartcn_full",
                           custom_tokenizer="cn_full"))

# Polish Morfologik lemmatizer (morfologik/MorfologikFilter.java:
# exact-then-lowercase dictionary lookup, ALL lemmas emitted at the same
# position, pass-through on miss) — analysis/morfologik.py over the
# seeded Polimorf-role dictionary (the reference's own
# TestMorfologikAnalyzer vectors seeded verbatim).
from lucene_spark.analysis.morfologik import morfologik_token_lists  # noqa: E402

CUSTOM_TOKENIZERS["pl_morfologik"] = morfologik_token_lists
register_analyzer(Analyzer(name="morfologik",
                           custom_tokenizer="pl_morfologik"))

# Polish (stempel/pl/PolishAnalyzer.java: StandardTokenizer → LowerCase →
# Stop(carrot2 list) → StempelFilter over the trained Egothor trie table).
# The stemmer runs the reference's own table (extracted data, see
# scripts/gen_stempel_table.py) through a re-implemented Egothor
# algorithm — analysis/stempel.py; vectors in tests/test_stempel.py.
from lucene_spark.analysis.stopwords_i18n import POLISH_STOP_WORDS  # noqa: E402

register_analyzer(Analyzer(name="polish", token_pattern=r"\w+",
                           stopwords=POLISH_STOP_WORDS,
                           stemmer="stempel_pl"))


def _char_ngram_tokenizer(n: int):
    """Per-word character n-grams — the NGramTokenizer role (analysis/
    ngram/NGramTokenizer.java with minGram=maxGram=n), scoped to
    whitespace words so the SQL oracles can reproduce the stream:
    lowercase, split on whitespace, emit w[i:i+n] for every window of
    every word; words shorter than n emit nothing (Lucene drops
    sub-minGram terms too). Gram positions are consecutive over the
    emitted stream (Lucene increments position per gram), so adjacency
    can span a word boundary — the documented NGramTokenizer behavior,
    mirrored by the gate oracle's gram-sequence twin."""
    def tok(s: pd.Series) -> pd.Series:
        def grams(text: str) -> list[str]:
            out: list[str] = []
            for w in text.lower().split():
                out.extend(w[i:i + n] for i in range(len(w) - n + 1))
            return out
        return s.map(grams)
    return tok


CUSTOM_TOKENIZERS["char_ngram2"] = _char_ngram_tokenizer(2)
CUSTOM_TOKENIZERS["char_ngram3"] = _char_ngram_tokenizer(3)

# UAX#29 URL/email tokenizer (analysis/email/UAX29URLEmailTokenizer.java
# role — see analysis/uax29.py for the word-break scanner + rule map).
# `uax29_url_email` keeps raw case (parity tests read types/case);
# `_lc` lowercases tokens (the UAX29URLEmailAnalyzer chain shape:
# tokenizer → LowerCaseFilter) so the stop filter matches.
def _uax29_token_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.uax29 import uax29_tokens

    return content.map(lambda s: uax29_tokens(s) if isinstance(s, str) else [])


def _uax29_token_lists_lc(content: pd.Series) -> pd.Series:
    return _uax29_token_lists(content).map(lambda ts: [t.lower() for t in ts])


CUSTOM_TOKENIZERS["uax29_url_email"] = _uax29_token_lists
CUSTOM_TOKENIZERS["uax29_url_email_lc"] = _uax29_token_lists_lc

register_analyzer(
    Analyzer(name="url_email_raw", custom_tokenizer="uax29_url_email",
             lowercase=False, stopwords=frozenset(),
             max_token_length=1 << 20)
)
# the UAX29URLEmailAnalyzer chain: tokenizer → lowercase → English stops
register_analyzer(
    Analyzer(name="url_email", custom_tokenizer="uax29_url_email_lc",
             lowercase=False, stopwords=ENGLISH_STOP_WORDS,
             max_token_length=1 << 20)
)

register_analyzer(Analyzer(name="ngram2", custom_tokenizer="char_ngram2"))
register_analyzer(Analyzer(name="ngram3", custom_tokenizer="char_ngram3"))

# English Snowball ("porter2") variant — the SnowballPorterFilterFactory
# language=English chain; distinct from the classic-Porter `english`
# analyzer below, and golden-validated against the reference's
# english.zip vocabulary.
register_analyzer(
    Analyzer(name="english_snowball", token_pattern=r"[A-Za-z0-9_']+",
             stopwords=ENGLISH_STOP_WORDS, stemmer="english_snowball")
)

# English analyzer: standard chain + Porter stemming — the
# EnglishAnalyzer role (analysis/en/EnglishAnalyzer.java: stops +
# PorterStemFilter; possessive stripping approximated by the tokenizer
# dropping apostrophes). `run` matches `running` on this chain.
register_analyzer(
    Analyzer(name="english", token_pattern=r"[A-Za-z0-9_]+",
             stopwords=ENGLISH_STOP_WORDS, stemmer="porter")
)

# KStemFilter chain (en/KStemFilterFactory.java usage: tokenizer →
# lowercase → KStem): Krovetz's dictionary-hybrid stemmer, golden-exact
# vs kstemTestData.zip (analysis/kstem.py)
register_analyzer(
    Analyzer(name="english_kstem", token_pattern=r"[A-Za-z0-9_]+",
             stopwords=ENGLISH_STOP_WORDS, stemmer="kstem")
)

# Whitespace + bigram shingles (ShingleFilter role): unigrams + space-
# joined word pairs, exactly reproducible by an external SQL engine.
register_analyzer(
    Analyzer(name="whitespace_shingle2", token_pattern=r"\S+", lowercase=False,
             stopwords=frozenset(), max_token_length=1 << 20, shingle_size=2)
)

# Whitespace + CommonGrams over the English stop set (the classic Solr
# text_cg fieldType shape: commongrams of stopwords WITHOUT removing
# them). Index chain emits stop-adjacent bigrams alongside unigrams;
# the _query twin is the CommonGramsQueryFilter side (one token per
# position). SQL-reproducible: '_'-joined adjacent pairs filtered on
# stop membership.
register_analyzer(
    Analyzer(name="whitespace_common_grams", token_pattern=r"\S+",
             lowercase=False, stopwords=frozenset(),
             max_token_length=1 << 20, common_grams=ENGLISH_STOP_WORDS)
)
register_analyzer(
    Analyzer(name="whitespace_common_grams_query", token_pattern=r"\S+",
             lowercase=False, stopwords=frozenset(),
             max_token_length=1 << 20, common_grams=ENGLISH_STOP_WORDS,
             common_grams_query=True)
)

# Whitespace + lowercase + bigram shingles: the FreeTextSuggester model
# chain (its n-gram LM lowercases before shingling).
register_analyzer(
    Analyzer(name="whitespace_lc_shingle2", token_pattern=r"\S+", lowercase=True,
             stopwords=frozenset(), max_token_length=1 << 20, shingle_size=2)
)

# Whitespace + lowercase + Porter: the SQL-oracle-friendly stemming chain
# (split is string_split_regex-reproducible; the stem map for a fixed
# vocabulary can be embedded in an oracle as a literal mapping).
register_analyzer(
    Analyzer(name="whitespace_porter", token_pattern=r"\S+", lowercase=True,
             stopwords=frozenset(), max_token_length=1 << 20, stemmer="porter")
)

# url_email now registers above from the UAX#29 scanner chain
# (analysis/uax29.py) — the earlier regex-alternation approximation is
# superseded.

# Phonetic / folding chains (analysis/phonetic PhoneticFilter role with
# inject=false; miscellaneous/ASCIIFoldingFilter role).
register_analyzer(Analyzer(name="phonetic_soundex", stemmer="soundex"))
register_analyzer(Analyzer(name="phonetic_metaphone", stemmer="metaphone"))
register_analyzer(Analyzer(name="phonetic_caverphone2", stemmer="caverphone2"))
register_analyzer(Analyzer(name="phonetic_nysiis", stemmer="nysiis"))


# Daitch-Mokotoff emits MULTIPLE codes per token (branching) — a custom
# tokenizer, not a 1:1 stemmer entry (phonetic/DaitchMokotoffSoundexFilter
# .java inject=false shape).
def _dm_token_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.phonetic import daitch_mokotoff

    return content.map(
        lambda s: [c for t in (s.split() if isinstance(s, str) else [])
                   for c in daitch_mokotoff(t)])


CUSTOM_TOKENIZERS["dm_soundex"] = _dm_token_lists

# Hunspell dictionary stemming (hunspell/HunspellStemFilter.java chain:
# whitespace tokenize → lowercase → HunspellStemFilter emitting every
# dictionary stem, stacked at the same position). The demo analyzer
# carries a small English affix dictionary; arbitrary .aff/.dic pairs
# load through analysis/hunspell.HunspellDictionary.
_HUNSPELL_DEMO = None


def _hunspell_demo_dict():
    global _HUNSPELL_DEMO
    if _HUNSPELL_DEMO is None:
        from lucene_spark.analysis.hunspell import HunspellDictionary

        aff = (
            "SET UTF-8\n"
            "PFX R Y 1\n"
            "PFX R 0 re .\n"
            "SFX S Y 3\n"
            "SFX S 0 s [^sxyh]\n"
            "SFX S 0 es [sxh]\n"
            "SFX S y ies y\n"
            "SFX D Y 3\n"
            "SFX D 0 ed [^en]\n"
            "SFX D e ed e\n"
            "SFX D 0 ned n\n"
            "SFX G Y 3\n"
            "SFX G 0 ing [^en]\n"
            "SFX G e ing e\n"
            "SFX G 0 ning n\n")
        dic = ("10\nwork/RSDG\nindex/SDG\nquery/SDG\nsearch/RSDG\n"
               "merge/SDG\nscan/SDG\nshard/SDG\nscore/SDG\ntoken/SDG\n"
               "write/SG\n")
        _HUNSPELL_DEMO = HunspellDictionary(aff, dic)
    return _HUNSPELL_DEMO


def _hunspell_token_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.hunspell import hunspell_stem_tokens

    d = _hunspell_demo_dict()
    return content.map(lambda s: [
        t.text for t in hunspell_stem_tokens((s or "").lower().split(), d)])


CUSTOM_TOKENIZERS["hunspell_demo"] = _hunspell_token_lists
register_analyzer(Analyzer(name="hunspell",
                           custom_tokenizer="hunspell_demo"))


# PathHierarchyTokenizer (analysis/path; pathhierarchy.py): ancestor
# prefixes of a /-delimited path, stacked at one position — the Solr
# path-faceting field type
def _path_hierarchy_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.pathhierarchy import path_hierarchy_tokens

    return content.map(
        lambda s: [t.text for t in path_hierarchy_tokens(s or "")])


def _rev_path_hierarchy_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.pathhierarchy import (
        reverse_path_hierarchy_tokens)

    return content.map(
        lambda s: [t.text for t in reverse_path_hierarchy_tokens(s or "")])


CUSTOM_TOKENIZERS["path_hierarchy"] = _path_hierarchy_lists
CUSTOM_TOKENIZERS["path_hierarchy_reverse"] = _rev_path_hierarchy_lists
register_analyzer(Analyzer(name="path_hierarchy",
                           custom_tokenizer="path_hierarchy",
                           max_token_length=1 << 20))
register_analyzer(Analyzer(name="path_hierarchy_reverse",
                           custom_tokenizer="path_hierarchy_reverse",
                           max_token_length=1 << 20))


# German-style dictionary decompounding demo chain
# (compound/DictionaryCompoundWordTokenFilter.java; compound.py):
# whitespace → lowercase → decompound with a seeded Germanic noun set
_DECOMPOUND_DEMO = ("bil dörr motor tak borr slag hammar pelar glas "
                    "ögon fodral bas fiol makare gesäll sko vind rute "
                    "torkare blad donau dampf schiff fahrt").split()


def _decompound_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.compound import dictionary_decompound

    return content.map(lambda s: [
        t.text for t in dictionary_decompound((s or "").lower().split(),
                                              _DECOMPOUND_DEMO)])


CUSTOM_TOKENIZERS["decompound_demo"] = _decompound_lists
register_analyzer(Analyzer(name="decompound",
                           custom_tokenizer="decompound_demo"))


# ClassicAnalyzer (analysis/classic; the pre-3.1 StandardAnalyzer
# grammar with ClassicFilter + English stops)
def _classic_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.classic import classic_analyzer_tokens

    return content.map(
        lambda s: [t.text for t in classic_analyzer_tokens(s or "")])


CUSTOM_TOKENIZERS["classic"] = _classic_lists
register_analyzer(Analyzer(name="classic", custom_tokenizer="classic"))


# WikipediaTokenizer (analysis/wikipedia; TOKENS_ONLY mode, lowercased)
def _wikipedia_lists(content: pd.Series) -> pd.Series:
    from lucene_spark.analysis.wikipedia import wikipedia_tokens

    return content.map(lambda s: [
        t.text.lower() for t in wikipedia_tokens(s or "")])


CUSTOM_TOKENIZERS["wikipedia"] = _wikipedia_lists
register_analyzer(Analyzer(name="wikipedia",
                           custom_tokenizer="wikipedia"))
register_analyzer(Analyzer(name="phonetic_dm", custom_tokenizer="dm_soundex",
                           stopwords=frozenset()))
register_analyzer(Analyzer(name="standard_folded", stopwords=ENGLISH_STOP_WORDS,
                           token_pattern=r"[^\W_]+|_+[^\W_]*", stemmer="ascii_fold"))
