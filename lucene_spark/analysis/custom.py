"""CustomAnalyzer — the lucene/analysis/custom role: factory-name-
driven analyzer construction (CustomAnalyzer.builder()
.addCharFilter("htmlstrip").withTokenizer("whitespace")
.addTokenFilter("asciifolding", preserveOriginal="true")... — the same
names a Solr schema or CustomAnalyzer.builder() uses, mapped onto this
repo's filter implementations).

The builder produces a plain ``str -> list[str]`` callable (and a
pandas Series hook via `as_series_tokenizer`) chaining:

- char filters: htmlstrip (the exact HTMLStripCharFilter),
  patternreplace;
- tokenizers: whitespace, keyword, letter, standard, classic,
  wikipedia, pattern (pattern/group params), pathhierarchy;
- token filters: lowercase, uppercase, asciifolding
  (preserveOriginal), stop (words/ignoreCase), porterstem, kstem,
  snowballporter (language), reverse, trim, truncate (prefixLength),
  capitalization, fingerprint, keepword, length (min/max),
  limittokencount (maxTokenCount), patternreplace (pattern/
  replacement/replace=all|first), scandinavianfolding,
  scandinaviannormalization, delimitedtermfrequency (term only),
  hunspellstem (dictionary= an analysis.hunspell.HunspellDictionary).

Unknown factory names raise, as the reference's loader does.
Parameters arrive as keyword strings, matching the factory-args
convention (TestCustomAnalyzer.java:84-110).
"""

from __future__ import annotations

import re


def _bool(v, default=False):
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return str(v).lower() == "true"


# ---- char filters ------------------------------------------------------

def _cf_htmlstrip(**params):
    from lucene_spark.analysis.htmlstrip import html_strip

    escaped = params.get("escapedTags")
    escaped_set = set(escaped.split(",")) if escaped else None
    return lambda text: html_strip(text, escaped_set)


def _cf_patternreplace(**params):
    rx = re.compile(params["pattern"])
    repl = params.get("replacement", "")
    return lambda text: rx.sub(repl, text)


_CHAR_FILTERS = {
    "htmlstrip": _cf_htmlstrip,
    "patternreplace": _cf_patternreplace,
}


# ---- tokenizers --------------------------------------------------------

def _tk_whitespace(**_p):
    return lambda text: text.split()


def _tk_keyword(**_p):
    return lambda text: [text] if text else []


def _tk_letter(**_p):
    rx = re.compile(r"[^\W\d_]+")
    return lambda text: rx.findall(text)


def _tk_standard(**p):
    max_len = int(p.get("maxTokenLength", 255))
    rx = re.compile(r"[A-Za-z0-9_]+")
    return lambda text: [t for t in rx.findall(text)
                         if len(t) <= max_len]


def _tk_classic(**p):
    from lucene_spark.analysis.classic import classic_filter, classic_tokens
    max_len = int(p.get("maxTokenLength", 255))
    return lambda text: [t.text for t in
                         classic_filter(classic_tokens(text, max_len))]


def _tk_wikipedia(**_p):
    from lucene_spark.analysis.wikipedia import wikipedia_tokens

    return lambda text: [t.text for t in wikipedia_tokens(text)]


def _tk_pattern(**p):
    from lucene_spark.analysis.patterns import pattern_tokenize

    pattern = p.get("pattern", r"\W+")
    group = int(p.get("group", -1))
    return lambda text: pattern_tokenize(text, pattern, group)


def _tk_pathhierarchy(**p):
    from lucene_spark.analysis.pathhierarchy import (
        path_hierarchy_tokens, reverse_path_hierarchy_tokens)

    delimiter = p.get("delimiter", "/")
    replacement = p.get("replace", delimiter)
    skip = int(p.get("skip", 0))
    fn = (reverse_path_hierarchy_tokens if _bool(p.get("reverse"))
          else path_hierarchy_tokens)
    return lambda text: [t.text for t in
                         fn(text, delimiter, replacement, skip)]


_TOKENIZERS = {
    "whitespace": _tk_whitespace,
    "keyword": _tk_keyword,
    "letter": _tk_letter,
    "standard": _tk_standard,
    "classic": _tk_classic,
    "wikipedia": _tk_wikipedia,
    "pattern": _tk_pattern,
    "pathhierarchy": _tk_pathhierarchy,
}


# ---- token filters -----------------------------------------------------

def _tf_lowercase(**_p):
    return lambda toks: [t.lower() for t in toks]


def _tf_uppercase(**_p):
    return lambda toks: [t.upper() for t in toks]


def _tf_asciifolding(**p):
    from lucene_spark.analysis.stem import ascii_fold

    preserve = _bool(p.get("preserveOriginal"))

    def fn(toks):
        out = []
        for t in toks:
            folded = ascii_fold(t)
            if preserve and folded != t:
                out.append(folded)
                out.append(t)
            else:
                out.append(folded)
        return out
    return fn


def _tf_stop(**p):
    words = p.get("words")
    if words is None:
        from lucene_spark.analysis.analyzers import ENGLISH_STOP_WORDS
        stopset = ENGLISH_STOP_WORDS
    elif isinstance(words, str):
        stopset = frozenset(w for w in re.split(r"[,\s]+", words) if w)
    else:
        stopset = frozenset(words)
    if _bool(p.get("ignoreCase")):
        low = frozenset(w.lower() for w in stopset)
        return lambda toks: [t for t in toks if t.lower() not in low]
    return lambda toks: [t for t in toks if t not in stopset]


def _tf_porterstem(**_p):
    from lucene_spark.analysis.stem import STEMMERS

    porter = STEMMERS["porter"]
    return lambda toks: [porter(t) for t in toks]


def _tf_kstem(**_p):
    from lucene_spark.analysis.kstem import kstem

    return lambda toks: [kstem(t) for t in toks]


def _tf_snowballporter(**p):
    # SnowballPorterFilterFactory: language= selects the stemmer; the
    # STEMMERS registry keys carry the _snowball suffix for languages
    # whose default analyzer chains a light stemmer instead
    from lucene_spark.analysis.stem import STEMMERS

    lang = p.get("language", "English").lower()
    for key in (f"{lang}_snowball", lang):
        if key in STEMMERS:
            stem = STEMMERS[key]
            break
    else:
        raise ValueError(
            f"unknown snowball language: {p.get('language')}")
    return lambda toks: [stem(t) for t in toks]


def _tf_reverse(**_p):
    from lucene_spark.analysis.misc import reverse_string

    return reverse_string


def _tf_trim(**_p):
    from lucene_spark.analysis.misc import trim

    return trim


def _tf_truncate(**p):
    from lucene_spark.analysis.misc import truncate

    length = int(p.get("prefixLength", 5))
    return lambda toks: truncate(toks, length)


def _tf_capitalization(**p):
    from lucene_spark.analysis.misc import capitalization

    only_first = _bool(p.get("onlyFirstWord"), True)
    return lambda toks: capitalization(toks, only_first_word=only_first)


def _tf_fingerprint(**p):
    from lucene_spark.analysis.misc import fingerprint

    sep = p.get("separator", " ")
    max_size = int(p.get("maxOutputTokenSize", 1024))
    return lambda toks: fingerprint(toks, sep, max_size)


def _tf_keepword(**p):
    from lucene_spark.analysis.misc import keep_words

    words = p["words"]
    ws = (frozenset(w for w in re.split(r"[,\s]+", words) if w)
          if isinstance(words, str) else frozenset(words))
    return lambda toks: keep_words(toks, ws)


def _tf_length(**p):
    lo = int(p.get("min", 0))
    hi = int(p.get("max", 2 ** 31 - 1))
    return lambda toks: [t for t in toks if lo <= len(t) <= hi]


def _tf_limittokencount(**p):
    from lucene_spark.analysis.misc import limit_token_count

    max_count = int(p["maxTokenCount"])
    return lambda toks: limit_token_count(toks, max_count)


def _tf_patternreplace(**p):
    from lucene_spark.analysis.patterns import pattern_replace

    pattern = p["pattern"]
    repl = p.get("replacement", "")
    replace_all = p.get("replace", "all") == "all"
    return lambda toks: pattern_replace(toks, pattern, repl, replace_all)


def _tf_scandinavianfolding(**_p):
    from lucene_spark.analysis.misc import scandinavian_fold

    return scandinavian_fold


def _tf_scandinaviannormalization(**_p):
    from lucene_spark.analysis.misc import scandinavian_normalize

    return scandinavian_normalize


def _tf_delimitedtermfrequency(**p):
    from lucene_spark.analysis.misc import delimited_term_frequency

    delim = p.get("delimiter", "|")
    return lambda toks: [t for t, _tf in
                         delimited_term_frequency(toks, delim)]


def _tf_hunspellstem(**p):
    from lucene_spark.analysis.hunspell import hunspell_stem_tokens

    dictionary = p["dictionary"]
    longest = _bool(p.get("longestOnly"))
    return lambda toks: [t.text for t in hunspell_stem_tokens(
        toks, dictionary, longest_only=longest, dedup=not longest)]


_TOKEN_FILTERS = {
    "lowercase": _tf_lowercase,
    "uppercase": _tf_uppercase,
    "asciifolding": _tf_asciifolding,
    "stop": _tf_stop,
    "porterstem": _tf_porterstem,
    "kstem": _tf_kstem,
    "snowballporter": _tf_snowballporter,
    "reverse": _tf_reverse,
    "trim": _tf_trim,
    "truncate": _tf_truncate,
    "capitalization": _tf_capitalization,
    "fingerprint": _tf_fingerprint,
    "keepword": _tf_keepword,
    "length": _tf_length,
    "limittokencount": _tf_limittokencount,
    "patternreplace": _tf_patternreplace,
    "scandinavianfolding": _tf_scandinavianfolding,
    "scandinaviannormalization": _tf_scandinaviannormalization,
    "delimitedtermfrequency": _tf_delimitedtermfrequency,
    "hunspellstem": _tf_hunspellstem,
}


class CustomAnalyzerBuilder:
    """CustomAnalyzer.builder() (custom/CustomAnalyzer.java:333-470):
    char filters apply in order to the raw text, then the tokenizer,
    then token filters in order."""

    def __init__(self):
        self._char_filters = []
        self._tokenizer = None
        self._token_filters = []

    def add_char_filter(self, name: str, **params):
        factory = _CHAR_FILTERS.get(name.lower())
        if factory is None:
            raise ValueError(f"unknown char filter factory: {name}")
        self._char_filters.append(factory(**params))
        return self

    def with_tokenizer(self, name: str, **params):
        factory = _TOKENIZERS.get(name.lower())
        if factory is None:
            raise ValueError(f"unknown tokenizer factory: {name}")
        self._tokenizer = factory(**params)
        return self

    def add_token_filter(self, name: str, **params):
        factory = _TOKEN_FILTERS.get(name.lower())
        if factory is None:
            raise ValueError(f"unknown token filter factory: {name}")
        self._token_filters.append(factory(**params))
        return self

    def build(self):
        if self._tokenizer is None:
            raise ValueError("a tokenizer is required (withTokenizer)")
        char_filters = list(self._char_filters)
        tokenizer = self._tokenizer
        token_filters = list(self._token_filters)

        def analyze(text: str) -> list[str]:
            for cf in char_filters:
                text = cf(text)
            toks = tokenizer(text)
            for tf in token_filters:
                toks = tf(toks)
            return toks
        return analyze


def custom_analyzer(tokenizer: str, char_filters=(), token_filters=(),
                    **tok_params):
    """Shorthand: char_filters/token_filters are names or
    (name, params) pairs."""
    b = CustomAnalyzerBuilder()
    for cf in char_filters:
        if isinstance(cf, str):
            b.add_char_filter(cf)
        else:
            b.add_char_filter(cf[0], **cf[1])
    b.with_tokenizer(tokenizer, **tok_params)
    for tf in token_filters:
        if isinstance(tf, str):
            b.add_token_filter(tf)
        else:
            b.add_token_filter(tf[0], **tf[1])
    return b.build()


def as_series_tokenizer(analyze):
    """Wrap a built analyzer as a CUSTOM_TOKENIZERS-compatible pandas
    Series hook."""
    def hook(content):
        return content.map(lambda s: analyze(s or ""))
    return hook
