"""Miscellaneous token filters — the lucene/analysis/miscellaneous role,
re-expressed as pure token-list functions (the repo's analyzer chains
compose them inside vectorized pandas maps).

Each function mirrors one reference filter, with its tests' vectors
pinned in tests/test_misc_filters.py:

- capitalization (CapitalizationFilter.java:103-196): per-token
  word-splitting on space/control/'.', keep list with forced first
  letter, okPrefix protection, minWordLength, maxWordCount backup
  restore, onlyFirstWord lowercasing the rest.
- codepoint_count / length / limit_token_count / truncate / trim /
  reverse_string / keep_words / stemmer_override: direct ports of the
  same-named filters.
- scandinavian_normalize (ScandinavianNormalizationFilter.java):
  ä→æ, ö→ø, aa/ao→å, ae→æ, oe/oo→ø (case-aware digraph collapse);
  scandinavian_fold (ScandinavianFoldingFilter.java): å/ä/æ→a,
  ö/ø→o, and the digraphs deleted to single letters.
- fingerprint (FingerprintFilter.java): sorted unique terms joined by
  the separator into ONE token; an over-limit fingerprint yields
  NOTHING (testMaxFingerprintSize).
- hyphenated_words (HyphenatedWordsFilter.java): a token with a
  trailing '-' joins the next token (hyphen dropped); a dangling
  hyphen at end-of-stream is kept.
- keyword_repeat + remove_duplicates (KeywordRepeatFilter.java +
  RemoveDuplicatesTokenFilter.java): emit original + stemmed at one
  position, dropping the stemmed copy when identical.
"""

from __future__ import annotations


def capitalization(tokens: list[str], only_first_word: bool = True,
                   keep: frozenset | set | None = None,
                   force_first_letter: bool = True,
                   ok_prefix: tuple = (),
                   min_word_length: int = 0,
                   max_word_count: int = 2 ** 31 - 1,
                   max_token_length: int = 2 ** 31 - 1) -> list[str]:
    def process_word(w: str, word_count: int) -> str:
        if not w:
            return w
        if only_first_word and word_count > 0:
            return w.lower()
        if keep is not None and w in keep:
            if word_count == 0 and force_first_letter:
                return w[0].upper() + w[1:]
            return w
        if len(w) < min_word_length:
            return w
        for p in ok_prefix:
            if w.startswith(p):
                return w
        return w[0].upper() + w[1:].lower()

    out = []
    for tok in tokens:
        if len(tok) >= max_token_length:
            out.append(tok)
            continue
        # exact replica of the reference's in-place scan, including its
        # skip of the character following a separator (java:120-131)
        buf = list(tok)
        word_count = 0
        last_word_start = 0
        i = 0
        while i < len(buf):
            c = buf[i]
            if c <= " " or c == ".":
                length = i - last_word_start
                if length > 0:
                    w = "".join(buf[last_word_start:i])
                    buf[last_word_start:i] = list(
                        process_word(w, word_count))
                    word_count += 1
                    last_word_start = i + 1
                    i += 1
            i += 1
        if last_word_start < len(buf):
            w = "".join(buf[last_word_start:])
            buf[last_word_start:] = list(process_word(w, word_count))
            word_count += 1
        if word_count > max_word_count:
            out.append(tok)
        else:
            out.append("".join(buf))
    return out


def codepoint_count(tokens: list[str], min_count: int,
                    max_count: int) -> list[str]:
    return [t for t in tokens if min_count <= len(t) <= max_count]


def keep_words(tokens: list[str], words) -> list[str]:
    ws = set(words)
    return [t for t in tokens if t in ws]


def stemmer_override(tokens: list[str], overrides: dict,
                     ignore_case: bool = False):
    """(token, is_keyword) pairs — overridden tokens are keyword-marked
    so downstream stemmers skip them (StemmerOverrideFilter.java)."""
    if ignore_case:
        overrides = {k.lower(): v for k, v in overrides.items()}
    out = []
    for t in tokens:
        key = t.lower() if ignore_case else t
        if key in overrides:
            out.append((overrides[key], True))
        else:
            out.append((t, False))
    return out


def trim(tokens: list[str]) -> list[str]:
    return [t.strip() for t in tokens]


def truncate(tokens: list[str], length: int) -> list[str]:
    return [t[:length] for t in tokens]


def reverse_string(tokens: list[str]) -> list[str]:
    return [t[::-1] for t in tokens]


def limit_token_count(tokens: list[str], max_count: int) -> list[str]:
    return tokens[:max_count]


_SCAN_NORM_SINGLE = {"ä": "æ", "Ä": "Æ", "ö": "ø", "Ö": "Ø"}
_SCAN_FOLD_SINGLE = {"å": "a", "ä": "a", "æ": "a",
                     "Å": "A", "Ä": "A", "Æ": "A",
                     "ö": "o", "ø": "o", "Ö": "O", "Ø": "O"}


def _digraph_pass(word: str, single: dict, aa_to: str | None,
                  ae_to: str | None, oe_to: str | None) -> str:
    out, i, n = [], 0, len(word)
    while i < n:
        c = word[i]
        if c in single:
            out.append(single[c])
            i += 1
            continue
        if i < n - 1:
            nxt = word[i + 1]
            if c in "aA" and nxt in "aAoO" and aa_to is not None:
                out.append(aa_to if c == "a" else aa_to.upper())
                i += 2
                continue
            if c in "aA" and nxt in "eE" and ae_to is not None:
                out.append(ae_to if c == "a" else ae_to.upper())
                i += 2
                continue
            if c in "oO" and nxt in "eEoO" and oe_to is not None:
                out.append(oe_to if c == "o" else oe_to.upper())
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def scandinavian_normalize(tokens: list[str]) -> list[str]:
    return [_digraph_pass(t, _SCAN_NORM_SINGLE, "å", "æ", "ø")
            for t in tokens]


def scandinavian_fold(tokens: list[str]) -> list[str]:
    return [_digraph_pass(t, _SCAN_FOLD_SINGLE, "a", "a", "o")
            for t in tokens]


def fingerprint(tokens: list[str], separator: str = " ",
                max_output_token_size: int = 1024) -> list[str]:
    uniq = sorted(set(tokens))
    if not uniq:
        return []
    joined = separator.join(uniq)
    if len(joined) > max_output_token_size:
        return []
    return [joined]


def hyphenated_words(tokens: list[str]) -> list[str]:
    out, pending = [], None
    for tok in tokens:
        if pending is not None:
            tok = pending + tok
            pending = None
        if tok.endswith("-"):
            pending = tok[:-1]
        else:
            out.append(tok)
    if pending is not None:
        out.append(pending + "-")
    return out


def keyword_repeat(tokens: list[str], stem_fn) -> list[tuple[str, int]]:
    """KeywordRepeatFilter → stemmer → RemoveDuplicatesTokenFilter:
    (term, posInc) pairs with the stemmed variant stacked at posInc 0,
    dropped when identical to the original."""
    out: list[tuple[str, int]] = []
    for tok in tokens:
        out.append((tok, 1))
        stemmed = stem_fn(tok)
        if stemmed != tok:
            out.append((stemmed, 0))
    return out


def remove_duplicates(tokens_with_inc: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """RemoveDuplicatesTokenFilter.java: drop a token whose term already
    occurred at the same position (posInc 0 stack)."""
    out, seen = [], set()
    for term, inc in tokens_with_inc:
        if inc > 0:
            seen = {term}
            out.append((term, inc))
        elif term not in seen:
            seen.add(term)
            out.append((term, inc))
    return out


def delimited_term_frequency(tokens: list[str],
                             delimiter: str = "|") -> list[tuple[str, int]]:
    """DelimitedTermFrequencyTokenFilter.java: "term|N" carries an
    explicit term frequency (the rightmost delimiter splits); tokens
    without the delimiter default to tf 1. Non-numeric frequencies
    raise, as the reference's int parse does."""
    out = []
    for t in tokens:
        pos = t.rfind(delimiter)
        if pos < 0:
            out.append((t, 1))
        else:
            out.append((t[:pos], int(t[pos + 1:])))
    return out


def date_recognizer(tokens, date_format="%m/%d/%Y"):
    """DateRecognizerFilter.java: keep only tokens that parse as dates
    under the format (the SimpleDateFormat role; lenient single-digit
    fields accepted, as in the reference's 7/11/2006 vector)."""
    from datetime import datetime

    out = []
    for t in tokens:
        try:
            datetime.strptime(t, date_format)
            out.append(t)
        except ValueError:
            pass
    return out


SEP_LABEL = "\u001f"    # ConcatenateGraphFilter.SEP_LABEL


def concatenate_graph(tokens_with_inc,
                      preserve_sep=True,
                      max_graph_expansions=100):
    """ConcatenateGraphFilter.java: the token graph collapses into one
    output per path — stacked tokens (posInc 0, e.g. synonyms) branch,
    positions join with SEP_LABEL (or nothing when preserveSep=false);
    expansion count capped at maxGraphExpansions."""
    positions = []
    for term, inc in tokens_with_inc:
        if inc > 0 or not positions:
            positions.append([term])
        else:
            positions[-1].append(term)
    sep = SEP_LABEL if preserve_sep else ""
    paths = [""]
    first = True
    for alts in positions:
        new_paths = []
        for p in paths:
            for alt in alts:
                if len(new_paths) >= max_graph_expansions:
                    break
                new_paths.append(alt if first else p + sep + alt)
        paths = new_paths
        first = False
    return paths
