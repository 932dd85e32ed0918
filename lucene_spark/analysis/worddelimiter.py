"""WordDelimiterGraphFilter — subword splitting with optional
catenation, as a pure token→parts function for the analysis chain.

Role analogue: lucene/analysis/common .../miscellaneous/
WordDelimiterGraphFilter.java (flags, buffering, the startPart-asc /
endPart-desc emission sort, posInc bookkeeping at
WordDelimiterGraphFilter.java:380-431) driven by WordDelimiterIterator
(WordDelimiterIterator.java:146-243: isBreak transition table, bounds
stripping, English-possessive skipping).

Splitting rules (all reference-exact, validated against the expected
token/position vectors published in the reference's own
TestWordDelimiterGraphFilter.java):

- split on intra-word delimiters (non-alphanumeric), case transitions
  (``PowerShot`` → ``Power, Shot``) and letter↔number transitions
  (``SD500`` → ``SD, 500``), each gated by its flag;
- leading/trailing delimiters stripped; trailing ``'s`` removed per
  subword under STEM_ENGLISH_POSSESSIVE;
- CATENATE_WORDS / CATENATE_NUMBERS / CATENATE_ALL emit maximal-run
  concatenations positioned at the run's FIRST subword (the graph
  startPos — note the reference javadoc's "last subword" examples
  predate the graph rewrite; the code and its tests place catenations
  at the first part, see testLotsOfConcatenating's posInc vector);
- PRESERVE_ORIGINAL emits the unmodified token first at position 0.

Flattening: this engine indexes flat positions (posLen is ignored at
index time, exactly as Lucene's indexer does), so `expand_tokens`
replays the filter's posInc arithmetic (accumPosInc + startPos -
wordPos) to assign absolute positions; swallowed all-delimiter tokens
leave holes, matching FilteringTokenFilter-style gaps.

Unicode: char classes mirror WordDelimiterIterator.getType via
unicodedata categories (Lu→UPPER, Ll→LOWER, Lt/Lm/Lo/Mn/Me/Mc→ALPHA,
Nd/Nl/No→DIGIT, surrogates→ALPHANUM, else SUBWORD_DELIM). Divergence
note: Java's isLowerCase also honors Other_Lowercase contributory
properties (e.g. U+00AA ª), which unicodedata's category view calls Lo
→ ALPHA here; affects only break decisions around those rare chars.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

__all__ = [
    "GENERATE_WORD_PARTS", "GENERATE_NUMBER_PARTS", "CATENATE_WORDS",
    "CATENATE_NUMBERS", "CATENATE_ALL", "PRESERVE_ORIGINAL",
    "SPLIT_ON_CASE_CHANGE", "SPLIT_ON_NUMERICS",
    "STEM_ENGLISH_POSSESSIVE", "WDGF_DEFAULT_FLAGS",
    "token_parts", "expand_tokens",
]

# WordDelimiterGraphFilter.java:95-147 — configuration flags
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

_ALL_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_WORDS
              | CATENATE_NUMBERS | CATENATE_ALL | PRESERVE_ORIGINAL
              | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
              | STEM_ENGLISH_POSSESSIVE)

#: the WordDelimiterGraphFilterFactory defaults (generate parts, split
#: on case/numerics, stem possessives) — the common index-time setup
WDGF_DEFAULT_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                      | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
                      | STEM_ENGLISH_POSSESSIVE)

# char classes — WordDelimiterIterator.java:29-37
_LOWER, _UPPER, _DIGIT, _DELIM = 0x01, 0x02, 0x04, 0x08
_ALPHA = _LOWER | _UPPER


@lru_cache(maxsize=4096)
def _char_type(ch: str) -> int:
    """WordDelimiterIterator.getType (WordDelimiterIterator.java:313)."""
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return _UPPER
    if cat == "Ll":
        return _LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return _ALPHA
    if cat in ("Nd", "Nl", "No"):
        return _DIGIT
    if cat == "Cs":  # surrogate: prevent splitting
        return _ALPHA | _DIGIT
    return _DELIM


class _Iter:
    """WordDelimiterIterator: subword slices of one token."""

    DONE = -1

    def __init__(self, text: str, split_case: bool, split_num: bool,
                 stem_poss: bool):
        self.text = text
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        n = len(text)
        self.start_bounds = 0
        self.end_bounds = n
        self.skip_possessive = False
        self.has_final_possessive = False
        # setBounds (WordDelimiterIterator.java:263-275)
        while (self.start_bounds < n
               and _char_type(text[self.start_bounds]) & _DELIM):
            self.start_bounds += 1
        while (self.end_bounds > self.start_bounds
               and _char_type(text[self.end_bounds - 1]) & _DELIM):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds
        self.end = 0  # pre-first-next state; next() starts from end

    def _ends_with_possessive(self, pos: int) -> bool:
        t = self.text
        return (self.stem_poss and pos > 2
                and t[pos - 2] == "'" and t[pos - 1] in "sS"
                and _char_type(t[pos - 3]) & _ALPHA != 0
                and (pos == self.end_bounds
                     or _char_type(t[pos]) & _DELIM != 0))

    def _is_break(self, last_type: int, typ: int) -> bool:
        # WordDelimiterIterator.java:225-243
        if typ & last_type:
            return False
        if (not self.split_case and last_type & _ALPHA and typ & _ALPHA):
            return False
        if (last_type & _UPPER) and (typ & _ALPHA):
            return False  # UPPER->letter: don't split
        if (not self.split_num
                and ((last_type & _ALPHA and typ & _DIGIT)
                     or (last_type & _DIGIT and typ & _ALPHA))):
            return False
        return True

    def next(self) -> int:
        # WordDelimiterIterator.java:146-180
        self.current = self.end
        if self.current == self.DONE:
            return self.DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        t, eb = self.text, self.end_bounds
        last_type = 0
        while self.current < eb:
            last_type = _char_type(t[self.current])
            if not last_type & _DELIM:
                break
            self.current += 1
        if self.current >= eb:
            self.end = self.DONE
            return self.DONE
        self.end = self.current + 1
        while self.end < eb:
            typ = _char_type(t[self.end])
            if self._is_break(last_type, typ):
                break
            last_type = typ
            self.end += 1
        if self.end < eb - 1 and self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == self.DONE:
            return 0
        typ = _char_type(self.text[self.current])
        return _ALPHA if typ & _ALPHA else typ

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return (self.current == self.start_bounds
                    and self.end == self.end_bounds - 2)
        return (self.current == self.start_bounds
                and self.end == self.end_bounds)


class _Concat:
    """WordDelimiterConcatenation — a buffered run of same-class parts."""

    __slots__ = ("parts", "start_part", "end_part", "start_pos", "type",
                 "subword_count")

    def __init__(self):
        self.clear()

    def clear(self):
        self.parts: list[str] = []
        self.start_part = self.end_part = self.type = 0
        self.start_pos = 0
        self.subword_count = 0

    def is_empty(self) -> bool:
        return not self.parts

    def append(self, text: str):
        self.parts.append(text)
        self.subword_count += 1

    def term(self) -> str:
        return "".join(self.parts)


# sentinel: token passes through unchanged (no delimiters / protected)
_PASSTHROUGH = None


def token_parts(
    token: str, flags: int, protected: frozenset[str] = frozenset()
) -> list[tuple[str, int]] | None:
    """All graph parts of one token as (term, startPos) in emission
    order (original first under PRESERVE_ORIGINAL, then parts sorted by
    startPart asc / endPart desc — WDGF's PositionSorter). Returns None
    for tokens the filter passes through untouched (no delimiters, or
    protected words), and [] for all-delimiter tokens (swallowed —
    PRESERVE_ORIGINAL handling is the caller's, matching
    incrementToken's early returns at WordDelimiterGraphFilter.java:
    355-380)."""
    if flags & ~_ALL_FLAGS:
        raise ValueError(f"flags contains unrecognized flag: {flags}")
    it = _Iter(token, bool(flags & SPLIT_ON_CASE_CHANGE),
               bool(flags & SPLIT_ON_NUMERICS),
               bool(flags & STEM_ENGLISH_POSSESSIVE))
    it.next()
    if (it.current == 0 and it.end == len(token)) or token in protected:
        return _PASSTHROUGH
    if it.end == _Iter.DONE:
        return []

    # bufferWordParts (WordDelimiterGraphFilter.java:252-338)
    gen_words = bool(flags & GENERATE_WORD_PARTS)
    gen_nums = bool(flags & GENERATE_NUMBER_PARTS)
    cat_words = bool(flags & CATENATE_WORDS)
    cat_nums = bool(flags & CATENATE_NUMBERS)
    cat_all = bool(flags & CATENATE_ALL)
    preserve = bool(flags & PRESERVE_ORIGINAL)

    def should_generate(wt: int) -> bool:
        return (gen_words and wt & _ALPHA != 0) or (gen_nums and wt & _DIGIT)

    def should_concatenate(wt: int) -> bool:
        return (cat_words and wt & _ALPHA != 0) or (cat_nums and wt & _DIGIT)

    # buffered rows: [term, startPos, endPos, startPart, endPart]
    buffered: list[list] = []
    word_pos = 0
    last_concat_count = 0
    concat, concat_all = _Concat(), _Concat()

    def concatenate(c: _Concat):
        if c.is_empty():
            c.type = it.type()
            c.start_part = it.current
            c.start_pos = word_pos
        c.append(token[it.current:it.end])
        c.end_part = it.end

    def write_concat(c: _Concat):
        buffered.append([c.term(), c.start_pos, word_pos,
                         c.start_part, c.end_part])

    def flush_concat(c: _Concat):
        nonlocal word_pos, last_concat_count
        if word_pos == c.start_pos:
            word_pos += 1
        last_concat_count = c.subword_count
        if c.subword_count != 1 or not should_generate(c.type):
            write_concat(c)
        c.clear()

    if preserve:
        buffered.append([token, 0, 1, 0, len(token)])

    if it.is_single_word():
        buffered.append([token[it.current:it.end], word_pos, word_pos + 1,
                         it.current, it.end])
        word_pos += 1
        it.next()
    else:
        while it.end != _Iter.DONE:
            wt = it.type()
            if not concat.is_empty() and (concat.type & wt) == 0:
                flush_concat(concat)
            if should_concatenate(wt):
                concatenate(concat)
            if cat_all:
                concatenate(concat_all)
            if should_generate(wt):
                buffered.append([token[it.current:it.end], word_pos,
                                 word_pos + 1, it.current, it.end])
                word_pos += 1
            it.next()
        if not concat.is_empty():
            flush_concat(concat)
        if not concat_all.is_empty():
            # only if not already emitted as an identical CATENATE_WORDS run
            if concat_all.subword_count > last_concat_count:
                if word_pos == concat_all.start_pos:
                    word_pos += 1
                write_concat(concat_all)
            concat_all.clear()

    if preserve:
        if word_pos == 0:
            word_pos = 1
        buffered[0][2] = word_pos  # original spans all positions

    head = buffered[:1] if preserve else []
    tail = sorted(buffered[1:] if preserve else buffered,
                  key=lambda r: (r[3], -r[4]))  # PositionSorter
    return [(r[0], r[1]) for r in head + tail]


# per-process memo: token → parts is pure, and corpus vocabulary is
# zipfian, so the hot tokens hit this instead of re-iterating (the same
# unique-vocab economics as the chain's stemmer table)
_cached_parts = lru_cache(maxsize=1 << 16)(token_parts)


def expand_tokens(
    tokens: list[str], flags: int, protected: frozenset[str] = frozenset()
) -> tuple[list[str], list[int]]:
    """Run the filter over a whitespace-tokenized stream and flatten the
    graph to absolute positions (the index-time view: posInc honored,
    posLen dropped). Mirrors incrementToken's accumPosInc/wordPos
    arithmetic (WordDelimiterGraphFilter.java:340-431): each input
    token's parts occupy positions base+startPos; the cursor then
    advances past the LAST emitted part's startPos; swallowed
    all-delimiter tokens leave a position hole."""
    out_t: list[str] = []
    out_p: list[int] = []
    pos = -1       # last emitted absolute position
    accum = 0      # accumPosInc
    for tok in tokens:
        accum += 1  # whitespace tokenizer always increments by 1
        parts = _cached_parts(tok, flags, protected)
        if parts is _PASSTHROUGH:
            pos += accum
            accum = 0
            out_t.append(tok)
            out_p.append(pos)
            continue
        if not parts:
            if flags & PRESERVE_ORIGINAL:
                # reference keeps the token's own increment and resets
                # the accumulator (incrementToken's delimiter-only arm)
                pos += 1
                accum = 0
                out_t.append(tok)
                out_p.append(pos)
            # else swallowed: the +1 stays in accum → position hole
            continue
        word_pos = 0
        for term, start_pos in parts:
            pos += accum + start_pos - word_pos
            accum = 0
            word_pos = start_pos
            out_t.append(term)
            out_p.append(pos)
    return out_t, out_p
