"""Japanese morphological analysis — the kuromoji JapaneseTokenizer role.

A Viterbi lattice segmenter over a MeCab-style dictionary, re-implemented
from the reference's semantics (no code or compiled dictionary data taken):

- lattice/cost model: analysis/kuromoji/src/java/org/apache/lucene/analysis/
  ja/JapaneseTokenizer.java:494-561 (`add`: path cost + connection cost
  (bigram of right_id→left_id) + word cost; BOS enters with right_id 0,
  EOS closes with conn(last_right_id, 0) — lines 1023-1039)
- dictionary prefix matches: JapaneseTokenizer.java:915-960 (FST walk from
  each live position; every final arc adds one arc per word id)
- unknown words: JapaneseTokenizer.java:962-1013 — generated when no
  dictionary match starts at the position OR the character class has the
  INVOKE flag; GROUP class flag extends the unknown word across the run of
  same-class characters with the same is-punctuation value, capped at
  MAX_UNKNOWN_WORD_LENGTH=1024; in NORMAL mode unknown generation is not
  re-invoked inside a previous unknown span (line 963:
  `!searchMode && unknownWordEndIndex > posData.pos`)
- character classes: dict/CharacterDefinition.java:52-66 (NGRAM DEFAULT
  SPACE SYMBOL NUMERIC ALPHA CYRILLIC GREEK HIRAGANA KATAKANA KANJI
  KANJINUMERIC); the class ranges and INVOKE/GROUP flags below follow the
  published mecab-ipadic char.def (public data of the published IPADIC
  model), which is what the reference's compiled CharacterDefinition.dat
  encodes
- punctuation: JapaneseTokenizer.java:2068-2090 (Unicode category switch);
  punctuation tokens are discarded when discard_punctuation (the
  analyzers' default, JapaneseAnalyzer)
- SEARCH mode (r5 — the r4 deviation is CLOSED): the forward Viterbi
  carries NO penalty (every parse() add() call passes addPenalty=false,
  java:952/1007); instead, during backtrace a long best-path token
  (all-kanji len>2 → (len-2)*3000, other len>7 → (len-7)*1700,
  java:106-112/382-399) triggers the 2nd-best machinery
  (java:1818-1931 + pruneAndRescore:1086-1180): the [start,end)
  sub-lattice is rebuilt from the compound's own predecessor (force
  congruence) keeping only arcs inside the span, re-scored WITH
  penalties, and if the cheapest rebuilt arrival — adjusted by the
  connection cost to the token on the right (lastLeftWordID) — is
  within compound_cost + penalty and decomposes, the backtrace
  redirects onto the parts. `discard_compound_token=False` also emits
  the compound with pos_len spanning the parts (outputCompounds);
  JapaneseAnalyzer's default discards it (JapaneseAnalyzer.java:95).
- EXTENDED mode (r5): SEARCH plus unknown-word unigram emission —
  every UNKNOWN token converts to per-character tokens
  (java:2007-2032; punctuation unigrams drop under
  discard_punctuation). Python strings make the surrogate-pair
  special case vacuous.

The bundled IPADIC binary is not shipped (it is compiled binary data);
`JapaneseTokenizer` takes any user lexicon (surface, left_id, right_id,
cost, pos) + connection-cost map — the exact cost semantics are what the
tests pin, including a brute-force all-segmentations oracle.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

from lucene_spark.analysis.userdict import (JA_USER_LEFT_ID,
                                            JA_USER_RIGHT_ID,
                                            JA_USER_WORD_COST, JaUserEntry)

# character classes (CharacterDefinition.java:52-66)
NGRAM, DEFAULT, SPACE, SYMBOL, NUMERIC, ALPHA, CYRILLIC, GREEK, \
    HIRAGANA, KATAKANA, KANJI, KANJINUMERIC = range(12)

# mecab-ipadic char.def INVOKE/GROUP flags (public IPADIC data; the
# reference compiles the same table into CharacterDefinition.dat):
#   class: (invoke, group)
_INVOKE = {
    DEFAULT: False, SPACE: False, KANJI: False, SYMBOL: True,
    NUMERIC: True, ALPHA: True, HIRAGANA: False, KATAKANA: True,
    KANJINUMERIC: True, GREEK: True, CYRILLIC: True, NGRAM: False,
}
_GROUP = {
    DEFAULT: True, SPACE: True, KANJI: False, SYMBOL: True,
    NUMERIC: True, ALPHA: True, HIRAGANA: True, KATAKANA: True,
    KANJINUMERIC: True, GREEK: True, CYRILLIC: True, NGRAM: False,
}

# unknown-word per-class entries: (left_id, right_id, word_cost) — one
# entry per class, modeled on the IPADIC unk.def magnitudes (KATAKANA and
# ALPHA runs are cheap single nouns; KANJI unknowns are expensive, which
# is what makes dictionary entries win when present)
_UNK_COSTS = {
    DEFAULT: (5, 5, 4769),
    SPACE: (9, 9, 1203),
    KANJI: (2, 2, 13581),
    SYMBOL: (3, 3, 1777),
    NUMERIC: (7, 7, 2286),
    ALPHA: (6, 6, 1756),
    HIRAGANA: (4, 4, 9461),
    KATAKANA: (8, 8, 3003),
    KANJINUMERIC: (2, 2, 13581),
    GREEK: (6, 6, 1756),
    CYRILLIC: (6, 6, 1756),
    NGRAM: (5, 5, 4769),
}

MAX_UNKNOWN_WORD_LENGTH = 1024          # JapaneseTokenizer.java:115
SEARCH_MODE_KANJI_LENGTH = 2            # :106
SEARCH_MODE_OTHER_LENGTH = 7            # :108
SEARCH_MODE_KANJI_PENALTY = 3000        # :110
SEARCH_MODE_OTHER_PENALTY = 1700        # :112

_PUNCT_CATS = frozenset([
    "Zs", "Zl", "Zp", "Cc", "Cf", "Pd", "Ps", "Pe", "Pc", "Po",
    "Sm", "Sc", "Sk", "So", "Pi", "Pf",
])


def is_punctuation(ch: str) -> bool:
    """JapaneseTokenizer.isPunctuation (java:2068-2090): Unicode general
    categories mapping 1:1 to Character.getType cases."""
    return unicodedata.category(ch) in _PUNCT_CATS


def char_class(ch: str) -> int:
    """CharacterDefinition.getCharacterClass — the char.def range map
    (published mecab-ipadic char.def ranges; reference compiles the same
    ranges into its .dat)."""
    cp = ord(ch)
    if ch.isspace():
        return SPACE
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF \
            or 0xF900 <= cp <= 0xFAFF:
        # KANJINUMERIC (一二三四五六七八九十百千万億兆) — char.def
        # singles them out of the KANJI block
        if ch in "一二三四五六七八九十百千万億兆":
            return KANJINUMERIC
        return KANJI
    if 0x3041 <= cp <= 0x309F:
        return HIRAGANA
    if 0x30A1 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF \
            or cp in (0xFF70,) or 0xFF66 <= cp <= 0xFF9D:
        return KATAKANA
    if ch.isdigit() or 0xFF10 <= cp <= 0xFF19:
        return NUMERIC
    if ("a" <= ch <= "z") or ("A" <= ch <= "Z") \
            or 0xFF21 <= cp <= 0xFF3A or 0xFF41 <= cp <= 0xFF5A:
        return ALPHA
    if 0x0370 <= cp <= 0x03FF:
        return GREEK
    if 0x0400 <= cp <= 0x04FF:
        return CYRILLIC
    if 0x3000 <= cp <= 0x303F or 0xFF00 <= cp <= 0xFFEF \
            or 0x2000 <= cp <= 0x206F:
        return SYMBOL
    return DEFAULT


@dataclass(frozen=True)
class DictEntry:
    surface: str
    left_id: int
    right_id: int
    cost: int
    pos: str = "名詞"
    base_form: str = ""       # dictionary form ("" = surface itself) —
                              # the JapaneseBaseFormFilter source
    reading: str = ""         # katakana reading ("" = none known) —
                              # the JapaneseReadingFormFilter source


@dataclass
class JaDictionary:
    """Seeded user lexicon + connection costs. `conn` maps
    (right_id_of_prev, left_id_of_next) → bigram cost; absent pairs cost
    `default_conn` (the matrix role of ConnectionCosts.java)."""
    entries: list[DictEntry] = field(default_factory=list)
    conn: dict[tuple[int, int], int] = field(default_factory=dict)
    default_conn: int = 0

    def __post_init__(self):
        self._by_prefix: dict[str, list[DictEntry]] = {}
        self._max_len = 0
        for e in self.entries:
            self._by_prefix.setdefault(e.surface, []).append(e)
            self._max_len = max(self._max_len, len(e.surface))

    def matches(self, text: str, pos: int) -> list[tuple[int, DictEntry]]:
        """All dictionary words starting at `pos` → (end, entry) — the
        TokenInfoFST prefix walk (JapaneseTokenizer.java:915-960)."""
        out = []
        limit = min(len(text), pos + self._max_len)
        for end in range(pos + 1, limit + 1):
            for e in self._by_prefix.get(text[pos:end], ()):
                out.append((end, e))
        return out

    def conn_cost(self, right_id: int, left_id: int) -> int:
        return self.conn.get((right_id, left_id), self.default_conn)


@dataclass(frozen=True)
class JaToken:
    surface: str
    start: int
    end: int
    known: bool
    pos: str
    pos_len: int = 1        # compound tokens span their parts (SEARCH
                            # mode with discard_compound_token=False)
    base_form: str = ""     # dictionary form ("" = surface)
    reading: str = ""       # katakana reading ("" = unknown)


class JapaneseTokenizer:
    """Viterbi lattice segmenter (JapaneseTokenizer.java semantics; see
    module docstring for the file:line map and the one documented SEARCH-
    mode deviation)."""

    def __init__(self, dictionary: JaDictionary | None = None,
                 mode: str = "normal", discard_punctuation: bool = True,
                 discard_compound_token: bool = True,
                 user_dictionary=None):
        self.dict = dictionary or JaDictionary()
        # kuromoji user dictionary (analysis/userdict.JaUserDictionary):
        # consulted before the system dictionary; a user match
        # suppresses system lookups at that position (java:873-911)
        self.user_dict = user_dictionary
        if mode not in ("normal", "search", "extended"):
            raise ValueError("mode must be 'normal', 'search' or "
                             "'extended'")
        # EXTENDED = SEARCH + unknown-word unigram emission
        # (JapaneseTokenizer.java:309-313 / 2007-2032)
        self.search_mode = mode in ("search", "extended")
        self.extended = mode == "extended"
        self.discard_punctuation = discard_punctuation
        # JapaneseAnalyzer passes discardCompoundToken=true (Lucene 9
        # JapaneseAnalyzer.java:95) — SEARCH mode then outputs only the
        # decomposition; False re-emits the compound with pos_len
        self.output_compounds = self.search_mode and not discard_compound_token

    def _penalty(self, text: str, pos: int, length: int) -> int:
        # computePenalty (java:382-399)
        if not self.search_mode or length <= SEARCH_MODE_KANJI_LENGTH:
            return 0
        if all(char_class(c) in (KANJI, KANJINUMERIC)
               for c in text[pos:pos + length]):
            return (length - SEARCH_MODE_KANJI_LENGTH) * SEARCH_MODE_KANJI_PENALTY
        if length > SEARCH_MODE_OTHER_LENGTH:
            return (length - SEARCH_MODE_OTHER_LENGTH) * SEARCH_MODE_OTHER_PENALTY
        return 0

    def _build_lattice(self, text: str) -> list:
        """Forward Viterbi pass; shared by tokenize() and
        tokenize_nbest()."""
        n = len(text)
        INF = float("inf")
        # best[pos] = list of arcs arriving: (cost, right_id, back_pos,
        # back_arc_idx, surface, known, pos_tag, left_id, word_cost,
        # entry) — the Position array; left_id/word_cost retained so the
        # SEARCH-mode pruneAndRescore pass can re-score the sub-lattice,
        # entry so tokens carry base form / reading
        arrive: list[list[tuple]] = [[] for _ in range(n + 1)]
        arrive[0].append((0, 0, -1, -1, "", True, "", 0, 0, None))  # BOS
        unknown_end = -1
        for pos in range(n):
            if not arrive[pos]:
                continue

            def add_arc(end: int, left_id: int, right_id: int,
                        word_cost: int, surface: str, known: bool,
                        pos_tag: str, entry=None) -> None:
                # JapaneseTokenizer.add (java:494-561): min over incoming
                # arcs of (path + bigram), then + word cost. The MAIN
                # forward pass carries NO search-mode penalty (every
                # parse() call site passes addPenalty=false, java:952/
                # 1007) — the penalty lives in the backtrace threshold
                # and the pruneAndRescore rebuild only (r4's forward-
                # penalty application was the documented deviation,
                # closed in r5)
                least, least_idx = INF, -1
                for idx, a in enumerate(arrive[pos]):
                    c = a[0] + self.dict.conn_cost(a[1], left_id)
                    if c < least:
                        least, least_idx = c, idx
                least += word_cost
                arrive[end].append((least, right_id, pos, least_idx,
                                    surface, known, pos_tag,
                                    left_id, word_cost, entry))

            # user dictionary first; any user match suppresses system
            # lookups at this position (JapaneseTokenizer.java:873-911)
            any_matches = False
            if self.user_dict is not None:
                for end, ue in self.user_dict.matches(text, pos):
                    add_arc(end, JA_USER_LEFT_ID, JA_USER_RIGHT_ID,
                            JA_USER_WORD_COST, ue.surface, True, ue.pos,
                            ue)
                    any_matches = True
            if not any_matches:
                for end, e in self.dict.matches(text, pos):
                    add_arc(end, e.left_id, e.right_id, e.cost, e.surface,
                            True, e.pos, e)
                    any_matches = True

            # normal mode: no unknown re-invocation inside a previous
            # unknown span (java:963-966)
            if not self.search_mode and unknown_end > pos:
                continue

            first = text[pos]
            cls = char_class(first)
            if not any_matches or _INVOKE[cls]:
                punct = is_punctuation(first)
                if not _GROUP[cls]:
                    length = 1
                else:
                    length = 1
                    while (length < MAX_UNKNOWN_WORD_LENGTH
                           and pos + length < n
                           and char_class(text[pos + length]) == cls
                           and is_punctuation(text[pos + length]) == punct):
                        length += 1
                left, right, cost = _UNK_COSTS[cls]
                add_arc(pos + length, left, right, cost,
                        text[pos:pos + length], False, "未知語")
                unknown_end = pos + length
        return arrive

    def tokenize(self, text: str) -> list[JaToken]:
        n = len(text)
        if n == 0:
            return []
        INF = float("inf")
        arrive = self._build_lattice(text)

        # EOS: min over arcs at n of cost + conn(right_id, 0) (java:1023-1039)
        best, best_idx = INF, -1
        for idx, a in enumerate(arrive[n]):
            c = a[0] + self.dict.conn_cost(a[1], 0)
            if c < best:
                best, best_idx = c, idx
        if best_idx < 0:
            return []    # no complete path (cannot happen: unknowns span)
        # backtrace, with the SEARCH-mode 2nd-best decomposition
        # (JapaneseTokenizer.backtrace:1818-1931 + pruneAndRescore): a
        # long token that SURVIVED the forward penalty is re-examined —
        # if a decomposition within penalty of the compound exists in
        # the pruned sub-lattice, emit it (and the compound itself when
        # output_compounds, with pos_len spanning the parts)
        out: list[JaToken] = []          # built right-to-left
        last_left_id = -1                # left id of the token to the right
        pos, idx = n, best_idx
        while pos > 0:
            a = arrive[pos][idx]
            (cost, right_id, back_pos, back_idx, surface, known,
             pos_tag, left_id, _wc, entry) = a
            if isinstance(entry, JaUserEntry):
                # USER arcs expand into their recorded segmentation and
                # are exempt from SEARCH-mode decomposition
                # (JapaneseTokenizer.java:1973-2000; :548/:1818)
                cur = pos
                for seg, rd in zip(reversed(entry.segments),
                                   reversed(entry.readings)):
                    out.extend(self._emit(JaToken(
                        seg, cur - len(seg), cur, True, entry.pos,
                        reading=rd)))
                    cur -= len(seg)
                last_left_id = left_id
                pos, idx = back_pos, back_idx
                continue
            parts = None
            if self.search_mode:
                penalty = self._penalty(text, back_pos, pos - back_pos)
                if penalty > 0:
                    parts = self._second_best(
                        arrive, text, back_pos, pos, a, last_left_id,
                        penalty)
            if parts:
                # parts come back left-to-right; emit right-to-left,
                # the compound LAST here = FIRST in text order (Lucene
                # pops the altToken before the decompounded parts)
                for pt in reversed(parts):
                    out.extend(self._emit(pt))
                if self.output_compounds:
                    out.append(JaToken(surface, back_pos, pos, known,
                                       pos_tag, pos_len=len(parts)))
                last_left_id = self._arc_left_id(arrive, parts[0])
            else:
                out.extend(self._emit(JaToken(
                    surface, back_pos, pos, known, pos_tag,
                    base_form=getattr(entry, "base_form", "") or "",
                    reading=getattr(entry, "reading", "") or "")))
                last_left_id = left_id
            pos, idx = back_pos, back_idx
        out.reverse()
        if self.discard_punctuation:
            out = [t for t in out
                   if not all(is_punctuation(c) for c in t.surface)]
        return out

    def tokenize_nbest(self, text: str, nbest_cost: int) -> list[JaToken]:
        """N-best output (setNBestCost, JapaneseTokenizer.java:1714 +
        backtraceNBest/Lattice): a token is emitted when its best
        THROUGH-path cost — leftCost + wordCost + rightCost, i.e. the
        cheapest full path using that arc (Lattice.cost(node)) — is
        within `nbest_cost` of the 1-best path. Spans dedupe
        (markSameSpanNode) and emit in (start, end) order, the
        reference's output order (TestJapaneseTokenizer:165-170:
        シニア before the longer same-start compound)."""
        n = len(text)
        if n == 0:
            return []
        arrive = self._build_lattice(text)
        INF = float("inf")
        # suffix cost of each arc (right cost): min continuation from
        # the arc's end through EOS, memoized right-to-left
        by_start: dict[int, list[tuple[int, int]]] = {}
        for pos in range(n + 1):
            for idx, a in enumerate(arrive[pos]):
                if a[2] >= 0:                 # skip BOS
                    by_start.setdefault(a[2], []).append((pos, idx))
        suffix: dict[tuple[int, int], float] = {}
        for end in range(n, -1, -1):
            for idx, a in enumerate(arrive[end]):
                right_id = a[1]
                if end == n:
                    suffix[(end, idx)] = self.dict.conn_cost(right_id, 0)
                    continue
                best = INF
                for (e2, i2) in by_start.get(end, ()):
                    b = arrive[e2][i2]
                    c = (self.dict.conn_cost(right_id, b[7])
                         + b[8] + suffix[(e2, i2)])
                    if c < best:
                        best = c
                suffix[(end, idx)] = best
        best_total = min(
            (a[0] + suffix[(n, i)] for i, a in enumerate(arrive[n])),
            default=INF)
        spans: dict[tuple[int, int], tuple] = {}
        for pos in range(1, n + 1):
            for idx, a in enumerate(arrive[pos]):
                through = a[0] + suffix[(pos, idx)]
                if through <= best_total + nbest_cost:
                    key = (a[2], pos)
                    if key not in spans or through < spans[key][0]:
                        spans[key] = (through, a[4], a[5], a[6])
        out = [JaToken(surf, s, e, known, pos_tag)
               for (s, e), (_, surf, known, pos_tag)
               in sorted(spans.items())]
        if self.discard_punctuation:
            out = [t for t in out
                   if not all(is_punctuation(c) for c in t.surface)]
        return out

    def _emit(self, tok: JaToken) -> list[JaToken]:
        """EXTENDED mode converts UNKNOWN tokens into character unigrams
        (JapaneseTokenizer.java:2007-2032, emitted right-to-left there —
        here the caller is already building right-to-left); punctuation
        unigrams drop under discard_punctuation. Python strings are
        codepoint sequences, so supplementary characters are single
        unigrams (the surrogate-pair special case handles itself)."""
        if not (self.extended and not tok.known):
            return [tok]
        out = []
        for i in range(len(tok.surface) - 1, -1, -1):
            ch = tok.surface[i]
            if self.discard_punctuation and is_punctuation(ch):
                continue
            out.append(JaToken(ch, tok.start + i, tok.start + i + 1,
                               False, tok.pos))
        return out

    @staticmethod
    def _arc_left_id(arrive, token: JaToken) -> int:
        for a in arrive[token.end]:
            if a[2] == token.start and a[4] == token.surface:
                return a[7]
        return -1

    def _second_best(self, arrive, text: str, bp: int, p: int,
                     compound_arc, last_left_id: int, penalty: int):
        """pruneAndRescore (java:1120-1175) + the 2nd-best selection
        (java:1849-1931): rebuild the [bp, p] sub-lattice from the
        compound's own best predecessor (force congruence), keeping only
        arcs wholly inside the span, re-scoring with penalties; accept
        the cheapest arrival at p within maxCost of the compound if it
        decomposes (back_pos != bp). Returns the part tokens
        left-to-right, or None."""
        ccost, cright, cback_idx = (compound_arc[0], compound_arc[1],
                                    compound_arc[3])
        max_cost = ccost + penalty
        if last_left_id != -1:
            max_cost += self.dict.conn_cost(cright, last_left_id)
        # forced start: the compound's own predecessor arc at bp
        start_arc = arrive[bp][cback_idx]
        path_cost, start_right = start_arc[0], start_arc[1]
        # rebuilt[q] = list of (cost, right_id, back_q, back_ridx,
        # surface, known, pos_tag, left_id)
        rebuilt: dict[int, list[tuple]] = {q: [] for q in range(bp, p + 1)}
        rebuilt[bp].append((path_cost, start_right, -1, -1, "", True,
                            "", -1))
        for q in range(bp, p):
            preds = rebuilt[q]
            if not preds:
                continue
            for to_pos in range(q + 1, p + 1):
                for a in arrive[to_pos]:
                    if a[2] != q:
                        continue
                    (_, a_right, _, _, a_surface, a_known, a_pos,
                     a_left, a_wc) = a[:9]
                    a_entry = a[9]
                    least, least_idx = float("inf"), -1
                    for ridx, pr in enumerate(preds):
                        c = pr[0] + self.dict.conn_cost(pr[1], a_left)
                        if c < least:
                            least, least_idx = c, ridx
                    least += a_wc + self._penalty(text, q, to_pos - q)
                    rebuilt[to_pos].append(
                        (least, a_right, q, least_idx, a_surface,
                         a_known, a_pos, a_left, a_entry))
        best, best_i = float("inf"), -1
        for i, a in enumerate(rebuilt[p]):
            c = a[0]
            if last_left_id != -1:
                c += self.dict.conn_cost(a[1], last_left_id)
            if c < best:
                best, best_i = c, i
        if best_i < 0 or best > max_cost or rebuilt[p][best_i][2] == bp:
            return None
        parts: list[JaToken] = []
        q, i = p, best_i
        while q > bp:
            a = rebuilt[q][i]
            ent = a[8]
            parts.append(JaToken(
                a[4], a[2], q, a[5], a[6],
                base_form=getattr(ent, "base_form", "") or "",
                reading=getattr(ent, "reading", "") or ""))
            q, i = a[2], a[3]
        parts.reverse()
        return parts

    def tokens(self, text: str) -> list[str]:
        return [t.surface for t in self.tokenize(text)]


def demo_dictionary() -> JaDictionary:
    """A small seeded lexicon (classic MeCab tutorial sentences + the
    compound-splitting examples the kuromoji tests use), with costs shaped
    like IPADIC magnitudes: particles cheap to attach, nouns moderate,
    compounds slightly cheaper than their parts in NORMAL mode so SEARCH
    mode's decomposition penalty is what splits them."""
    E = DictEntry
    entries = [
        # すもももももももものうち
        E("すもも", 10, 10, 7546),
        E("もも", 10, 10, 7219),
        E("も", 20, 20, 4669, pos="助詞"),
        E("の", 21, 21, 4816, pos="助詞"),
        E("うち", 10, 10, 5796),
        # 関西国際空港 compound + parts
        E("関西", 10, 10, 3000),
        E("国際", 10, 10, 3100),
        E("空港", 10, 10, 3200),
        E("関西国際空港", 10, 10, 5000),
        # 東京大学 compound + parts
        E("東京", 10, 10, 3000),
        E("大学", 10, 10, 3100),
        E("東京大学", 10, 10, 5500),
    ]
    conn = {
        # BOS/EOS transitions (id 0): nouns preferred at edges
        (0, 10): 500, (10, 0): 500,
        (0, 20): 3000, (20, 0): 3000,
        (0, 21): 3000, (21, 0): 3000,
        # noun→particle cheap, particle→noun cheap (the glue that makes
        # すもも|も|もも|も|もも|の|うち beat greedy もも splits)
        (10, 20): -2000, (20, 10): -1500,
        (10, 21): -2000, (21, 10): -1500,
        (10, 10): 2500,        # noun→noun juncture is expensive
        (20, 21): 2000, (21, 20): 2000, (20, 20): 4000, (21, 21): 4000,
    }
    return JaDictionary(entries=entries, conn=conn, default_conn=1000)


_DEFAULT_DICT = None


def default_dictionary() -> JaDictionary:
    """The seeded LARGE lexicon (~10k entries — scripts/gen_ja_lexicon.py,
    VERDICT r4 item 4): IPADIC-shaped structure (kanji nouns/compounds
    with parts, katakana loanwords, full particle/aux sets, verb
    conjugations) + a structured 21-class connection matrix. The
    reference's compiled IPADIC buffer is absent from its checkout, so
    the data is generated, not extracted — the SEMANTICS (lattice, costs,
    unknown handling, pruneAndRescore) are the reference's."""
    global _DEFAULT_DICT
    if _DEFAULT_DICT is None:
        import os

        import numpy as np

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "ja_lexicon.npz")
        z = np.load(path, allow_pickle=True)
        entries = [
            DictEntry(str(s), int(l), int(r), int(c), str(p),
                      base_form=str(b), reading=str(rd))
            for s, l, r, c, p, b, rd in zip(
                z["surfaces"], z["left_ids"], z["right_ids"],
                z["costs"], z["pos"], z["base_forms"], z["readings"])]
        conn = {(int(k[0]), int(k[1])): int(v)
                for k, v in zip(z["conn_keys"], z["conn_vals"])}
        _DEFAULT_DICT = JaDictionary(entries=entries, conn=conn,
                                     default_conn=int(z["default_conn"]))
    return _DEFAULT_DICT


def base_form(tok: JaToken) -> str:
    """JapaneseBaseFormFilter.java: replace the term with its dictionary
    form when the token carries one."""
    return tok.base_form or tok.surface


def reading_form(tok: JaToken) -> str:
    """JapaneseReadingFormFilter.java (katakana output): replace the
    term with its reading; tokens without one keep the surface."""
    return tok.reading or tok.surface


def japanese_analyzer_tokens(text: str,
                             tokenizer: "JapaneseTokenizer | None" = None
                             ) -> list[str]:
    """The FULL JapaneseAnalyzer chain (JapaneseAnalyzer.java:95-101):
    JapaneseTokenizer(SEARCH, discardPunctuation, discardCompoundToken)
    → JapaneseBaseFormFilter → JapanesePartOfSpeechStopFilter (the
    reference's stoptags.txt, exact POS match) → CJKWidthFilter →
    StopFilter (the reference's ja stopwords.txt) →
    JapaneseKatakanaStemFilter → LowerCaseFilter."""
    from lucene_spark.analysis.cjk import cjk_width_fold
    from lucene_spark.analysis.janumber import katakana_stem
    from lucene_spark.analysis.stopwords_i18n import (
        JAPANESE_STOP_WORDS,
        JAPANESE_STOPTAGS_STOP_WORDS,
    )

    tok = tokenizer or JapaneseTokenizer(default_dictionary(),
                                         mode="search")
    out: list[str] = []
    for t in tok.tokenize(text):
        if t.pos in JAPANESE_STOPTAGS_STOP_WORDS:
            continue
        term = cjk_width_fold(base_form(t))
        if term in JAPANESE_STOP_WORDS:
            continue
        out.append(katakana_stem(term).lower())
    return out


# ---- Spark-side vectorized tokenizers (analyzer registry hooks) -----------
# Series[str] → Series[list[str]] per the CUSTOM_TOKENIZERS contract in
# analyzers.py — each Arrow batch runs the lattice per document inside one
# pandas map (the JapaneseAnalyzer chain role). Module-level singletons so
# every executor builds the dictionary once per worker process.
_NORMAL_TOK = None
_SEARCH_TOK = None


def ja_token_lists(content) -> "pd.Series":
    global _NORMAL_TOK
    if _NORMAL_TOK is None:
        _NORMAL_TOK = JapaneseTokenizer(demo_dictionary())
    return content.map(lambda s: _NORMAL_TOK.tokens(s or ""))


def ja_search_token_lists(content) -> "pd.Series":
    global _SEARCH_TOK
    if _SEARCH_TOK is None:
        _SEARCH_TOK = JapaneseTokenizer(demo_dictionary(), mode="search")
    return content.map(lambda s: _SEARCH_TOK.tokens(s or ""))


_EXTENDED_TOK = None


def ja_extended_token_lists(content) -> "pd.Series":
    global _EXTENDED_TOK
    if _EXTENDED_TOK is None:
        _EXTENDED_TOK = JapaneseTokenizer(demo_dictionary(),
                                          mode="extended")
    return content.map(lambda s: _EXTENDED_TOK.tokens(s or ""))


_FULL_TOK = None


def ja_full_token_lists(content) -> "pd.Series":
    """CUSTOM_TOKENIZERS hook: the complete JapaneseAnalyzer chain over
    the LARGE seeded lexicon."""
    global _FULL_TOK
    if _FULL_TOK is None:
        _FULL_TOK = JapaneseTokenizer(default_dictionary(), mode="search")
    return content.map(
        lambda s: japanese_analyzer_tokens(s or "", _FULL_TOK))


def ja_iteration_token_lists(content) -> "pd.Series":
    """CUSTOM_TOKENIZERS hook: JapaneseIterationMarkCharFilter →
    the complete JapaneseAnalyzer chain — the reference's
    charFilter+analyzer composition
    (TestJapaneseIterationMarkCharFilter.java:40-56 builds exactly
    this stack; the char filter is 1:1 so offsets are unchanged)."""
    from lucene_spark.analysis.jaiteration import iteration_mark

    global _FULL_TOK
    if _FULL_TOK is None:
        _FULL_TOK = JapaneseTokenizer(default_dictionary(), mode="search")
    return content.map(
        lambda s: japanese_analyzer_tokens(iteration_mark(s or ""),
                                           _FULL_TOK))
