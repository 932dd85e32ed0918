"""Korean morphological analysis — the nori KoreanTokenizer role.

Same Viterbi lattice family as analysis/ja.py (nori and kuromoji share
the code lineage), re-implemented from the reference's semantics:

- lattice/cost model: analysis/nori/src/java/org/apache/lucene/analysis/
  ko/KoreanTokenizer.java `add()` — path + connection(right_id, left_id)
  + word cost, BOS right_id 0, EOS conn(last, 0); identical to the
  kuromoji recurrence.
- unknown words (KoreanTokenizer.java:840-905): generated when no
  dictionary match starts at the position OR the class has INVOKE;
  grouping runs over SAME-SCRIPT characters (UnicodeScript, with
  non-spacing marks inheriting per UTR #24), split on punctuation and
  digit boundaries, only while the group flag holds; Common/Inherited
  script upgrades to the first concrete script seen.
- decompound (KoreanTokenizer.java:1029-1086): dictionary entries whose
  POS type is COMPOUND/INFLECT carry morphemes; DISCARD mode (the
  KoreanAnalyzer default, :90) replaces the compound with its morphemes,
  MIXED emits the compound first (position length = #morphemes) then the
  morphemes, NONE keeps the compound whole.
- POS stop filter (KoreanPartOfSpeechStopFilter.java:36-56): the default
  stop-tag set (E IC J MAG MAJ MM SP SSC SSO SC SE XPN XSA XSN XSV UNA
  NA VSV) drops functional morphemes; KoreanAnalyzer chains tokenizer →
  POS stop → reading form → lowercase (KoreanAnalyzer.java:72-79).

The mecab-ko-dic binary is not shipped; the tokenizer takes any seeded
lexicon + connection costs (same contract as analysis/ja.py), and the
script-based unknown grouping is a documented stdlib subset: python has
no UnicodeScript property, so `_script()` maps the blocks relevant to
Korean text (Hangul incl. jamo, Han, Latin, digits handled by the digit
split, Cyrillic/Greek/Kana) and falls back to COMMON.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

from lucene_spark.analysis.ja import is_punctuation

MAX_UNKNOWN_WORD_LENGTH = 1024          # KoreanTokenizer.java:95

# POS.Tag values nori's default stop filter drops
DEFAULT_STOP_TAGS = frozenset([
    "E", "IC", "J", "MAG", "MAJ", "MM", "SP", "SSC", "SSO", "SC", "SE",
    "XPN", "XSA", "XSN", "XSV", "UNA", "NA", "VSV",
])

HANGUL, HANJA, LATIN, KANA, CYRILLIC, GREEK, COMMON = range(7)


def _script(ch: str) -> int:
    cp = ord(ch)
    if 0xAC00 <= cp <= 0xD7AF or 0x1100 <= cp <= 0x11FF \
            or 0x3130 <= cp <= 0x318F or 0xA960 <= cp <= 0xA97F \
            or 0xD7B0 <= cp <= 0xD7FF:
        return HANGUL
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF \
            or 0xF900 <= cp <= 0xFAFF:
        return HANJA
    if ("a" <= ch <= "z") or ("A" <= ch <= "Z") \
            or 0x00C0 <= cp <= 0x024F:
        return LATIN
    if 0x3041 <= cp <= 0x30FF:
        return KANA
    if 0x0400 <= cp <= 0x04FF:
        return CYRILLIC
    if 0x0370 <= cp <= 0x03FF:
        return GREEK
    return COMMON


# mecab-ko-dic char.def flags for the classes above: Hangul/Hanja and
# alphabetic runs group; punctuation/digits group within themselves
_INVOKE = {HANGUL: False, HANJA: False, LATIN: True, KANA: True,
           CYRILLIC: True, GREEK: True, COMMON: True}
_GROUP = {HANGUL: True, HANJA: False, LATIN: True, KANA: True,
          CYRILLIC: True, GREEK: True, COMMON: True}

# per-class unknown entries (left_id, right_id, cost) — mecab-ko-dic
# magnitudes: hangul unknowns are plausible nouns, hanja expensive
_UNK = {HANGUL: (4, 4, 3534), HANJA: (2, 2, 12850), LATIN: (6, 6, 1756),
        KANA: (6, 6, 3003), CYRILLIC: (6, 6, 1756), GREEK: (6, 6, 1756),
        COMMON: (5, 5, 4769)}


@dataclass(frozen=True)
class KoDictEntry:
    surface: str
    left_id: int
    right_id: int
    cost: int
    pos: str = "NNG"                    # POS.Tag of the whole entry
    pos_type: str = "MORPHEME"          # MORPHEME | COMPOUND | INFLECT
    morphemes: tuple = ()               # ((pos_tag, surface), ...) for
                                        # COMPOUND/INFLECT entries
    reading: str = ""                   # hangul transcription for hanja
                                        # entries ("" = none) — the
                                        # ReadingAttribute source
                                        # (KoreanReadingFormFilter.java)


@dataclass
class KoDictionary:
    entries: list[KoDictEntry] = field(default_factory=list)
    conn: dict[tuple[int, int], int] = field(default_factory=dict)
    default_conn: int = 1000

    def __post_init__(self):
        self._by_surface: dict[str, list[KoDictEntry]] = {}
        self._max_len = 0
        for e in self.entries:
            self._by_surface.setdefault(e.surface, []).append(e)
            self._max_len = max(self._max_len, len(e.surface))

    def matches(self, text: str, pos: int):
        out = []
        limit = min(len(text), pos + self._max_len)
        for end in range(pos + 1, limit + 1):
            for e in self._by_surface.get(text[pos:end], ()):
                out.append((end, e))
        return out

    def conn_cost(self, right_id: int, left_id: int) -> int:
        return self.conn.get((right_id, left_id), self.default_conn)


@dataclass(frozen=True)
class KoToken:
    surface: str
    start: int
    end: int
    pos: str
    known: bool
    position_increment: int = 1
    reading: str = ""       # hangul reading ("" = none): DictionaryToken
                            # carries the dictionary reading, Decompound
                            # parts carry none (DecompoundToken.java:35)


class KoreanTokenizer:
    def __init__(self, dictionary: KoDictionary | None = None,
                 decompound_mode: str = "discard",
                 discard_punctuation: bool = True,
                 stop_tags: frozenset | None = DEFAULT_STOP_TAGS,
                 user_dictionary=None):
        if decompound_mode not in ("none", "discard", "mixed"):
            raise ValueError("decompound_mode must be none|discard|mixed")
        self.dict = dictionary or KoDictionary()
        # nori user dictionary (analysis/userdict.KoUserDictionary):
        # longest user match per position, consulted before the system
        # dictionary (KoreanTokenizer.java:745-785)
        self.user_dict = user_dictionary
        self.mode = decompound_mode
        self.discard_punctuation = discard_punctuation
        self.stop_tags = stop_tags or frozenset()

    def _unknown_length(self, text: str, pos: int) -> tuple[int, int]:
        """(length, character class) per KoreanTokenizer.java:846-889."""
        first = text[pos]
        cls = _script(first)
        if not _GROUP[cls]:
            return 1, cls
        punct = is_punctuation(first)
        digit = first.isdigit()
        script = cls
        length = 1
        while (length < MAX_UNKNOWN_WORD_LENGTH and pos + length < len(text)):
            ch = text[pos + length]
            sc = _script(ch)
            same = (sc == script or script == COMMON or sc == COMMON
                    or unicodedata.category(ch) == "Mn")
            if not (same and is_punctuation(ch) == punct
                    and ch.isdigit() == digit and _GROUP[sc]):
                break
            length += 1
            if script == COMMON and sc != COMMON:
                script = sc          # Common/Inherited upgrade (:884-888)
        return length, script

    def tokenize(self, text: str) -> list[KoToken]:
        n = len(text)
        if n == 0:
            return []
        INF = float("inf")
        arrive: list[list[tuple]] = [[] for _ in range(n + 1)]
        arrive[0].append((0, 0, -1, -1, None))      # BOS
        user_max_pos_ahead = -1     # userWordMaxPosAhead (java:741)
        for pos in range(n):
            if not arrive[pos]:
                continue

            def add_arc(end, left_id, right_id, word_cost, entry):
                least, least_idx = INF, -1
                for idx, a in enumerate(arrive[pos]):
                    c = a[0] + self.dict.conn_cost(a[1], left_id)
                    if c < least:
                        least, least_idx = c, idx
                arrive[end].append((least + word_cost, right_id, pos,
                                    least_idx, entry))

            # user dictionary first: longest match only, added only when
            # it reaches past every earlier user match; ANY user final
            # suppresses system lookups here (KoreanTokenizer.java:
            # 745-785 — anyMatches is set even when the arc is dropped
            # by the userWordMaxPosAhead rule)
            any_matches = False
            if self.user_dict is not None:
                m = self.user_dict.longest_match(text, pos)
                if m is not None:
                    any_matches = True
                    end, ue = m
                    if end - 1 > user_max_pos_ahead:
                        add_arc(end, ue.left_id, ue.right_id, ue.cost, ue)
                        user_max_pos_ahead = end - 1
            if not any_matches:
                for end, e in self.dict.matches(text, pos):
                    add_arc(end, e.left_id, e.right_id, e.cost, e)
                    any_matches = True
            cls = _script(text[pos])
            if not any_matches or _INVOKE[cls]:
                length, script = self._unknown_length(text, pos)
                l, r, c = _UNK[script]
                add_arc(pos + length, l, r, c, None)

        best, best_idx = INF, -1
        for idx, a in enumerate(arrive[n]):
            c = a[0] + self.dict.conn_cost(a[1], 0)
            if c < best:
                best, best_idx = c, idx
        if best_idx < 0:
            return []
        # backtrace with decompound (KoreanTokenizer.java:1029-1086)
        out: list[KoToken] = []
        pos, idx = n, best_idx
        while pos > 0:
            a = arrive[pos][idx]
            _, _, back_pos, back_idx, entry = a
            surface = text[back_pos:pos]
            toks: list[KoToken] = []
            if entry is None:
                toks = [KoToken(surface, back_pos, pos, "UNKNOWN", False)]
            elif (entry.pos_type == "MORPHEME" or self.mode == "none"
                  or not entry.morphemes):
                toks = [KoToken(surface, back_pos, pos, entry.pos, True,
                                reading=entry.reading)]
            else:
                end = pos
                parts = []
                for i, (ptag, psurf) in enumerate(reversed(entry.morphemes)):
                    if entry.pos_type == "COMPOUND":
                        s, e = end - len(psurf), end
                        end -= len(psurf)
                    else:                       # INFLECT: shared offsets
                        s, e = back_pos, pos
                    is_first = i == len(entry.morphemes) - 1
                    parts.append(KoToken(
                        psurf, s, e, ptag, True,
                        0 if (is_first and self.mode == "mixed") else 1))
                parts.reverse()
                if self.mode == "mixed":
                    toks = [KoToken(surface, back_pos, pos, entry.pos,
                                    True, reading=entry.reading)]
                    toks += parts
                else:
                    toks = parts
            out[:0] = toks
            pos, idx = back_pos, back_idx
        if self.discard_punctuation:
            out = [t for t in out
                   if not all(is_punctuation(c) for c in t.surface)]
        if self.stop_tags:
            out = [t for t in out if t.pos not in self.stop_tags]
        return out

    def tokens(self, text: str) -> list[str]:
        return [t.surface.lower() for t in self.tokenize(text)]


def hanja_entries() -> list:
    """Hanja NNG entries carrying hangul readings — the ReadingAttribute
    rows a mecab-ko-dic build populates for Sino-Korean words (public
    hanja→hangul transcriptions). Includes the
    TestKoreanReadingFormFilter.java surface forms (車 丞相 → 차 승상).
    Merged into both seeded lexicons; NNG ids (10) match the generated
    id space (scripts/gen_ko_lexicon.py)."""
    E = KoDictEntry
    return [
        E("車", 10, 10, 3400, reading="차"),
        E("丞相", 10, 10, 3300, reading="승상"),
        E("學校", 10, 10, 3100, reading="학교"),
        E("韓國", 10, 10, 2950, reading="한국"),
        E("大學", 10, 10, 3050, reading="대학"),
        E("新聞", 10, 10, 3150, reading="신문"),
        E("世界", 10, 10, 3000, reading="세계"),
        E("經濟", 10, 10, 3200, reading="경제"),
    ]


def demo_dictionary() -> KoDictionary:
    """Seeded lexicon shaped like mecab-ko-dic entries (the classic nori
    test sentences): nouns, the compound 삼성전자 = 삼성+전자, the josa
    particles as J-tagged entries the POS stop filter drops."""
    E = KoDictEntry
    entries = [
        E("삼성", 10, 10, 3000),
        E("전자", 10, 10, 3100),
        E("삼성전자", 10, 10, 4500, pos_type="COMPOUND",
          morphemes=(("NNG", "삼성"), ("NNG", "전자"))),
        E("주식회사", 10, 10, 3500),
        E("한국", 10, 10, 2900),
        E("대학교", 10, 10, 3200),
        E("는", 20, 20, 500, pos="J"),     # topic particle → stopped
        E("가", 20, 20, 500, pos="J"),
        E("를", 20, 20, 500, pos="J"),
        E("에", 20, 20, 500, pos="J"),
    ]
    entries += hanja_entries()
    conn = {(0, 10): 500, (10, 0): 500, (0, 20): 4000, (20, 0): 2500,
            (10, 20): -1500, (20, 10): -1000, (10, 10): 2000}
    return KoDictionary(entries=entries, conn=conn, default_conn=1200)


_DEFAULT_DICT = None


def default_dictionary() -> KoDictionary:
    """The seeded LARGE lexicon (~7k entries — scripts/gen_ko_lexicon.py,
    VERDICT r4 item 4): mecab-ko-dic-shaped structure (NNG/NNP nouns,
    COMPOUND entries with NNG morphemes for the decompound modes, the
    josa/ending function sets the POS stop filter drops, VV/VA/MAG) +
    a structured connection matrix. Generated, not extracted — the
    reference checkout ships no word-cost buffer; the SEMANTICS are
    the reference's (test_ko.py)."""
    global _DEFAULT_DICT
    if _DEFAULT_DICT is None:
        import os

        import numpy as np

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "ko_lexicon.npz")
        z = np.load(path, allow_pickle=True)
        entries = []
        for s, l, r, c, p, pt, m in zip(
                z["surfaces"], z["left_ids"], z["right_ids"], z["costs"],
                z["pos"], z["pos_types"], z["morphemes"]):
            morphs = tuple(tuple(part.split(":", 1))
                           for part in str(m).split("|") if part)
            entries.append(KoDictEntry(
                str(s), int(l), int(r), int(c), pos=str(p),
                pos_type=str(pt), morphemes=morphs))
        conn = {(int(k[0]), int(k[1])): int(v)
                for k, v in zip(z["conn_keys"], z["conn_vals"])}
        entries += hanja_entries()
        _DEFAULT_DICT = KoDictionary(entries=entries, conn=conn,
                                     default_conn=int(z["default_conn"]))
    return _DEFAULT_DICT


_KO_TOK = None


def korean_analyzer_tokens(text: str, tokenizer: KoreanTokenizer) -> list[str]:
    """The COMPLETE KoreanAnalyzer chain (KoreanAnalyzer.java:72-79):
    KoreanTokenizer DISCARD → KoreanPartOfSpeechStopFilter (the
    tokenizer's stop_tags) → KoreanReadingFormFilter (term replaced by
    the hangul reading when present — hanja_entries carry them) →
    LowerCaseFilter."""
    return [(t.reading or t.surface).lower()
            for t in tokenizer.tokenize(text)]


def ko_token_lists(content) -> "pd.Series":
    """CUSTOM_TOKENIZERS hook: KoreanAnalyzer chain (tokenizer DISCARD →
    POS stop → reading form → lowercase) over the demo lexicon."""
    global _KO_TOK
    if _KO_TOK is None:
        _KO_TOK = KoreanTokenizer(demo_dictionary())
    return content.map(lambda s: korean_analyzer_tokens(s or "", _KO_TOK))


_KO_FULL_TOK = None


def ko_full_token_lists(content) -> "pd.Series":
    """CUSTOM_TOKENIZERS hook: the complete KoreanAnalyzer chain over
    the LARGE seeded lexicon (+ hanja readings)."""
    global _KO_FULL_TOK
    if _KO_FULL_TOK is None:
        _KO_FULL_TOK = KoreanTokenizer(default_dictionary())
    return content.map(
        lambda s: korean_analyzer_tokens(s or "", _KO_FULL_TOK))
