"""Japanese Viterbi lattice tokenizer (kuromoji JapaneseTokenizer role).

Three tiers of evidence:
1. reference vectors that depend only on the unknown-word machinery
   (TestJapaneseTokenizer.java vectors reproducible without the IPADIC
   binary: katakana grouping :161, per-char kanji :409)
2. canonical dictionary segmentations over the seeded lexicon (the
   classic すもも sentence; compound-vs-split NORMAL/SEARCH behavior the
   kuromoji tests exercise at :179-202)
3. a brute-force ALL-SEGMENTATIONS oracle: enumerate every path over the
   same arcs and verify Viterbi returns the min-cost one — pins the
   lattice/cost semantics independent of any dictionary data."""

from __future__ import annotations

import itertools
import random

import pytest

from lucene_spark.analysis.ja import (
    DictEntry,
    JaDictionary,
    JapaneseTokenizer,
    char_class,
    demo_dictionary,
    is_punctuation,
    ALPHA, HIRAGANA, KANJI, KATAKANA, NUMERIC,
    _UNK_COSTS, _GROUP, _INVOKE, MAX_UNKNOWN_WORD_LENGTH,
)


# ---- tier 1: unknown-word reference vectors -------------------------------

def test_katakana_run_single_token():
    # TestJapaneseTokenizer.java:161 (normal mode keeps the run whole)
    t = JapaneseTokenizer()
    assert t.tokens("シニアソフトウェアエンジニア") == ["シニアソフトウェアエンジニア"]


def test_kanji_per_character():
    # TestJapaneseTokenizer.java:409 — KANJI group=false ⇒ one char each;
    # the supplementary 𩬅 falls to DEFAULT (group=true) via surrogates
    t = JapaneseTokenizer()
    assert t.tokens("𩬅艱鍟䇹愯瀛") == ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]


def test_class_runs_and_punctuation_discard():
    t = JapaneseTokenizer()
    assert t.tokens("abcアイウ123、def。") == ["abc", "アイウ", "123", "def"]
    # punctuation retained when asked (JapaneseTokenizer discardPunctuation=false)
    t2 = JapaneseTokenizer(discard_punctuation=False)
    assert t2.tokens("abc、def") == ["abc", "、", "def"]


def test_fullwidth_classes():
    t = JapaneseTokenizer()
    assert t.tokens("ＡＢＣ１２３") == ["ＡＢＣ", "１２３"]
    assert char_class("Ａ") == ALPHA and char_class("１") == NUMERIC


def test_char_classes_and_punct():
    assert char_class("あ") == HIRAGANA
    assert char_class("ア") == KATAKANA
    assert char_class("漢") == KANJI
    assert is_punctuation("、") and is_punctuation(" ") and is_punctuation("$")
    assert not is_punctuation("a") and not is_punctuation("あ")


# ---- tier 2: dictionary segmentations -------------------------------------

def test_sumomo_canonical():
    t = JapaneseTokenizer(demo_dictionary())
    assert t.tokens("すもももももももものうち") == \
        ["すもも", "も", "もも", "も", "もも", "の", "うち"]


def test_normal_keeps_compound_search_splits():
    d = demo_dictionary()
    assert JapaneseTokenizer(d).tokens("関西国際空港") == ["関西国際空港"]
    assert JapaneseTokenizer(d, mode="search").tokens("関西国際空港") == \
        ["関西", "国際", "空港"]
    assert JapaneseTokenizer(d).tokens("東京大学") == ["東京大学"]
    assert JapaneseTokenizer(d, mode="search").tokens("東京大学") == \
        ["東京", "大学"]


def test_offsets_and_types():
    d = demo_dictionary()
    toks = JapaneseTokenizer(d).tokenize("すもものうち")
    assert [(t.surface, t.start, t.end) for t in toks] == \
        [("すもも", 0, 3), ("の", 3, 4), ("うち", 4, 6)]
    assert all(t.known for t in toks)
    unk = JapaneseTokenizer(d).tokenize("ラーメンのうち")
    assert unk[0].surface == "ラーメン" and not unk[0].known


def test_unknown_inside_dictionary_text():
    d = demo_dictionary()
    # katakana INVOKE=true: unknown generated even next to dict words
    assert JapaneseTokenizer(d).tokens("カレーのうち") == ["カレー", "の", "うち"]


# ---- tier 3: brute-force all-segmentations oracle --------------------------

def _arcs(text: str, d: JaDictionary, tok: JapaneseTokenizer):
    """Re-generate the lattice arcs with an independent (simple) walk:
    every dict match at every position, plus the unknown arc per the
    invoke/group rules — mirrors parse() (JapaneseTokenizer.java:915-1013)
    WITHOUT the normal-mode unknown suppression (which only prunes arcs
    Viterbi could use; for the oracle we enumerate the superset reachable
    in search mode and compare against the search-mode tokenizer)."""
    arcs = {}
    for pos in range(len(text)):
        out = []
        any_match = False
        for end, e in d.matches(text, pos):
            out.append((end, e.left_id, e.right_id,
                        e.cost + tok._penalty(text, pos, end - pos),
                        text[pos:end]))
            any_match = True
        cls = char_class(text[pos])
        if not any_match or _INVOKE[cls]:
            punct = is_punctuation(text[pos])
            ln = 1
            if _GROUP[cls]:
                while (ln < MAX_UNKNOWN_WORD_LENGTH and pos + ln < len(text)
                       and char_class(text[pos + ln]) == cls
                       and is_punctuation(text[pos + ln]) == punct):
                    ln += 1
            l, r, c = _UNK_COSTS[cls]
            out.append((pos + ln, l, r,
                        c + tok._penalty(text, pos, ln), text[pos:pos + ln]))
        arcs[pos] = out
    return arcs


def _best_path_bruteforce(text: str, d: JaDictionary, tok: JapaneseTokenizer):
    arcs = _arcs(text, d, tok)
    best = [None] * (len(text) + 1)

    def walk(pos, right_id, cost, path):
        if cost > 10**9:
            return None
        if pos == len(text):
            return cost + d.conn_cost(right_id, 0), path
        out = None
        for (end, lid, rid, wcost, surf) in arcs[pos]:
            r = walk(end, rid,
                     cost + d.conn_cost(right_id, lid) + wcost,
                     path + [surf])
            if r is not None and (out is None or r < out):
                out = r
        return out

    return walk(0, 0, 0, [])


@pytest.mark.parametrize("seed", range(6))
def test_viterbi_equals_bruteforce(seed):
    rng = random.Random(seed)
    chars = "あいうえおかきくけこ"
    # random lexicon of 1-3 char words with random ids/costs
    entries = []
    for _ in range(12):
        ln = rng.randint(1, 3)
        w = "".join(rng.choice(chars) for _ in range(ln))
        entries.append(DictEntry(w, rng.randint(1, 5), rng.randint(1, 5),
                                 rng.randint(1000, 9000)))
    conn = {(r, l): rng.randint(-2000, 4000)
            for r in range(6) for l in range(6) if rng.random() < 0.5}
    d = JaDictionary(entries=entries, conn=conn,
                     default_conn=rng.randint(0, 2000))
    # search mode: oracle and tokenizer generate identical arc sets
    tok = JapaneseTokenizer(d, mode="search", discard_punctuation=False)
    for _ in range(8):
        text = "".join(rng.choice(chars) for _ in range(rng.randint(1, 9)))
        want = _best_path_bruteforce(text, d, tok)
        got = tok.tokenize(text)
        got_cost_path = [t.surface for t in got]
        assert want is not None
        # token sequence must BE a min-cost path: recompute its cost
        assert "".join(got_cost_path) == text
        # and equal the brute-force min cost
        def path_cost(parts):
            # min cost over arc choices realizing this exact split
            pos, acc = 0, [(0, 0)]   # (cost, right_id) candidates
            arcs = _arcs(text, d, tok)
            for surf in parts:
                nxt = []
                for (end, lid, rid, wcost, s) in arcs[pos]:
                    if s != surf or end != pos + len(surf):
                        continue
                    for (c, prid) in acc:
                        nxt.append((c + d.conn_cost(prid, lid) + wcost, rid))
                if not nxt:
                    return None
                # keep best per right_id
                bymin = {}
                for c, rid in nxt:
                    if rid not in bymin or c < bymin[rid]:
                        bymin[rid] = c
                acc = [(c, rid) for rid, c in bymin.items()]
                pos += len(surf)
            return min(c + d.conn_cost(rid, 0) for c, rid in acc)

        assert path_cost(got_cost_path) == want[0]


# ---- Spark integration: japanese analyzer through the index/search path ---

def test_japanese_analyzer_index_and_search(spark, tmp_path):
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher

    docs = spark.createDataFrame(
        [(1, "すもももももももものうち"),
         (2, "関西国際空港と東京大学"),
         (3, "カレーのうちシニアソフトウェアエンジニア")],
        "id long, text string")
    idx = str(tmp_path / "ja_idx")
    cfg = IndexConfig(key_cols=("id",), content_col="text",
                      analyzer="japanese_search", partitions=1,
                      num_groups=1, num_buckets=4)
    IndexBuilder(spark, cfg).build(docs, idx, overwrite=True)
    s = IndexSearcher(IndexReader(spark, idx))
    # SEARCH mode splits 関西国際空港 → the part 空港 is a real term
    hits = {r["doc_id"] for r in s.matches("空港", with_scores=False).collect()}
    assert len(hits) == 1
    # うち appears in docs 1 and 3
    assert len(s.matches("うち", with_scores=False).collect()) == 2
    # query-side analysis runs the same chain: a compound query string
    # segments into its parts and matches as a BooleanQuery
    assert s.count("もも") == 1
