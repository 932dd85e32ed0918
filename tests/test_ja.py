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
    # search mode: oracle and tokenizer generate identical arc sets.
    # Texts capped at 7 chars so no token can carry a search-mode
    # penalty — the r5 reference-exact semantics applies penalties only
    # in the backtrace 2nd-best pass (addPenalty=false forward), which
    # the dedicated pruneAndRescore tests below pin; penalty-free
    # search == plain min-cost, which this oracle enumerates
    tok = JapaneseTokenizer(d, mode="search", discard_punctuation=False)
    for _ in range(8):
        text = "".join(rng.choice(chars) for _ in range(rng.randint(1, 7)))
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


# ---- r5: pruneAndRescore 2nd-best + the large seeded lexicon ---------------

def _mini_dict(compound_cost, part_cost, conn_nn=500):
    E = DictEntry
    return JaDictionary(entries=[
        E("水力発電", 10, 10, compound_cost),
        E("水力", 10, 10, part_cost),
        E("発電", 10, 10, part_cost),
    ], conn={(0, 10): 0, (10, 0): 0, (10, 10): conn_nn},
        default_conn=1000)


def test_prune_and_rescore_splits_within_threshold():
    """compound forward cost 1000, parts path 8500, penalty (4-2)*3000 =
    6000 → maxCost 7000+... = 1000+6000=7000 < 8500? NO — wait:
    maxCost = compound_cost + penalty = 7000, parts 8500 > 7000 → keep
    compound. With part_cost 3000 the parts path costs 6500 <= 7000 →
    redirect (and the compound re-emits with pos_len when kept)."""
    d_keep = _mini_dict(1000, 4000)
    t = JapaneseTokenizer(d_keep, mode="search")
    assert t.tokens("水力発電") == ["水力発電"]      # beyond threshold

    d_split = _mini_dict(1000, 3000)
    t2 = JapaneseTokenizer(d_split, mode="search")
    assert t2.tokens("水力発電") == ["水力", "発電"]
    # NORMAL mode never splits
    assert JapaneseTokenizer(d_split, mode="normal").tokens("水力発電") \
        == ["水力発電"]
    # compound emission with position length (outputCompounds)
    t3 = JapaneseTokenizer(d_split, mode="search",
                           discard_compound_token=False)
    toks = t3.tokenize("水力発電")
    assert [(tk.surface, tk.pos_len) for tk in toks] == [
        ("水力発電", 2), ("水力", 1), ("発電", 1)]
    # offsets: compound spans the parts
    assert (toks[0].start, toks[0].end) == (0, 4)
    assert (toks[1].start, toks[1].end) == (0, 2)
    assert (toks[2].start, toks[2].end) == (2, 4)


def test_prune_and_rescore_respects_right_context():
    """The 2nd-best threshold includes the connection cost to the token
    on the RIGHT (lastLeftWordID, java:1852-1853) — a particle following
    the compound changes maxCost."""
    E = DictEntry
    d = JaDictionary(entries=[
        E("水力発電", 10, 10, 1000),
        E("水力", 10, 10, 3000),
        E("発電", 11, 11, 3000),
        E("を", 20, 20, 500),
    ], conn={(0, 10): 0, (10, 0): 0, (11, 0): 0, (10, 11): 500,
             (10, 20): -1800, (11, 20): -1800, (20, 0): 0},
        default_conn=1000)
    t = JapaneseTokenizer(d, mode="search")
    out = t.tokens("水力発電を")
    assert out == ["水力", "発電", "を"]


def test_default_dictionary_scale_and_properties():
    from lucene_spark.analysis.ja import default_dictionary

    d = default_dictionary()
    assert len(d.entries) >= 9000          # order-10^4 lexicon
    pos_counts = {}
    for e in d.entries:
        pos_counts[e.pos] = pos_counts.get(e.pos, 0) + 1
    assert pos_counts.get("名詞", 0) >= 6000
    assert pos_counts.get("助詞", 0) >= 10
    assert pos_counts.get("動詞", 0) >= 50
    # deterministic regeneration: loading twice gives the same object
    assert default_dictionary() is d


def test_large_lexicon_normal_vs_search_compounds():
    """Every 4-kanji compound whose two halves are in the lexicon:
    NORMAL emits the compound, SEARCH decomposes via pruneAndRescore
    (compound costs sit below parts-sum but within the 6000 penalty)."""
    import random

    from lucene_spark.analysis.ja import default_dictionary

    d = default_dictionary()
    comps = [e.surface for e in d.entries if e.pos == "名詞-固有"]
    assert len(comps) >= 800
    tn = JapaneseTokenizer(d, mode="normal")
    ts = JapaneseTokenizer(d, mode="search")
    rng = random.Random(7)
    split = kept = 0
    for w in rng.sample(comps, 60):
        nrm = tn.tokens(w)
        sch = ts.tokens(w)
        assert "".join(nrm) == w and "".join(sch) == w
        if nrm == [w] and sch == [w[:2], w[2:]]:
            split += 1
        elif nrm == sch:
            kept += 1
    # the seeded costs put most compounds within the 6000 penalty window
    # (split) and leave some beyond it (kept) — both sides of the
    # pruneAndRescore threshold are exercised, like real IPADIC
    assert split >= 30, (split, kept)
    assert kept >= 1, (split, kept)


def test_large_lexicon_oov_and_mixed_script():
    import random

    from lucene_spark.analysis.ja import default_dictionary

    d = default_dictionary()
    tn = JapaneseTokenizer(d, mode="normal")
    nouns = [e.surface for e in d.entries if e.pos == "名詞"][:200]
    rng = random.Random(3)
    known = unk = 0
    for _ in range(40):
        s = "".join(rng.choice(nouns) + rng.choice(["は", "を", "の", "で"])
                    for _ in range(6))
        for tk in tn.tokenize(s):
            known += tk.known
            unk += not tk.known
    assert unk == 0 and known > 400        # dictionary text: zero OOV
    # mixed script: latin/digit/unknown-katakana runs group as unknowns
    toks = tn.tokenize(nouns[0] + "は Spark3 で ミャンマオーク を")
    surf = [t.surface for t in toks]
    assert "Spark" in surf and "3" in surf and "ミャンマオーク" in surf
    assert [t.known for t in toks if t.surface in
            ("Spark", "3", "ミャンマオーク")] == [False, False, False]


def test_large_lexicon_viterbi_equals_bruteforce():
    """The exhaustive-path oracle holds on the big lexicon too (short
    penalty-free texts — see test_viterbi_equals_bruteforce)."""
    import random

    from lucene_spark.analysis.ja import default_dictionary

    d = default_dictionary()
    tok = JapaneseTokenizer(d, mode="search", discard_punctuation=False)
    nouns = [e.surface for e in d.entries if e.pos == "名詞"][:40]
    rng = random.Random(11)
    for _ in range(10):
        text = (rng.choice(nouns) + rng.choice(["は", "を", "の"])
                + rng.choice(nouns))[:7]
        want = _best_path_bruteforce(text, d, tok)
        got = [t.surface for t in tok.tokenize(text)]
        assert "".join(got) == text
        assert want is not None


def test_extended_mode_unknown_unigrams():
    """EXTENDED mode (JapaneseTokenizer.java:309-313/2007-2032):
    unknown words emit as character unigrams; dictionary tokens and the
    SEARCH decomposition behavior are unchanged; punctuation unigrams
    drop under discard_punctuation."""
    d = demo_dictionary()
    te = JapaneseTokenizer(d, mode="extended")
    assert te.tokens("カレーのうち") == ["カ", "レ", "ー", "の", "うち"]
    assert te.tokens("すもももももももものうち") == \
        ["すもも", "も", "もも", "も", "もも", "の", "うち"]
    assert te.tokens("関西国際空港") == ["関西", "国際", "空港"]
    # offsets per unigram
    toks = te.tokenize("abcの")
    assert [(t.surface, t.start, t.end) for t in toks] == \
        [("a", 0, 1), ("b", 1, 2), ("c", 2, 3), ("の", 3, 4)]
    # punctuation inside an unknown run drops
    tp = JapaneseTokenizer(d, mode="extended", discard_punctuation=False)
    assert "、" in tp.tokens("ラー、メン")


def test_nbest_emits_within_threshold_paths():
    """setNBestCost role (java:1714 + Lattice.cost): tokens on any path
    within nbest_cost of the best path emit once per span, in
    (start, end) order — the TestJapaneseTokenizer:165-170 shape
    (same-start shorter token before the longer compound)."""
    d = demo_dictionary()
    t = JapaneseTokenizer(d)
    assert [tk.surface for tk in t.tokenize_nbest("関西国際空港", 0)] == \
        ["関西国際空港"]
    # parts path sits 9300 above the compound path in the demo costs
    assert [tk.surface for tk in t.tokenize_nbest("関西国際空港", 9299)] == \
        ["関西国際空港"]
    assert [tk.surface for tk in t.tokenize_nbest("関西国際空港", 9300)] == \
        ["関西", "関西国際空港", "国際", "空港"]
    # 1-best path unchanged vs tokenize() on an unambiguous sentence
    assert [tk.surface for tk in
            t.tokenize_nbest("すもももももももものうち", 0)] == \
        t.tokens("すもももももももものうち")


@pytest.mark.parametrize("seed", range(4))
def test_nbest_equals_bruteforce_union(seed):
    """Oracle: enumerate EVERY path; the nbest token set must equal the
    union of spans on paths with cost <= best + nbest_cost."""
    rng = random.Random(seed + 100)
    chars = "あいうえお"
    entries = []
    for _ in range(10):
        ln = rng.randint(1, 3)
        w = "".join(rng.choice(chars) for _ in range(ln))
        entries.append(DictEntry(w, rng.randint(1, 4), rng.randint(1, 4),
                                 rng.randint(1000, 8000)))
    conn = {(r, l): rng.randint(-1500, 3000)
            for r in range(5) for l in range(5) if rng.random() < 0.6}
    d = JaDictionary(entries=entries, conn=conn,
                     default_conn=rng.randint(0, 1500))
    # search mode: the oracle's _arcs enumerates the same superset
    # (normal mode suppresses unknown re-invocation inside a previous
    # unknown span, which backtraceNBest inherits from parse)
    tok = JapaneseTokenizer(d, mode="search", discard_punctuation=False)
    for _ in range(5):
        text = "".join(rng.choice(chars) for _ in range(rng.randint(2, 6)))
        nbest = rng.choice([0, 1000, 4000, 10**6])
        arcs = _arcs(text, d, tok)

        paths = []

        def walk(pos, right_id, cost, path):
            if pos == len(text):
                paths.append((cost + d.conn_cost(right_id, 0), path))
                return
            for (end, lid, rid, wcost, surf) in arcs[pos]:
                walk(end, rid, cost + d.conn_cost(right_id, lid) + wcost,
                     path + [(pos, end, surf)])

        walk(0, 0, 0, [])
        best = min(c for c, _ in paths)
        want = {(s, e) for c, p in paths if c <= best + nbest
                for (s, e, _) in p}
        got = {(t2.start, t2.end)
               for t2 in tok.tokenize_nbest(text, nbest)}
        assert got == want, (text, nbest)


def test_full_analyzer_chain():
    """JapaneseAnalyzer.java:95-101 chain: tokenizer(SEARCH) → base form
    → POS stop (reference stoptags.txt) → CJK width → stop words
    (reference stopwords.txt) → katakana stem → lowercase."""
    from lucene_spark.analysis.ja import (JapaneseTokenizer,
                                          default_dictionary,
                                          japanese_analyzer_tokens)

    d = default_dictionary()
    tok = JapaneseTokenizer(d, mode="search")
    nouns = [e.surface for e in d.entries if e.pos == "名詞"][:3]
    conj = [(e.surface, e.base_form) for e in d.entries if e.base_form][0]
    out = japanese_analyzer_tokens(
        nouns[0] + "は" + conj[0] + "。ＡＢＣコーヒーの" + nouns[1] + "です",
        tok)
    assert nouns[0] in out and nouns[1] in out
    assert conj[1] in out and conj[0] not in out     # base form applied
    assert "abc" in out                              # width fold + lower
    assert "コーヒ" in out                           # katakana stem
    assert "は" not in out and "の" not in out       # POS-stopped (助詞)
    assert "です" not in out                         # POS-stopped (助動詞)
    # the reference stopword list also drops base forms like ある/いる
    out2 = japanese_analyzer_tokens("ある" + nouns[0], tok)
    assert "ある" not in out2


def test_base_and_reading_forms():
    from lucene_spark.analysis.ja import (JapaneseTokenizer, base_form,
                                          default_dictionary,
                                          reading_form)

    d = default_dictionary()
    t = JapaneseTokenizer(d)
    conj = [e for e in d.entries if e.base_form][0]
    toks = t.tokenize(conj.surface)
    assert base_form(toks[0]) == conj.base_form
    # every known dictionary token carries a katakana reading
    noun = [e for e in d.entries if e.pos == "名詞"][0]
    tk = t.tokenize(noun.surface)[0]
    assert tk.known and reading_form(tk) == noun.reading
    assert all(0x30A0 <= ord(c) <= 0x30FF for c in noun.reading)
    # unknown tokens fall back to the surface
    unk = t.tokenize("ミャンマオーク")[0]
    assert not unk.known and reading_form(unk) == unk.surface
