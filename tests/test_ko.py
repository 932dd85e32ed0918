"""Korean lattice tokenizer (nori KoreanTokenizer role) — decompound
modes, POS stop filtering, script-grouped unknowns, Viterbi oracle."""

from __future__ import annotations

import random

import pytest

from lucene_spark.analysis.ko import (
    DEFAULT_STOP_TAGS,
    KoDictEntry,
    KoDictionary,
    KoreanTokenizer,
    demo_dictionary,
)


def test_decompound_discard_default():
    # KoreanTokenizer DEFAULT_DECOMPOUND = DISCARD (java:90): compound
    # replaced by its morphemes; josa particles dropped by the POS stop
    t = KoreanTokenizer(demo_dictionary())
    assert t.tokens("삼성전자는 한국에 있다") == ["삼성", "전자", "한국", "있다"]


def test_decompound_none_keeps_compound():
    t = KoreanTokenizer(demo_dictionary(), decompound_mode="none")
    assert t.tokens("삼성전자는") == ["삼성전자"]


def test_decompound_mixed_emits_both():
    # MIXED: compound first, first morpheme at posInc 0 (java:1066-1068)
    t = KoreanTokenizer(demo_dictionary(), decompound_mode="mixed",
                        stop_tags=None)
    got = [(x.surface, x.position_increment) for x in t.tokenize("삼성전자")]
    assert got == [("삼성전자", 1), ("삼성", 0), ("전자", 1)]


def test_compound_morpheme_offsets():
    t = KoreanTokenizer(demo_dictionary())
    toks = t.tokenize("삼성전자")
    assert [(x.surface, x.start, x.end) for x in toks] == \
        [("삼성", 0, 2), ("전자", 2, 4)]


def test_pos_stop_tags_droppable():
    d = demo_dictionary()
    keep_all = KoreanTokenizer(d, stop_tags=None)
    assert keep_all.tokens("한국에") == ["한국", "에"]
    assert KoreanTokenizer(d).tokens("한국에") == ["한국"]
    assert "J" in DEFAULT_STOP_TAGS and "E" in DEFAULT_STOP_TAGS


def test_script_grouped_unknowns():
    # KoreanTokenizer.java:846-889 — same-script runs group, digit and
    # punctuation boundaries split
    e = KoreanTokenizer()
    assert e.tokens("한국어 text123 테스트") == \
        ["한국어", "text", "123", "테스트"]
    assert e.tokens("abc,def") == ["abc", "def"]


def test_viterbi_picks_min_cost_path():
    # brute-force oracle over a tiny lexicon: compound vs parts decided
    # purely by costs (compound cheaper here)
    E = KoDictEntry
    d = KoDictionary(entries=[
        E("가나", 1, 1, 100), E("가", 1, 1, 900), E("나", 1, 1, 900)],
        conn={}, default_conn=0)
    t = KoreanTokenizer(d, stop_tags=None)
    assert t.tokens("가나") == ["가나"]
    d2 = KoDictionary(entries=[
        E("가나", 1, 1, 5000), E("가", 1, 1, 100), E("나", 1, 1, 100)],
        conn={}, default_conn=0)
    assert KoreanTokenizer(d2, stop_tags=None).tokens("가나") == ["가", "나"]


def test_analyzer_registered(spark):
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    a = get_analyzer("korean")
    toks = a.tokenize_series(pd.Series(["삼성전자는 Computer"])).iloc[0]
    assert "삼성" in toks and "전자" in toks
    assert "computer" in toks          # lowercase stage
    assert "는" not in toks


# ---- r5: large seeded lexicon (VERDICT r4 item 4) --------------------------

def test_default_dictionary_scale():
    from lucene_spark.analysis.ko import default_dictionary

    d = default_dictionary()
    assert len(d.entries) >= 6500
    comps = [e for e in d.entries if e.pos_type == "COMPOUND"]
    assert len(comps) >= 700
    assert all(len(e.morphemes) == 2 for e in comps)
    assert default_dictionary() is d        # cached singleton


def test_large_lexicon_decompound_modes():
    import random

    from lucene_spark.analysis.ko import (KoreanTokenizer,
                                          default_dictionary)

    d = default_dictionary()
    comps = [e for e in d.entries if e.pos_type == "COMPOUND"]
    td = KoreanTokenizer(d)
    tm = KoreanTokenizer(d, decompound_mode="mixed")
    tn = KoreanTokenizer(d, decompound_mode="none")
    rng = random.Random(9)
    hits = 0
    for e in rng.sample(comps, 40):
        w = e.surface
        n_toks = tn.tokens(w)
        if n_toks != [w]:
            continue                 # a cheaper split beat the compound
        hits += 1
        parts = [s for _, s in e.morphemes]
        assert td.tokens(w) == parts
        assert tm.tokens(w) == [w] + parts
    assert hits >= 25                 # most compounds win their lattice


def test_large_lexicon_oov_mixed_script():
    import random

    from lucene_spark.analysis.ko import (KoreanTokenizer,
                                          default_dictionary)

    d = default_dictionary()
    t = KoreanTokenizer(d)
    nouns = [e.surface for e in d.entries
             if e.pos == "NNG" and e.pos_type == "MORPHEME"][:100]
    rng = random.Random(4)
    # dictionary text: particles dropped by the POS stop chain, zero OOV
    for _ in range(20):
        s = "".join(rng.choice(nouns) + rng.choice(["는", "를", "에"])
                    for _ in range(4))
        toks = t.tokenize(s)
        assert all(tk.known for tk in toks)
        assert all(tk.pos not in ("J", "E") for tk in toks)
    # mixed script runs stay unknown single tokens
    surf = t.tokens(nouns[0] + "Spark2026입니다테스트")
    assert "spark" in surf and "2026" in surf


def test_reading_form_filter():
    # TestKoreanReadingFormFilter.java: hanja replaced by hangul reading
    from lucene_spark.analysis.ko import (KoreanTokenizer, demo_dictionary,
                                          korean_analyzer_tokens)

    tok = KoreanTokenizer(demo_dictionary())
    assert korean_analyzer_tokens("車丞相", tok) == ["차", "승상"]
    # tokens without readings keep their surface
    assert korean_analyzer_tokens("한국", tok) == ["한국"]


def test_reading_attribute_on_tokens():
    from lucene_spark.analysis.ko import KoreanTokenizer, demo_dictionary

    tok = KoreanTokenizer(demo_dictionary())
    toks = tok.tokenize("學校")
    assert toks[0].reading == "학교"
    # decompound parts carry no reading (DecompoundToken.java:35)
    parts = tok.tokenize("삼성전자")
    assert all(t.reading == "" for t in parts)
