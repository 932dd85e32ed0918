"""JapaneseIterationMarkCharFilter vectors — every
TestJapaneseIterationMarkCharFilter.java case (kanji/kana flags, span
clamping, illegal marks, full-stop reset, and the complete
hiragana/katakana coverage tables)."""

import pytest

from lucene_spark.analysis.jaiteration import iteration_mark

BASIC = [
    # testKanji / testKanjiSequence
    ("時々", "時時"),
    ("馬鹿々々しい", "馬鹿馬鹿しい"),
    # testKana variants
    ("ミスヾ", "ミスズ"),
    ("おゝの", "おおの"),
    ("みすゞ", "みすず"),
    ("じゞ", "じじ"),
    ("じゝ", "じし"),
    ("ところゞゝゝ", "ところどころ"),
    # cross-script sources pass through unmodified
    ("abcところゝゝゝゝ", "abcところcところ"),
    ("abcところゞゝゝゝ", "abcところcところ"),
    # span clamp: marks may not reach back into the previous span
    ("ところゞゝゝゞゝゞ", "ところどころゞゝゞ"),
    # illegal marks at stream start emit as-is
    ("々", "々"),
    ("ゞ", "ゞ"),
    ("ゞゝ", "ゞゝ"),
    # full stop cannot be iterated
    ("。ゝ", "。ゝ"),
    ("。。ゝゝ", "。。ゝゝ"),
    ("。", "。"),
    ("。。", "。。"),
    ("。。。", "。。。"),
    # the filter ignores script on illegal-looking sources
    ("？ゝ", "？？"),
    # mid-word marks
    ("ねやぽゞつむぴ", "ねやぽぽつむぴ"),
    ("ねやぽゝつむぴ", "ねやぽぽつむぴ"),
    # testCombinations
    ("時々、おゝのさんと一緒にお寿司を食べに行きます。",
     "時時、おおのさんと一緒にお寿司を食べに行きます。"),
    ("", ""),
]


@pytest.mark.parametrize("raw,want", BASIC)
def test_basic(raw, want):
    assert iteration_mark(raw) == want


def test_kanji_only():
    src = "時々、おゝのさんと一緒にお寿司が食べたいです。abcところゞゝゝ。"
    assert iteration_mark(src, True, False) == \
        "時時、おゝのさんと一緒にお寿司が食べたいです。abcところゞゝゝ。"


def test_kana_only():
    src = "時々、おゝのさんと一緒にお寿司が食べたいです。abcところゞゝゝ。"
    assert iteration_mark(src, False, True) == \
        "時々、おおのさんと一緒にお寿司が食べたいです。abcところどころ。"


def test_none():
    src = "時々、おゝのさんと一緒にお寿司が食べたいです。abcところゞゝゝ。"
    assert iteration_mark(src, False, False) == src


def test_hiragana_coverage():
    src = ("かゝがゝきゝぎゝくゝぐゝけゝげゝこゝごゝさゝざゝしゝじゝ"
           "すゝずゝせゝぜゝそゝぞゝたゝだゝちゝぢゝつゝづゝてゝでゝ"
           "とゝどゝはゝばゝひゝびゝふゝぶゝへゝべゝほゝぼゝ")
    want = ("かかがかききぎきくくぐくけけげけここごこささざさししじし"
            "すすずすせせぜせそそぞそたただたちちぢちつつづつててでて"
            "ととどとははばはひひびひふふぶふへへべへほほぼほ")
    assert iteration_mark(src) == want


def test_hiragana_coverage_dakuten():
    src = ("かゞがゞきゞぎゞくゞぐゞけゞげゞこゞごゞさゞざゞしゞじゞ"
           "すゞずゞせゞぜゞそゞぞゞたゞだゞちゞぢゞつゞづゞてゞでゞ"
           "とゞどゞはゞばゞひゞびゞふゞぶゞへゞべゞほゞぼゞ")
    want = ("かがががきぎぎぎくぐぐぐけげげげこごごごさざざざしじじじ"
            "すずずずせぜぜぜそぞぞぞただだだちぢぢぢつづづづてででで"
            "とどどどはばばばひびびびふぶぶぶへべべべほぼぼぼ")
    assert iteration_mark(src) == want


def test_katakana_coverage():
    src = ("カヽガヽキヽギヽクヽグヽケヽゲヽコヽゴヽサヽザヽシヽジヽ"
           "スヽズヽセヽゼヽソヽゾヽタヽダヽチヽヂヽツヽヅヽテヽデヽ"
           "トヽドヽハヽバヽヒヽビヽフヽブヽヘヽベヽホヽボヽ")
    want = ("カカガカキキギキククグクケケゲケココゴコササザサシシジシ"
            "ススズスセセゼセソソゾソタタダタチチヂチツツヅツテテデテ"
            "トトドトハハバハヒヒビヒフフブフヘヘベヘホホボホ")
    assert iteration_mark(src) == want


def test_katakana_coverage_dakuten():
    src = ("カヾガヾキヾギヾクヾグヾケヾゲヾコヾゴヾサヾザヾシヾジヾ"
           "スヾズヾセヾゼヾソヾゾヾタヾダヾチヾヂヾツヾヅヾテヾデヾ"
           "トヾドヾハヾバヾヒヾビヾフヾブヾヘヾベヾホヾボヾ")
    want = ("カガガガキギギギクグググケゲゲゲコゴゴゴサザザザシジジジ"
            "スズズズセゼゼゼソゾゾゾタダダダチヂヂヂツヅヅヅテデデデ"
            "トドドドハバババヒビビビフブブブヘベベベホボボボ")
    assert iteration_mark(src) == want


def test_full_stop_resets_but_allows_new_span():
    # a span after a full stop works; iterating the stop itself does not
    assert iteration_mark("時々。時々") == "時時。時時"


def test_astral_breaks_span():
    # astral chars behave like surrogate pairs: a mark immediately
    # after one is illegal and emits as-is
    assert iteration_mark("\U00020000ゝ") == "\U00020000ゝ"
