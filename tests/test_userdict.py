"""User-dictionary vectors — kuromoji TestJapaneseTokenizer
(testUserDict/2/3/4, testEmptyUserDict) and nori TestKoreanTokenizer
(testUserDict, compound entries, longest-match), using the reference
test fixtures' own entries (ja/userdict.txt, ko/userdict.txt)."""

import pytest

from lucene_spark.analysis.ja import JapaneseTokenizer, default_dictionary
from lucene_spark.analysis.ko import KoreanTokenizer
from lucene_spark.analysis.userdict import (JaUserDictionary,
                                            KoUserDictionary,
                                            parse_ko_user_dict)

JA_USERDICT = """\
# Custom segmentation for long entries
日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞
関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,テスト名詞

# Custom reading for sumo wrestler
朝青龍,朝青龍,アサショウリュウ,カスタム人名

# Silly entry:
abcd,a b cd,foo1 foo2 foo3,bar
abcdefg,ab cd efg,foo1 foo2 foo4,bar
"""

KO_USERDICT = """\
# Additional nouns
c++
C샤프
세종
세종시 세종 시
대한민국날씨
대한민국
날씨
21세기대한민국
세기
"""


@pytest.fixture(scope="module")
def ja_tok():
    return JapaneseTokenizer(default_dictionary(), mode="search",
                             user_dictionary=JaUserDictionary(JA_USERDICT))


def test_ja_userdict_segmentation(ja_tok):
    # testUserDict: the entry breaks 関西国際空港 into its segmentation
    toks = ja_tok.tokenize("関西国際空港")
    assert [t.surface for t in toks] == ["関西", "国際", "空港"]
    assert [(t.start, t.end) for t in toks] == [(0, 2), (2, 4), (4, 6)]
    assert [t.reading for t in toks] == ["カンサイ", "コクサイ", "クウコウ"]
    assert all(t.pos == "テスト名詞" for t in toks)


def test_ja_userdict_sentence(ja_tok):
    # testUserDict full sentence: user split + system tail
    surfs = [t.surface for t in ja_tok.tokenize("関西国際空港に行った")]
    assert surfs[:3] == ["関西", "国際", "空港"]
    assert "".join(surfs) == "関西国際空港に行った"


def test_ja_userdict_single(ja_tok):
    # testUserDict2: single-segment entry beats any system segmentation
    toks = ja_tok.tokenize("朝青龍")
    assert [t.surface for t in toks] == ["朝青龍"]
    assert toks[0].reading == "アサショウリュウ"
    assert toks[0].pos == "カスタム人名"


def test_ja_userdict_multi_ascii(ja_tok):
    # testUserDict3
    toks = ja_tok.tokenize("abcd")
    assert [t.surface for t in toks] == ["a", "b", "cd"]
    assert [(t.start, t.end) for t in toks] == [(0, 1), (1, 2), (2, 4)]


def test_ja_userdict_prefix_entries(ja_tok):
    # testUserDict4 is DISABLED in the reference checkout (commented
    # out, TestJapaneseTokenizer.java:523-532): abcd+unknown(efghij)
    # and abcdefg+unknown(hij) are an exact cost tie (-100000 + one
    # ALPHA unknown each, identical connections), so the winner is the
    # first arrival — abcd's path, processed at the earlier position.
    # Pin our deterministic resolution; both user entries fire intact.
    toks = ja_tok.tokenize("abcdefghij")
    assert [t.surface for t in toks] == ["a", "b", "cd", "efghij"]
    assert [(t.start, t.end) for t in toks] == [(0, 1), (1, 2), (2, 4),
                                                (4, 10)]
    # without trailing chars the longer entry matches exactly
    assert [t.surface for t in ja_tok.tokenize("abcdefg")] \
        == ["ab", "cd", "efg"]


def test_ja_userdict_no_search_decompose(ja_tok):
    # user tokens are exempt from SEARCH-mode decomposition even when
    # long and all-kanji (JapaneseTokenizer.java:548/1818)
    long_tok = JapaneseTokenizer(
        default_dictionary(), mode="search",
        user_dictionary=JaUserDictionary(
            ["日本経済新聞社説,日本経済新聞社説,ニッケイシャセツ,名詞"]))
    assert [t.surface for t in long_tok.tokenize("日本経済新聞社説")] \
        == ["日本経済新聞社説"]


def test_ja_empty_userdict():
    # testEmptyUserDict
    ud = JaUserDictionary("\n# This is an empty user dictionary\n\n")
    assert ud.entries == []
    tok = JapaneseTokenizer(default_dictionary(), mode="search",
                            user_dictionary=ud)
    assert tok.tokenize("関西国際空港") != []


def test_ja_userdict_validation():
    with pytest.raises(ValueError, match="number of segmentations"):
        JaUserDictionary(["ここ,こ こ,ココ,名詞"])
    with pytest.raises(ValueError, match="concatenated segmentation"):
        JaUserDictionary(["ここ,こ そ,コ ソ,名詞"])


@pytest.fixture(scope="module")
def ko_ud():
    return KoUserDictionary(KO_USERDICT)


def test_ko_userdict_cpp(ko_ud):
    # testUserDict: c++ is one NNG token (symbols would otherwise split)
    tok = KoreanTokenizer(decompound_mode="none", stop_tags=None,
                          user_dictionary=ko_ud)
    toks = tok.tokenize("c++ 프로그래밍 언어")
    assert [t.surface for t in toks] == ["c++", "프로그래밍", "언어"]
    assert toks[0].pos == "NNG"


def test_ko_userdict_compound_modes(ko_ud):
    none = KoreanTokenizer(decompound_mode="none", stop_tags=None,
                           user_dictionary=ko_ud)
    assert [t.surface for t in none.tokenize("세종시")] == ["세종시"]
    discard = KoreanTokenizer(decompound_mode="discard", stop_tags=None,
                              user_dictionary=ko_ud)
    assert [t.surface for t in discard.tokenize("세종시")] == ["세종", "시"]
    mixed = KoreanTokenizer(decompound_mode="mixed", stop_tags=None,
                            user_dictionary=ko_ud)
    mtoks = mixed.tokenize("세종시")
    assert [t.surface for t in mtoks] == ["세종시", "세종", "시"]
    assert [t.position_increment for t in mtoks] == [1, 0, 1]


def test_ko_userdict_longest_match(ko_ud):
    # 대한민국날씨 beats 대한민국 + 날씨 (longest user match only)
    tok = KoreanTokenizer(decompound_mode="none", stop_tags=None,
                          user_dictionary=ko_ud)
    assert [t.surface for t in tok.tokenize("대한민국날씨")] == ["대한민국날씨"]
    # digits lead the entry: still a single user token
    assert [t.surface for t in tok.tokenize("21세기대한민국")] \
        == ["21세기대한민국"]


def test_ko_userdict_validation():
    with pytest.raises(ValueError, match="segmentation is bigger"):
        parse_ko_user_dict(["세종 세종시"])


def test_ko_userdict_dedup_and_comments():
    entries = parse_ko_user_dict(
        ["날씨", "날씨 날 씨", "# comment", "세종  # trailing comment"])
    # sorted by token; duplicate 날씨 keeps the first after sort
    assert [e.surface for e in entries] == ["날씨", "세종"]
    assert entries[0].pos_type == "MORPHEME"
