"""Hunspell stemmer vectors — the reference's own fixture dictionaries
and every assertStemsTo in TestStemmer, TestCondition,
TestOptionalCondition, TestFullStrip, TestNeedAffix, TestCircumfix,
TestFlagLong, TestFlagNum, TestIgnore, TestEscaped, TestHomonyms, and
the TestHunspellStemFilter stream cases."""

import pytest

from lucene_spark.analysis.hunspell import (HunspellDictionary,
                                            hunspell_stem_tokens)

SIMPLE_AFF = """\
SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""
SIMPLE_DIC = """\
9
ab/C
apach/A
foo/D
foo/E
lucen/A
lucene
mahout/A
moo/E
olr/B
"""


@pytest.fixture(scope="module")
def simple():
    return HunspellDictionary(SIMPLE_AFF, SIMPLE_DIC)


def assert_stems(d, word, *expected):
    assert sorted(d.stems(word)) == sorted(expected), word


def test_simple_suffix(simple):
    assert_stems(simple, "lucene", "lucene", "lucen")
    assert_stems(simple, "mahoute", "mahout")


def test_simple_prefix(simple):
    assert_stems(simple, "solr", "olr")


def test_recursive_suffix(simple):
    # we should not recurse here, as the suffix has no continuation
    assert_stems(simple, "abcd")


def test_all_stems(simple):
    assert_stems(simple, "ab", "ab")
    assert_stems(simple, "abc", "ab")
    assert_stems(simple, "apach", "apach")
    assert_stems(simple, "apache", "apach")
    assert_stems(simple, "foo", "foo", "foo")
    assert_stems(simple, "food", "foo")
    assert_stems(simple, "foos", "foo")
    assert_stems(simple, "lucen", "lucen")
    assert_stems(simple, "lucene", "lucen", "lucene")
    assert_stems(simple, "mahout", "mahout")
    assert_stems(simple, "mahoute", "mahout")
    assert_stems(simple, "moo", "moo")
    assert_stems(simple, "mood", "moo")
    assert_stems(simple, "olr", "olr")
    assert_stems(simple, "solr", "olr")


def test_bogus_stems(simple):
    for w in ("abs", "abe", "sab", "sapach", "sapache", "apachee",
              "sfoo", "sfoos", "fooss", "lucenee", "solre"):
        assert_stems(simple, w)


CONDITION_AFF = """\
SET UTF-8

PFX A Y 1
PFX A 0 re .

SFX B Y 2
SFX B 0 ed [^y]
SFX B y ied y
"""
OPTIONAL_CONDITION_AFF = """\
SET UTF-8

# has no condition
PFX A Y 1
PFX A 0 re

SFX B Y 2
SFX B 0 ed [^y]
SFX B y ied y
"""
CONDITION_DIC = "3\nhello\ntry/B\nwork/AB\n"


@pytest.mark.parametrize("aff", [CONDITION_AFF, OPTIONAL_CONDITION_AFF],
                         ids=["condition", "optional-condition"])
def test_conditions(aff):
    d = HunspellDictionary(aff, CONDITION_DIC)
    assert_stems(d, "hello", "hello")
    assert_stems(d, "try", "try")
    assert_stems(d, "tried", "try")
    assert_stems(d, "work", "work")
    assert_stems(d, "worked", "work")
    assert_stems(d, "rework", "work")
    assert_stems(d, "reworked", "work")
    for w in ("retried", "workied", "tryed", "tryied", "helloed"):
        assert_stems(d, w)


def test_full_strip():
    d = HunspellDictionary(
        "SET UTF-8\n\nFULLSTRIP\n\nSFX A Y 1\nSFX A   beer   tasty  .\n",
        "1\nbeer/A\n")
    assert_stems(d, "tasty", "beer")


def test_need_affix():
    d = HunspellDictionary(
        "SET UTF-8\n\nNEEDAFFIX Z\n\nPFX Y Y 1\nPFX Y 0 pre . pre+\n\n"
        "SFX X Y 1\nSFX X 0 s . +s\n",
        "3\ndrink/X\nwalk/XYZ\ntest/Z\n")
    assert_stems(d, "drink", "drink")
    assert_stems(d, "drinks", "drink")
    assert_stems(d, "walk")
    assert_stems(d, "walks", "walk")
    assert_stems(d, "prewalk", "walk")
    assert_stems(d, "prewalks", "walk")
    for w in ("test", "pretest", "tests", "pretests"):
        assert_stems(d, w)


def test_circumfix():
    d = HunspellDictionary(
        "SET UTF-8\n\nCIRCUMFIX X\n\nPFX A Y 1\nPFX A 0 leg/X .\n\n"
        "PFX B Y 1\nPFX B 0 legesleg/X .\n\n"
        "SFX C Y 3\nSFX C 0 obb . +COMPARATIVE\n"
        "SFX C 0 obb/AX . +SUPERLATIVE\n"
        "SFX C 0 obb/BX . +SUPERSUPERLATIVE\n",
        "1\nnagy/C\t[MN]\n")
    assert_stems(d, "nagy", "nagy")
    assert_stems(d, "nagyobb", "nagy")
    assert_stems(d, "legnagyobb", "nagy")
    assert_stems(d, "legeslegnagyobb", "nagy")
    for w in ("nagyobbobb", "legnagy", "legeslegnagy"):
        assert_stems(d, w)


def test_flag_long():
    d = HunspellDictionary(
        "SET UTF-8\nFLAG long\nSFX Y1 Y 1\nSFX Y1 0 s .\n\n"
        "SFX 1Y Y 1\nSFX 1Y 0 bogus .\n",
        "1\nfoo/Y1Z3F?\n")
    assert_stems(d, "foo", "foo")
    assert_stems(d, "foos", "foo")
    assert_stems(d, "fooss")
    assert_stems(d, "foobogus")


def test_flag_num():
    d = HunspellDictionary(
        "SET UTF-8\nFLAG num\nSFX 65000 Y 1\nSFX 65000 0 s .\n",
        "1\nfoo/65000,12,2756\n")
    assert_stems(d, "foo", "foo")
    assert_stems(d, "foos", "foo")
    assert_stems(d, "fooss")


def test_ignore():
    d = HunspellDictionary(
        "SET UTF-8\n\nIGNORE '-\n\nSFX X Y 1\nSFX X 0 able . +ABLE\n",
        "2\ndrink/X\t[VERB]\ndr-ank/X\t[VERB]\n")
    assert_stems(d, "drink", "drink")
    assert_stems(d, "drinkable", "drink")
    assert_stems(d, "dr'ink-able", "drink")
    assert_stems(d, "drank-able", "drank")
    assert_stems(d, "'-'-'-")


def test_escaped():
    d = HunspellDictionary(
        "SET UTF-8\nWORDCHARS \\/0123456789\n\n"
        "SFX A Y 1\nSFX A 0 s . +PLUR\n",
        "5\n/\n/a\nwork/A\nR2\\/D2/A\nN\\/A\n")
    assert_stems(d, "/", "/")
    assert_stems(d, "/a", "/a")
    assert_stems(d, "works", "work")
    assert_stems(d, "work", "work")
    assert_stems(d, "R2/D2", "R2/D2", "R2/d2")
    assert_stems(d, "R2/D2s", "R2/D2")
    assert_stems(d, "N/A", "N/A")
    assert_stems(d, "N/As")
    assert_stems(d, "//")


def test_homonyms():
    d = HunspellDictionary(
        "SET UTF-8\n\nSFX A Y 1\nSFX A 0 s . +SG3\n\n"
        "SFX B Y 1\nSFX B 0 s . +PLUR\n",
        "2\nwork/A\t[VERB]\nwork/B\t[NOUN]\n")
    assert_stems(d, "works", "work", "work")


@pytest.fixture(scope="module")
def simple_d(simple):
    return simple


def test_stem_filter(simple_d):
    # TestHunspellStemFilter.testKeywordAttribute
    toks = hunspell_stem_tokens(["lucene", "is", "awesome"], simple_d)
    assert [(t.text, t.position_increment) for t in toks] == [
        ("lucene", 1), ("lucen", 0), ("is", 1), ("awesome", 1)]
    # with keyword marker
    toks = hunspell_stem_tokens(["lucene", "is", "awesome"], simple_d,
                                keywords=frozenset(["lucene"]))
    assert [(t.text, t.position_increment) for t in toks] == [
        ("lucene", 1), ("is", 1), ("awesome", 1)]


def test_stem_filter_longest_only(simple_d):
    toks = hunspell_stem_tokens(["lucene", "is", "awesome"], simple_d,
                                dedup=False, longest_only=True)
    assert [(t.text, t.position_increment) for t in toks] == [
        ("lucene", 1), ("is", 1), ("awesome", 1)]


def test_empty_term(simple_d):
    assert simple_d.stems("") == []


def test_keep_case():
    d = HunspellDictionary(
        "SET UTF-8\n\nKEEPCASE Z\n\nSFX X Y 1\nSFX X 0 s . +s\n",
        "7\ndrink/X\nwalk/XZ\ntest/Z\nfoo/Z\nBar/Z\nbaz./Z\nQuux./Z\n")
    assert_stems(d, "drink", "drink")
    assert_stems(d, "Drink", "drink")
    assert_stems(d, "DRINK", "drink")
    assert_stems(d, "drinks", "drink")
    assert_stems(d, "Drinks", "drink")
    assert_stems(d, "DRINKS", "drink")
    assert_stems(d, "walk", "walk")
    assert_stems(d, "walks", "walk")
    for w in ("Walk", "Walks", "WALKS", "Test", "TEST", "Baz.", "QUUX."):
        assert_stems(d, w)
    assert_stems(d, "test", "test")
    assert_stems(d, "baz.", "baz.")
    assert_stems(d, "Quux.", "Quux.")


# ---- spell checking (SpellChecker.java fixtures) ----------------------

BREAK_AFF = """\
SET UTF-8

BREAK 2
BREAK -
BREAK –

WORDCHARS -–

FORBIDDENWORD !
"""
BREAK_DIC = "6\nfoo\nbar\nbaz\nfox-bax\nfoo-baz/!\ne-mail\n"


def test_spell_breaks():
    d = HunspellDictionary(BREAK_AFF, BREAK_DIC)
    good = ["foo", "bar", "fox-bax", "foo-bar", "foo–bar",
            "foo-bar-foo-bar", "foo-bar–foo-bar", "bar-baz",
            "baz-foo", "foo-bar-foo-bar-foo-bar-foo-bar-foo-bar",
            "e-mail", "e-mail-foo"]
    wrong = ["fox", "bax", "-foo", "bar-", "fox-bar", "foo-bax",
             "foo–bax", "fox–bar", "foo-bar-fox-bar",
             "foo-bax-foo-bar", "foo-bar–fox-bar",
             "foo-bax–foo-bar", "foo-baz"]
    for w in good:
        assert d.spell(w), w
    for w in wrong:
        assert not d.spell(w), w


def test_spell_break_default():
    # breakdefault.aff: no BREAK directive -> "-" everywhere
    d = HunspellDictionary(
        "SET UTF-8\nWORDCHARS -\nTRY ot\n",
        "5\nfoo\nbar\nfree\nscott\nscot-free\n")
    for w in ("foo", "bar", "foo-", "-foo", "scot-free", "foo-bar",
              "foo-bar-foo-bar"):
        assert d.spell(w), w
    for w in ("scot", "sco-free", "fo-bar", "foo-fo-bar", "foo-foo-fo"):
        assert not d.spell(w), w


def test_spell_break_off():
    d = HunspellDictionary(
        "SET UTF-8\nWORDCHARS -\nTRY ot\n\nBREAK 0\n",
        "5\nfoo\nbar\nfree\nscott\nscot-free\n")
    for w in ("foo", "bar", "scot-free"):
        assert d.spell(w), w
    for w in ("foo-", "-foo", "foo-bar", "foo-bar-foo-bar", "scot"):
        assert not d.spell(w), w


BASE_AFF = """\
SET ISO8859-1
TRY esianrtolcdugmphbyfvkwz'

WORDCHARS .'

PFX A Y 1
PFX A   0     re         .

PFX I Y 1
PFX I   0     in         .

PFX U Y 1
PFX U   0     un         .

PFX C Y 1
PFX C   0     de          .

PFX E Y 1
PFX E   0     dis         .

PFX F Y 1
PFX F   0     con         .

PFX K Y 1
PFX K   0     pro         .

SFX V N 2
SFX V   e     ive        e
SFX V   0     ive        [^e]

SFX N Y 3
SFX N   e     ion        e
SFX N   y     ication    y
SFX N   0     en         [^ey]

SFX X Y 3
SFX X   e     ions       e
SFX X   y     ications   y
SFX X   0     ens        [^ey]

SFX H N 2
SFX H   y     ieth       y
SFX H   0     th         [^y]

SFX Y Y 1
SFX Y   0     ly         .

SFX G Y 2
SFX G   e     ing        e
SFX G   0     ing        [^e]

SFX J Y 2
SFX J   e     ings       e
SFX J   0     ings       [^e]

SFX D Y 4
SFX D   0     d          e
SFX D   y     ied        [^aeiou]y
SFX D   0     ed         [^ey]
SFX D   0     ed         [aeiou]y

SFX T N 4
SFX T   0     st         e
SFX T   y     iest       [^aeiou]y
SFX T   0     est        [aeiou]y
SFX T   0     est        [^ey]

SFX R Y 4
SFX R   0     r          e
SFX R   y     ier        [^aeiou]y
SFX R   0     er         [aeiou]y
SFX R   0     er         [^ey]

SFX Z Y 4
SFX Z   0     rs         e
SFX Z   y     iers       [^aeiou]y
SFX Z   0     ers        [aeiou]y
SFX Z   0     ers        [^ey]

SFX S Y 4
SFX S   y     ies        [^aeiou]y
SFX S   0     s          [aeiou]y
SFX S   0     es         [sxzh]
SFX S   0     s          [^sxzhy]

SFX P Y 3
SFX P   y     iness      [^aeiou]y
SFX P   0     ness       [aeiou]y
SFX P   0     ness       [^y]

SFX M Y 1
SFX M   0     's         .

SFX B Y 3
SFX B   0     able       [^aeiou]
SFX B   0     able       ee
SFX B   e     able       [^aeiou]e

SFX L Y 1
SFX L   0     ment       .
"""
BASE_DIC = """\
28
created/U
create/XKVNGADS
imply/GNSDX
natural/PUY
like/USPBY
convey/BDGS
look/GZRDS
text
hello
said
sawyer
NASA
rotten
day
tomorrow
seven
FAQ/SM
can't
doesn't
etc
won't
lip
text
horrifying
speech
suggest
uncreate/V
Hunspell
"""


def test_spell_base_english():
    # the reference's OpenOffice en_US-derived base fixture
    # (base.good / base.wrong)
    d = HunspellDictionary(BASE_AFF, BASE_DIC)
    good = ["created", "uncreate", "uncreated", "imply", "implied",
            "unnatural", "conveyed", "sawyer", "NASA", "FAQs", "can't",
            "doesn't", "won't", "Created", "Hello", "HELLO", "etc.",
            "etc", "lip.", "text.", "NASA.", "Text.", "TEXT.",
            "Hunspell.", "HUNSPELL.", "HUNSPELL..."]
    wrong = ["loooked", "texxt", "hlelo", "seid", "rottenday",
             "tomorow", "seeeven", "Nasa", "horrorfying", "peech",
             "sugesst"]
    for w in good:
        assert d.spell(w), w
    for w in wrong:
        assert not d.spell(w), w


# ---- suggestions (ModifyingSuggester fixtures) ------------------------

SUG_AFF = """\
MAXNGRAMSUGS 0
REP 2
REP alot a_lot
REP inspite in_spite
KEY qwertzuiop|asdfghjkl|yxcvbnm|aq
WORDCHARS .-
FORBIDDENWORD ?
"""
SUG_DIC = ("13\nNASA\nGandhi\ngrateful\npermanent\nvacation\na\nlot\n"
           "have\nwhich\nMcDonald\npermanent-vacation/?\nin\nspite\n"
           "inspire\n")


def test_suggest_sug_fixture():
    # sug.aff/sug.dic/sug.sug: capitalization, long swap/move, doubled
    # pair, REP-with-space, mixed-case dot split, KEY neighbor rows
    d = HunspellDictionary(SUG_AFF, SUG_DIC)
    assert d.suggest("nasa") == ["NASA"]
    assert d.suggest("Ghandi") == ["Gandhi"]
    assert d.suggest("greatful") == ["grateful"]
    assert d.suggest("permenant") == ["permanent"]
    assert d.suggest("vacacation") == ["vacation"]
    assert d.suggest("alot") == ["a lot", "lot"]
    assert d.suggest("inspite") == ["in spite", "inspire"]
    assert d.suggest("permanent.Vacation") == ["permanent. Vacation"]
    # the reference code's own documented double-swap examples
    # (ModifyingSuggester.java:181)
    assert d.suggest("ahev") == ["have"]
    assert d.suggest("hwihc") == ["which"]
    assert d.suggest("GAndhi") == ["Gandhi"]
    assert d.suggest("Mcdonald") == ["McDonald"]
    assert d.suggest("permqnent") == ["permanent"]   # KEY aq row
    # forbidden word: neither spelled nor suggested
    assert not d.spell("permanent-vacation")
    assert d.suggest("permanent-vacation") == []


REPSUG_AFF = """\
MAXNGRAMSUGS 0
REP 8
REP f ph
REP ph f
REP shun$ tion
REP ^alot$ a_lot
REP ^foo$ bar
REP ' _
REP ^vinteún$ vinte_e_un
REP s 's

SFX A Y 1
SFX A 0 's .

WORDCHARS '
"""
REPSUG_DIC = ("14\nform\nphantom\nvacation\nvacations\na\nlot\nun\n"
              "alunno\nbar\nbarbars\nvinte\ne\nun\nauto/A\n")


def test_suggest_rep_fixture():
    # rep.aff/rep.dic/rep.sug: anchored REPs, _ -> space, multi-word
    # candidates verified part-by-part, affixed REP results
    d = HunspellDictionary(REPSUG_AFF, REPSUG_DIC)
    assert d.suggest("phorm") == ["form"]
    assert d.suggest("fantom") == ["phantom"]
    assert d.suggest("vacashun") == ["vacation"]
    assert d.suggest("vacashuns") == []
    assert d.suggest("alot") == ["a lot", "lot"]
    assert d.suggest("un'alunno") == ["un alunno"]
    assert d.suggest("foo") == ["bar"]
    assert d.suggest("foobars") == []
    assert d.suggest("barfoos") == []
    assert d.suggest("vinteún") == ["vinte e un"]
    assert d.suggest("autos") == ["auto's", "auto"]


def test_suggest_breakdefault_fixture():
    # breakdefault.sug: TRY-char insertion and dash-chunk repair
    d = HunspellDictionary(
        "MAXNGRAMSUGS 0\nWORDCHARS -\nTRY ot\n",
        "5\nfoo\nbar\nfree\nscott\nscot-free\n")
    assert d.suggest("scot") == ["scott"]
    assert d.suggest("sco-free") == ["scot-free"]
    assert d.suggest("fo-bar") == ["foo-bar"]
    assert d.suggest("foo-fo-bar") == ["foo-foo-bar"]
    assert d.suggest("foo-foo-fo") == ["foo-foo-foo"]


def test_suggest_nosuggest_flag():
    # nosuggest.aff (non-compound rows): NOSUGGEST roots are spelled
    # but never suggested (nosuggest.sug is an empty file)
    d = HunspellDictionary("NOSUGGEST A\n", "2\nfoo/A\nbar\n")
    assert d.spell("foo")
    assert not d.spell("foox")
    assert d.suggest("foox") == []


def test_suggest_base_ngram_fixture():
    """base_utf.sug — the full suggestion stack including the n-gram
    GeneratingSuggester (horrorfying -> horrifying has no edit-based
    path), split suggestions, and case restoration."""
    d = HunspellDictionary(BASE_AFF, BASE_DIC)
    assert d.suggest("loooked") == ["looked", "look"]
    assert d.suggest("texxt") == ["text"]
    assert d.suggest("hlelo") == ["hello"]
    assert d.suggest("seid") == ["said"]
    assert d.suggest("rottenday") == ["rotten day", "rotten-day",
                                      "rotten"]
    assert d.suggest("tomorow") == ["tomorrow"]
    assert d.suggest("seeeven") == ["seven"]
    assert d.suggest("Nasa") == ["NASA"]
    assert d.suggest("horrorfying") == ["horrifying"]
    assert d.suggest("peech") == ["speech"]
    assert d.suggest("sugesst") == ["suggest"]


# ---- COMPOUNDRULE (CompoundRule.java + checkCompoundRules) -----------

def run_fixture(aff, dic, good, wrong):
    d = HunspellDictionary(aff, dic)
    for w in good:
        assert d.spell(w), w
    for w in wrong:
        assert not d.spell(w), w


def test_compoundrule_basic():
    run_fixture(
        "COMPOUNDMIN 1\nCOMPOUNDRULE 1\nCOMPOUNDRULE ABC\n",
        "3\na/A\nb/B\nc/BC\n",
        ["abc", "acc"],
        ("ba aaabaaa bbaaa aaaaba bbbbbaa aa aaa aaaa ab aab aaab "
         "aaaab abb aabb aaabbb bb bbb bbbb abcc abbc abbcc aabc "
         "aabcc aabbc aabbcc aaabbbccc ac aac aacc aaaccc bc bcc bbc "
         "bbcc bbbccc cc ccc cccccc").split())


def test_compoundrule_star():
    run_fixture(
        "COMPOUNDMIN 1\nCOMPOUNDRULE 1\nCOMPOUNDRULE A*B*C*\n",
        "3\na/A\nb/B\nc/C\n",
        ("aa aaa aaaa ab aab aaab aaaab abb aabb aaabbb bb bbb bbbb "
         "abc abcc abbc abbcc aabc aabcc aabbc aabbcc aaabbbccc ac "
         "acc aac aacc aaaccc bc bcc bbc bbcc bbbccc cc ccc "
         "cccccc").split(),
        "ba aaabaaa bbaaa aaaaba bbbbbaa cba cab acb".split())


def test_compoundrule_question():
    run_fixture(
        "COMPOUNDMIN 1\nCOMPOUNDRULE 1\nCOMPOUNDRULE A?B?C?\n",
        "3\na/A\nb/B\nc/C\n",
        "ab abc ac bc".split(),
        "aa aaa aaaa aab aaab aaaab".split())


ORDINAL_DIC = ("22\n0/nm\n1/n1\n2/nm\n3/nm\n4/nm\n5/nm\n6/nm\n7/nm\n"
               "8/nm\n9/nm\n0th/pt\n1st/p\n1th/tc\n2nd/p\n2th/tc\n"
               "3rd/p\n3th/tc\n4th/pt\n5th/pt\n6th/pt\n7th/pt\n8th/pt\n"
               "9th/pt\n")


def test_compoundrule_ordinals():
    # compoundrule4: ONLYINCOMPOUND + two rules + case variant (42ND)
    run_fixture(
        "WORDCHARS 0123456789\nCOMPOUNDMIN 1\nONLYINCOMPOUND c\n"
        "COMPOUNDRULE 2\nCOMPOUNDRULE n*1t\nCOMPOUNDRULE n*mp\n",
        ORDINAL_DIC,
        ("1st 2nd 3rd 4th 5th 6th 7th 8th 9th 10th 11th 12th 13th "
         "14th 15th 16th 17th 18th 19th 20th 21st 22nd 23rd 24th "
         "25th 100th 1000th 10001st 100001st 1000001st 42ND").split(),
        "1th 2th 3th 10001th 10011st 11st 12nd 13rd".split())


def test_compoundrule_percent():
    run_fixture(
        "SET UTF-8\nCOMPOUNDMIN 1\nCOMPOUNDRULE 2\n"
        "COMPOUNDRULE N*%?\nCOMPOUNDRULE NN*.NN*%?\n"
        "WORDCHARS 0123456789‰.\n",
        "13\n" + "\n".join(f"{i}/N" for i in range(10))
        + "\n./.\n%/%\n‰/%\n",
        # 10.10. is good via the trailing-dot tolerance
        "10% 0.2% 0.20% 123.4561‰ 10 0000 10.25 10.10.".split(),
        ".25 .25% 10.10.% 10..25 10%% 10%‰ 10.%".split())


def test_compoundrule_multi():
    run_fixture(
        "COMPOUNDMIN 1\nCOMPOUNDRULE 2\nCOMPOUNDRULE A*A\n"
        "COMPOUNDRULE A*AAB*BBBC*C\n",
        "3\na/A\nb/B\nc/C\n",
        "aa aaaaaa aabbbc aaaaabbbbbbcccccc".split(),
        "abc abbbbbccccccc aabbccccccc aabbbbbbb".split())


def test_compoundrule_flag_long_groups():
    run_fixture(
        "FLAG long\nWORDCHARS 0123456789\nCOMPOUNDMIN 1\n"
        "ONLYINCOMPOUND cc\nCOMPOUNDRULE 2\n"
        "COMPOUNDRULE (nn)*(11)(tt)\nCOMPOUNDRULE (nn)*(mm)(pp)\n",
        ("22\n0/nnmm\n1/nn11\n2/nnmm\n3/nnmm\n4/nnmm\n5/nnmm\n6/nnmm\n"
         "7/nnmm\n8/nnmm\n9/nnmm\n0th/pptt\n1st/pp\n1th/ttcc\n2nd/pp\n"
         "2th/ttcc\n3rd/pp\n3th/ttcc\n4th/pptt\n5th/pptt\n6th/pptt\n"
         "7th/pptt\n8th/pptt\n9th/pptt\n"),
        "1st 2nd 3rd 4th 10001st 21st".split(),
        "1th 2th 3th 10001th 10011st".split())


# ---- COMPOUNDFLAG compounding (SpellChecker.checkCompounds) ----------

def test_compoundflag():
    run_fixture(
        "COMPOUNDMIN 3\nCOMPOUNDFLAG A\n",
        "4\nfoo/A\nbar/A\nxy/A\nyz/A\n",
        "foobar barfoo foobarfoo".split(),
        "xyyz fooxy xyfoo fooxybar".split())


def test_compoundforbid():
    # affix-generated parts via COMPOUNDPERMITFLAG; COMPOUNDFORBIDFLAG
    # bans roots from begin/middle positions
    run_fixture(
        "COMPOUNDFLAG X\nCOMPOUNDPERMITFLAG Y\nCOMPOUNDFORBIDFLAG Z\n"
        "SFX S Y 2\nSFX S 0 bar/YX .\nSFX S 0 baz/YX .\n",
        "3\nfoo/S\nexample/X\nfoobaz/Z\n",
        "foo example foobar foobaz foobarexample".split(),
        "fooexample examplefoo foobazexample".split())


def test_checkcompoundcase():
    run_fixture(
        "CHECKCOMPOUNDCASE\nCOMPOUNDFLAG A\n",
        "4\nfoo/A\nBar/A\nBAZ/A\n-/A\n",
        "Barfoo foo-Bar foo-BAZ BAZ-foo BAZ-Bar".split(),
        "fooBar BAZBar BAZfoo".split())


def test_checkcompounddup():
    run_fixture(
        "CHECKCOMPOUNDDUP\nCOMPOUNDFLAG A\n",
        "2\nfoo/A\nbar/A\n",
        "barfoo foobar foofoobar foobarfoo barfoobarfoo".split(),
        "foofoo foofoofoo foobarbar".split())


def test_checkcompoundtriple():
    run_fixture(
        "CHECKCOMPOUNDTRIPLE\nCOMPOUNDFLAG A\n",
        "4\nfoo/A\nopera/A\neel/A\nbare/A\n",
        "operafoo operaeel operabare eelbare eelfoo eelopera".split(),
        "fooopera bareeel".split())


def test_checkcompoundrep():
    # szer+víz forbidden: REP í->i yields the dictionary word szerviz
    run_fixture(
        "CHECKCOMPOUNDREP\nCOMPOUNDFLAG A\nREP 1\nREP í i\n",
        "3\nszer/A\nvíz/A\nszerviz\nkocsi/A\n",
        "vízszer szerkocsi".split(),
        "szervíz szervízkocsi kocsiszervíz".split())


def test_forceucase_compound():
    run_fixture(
        "TRY F\nFORCEUCASE A\nCOMPOUNDFLAG C\n",
        "3\nfoo/C\nbar/C\nbaz/CA\n",
        "foo bar baz foobar Foobaz foobazbar Foobarbaz".split(),
        "foobaz foobarbaz".split())
    d = HunspellDictionary("TRY F\nFORCEUCASE A\nCOMPOUNDFLAG C\n",
                           "3\nfoo/C\nbar/C\nbaz/CA\n")
    # forceucase.sug: the capitalized compound is suggested
    assert d.suggest("foobaz") == ["Foobaz"]
    assert d.suggest("foobarbaz") == ["Foobarbaz"]


def test_checkcompoundpattern():
    # checkcompoundpattern: literal end/begin patterns forbid the bound
    run_fixture(
        "COMPOUNDFLAG A\nCHECKCOMPOUNDPATTERN 2\n"
        "CHECKCOMPOUNDPATTERN nny ny\nCHECKCOMPOUNDPATTERN ssz sz\n",
        "4\nkönny/A\nnyelés/A\nhossz/A\nszámítás/A\n",
        "könnyszámítás hossznyelés".split(),
        ("könnynyelés hosszszámítás hosszkönnynyelés "
         "könnynyeléshossz").split())


def test_checkcompoundpattern_replacement():
    # checkcompoundpattern2: the replacement form re-enables compounds
    run_fixture(
        "COMPOUNDFLAG A\nCHECKCOMPOUNDPATTERN 2\n"
        "CHECKCOMPOUNDPATTERN o b z\nCHECKCOMPOUNDPATTERN oo ba u\n"
        "COMPOUNDMIN 1\n",
        "2\nfoo/A\nbar/A\n",
        "barfoo fozar fur".split(),
        ["foobar"])


def test_checkcompoundpattern_flags():
    # checkcompoundpattern3: /X /Y stem-flag constraints
    run_fixture(
        "COMPOUNDFLAG A\nCHECKCOMPOUNDPATTERN 1\n"
        "CHECKCOMPOUNDPATTERN o/X b/Y z\nCOMPOUNDMIN 1\n",
        "4\nfoo/A\nboo/AX\nbar/A\nban/AY\n",
        ("bozan barfoo banfoo banbar foobar fooban foobanbar boobar "
         "boobarfoo").split(),
        ("booban boobanfoo fozar fozarfoo fozan fozanfoo bozar "
         "bozarfoo").split())


def test_iconv_oconv():
    # TestConv: ICONV normalizes input, OCONV converts the stems out
    d = HunspellDictionary(
        "SET UTF-8\nICONV 4\nICONV A a\nICONV B b\nICONV C c\n"
        "ICONV I i\nOCONV 4\nOCONV a A\nOCONV b B\nOCONV c C\n"
        "OCONV i I\nSFX X Y 1\nSFX X 0 able . +ABLE\n",
        "1\ndrink/X\t[VERB]\n")
    for w in ("drink", "drInk", "drInkAble", "drInkABle", "drinkABle"):
        assert "drInk" in d.stems(w), w


def test_oconv_suggestions():
    # oconv fixture: suggestions pass through the output conversion
    d = HunspellDictionary(
        "SET UTF-8\nOCONV 7\nOCONV a A\nOCONV á Á\nOCONV b B\n"
        "OCONV c C\nOCONV d D\nOCONV e E\nOCONV é É\n",
        "3\nbébé\ndádá\naábcdeé\n")
    for w in ("bébé", "dádá", "aábcdeé"):
        assert d.spell(w), w
    assert d.suggest("béb") == ["BÉBÉ"]
    assert d.suggest("dád") == ["DÁDÁ"]
    assert d.suggest("aábcde") == ["AÁBCDEÉ"]


def test_af_flag_aliases():
    """TestCompressed: AF alias table (digit flag fields resolve to
    1-based alias rows, with FLAG long declared after the table) plus
    mixed/upper hidden-variant casing."""
    d = HunspellDictionary(
        "AF 5\nAF AA\nAF BB\nAF CC\nAF DD\nAF EE\n\nSET UTF-8\n"
        "FLAG long\n\nSFX AA Y 3\nSFX AA 0 e n\nSFX AA 0 e t\n"
        "SFX AA 0 e h\n\nSFX CC Y 2\nSFX CC 0 d/3 c\nSFX CC 0 c b\n\n"
        "SFX DD Y 1\nSFX DD 0 s .\n\nSFX EE Y 1\nSFX EE 0 d o\n\n"
        "PFX BB Y 1\nPFX BB 0 s o\n",
        "10\nab/3\napach/1\nfoo/4\nfoo/5\nlucen/1\nlucene\nmahout/1\n"
        "olr/2\nXYZ/4\nmixedCase\n")
    assert_stems(d, "ab", "ab")
    assert_stems(d, "abc", "ab")
    assert_stems(d, "abcd")                 # no continuation chain
    assert_stems(d, "apach", "apach")
    assert_stems(d, "apache", "apach")
    assert_stems(d, "apachee")
    assert_stems(d, "XYZ", "XYZ", "Xyz")
    assert_stems(d, "XYZs", "XYZ")
    assert_stems(d, "XYZS", "Xyz")
    assert_stems(d, "xyz")
    assert_stems(d, "mixedCase", "mixedCase")
    assert_stems(d, "MIXEDCASE", "Mixedcase")


def test_complex_prefixes():
    """TestComplexPrefix: COMPLEXPREFIXES allows a second prefix whose
    continuation class carries the first (pone+ptwo/A), plus a suffix
    on top; the reverse prefix order fails."""
    d = HunspellDictionary(
        "SET UTF-8\nCOMPLEXPREFIXES\nPFX A Y 1\nPFX A 0 pone .\n"
        "PFX B Y 1\nPFX B 0 ptwo/A .\nSFX C Y 1\nSFX C 0 suf .\n",
        "1\nfoo/BC\n")
    assert_stems(d, "ptwofoo", "foo")
    assert_stems(d, "poneptwofoo", "foo")
    assert_stems(d, "foosuf", "foo")
    assert_stems(d, "ptwofoosuf", "foo")
    assert_stems(d, "poneptwofoosuf", "foo")
    for w in ("ponefoo", "ponefoosuf", "ptwoponefoo", "ptwoponefoosuf"):
        assert_stems(d, w)
