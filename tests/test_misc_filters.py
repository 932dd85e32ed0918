"""Miscellaneous-filter vectors — TestCapitalizationFilter,
TestFingerprintFilter, TestHyphenatedWordsFilter,
TestScandinavianNormalizationFilter, TestScandinavianFoldingFilter,
TestStemmerOverrideFilter, and direct-port sanity for the small
filters."""

from lucene_spark.analysis.misc import (capitalization, codepoint_count,
                                        fingerprint, hyphenated_words,
                                        keep_words, keyword_repeat,
                                        limit_token_count,
                                        remove_duplicates,
                                        reverse_string,
                                        scandinavian_fold,
                                        scandinavian_normalize,
                                        stemmer_override, trim, truncate)

KEEP = frozenset(["and", "the", "it", "BIG"])


def test_capitalization_basic():
    assert capitalization(["kiTTEN"], keep=KEEP) == ["Kitten"]
    assert capitalization(["and"], keep=KEEP) == ["And"]
    assert capitalization(["AnD"], keep=KEEP) == ["And"]
    # first is not forced, but AnD is not a keep word either
    assert capitalization(["AnD"], keep=KEEP,
                          force_first_letter=False) == ["And"]
    assert capitalization(["big"], keep=KEEP) == ["Big"]
    assert capitalization(["BIG"], keep=KEEP) == ["BIG"]


def test_capitalization_keyword_token():
    # KeywordTokenizer: the whole phrase as one token, word-split inside
    assert capitalization(["Hello thEre my Name is Ryan"], keep=KEEP) \
        == ["Hello there my name is ryan"]
    assert capitalization(["the The the"], keep=KEEP,
                          only_first_word=False) == ["The The the"]


def test_capitalization_each_token():
    toks = "Hello thEre my Name is Ryan".split()
    assert capitalization(toks, only_first_word=False, keep=KEEP) == \
        ["Hello", "There", "My", "Name", "Is", "Ryan"]
    # only the long words
    assert capitalization(toks, only_first_word=False, keep=KEEP,
                          min_word_length=3) == \
        ["Hello", "There", "my", "Name", "is", "Ryan"]
    # numbers
    assert capitalization("1st 2nd third".split(),
                          only_first_word=False, keep=KEEP,
                          force_first_letter=False) == \
        ["1st", "2nd", "Third"]


def test_capitalization_ok_prefix():
    assert capitalization(["McKinley"], keep=KEEP) == ["Mckinley"]
    assert capitalization(["McKinley"], keep=KEEP,
                          ok_prefix=("McK",)) == ["McKinley"]


def test_fingerprint():
    assert fingerprint("B A B E".split()) == ["A B E"]
    assert fingerprint(["B2", "B2"]) == ["B2"]
    assert fingerprint("B2 A1 C3 D4 E5 F6 G7 H1".split(),
                       max_output_token_size=4) == []
    assert fingerprint("B2 A1 C3 B2".split(), separator="_") == \
        ["A1_B2_C3"]
    assert fingerprint(["A1"]) == ["A1"]
    assert fingerprint([]) == []


def test_hyphenated_words():
    toks = ("ecologi- cal devel- op compre- hensive-hands-on and "
            "ecological").split()
    assert hyphenated_words(toks) == [
        "ecological", "develop", "comprehensive-hands-on", "and",
        "ecological"]
    # final hyphen survives
    toks = ("ecologi- cal devel- op compre- hensive-hands-on and "
            "ecology-").split()
    assert hyphenated_words(toks) == [
        "ecological", "develop", "comprehensive-hands-on", "and",
        "ecology-"]
    assert hyphenated_words("abc- def geh 1234- 5678-".split()) == \
        ["abcdef", "geh", "12345678-"]


def test_scandinavian_normalization():
    # every TestScandinavianNormalizationFilter checkOneTerm
    cases = [
        ("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"),
        ("aeaeeeae", "ææeeæ"), ("bøen", "bøen"), ("bOEen", "bØen"),
        ("åene", "åene"), ("blåbærsyltetøj", "blåbærsyltetøj"),
        ("blaabaersyltetöj", "blåbærsyltetøj"),
        ("räksmörgås", "ræksmørgås"), ("raeksmörgaos", "ræksmørgås"),
        ("raeksmörgaas", "ræksmørgås"), ("raeksmoergås", "ræksmørgås"),
        ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
        ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
        ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
        ("æ", "æ"), ("ä", "æ"), ("Æ", "Æ"), ("Ä", "Æ"),
        ("ae", "æ"), ("aE", "æ"), ("Ae", "Æ"), ("AE", "Æ"),
        ("ö", "ø"), ("ø", "ø"), ("Ö", "Ø"), ("Ø", "Ø"),
        ("oo", "ø"), ("oe", "ø"), ("oO", "ø"), ("oE", "ø"),
        ("Oo", "Ø"), ("Oe", "Ø"), ("OO", "Ø"), ("OE", "Ø"),
    ]
    for raw, want in cases:
        assert scandinavian_normalize([raw]) == [want], raw


def test_scandinavian_folding():
    # every TestScandinavianFoldingFilter checkOneTerm
    cases = [
        ("aeäaeeea", "aaaeea"), ("aeäaeeeae", "aaaeea"),
        ("aeaeeeae", "aaeea"), ("bøen", "boen"), ("åene", "aene"),
        ("blåbærsyltetøj", "blabarsyltetoj"),
        ("blaabaarsyltetoej", "blabarsyltetoj"),
        ("blåbärsyltetöj", "blabarsyltetoj"),
        ("raksmorgas", "raksmorgas"), ("räksmörgås", "raksmorgas"),
        ("ræksmørgås", "raksmorgas"), ("raeksmoergaas", "raksmorgas"),
        ("ræksmörgaos", "raksmorgas"),
        ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
        ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
        ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
        ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
        ("ae", "a"), ("aE", "a"), ("Ae", "A"), ("AE", "A"),
        ("ö", "o"), ("ø", "o"), ("Ö", "O"),
    ]
    for raw, want in cases:
        assert scandinavian_fold([raw]) == [want], raw


def test_stemmer_override():
    from lucene_spark.analysis.stem import STEMMERS

    porter = STEMMERS["porter"]

    def chain(tokens, overrides, ignore_case=False):
        return [t if kw else porter(t)
                for t, kw in stemmer_override(tokens, overrides,
                                              ignore_case)]

    assert chain(["booked"], {"booked": "books"}) == ["books"]
    assert chain(["BooKeD"], {"boOkEd": "books"}, True) == ["books"]
    assert chain(["book"], {}) == ["book"]


def test_keyword_repeat_remove_duplicates():
    from lucene_spark.analysis.stem import STEMMERS

    porter = STEMMERS["porter"]
    out = remove_duplicates(keyword_repeat(["running", "cat"], porter))
    assert out == [("running", 1), ("run", 0), ("cat", 1)]


def test_small_filters():
    assert codepoint_count(["a", "ab", "abc", "abcd"], 2, 3) == \
        ["ab", "abc"]
    assert keep_words(["a", "b", "c"], {"b"}) == ["b"]
    assert trim([" a ", "b\t"]) == ["a", "b"]
    assert truncate(["abcdefg", "ab"], 3) == ["abc", "ab"]
    assert reverse_string(["abc"]) == ["cba"]
    assert limit_token_count(["a", "b", "c"], 2) == ["a", "b"]


def test_delimited_term_frequency():
    from lucene_spark.analysis.misc import delimited_term_frequency

    assert delimited_term_frequency(["foo|5", "bar", "baz|1"]) == [
        ("foo", 5), ("bar", 1), ("baz", 1)]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        delimited_term_frequency(["foo|bar"])


def test_date_recognizer():
    from lucene_spark.analysis.misc import date_recognizer

    toks = ("The red fox jumped over the lazy dogs on 7/11/2006 The "
            "dogs finally reacted on 7/12/2006").split()
    assert date_recognizer(toks) == ["7/11/2006", "7/12/2006"]


def test_concatenate_graph():
    from lucene_spark.analysis.misc import SEP_LABEL, concatenate_graph

    assert concatenate_graph([("mykeyword", 1)]) == ["mykeyword"]
    assert concatenate_graph(
        [("mykeyword", 1), ("another", 1), ("keyword", 1)],
        preserve_sep=False) == ["mykeywordanotherkeyword"]
    assert concatenate_graph(
        [("mykeyword", 1), ("another", 1), ("keyword", 1)]) == \
        [SEP_LABEL.join(["mykeyword", "another", "keyword"])]
    # synonym branch: two paths
    assert concatenate_graph([("mykeyword", 1), ("mysynonym", 0)]) == \
        ["mykeyword", "mysynonym"]
