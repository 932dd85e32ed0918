

# ---- reference vectors from TestPhoneticFilter.testAlgorithms ----------
def test_metaphone_reference_vectors():
    from lucene_spark.analysis.phonetic import metaphone

    assert [metaphone(w) for w in "aaa bbb ccc easgasg".split()] == \
        ["A", "B", "KKK", "ESKS"]
    assert metaphone("") == ""
    assert metaphone("x") == "X"           # single char returns itself
    assert metaphone("international", max_code_len=8) != ""


def test_caverphone2_reference_vectors():
    from lucene_spark.analysis.phonetic import caverphone2

    assert [caverphone2(w) for w in "Darda Karleen Datha Carlene".split()] \
        == ["TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"]
    assert all(len(caverphone2(w)) == 10
               for w in ["a", "thompson", "x", "Stevenson"])


def test_nysiis_reference_vectors():
    from lucene_spark.analysis.phonetic import nysiis

    assert [nysiis(w) for w in "aaa bbb ccc easgasg".split()] == \
        ["A", "B", "C", "EASGAS"]
    assert len(nysiis("knickerbocker")) <= 6   # strict cap
    assert nysiis("knight").startswith("N")    # KN -> NN transcode


def test_phonetic_chains_registered():
    from lucene_spark.analysis import get_analyzer

    assert get_analyzer("phonetic_metaphone").tokenize_one(
        "ccc easgasg") == ["KKK", "ESKS"]
    assert get_analyzer("phonetic_caverphone2").tokenize_one(
        "Darda Carlene") == ["TTA1111111", "KLN1111111"]
    assert get_analyzer("phonetic_nysiis").tokenize_one(
        "easgasg") == ["EASGAS"]


def test_metaphone_commons_rules():
    from lucene_spark.analysis.phonetic import metaphone

    assert metaphone("science") == "SNS"   # SCE/SCI/SCY: silent C
    assert metaphone("laugh") == "L"       # word-final GH silent
    assert metaphone("school") == "SKL"    # SCH -> K
    assert metaphone("magnet") == "MNT"    # mid-word GN silent (commons)
    assert metaphone("chair") == "KR"      # initial CH + vowel@2 -> K


def test_caverphone2_ascii_only():
    from lucene_spark.analysis.phonetic import caverphone2

    assert caverphone2("café") == "KF11111111"   # non-ASCII stripped


def test_daitch_mokotoff_reference_vectors():
    from lucene_spark.analysis.phonetic import daitch_mokotoff as dm

    # TestDaitchMokotoffSoundexFilter.testAlgorithms
    assert dm("aaa") == ("000000",)
    assert dm("bbb") == ("700000",)
    assert set(dm("ccc")) == {"400000", "450000", "454000",
                              "540000", "545000", "500000"}
    assert dm("easgasg") == ("045450",)
    assert dm("") == ()


def test_daitch_mokotoff_chain():
    from lucene_spark.analysis import get_analyzer

    out = get_analyzer("phonetic_dm").tokenize_one("bbb easgasg")
    assert out == ["700000", "045450"]


def test_dm_initial_mn_codes_nasal():
    from lucene_spark.analysis.phonetic import daitch_mokotoff as dm

    # review regression: word-initial Mn-/Nm- must code the nasal
    assert dm("mniszek") == dm("niszek") == ("645000",)
