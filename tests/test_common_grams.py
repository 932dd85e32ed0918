"""CommonGramsFilter / CommonGramsQueryFilter parity — every vector from
the reference's TestCommonGramsFilter.java (testCommonGramsFilter,
testCommonGramsQueryFilter, testReset ordering), common set
{s,a,b,c,d,the,of}, whitespace tokenizer, no stopwords."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_spark.analysis.analyzers import (Analyzer, _common_grams,
                                             _common_grams_positions,
                                             analyze_stages,
                                             tokenize_pandas,
                                             tokenize_pandas_positions)

COMMON = frozenset("s a b c d the of".split())

IDX = Analyzer(name="cg_test", token_pattern=r"\S+", lowercase=False,
               common_grams=COMMON)
QRY = Analyzer(name="cgq_test", token_pattern=r"\S+", lowercase=False,
               common_grams=COMMON, common_grams_query=True)


# --------------------------------- testCommonGramsFilter (index mode)
@pytest.mark.parametrize("inp,toks,incs", [
    ("the", ["the"], [1]),
    ("foo", ["foo"], [1]),
    ("brown fox", ["brown", "fox"], [1, 1]),
    ("the fox", ["the", "the_fox", "fox"], [1, 0, 1]),
    ("fox of", ["fox", "fox_of", "of"], [1, 0, 1]),
    ("of the", ["of", "of_the", "the"], [1, 0, 1]),
    ("n n n", ["n", "n", "n"], [1, 1, 1]),
    ("quick brown fox", ["quick", "brown", "fox"], [1, 1, 1]),
    ("n n s", ["n", "n", "n_s", "s"], [1, 1, 0, 1]),
    ("quick brown the", ["quick", "brown", "brown_the", "the"],
     [1, 1, 0, 1]),
    ("n s n", ["n", "n_s", "s", "s_n", "n"], [1, 0, 1, 0, 1]),
    ("quick the fox", ["quick", "quick_the", "the", "the_fox", "fox"],
     [1, 0, 1, 0, 1]),
    ("n s s", ["n", "n_s", "s", "s_s", "s"], [1, 0, 1, 0, 1]),
    ("fox of the", ["fox", "fox_of", "of", "of_the", "the"],
     [1, 0, 1, 0, 1]),
    ("s n n", ["s", "s_n", "n", "n"], [1, 0, 1, 1]),
    ("the quick brown", ["the", "the_quick", "quick", "brown"],
     [1, 0, 1, 1]),
    ("s n s", ["s", "s_n", "n", "n_s", "s"], [1, 0, 1, 0, 1]),
    ("the fox of", ["the", "the_fox", "fox", "fox_of", "of"],
     [1, 0, 1, 0, 1]),
    ("s s n", ["s", "s_s", "s", "s_n", "n"], [1, 0, 1, 0, 1]),
    ("of the fox", ["of", "of_the", "the", "the_fox", "fox"],
     [1, 0, 1, 0, 1]),
    ("s s s", ["s", "s_s", "s", "s_s", "s"], [1, 0, 1, 0, 1]),
    ("of the of", ["of", "of_the", "the", "the_of", "of"],
     [1, 0, 1, 0, 1]),
])
def test_index_mode_reference_vectors(inp, toks, incs):
    out = _common_grams(inp.split(), COMMON, query=False)
    assert out == toks
    # position parity: cumulative posInc per reference vector
    pos_ref, p = [], -1
    for inc in incs:
        p += inc
        pos_ref.append(p)
    out_t, out_p = _common_grams_positions(
        inp.split(), list(range(len(inp.split()))), COMMON, query=False)
    assert out_t == toks and out_p == pos_ref


# ---------------------------- testCommonGramsQueryFilter (query mode)
@pytest.mark.parametrize("inp,toks", [
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the_fox"]),
    ("fox of", ["fox_of"]),
    ("of the", ["of_the"]),
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("n n n", ["n", "n", "n"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("n n s", ["n", "n_s"]),
    ("quick brown the", ["quick", "brown_the"]),
    ("n s n", ["n_s", "s_n"]),
    ("quick the brown", ["quick_the", "the_brown"]),
    ("n s s", ["n_s", "s_s"]),
    ("fox of the", ["fox_of", "of_the"]),
    ("s n n", ["s_n", "n", "n"]),
    ("the quick brown", ["the_quick", "quick", "brown"]),
    ("s n s", ["s_n", "n_s"]),
    ("the fox of", ["the_fox", "fox_of"]),
    ("s s n", ["s_s", "s_n"]),
    ("of the fox", ["of_the", "the_fox"]),
    ("s s s", ["s_s", "s_s"]),
    ("of the of", ["of_the", "the_of"]),
])
def test_query_mode_reference_vectors(inp, toks):
    assert _common_grams(inp.split(), COMMON, query=True) == toks


def test_reset_stream_order():
    # testReset: "How the s a brown ..." begins How, How_the, the, the_s
    out = _common_grams("How the s a brown s cow d like A B thing?".split(),
                        COMMON, query=False)
    assert out[:4] == ["How", "How_the", "the", "the_s"]
    q = _common_grams("How the s a brown s cow d like A B thing?".split(),
                      COMMON, query=True)
    assert q[:2] == ["How_the", "the_s"]


def test_all_paths_agree():
    texts = ["the fox of", "s n s", "of the of", "brown fox", "", "the"]
    ser = pd.Series(texts)
    for an in (IDX, QRY):
        via_pandas = list(tokenize_pandas(ser, an))
        via_scalar = [an.tokenize_one(t) for t in texts]
        via_pos = list(tokenize_pandas_positions(ser, an)[0])
        assert via_pandas == via_scalar == via_pos
        for t in texts:
            st = analyze_stages(t, an)
            assert st[-1][1] == an.tokenize_one(t)


def test_positions_enable_gram_phrases():
    # grams sit at their left member's pre-filter position (index mode)
    t, p, _ = tokenize_pandas_positions(pd.Series(["of the fox"]), IDX)
    assert list(t.iloc[0]) == ["of", "of_the", "the", "the_fox", "fox"]
    assert list(p.iloc[0]) == [0, 0, 1, 1, 2]


def test_fingerprint_covers_common_grams():
    from lucene_spark.analysis.analyzers import (analyzer_fingerprint,
                                                 register_analyzer)

    register_analyzer(Analyzer(name="_cg_fp_a", token_pattern=r"\S+",
                               lowercase=False))
    register_analyzer(Analyzer(name="_cg_fp_b", token_pattern=r"\S+",
                               lowercase=False, common_grams=COMMON))
    register_analyzer(Analyzer(name="_cg_fp_c", token_pattern=r"\S+",
                               lowercase=False, common_grams=COMMON,
                               common_grams_query=True))
    fps = {analyzer_fingerprint(n) for n in ("_cg_fp_a", "_cg_fp_b",
                                             "_cg_fp_c")}
    assert len(fps) == 3     # word set AND query mode both observable


def test_payloads_incompatible_with_common_grams():
    from lucene_spark.analysis.analyzers import tokenize_pandas_positions

    bad = Analyzer(name="_cg_pay", token_pattern=r"\S+", lowercase=False,
                   common_grams=COMMON, payload_delimiter="|")
    with pytest.raises(ValueError):
        tokenize_pandas_positions(pd.Series(["the|1 fox|2"]), bad,
                                  want_payloads=True)
