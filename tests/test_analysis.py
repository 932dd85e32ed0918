import pandas as pd

from lucene_spark.analysis import ENGLISH_STOP_WORDS, get_analyzer
from lucene_spark.oracle import oracle_tokenize


def toks(name, text):
    return list(get_analyzer(name).tokenize_series(pd.Series([text])).iloc[0])


def test_standard_basic():
    # StandardAnalyzer chain: tokenize → lowercase → stop
    assert toks("standard", "The Quick Brown fox") == ["quick", "brown", "fox"]


def test_standard_stopwords_full_set():
    assert len(ENGLISH_STOP_WORDS) == 33  # EnglishAnalyzer.java:43-52
    assert toks("standard", "the of and is it") == []


def test_standard_keeps_snake_whole():
    # UAX#29 ExtendNumLet: underscore joins words in StandardTokenizer
    assert toks("standard", "snake_case_name") == ["snake_case_name"]


def test_code_splits_camel_and_snake():
    assert toks("code", "getIndexWriter") == ["get", "index", "writer"]
    assert toks("code", "snake_case_name") == ["snake", "case", "name"]
    assert toks("code", "HTTPServer") == ["http", "server"]
    assert toks("code", "parseHTTPResponse2x") == ["parse", "http", "response2x"]


def test_max_token_length_drop():
    # StandardAnalyzer.java:37 — tokens longer than 255 chars are dropped
    long_tok = "x" * 256
    keep_tok = "y" * 255
    assert toks("standard", f"hello {long_tok} {keep_tok}") == ["hello", keep_tok]


def test_digits_and_empty():
    assert toks("code", "abc123 42") == ["abc123", "42"]
    assert toks("code", "") == []
    assert toks("code", "+++///") == []


def test_oracle_tokenizer_agrees_with_vectorized():
    cases = [
        "The Quick getIndexWriter snake_case_name HTTPServer 42",
        "Licensed under the Apache License Version 2 0",
        "x" * 256 + " ok",
        "",
        "if (foo_bar) { return baz; } // comment",
    ]
    for c in cases:
        assert oracle_tokenize(c, "code") == toks("code", c), c
        assert oracle_tokenize(c, "standard") == toks("standard", c), c


def test_shingle_filter():
    """ShingleFilter analogue: bigrams alongside unigrams, positioned at
    their first member."""
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("whitespace_shingle2")
    toks = an.tokenize_series(pd.Series(["a b c"]))
    assert list(toks.iloc[0]) == ["a", "b", "c", "a b", "b c"]
    t, p = an.tokenize_with_positions(pd.Series(["a b c"]))
    assert list(t.iloc[0]) == ["a", "b", "c", "a b", "b c"]
    assert list(p.iloc[0]) == [0, 1, 2, 0, 1]
    # short input: no shingles
    assert list(an.tokenize_series(pd.Series(["solo"])).iloc[0]) == ["solo"]


def test_query_time_synonyms(spark, tmp_path_factory):
    """Searcher-level synonym map: plain term query scores as SynonymQuery
    (tf summed, df=max) — identical to an explicit SynonymNode."""
    import numpy as np

    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.search import IndexSearcher
    from lucene_spark.search import plan as P

    idx = str(tmp_path_factory.mktemp("syn")) + "/idx"
    src = spark.createDataFrame(make_corpus(80, seed=5))
    IndexBuilder(spark, IndexConfig(partitions=2, num_buckets=4)).build(
        src, idx, overwrite=True)
    r = IndexReader(spark, idx)
    s_syn = IndexSearcher(r, synonyms={"index": ("index", "writer")})
    s_plain = IndexSearcher(r)
    got = {x["doc_id"]: np.float32(x["score"])
           for x in s_syn.matches("index").collect()}
    want = {x["doc_id"]: np.float32(x["score"])
            for x in s_plain.matches(
                P.SynonymNode(terms=("index", "writer"))).collect()}
    assert got == want and got


def test_language_analyzers():
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    de = get_analyzer("german")
    out = list(de.tokenize_series(pd.Series(["Der Hund und die Katzen"])).iloc[0])
    assert out == ["hund", "katz"]  # stops dropped, light-stemmed
    fr = get_analyzer("french")
    out = list(fr.tokenize_series(pd.Series(["le chat est sur les tables"])).iloc[0])
    assert out == ["chat", "tabl"]  # "sur" is in the French stop set
    es = get_analyzer("spanish")
    out = list(es.tokenize_series(pd.Series(["el perro y los gatos"])).iloc[0])
    assert out == ["perr", "gat"]
    # plural and singular conflate to the same term on every chain
    # (pairs long enough for each reference stemmer's length floor —
    # SpanishLightStemmer skips <5 chars, ItalianLightStemmer <6)
    for name, sing, plur in [("german", "Hund", "Hunde"),
                             ("french", "table", "tables"),
                             ("spanish", "perro", "perros"),
                             ("italian", "ragazzo", "ragazzi"),
                             ("portuguese", "livro", "livros"),
                             ("dutch", "boek", "boeken"),
                             ("swedish", "bil", "bilar"),
                             # Snowball (the reference default) strips final -л from журнал
                             # as a verb ending, so use a noun pair that
                             # conflates under RussianStemmer.java
                             ("russian", "книга", "книгами"),
                             ("finnish", "kirjat", "kirjassa"),
                             ("hungarian", "házak", "házban"),
                             ("norwegian", "bilen", "bilene")]:
        a = get_analyzer(name)
        s = list(a.tokenize_series(pd.Series([sing])).iloc[0])
        p = list(a.tokenize_series(pd.Series([plur])).iloc[0])
        assert s == p, (name, s, p)


def test_url_email_analyzer():
    """UAX29URLEmailTokenizer role: URLs/emails survive as single tokens."""
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("url_email")
    toks = list(an.tokenize_series(pd.Series(
        ["Visit https://Example.com/a?b=1 or mail Bob.smith+x@Example.COM now!"]
    )).iloc[0])
    # the UAX29URLEmailAnalyzer chain: scanner → lowercase → English
    # stops ('or' is a stop word and drops; URLs/emails survive whole)
    assert toks == ["visit", "https://example.com/a?b=1", "mail",
                    "bob.smith+x@example.com", "now"]
    raw = get_analyzer("url_email_raw")
    assert raw.tokenize_one("A:B_A:B or O'Reilly") == \
        ["A:B_A:B", "or", "O'Reilly"]


def test_decontaminate_op(spark):
    """contaminated_docs flags exactly the docs sharing an n-gram with the
    benchmark; decontaminate() removes them."""
    from lucene_spark.pipeline.decontaminate import (
        contaminated_docs,
        decontaminate,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "a completely different sentence with no overlap at all"),
        (3, "xx yy quick brown fox jumps over zz ww qq rr"),
        (4, "short doc"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "did you see the quick brown fox jumps over things")],
        "doc_id long, text string")
    got = {(r["key"], r["hits"]) for r in
           contaminated_docs(corpus, bench, "text", "doc_id", n=5).collect()}
    # doc 1 shares 'the quick brown fox jumps' + 'quick brown fox jumps over'
    # doc 3 shares 'quick brown fox jumps over'; docs 2/4 clean
    assert got == {(1, 2), (3, 1)}
    kept = {r["doc_id"] for r in
            decontaminate(corpus, bench, "text", "doc_id", n=5).collect()}
    assert kept == {2, 4}


def test_phonetic_encoders():
    """Soundex against the classic published vectors (the commons-codec
    SoundexTest set Lucene's PhoneticFilter delegates to), RefinedSoundex
    against the commons-codec mapping, ASCII folding basics."""
    from lucene_spark.analysis.phonetic import (
        ascii_fold,
        refined_soundex,
        soundex,
    )

    vectors = {"robert": "R163", "rupert": "R163", "ashcraft": "A261",
               "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
               "honeyman": "H555", "washington": "W252", "lee": "L000",
               "gutierrez": "G362", "jackson": "J250", "rubin": "R150"}
    for w, code in vectors.items():
        assert soundex(w) == code, (w, soundex(w), code)
    assert refined_soundex("testing") == "T6036084"   # commons-codec doc example
    assert refined_soundex("quick") == "Q503"
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("Łódź") == "Lodz"

    # analyzer chains: phonetic terms conflate homophones; folded chain
    # matches accented and plain spellings
    an = get_analyzer("phonetic_soundex")
    a = list(an.tokenize_series(pd.Series(["Robert called"])).iloc[0])
    b = list(an.tokenize_series(pd.Series(["Rupert called"])).iloc[0])
    assert a == b == ["R163", "C430"]
    fa = get_analyzer("standard_folded")
    assert list(fa.tokenize_series(pd.Series(["résumé café"])).iloc[0]) == \
        ["resume", "cafe"]


def test_icu_folding():
    """Every vector from the reference's TestICUFoldingFilter.java:49-87
    (UTR#30: casefold + accent removal + normalization + default
    ignorables + native digits + ascii-folding-type Latin cases)."""
    from lucene_spark.analysis.phonetic import icu_fold, nfkc_cf

    vectors = [
        ("This", "this"), ("Ruß", "russ"),
        ("ΜΆΪΟΣ", "μαιοσ"), ("Μάϊος", "μαιοσ"),
        ("𐐖", "𐐾"), ("ﴳﴺﰧ", "طمطمطم"),
        ("क्‍ष", "कष"), ("résumé", "resume"),
        ("résumé", "resume"), ("৭০৬", "706"),
        ("đis", "dis"), ("cræzy", "craezy"),
        ("ELİF", "elif"), ("eli̇f", "elif"), ("", ""),
    ]
    for inp, expect in vectors:
        assert icu_fold(inp) == expect, (inp, icu_fold(inp), expect)
    # nfkc_cf keeps accents (TestICUNormalizer2Filter default mode)
    assert nfkc_cf("Ruß") == "russ"
    assert nfkc_cf("résumé") == "résumé"

    import pandas as pd

    from lucene_spark.analysis import get_analyzer
    an = get_analyzer("icu")
    toks = list(an.tokenize_series(pd.Series(["đis is cræzy ৭০৬"])).iloc[0])
    assert toks == ["dis", "is", "craezy", "706"]


def test_tokenize_one_matches_series_every_analyzer():
    """tokenize_one (the scalar fast path used by query parsing) must be
    output-identical to tokenize_series for EVERY registered analyzer on
    a corpus of adversarial inputs — the two chains may never drift."""
    import pandas as pd

    from lucene_spark.analysis.analyzers import _REGISTRY

    samples = [
        None, "", "   ", "hello world", "HelloWorld HTTPServer fooBar2x",
        "the and of a an IS THE", "x" * 300 + " ok",
        "index AND writer OR merge", "café naïve åäö ÀLA über",
        "foo_bar baz-qux a.b.c", "привет мир", "日本語のテキスト処理",
        "tok|1.5 other|x bare", "a b c d e f g h",
        "Mixed CASE With  multiple   spaces\tand\ttabs\nnewlines",
        "ελληνικά κείμενο", "han hadde ikke noe å si",
    ]
    for name, a in sorted(_REGISTRY.items()):
        series_out = list(a.tokenize_series(pd.Series(samples, dtype=object)))
        scalar_out = [a.tokenize_one(s) for s in samples]
        assert scalar_out == series_out, (
            f"analyzer {name!r}: scalar/series drift")


def test_line_dedup_op(spark):
    """C4-style boilerplate removal: a line in ≥2 distinct docs drops
    from every doc; unique lines survive in original order; docs with
    zero surviving lines disappear."""
    from lucene_spark.pipeline.dedup import line_dedup

    rows = [
        (1, "alpha one\nCOOKIE BANNER\nbeta two"),
        (2, "gamma three\nCOOKIE BANNER\ndelta four"),
        (3, "COOKIE BANNER"),
        (4, "unique line\nanother unique"),
    ]
    df = spark.createDataFrame(rows, "k long, t string")
    got = {r["k"]: r["text_clean"]
           for r in line_dedup(df, "t", "k", min_docs=2).collect()}
    assert got == {1: "alpha one\nbeta two",
                   2: "gamma three\ndelta four",
                   4: "unique line\nanother unique"}
    # min_line_len exempts short lines from the boilerplate count
    rows2 = [(1, "x\nlong shared line"), (2, "x\nlong shared line")]
    df2 = spark.createDataFrame(rows2, "k long, t string")
    got2 = {r["k"]: r["text_clean"]
            for r in line_dedup(df2, "t", "k", min_docs=2,
                                min_line_len=5).collect()}
    assert got2 == {1: "x", 2: "x"}


def test_pii_redaction(spark):
    from lucene_spark.pipeline.textstats import pii_counts, redact_pii
    from pyspark.sql import functions as F

    rows = [(1, "mail a.b+c@ex-ample.org and 192.168.0.1 then +1 (555) 123-4567 end"),
            (2, "no pii here")]
    df = spark.createDataFrame(rows, "k long, t string")
    red = {r["k"]: r["red"] for r in
           df.select("k", redact_pii(F.col("t")).alias("red")).collect()}
    assert red[1] == "mail <EMAIL> and <IP> then <PHONE> end"
    assert red[2] == "no pii here"
    cnt = {r["k"]: (r["n_email"], r["n_ipv4"], r["n_phone"])
           for r in pii_counts(df, "t", "k").collect()}
    assert cnt == {1: (1, 1, 1), 2: (0, 0, 0)}


def test_chunk_tokens_op(spark):
    """Fixed token windows with overlap: starts every size−overlap
    tokens, last window short, single-window docs and the empty-ish
    edge covered; contract error on bad overlap."""
    import pytest as _pt
    from lucene_spark.pipeline.textstats import chunk_tokens

    toks = " ".join(str(i) for i in range(10))      # 10 tokens
    df = spark.createDataFrame([(1, toks), (2, "a b")], "k long, t string")
    got = {(r["k"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
           for r in chunk_tokens(df, "t", "k", size=4, overlap=1).collect()}
    # stride 3 → starts 0,3,6,9
    assert got[(1, 0)] == ("0 1 2 3", 4)
    assert got[(1, 1)] == ("3 4 5 6", 4)
    assert got[(1, 2)] == ("6 7 8 9", 4)
    assert got[(1, 3)] == ("9", 1)
    assert got[(2, 0)] == ("a b", 2)
    assert len(got) == 5
    with _pt.raises(ValueError, match="overlap"):
        chunk_tokens(df, "t", "k", size=4, overlap=4)
