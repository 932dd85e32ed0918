"""OpenNLP chain mechanics — sentence batching, tag-as-type, chunk
labels, lemmatizer dictionary priority with the reference's O/_
sentinels, keyword bypass (opennlp/OpenNLP*Filter.java +
tools/NLPLemmatizerOp.java)."""

from lucene_spark.analysis.opennlp_chain import (NLPToken,
                                                 SeededEnglishModels,
                                                 load_opennlp_models,
                                                 opennlp_chunk,
                                                 opennlp_lemmatize,
                                                 opennlp_pos,
                                                 opennlp_tokenize)

import pytest

M = SeededEnglishModels()


def test_tokenizer_sentences_and_offsets():
    text = "The dog ran. The cat sat."
    toks = opennlp_tokenize(text, M)
    assert [t.text for t in toks] == ["The", "dog", "ran", ".",
                                      "The", "cat", "sat", "."]
    # offsets are absolute, spanning both sentences
    assert toks[4].start == text.index("The", 5)
    assert text[toks[1].start:toks[1].end] == "dog"


def test_pos_types():
    toks = opennlp_pos("The dog chased it quickly.", M)
    assert [(t.text, t.type) for t in toks] == [
        ("The", "DT"), ("dog", "NN"), ("chased", "VBD"),
        ("it", "PRP"), ("quickly", "RB"), (".", ".")]


def test_pos_per_sentence_batching():
    # tags are computed sentence-at-a-time: the capitalized sentence
    # opener is never an NNP (i > 0 rule resets per sentence)
    toks = opennlp_pos("The dog ran. The cat sat.", M)
    assert [t.type for t in toks] == ["DT", "NN", "VB", ".",
                                      "DT", "NN", "VB", "."]


def test_chunker_labels():
    toks = opennlp_chunk("The dog chased the cat.", M)
    assert [(t.text, t.type) for t in toks] == [
        ("The", "B-NP"), ("dog", "I-NP"), ("chased", "B-VP"),
        ("the", "B-NP"), ("cat", "I-NP"), (".", "O")]


def test_lemmatizer_dictionary_first():
    toks = [NLPToken("dogs", "NNS", 0, 4), NLPToken("ran", "VBD", 5, 8)]
    dic = {("dogs", "NNS"): "dog", ("ran", "VBD"): "run"}
    out = opennlp_lemmatize(toks, dic)
    assert [t.text for t in out] == ["dog", "run"]
    assert [t.type for t in out] == ["NNS", "VBD"]


def test_lemmatizer_sentinels_and_fallback():
    class OneLemma(SeededEnglishModels):
        def lemmas(self, tokens, tags):
            return ["run" if t == "running" else "_" for t in tokens]

    toks = [NLPToken("running", "VBG", 0, 7),
            NLPToken("unknownword", "NN", 8, 19)]
    # dictionary misses ("O") -> model; model "_" -> original word
    out = opennlp_lemmatize(toks, {}, OneLemma())
    assert [t.text for t in out] == ["run", "unknownword"]
    # no model either: original word
    out = opennlp_lemmatize(toks, None)
    assert [t.text for t in out] == ["running", "unknownword"]


def test_lemmatizer_keyword_bypass():
    toks = [NLPToken("dogs", "NNS", 0, 4)]
    out = opennlp_lemmatize(toks, {("dogs", "NNS"): "dog"},
                            keywords=frozenset(["dogs"]))
    assert out[0].text == "dogs"


def test_real_model_loading_is_gated():
    with pytest.raises(ImportError, match="OpenNLP"):
        load_opennlp_models("en-pos.bin")
