"""OpenNLP analysis chain — the lucene/analysis/opennlp role
(OpenNLPTokenizer + OpenNLPPOSFilter + OpenNLPChunkerFilter +
OpenNLPLemmatizerFilter + the tools/NLP*Op wrappers).

The reference wires trained OpenNLP (Java MaxEnt) models behind small
Op interfaces: sentence detection feeds a per-sentence tokenizer
(OpenNLPTokenizer.java), the POS filter buffers one sentence and
writes tags into the token TYPE attribute (OpenNLPPOSFilter.java:
50-75), the chunker converts token+tag sentences to chunk labels
(OpenNLPChunkerFilter.java), and the lemmatizer tries a
``word[tab]lemma[tab]tag`` dictionary first with the "O" not-found
sentinel falling back to the model, then the original word
(tools/NLPLemmatizerOp.java:47-76). Keyword-marked tokens bypass
lemmatization (OpenNLPLemmatizerFilter).

The trained binary models are Java-runtime artifacts this environment
cannot execute, so the model boundary is an injectable protocol
(``NLPModels``) with a deterministic seeded rule-based English
implementation (``seeded_models``) standing in — the same
stub-with-real-plumbing pattern as the multimodal decode path. The
chain mechanics (sentence batching, tag-as-type, dictionary priority,
sentinel handling, keyword bypass) are the reference's and are what
tests/test_opennlp_chain.py pins.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class NLPToken:
    text: str
    type: str           # POS tag (TypeAttribute role), then chunk label
    start: int
    end: int


class NLPModels:
    """Injectable model protocol (the NLP*Op seam)."""

    def detect_sentences(self, text: str) -> list[tuple[int, int]]:
        raise NotImplementedError

    def tokenize(self, sentence: str) -> list[tuple[int, int]]:
        raise NotImplementedError

    def pos_tags(self, tokens: list[str]) -> list[str]:
        raise NotImplementedError

    def chunks(self, tokens: list[str], tags: list[str]) -> list[str]:
        raise NotImplementedError

    def lemmas(self, tokens: list[str], tags: list[str]) -> list[str]:
        """MaxEnt lemmatizer role; "_" = no lemma found."""
        return ["_"] * len(tokens)


class SeededEnglishModels(NLPModels):
    """Deterministic rule-based stand-in for the trained models."""

    _NOUNS = frozenset("time year people way day man thing woman life "
                       "child world school state family student group "
                       "country problem hand part place case week point "
                       "government company number fact sentence test "
                       "dog cat index query document".split())
    _DETS = frozenset("the a an this that these those".split())
    _PREPS = frozenset("in on at by for with from to of".split())
    _CONJS = frozenset("and or but".split())
    _PRONOUNS = frozenset("he she it they we i you".split())

    def detect_sentences(self, text):
        out, start = [], 0
        for m in re.finditer(r"[.!?]+(?:\s+|$)", text):
            out.append((start, m.end()))
            start = m.end()
        if start < len(text):
            out.append((start, len(text)))
        return out

    def tokenize(self, sentence):
        return [(m.start(), m.end())
                for m in re.finditer(r"[A-Za-z0-9']+|[.,!?;]", sentence)]

    def pos_tags(self, tokens):
        tags = []
        for i, t in enumerate(tokens):
            low = t.lower()
            if low in self._DETS:
                tags.append("DT")
            elif low in self._PREPS:
                tags.append("IN")
            elif low in self._CONJS:
                tags.append("CC")
            elif low in self._PRONOUNS:
                tags.append("PRP")
            elif t in ".,!?;":
                tags.append(".")
            elif low.endswith("ing"):
                tags.append("VBG")
            elif low.endswith("ed"):
                tags.append("VBD")
            elif low.endswith("ly"):
                tags.append("RB")
            elif low[:1].isdigit():
                tags.append("CD")
            elif low.endswith("s") and low[:-1] in self._NOUNS:
                tags.append("NNS")
            elif low in self._NOUNS:
                tags.append("NN")
            elif t[:1].isupper() and i > 0:
                tags.append("NNP")
            else:
                tags.append("VB" if i > 0 and tags[i - 1] in
                            ("PRP", "NN", "NNS", "NNP") else "NN")
        return tags

    def chunks(self, tokens, tags):
        out, prev = [], "O"
        for tag in tags:
            if tag in ("DT", "JJ", "NN", "NNS", "NNP", "PRP", "CD"):
                out.append("B-NP" if prev not in ("B-NP", "I-NP")
                           else "I-NP")
            elif tag.startswith("VB"):
                out.append("B-VP" if prev not in ("B-VP", "I-VP")
                           else "I-VP")
            elif tag == "IN":
                out.append("B-PP")
            else:
                out.append("O")
            prev = out[-1]
        return out


def load_opennlp_models(*_args, **_kwargs):
    """Loading real OpenNLP .bin models requires the (Java) OpenNLP
    runtime, which this environment does not provide; supply any
    NLPModels implementation instead."""
    raise ImportError(
        "OpenNLP MaxEnt models are Java artifacts; provide an "
        "NLPModels implementation (see SeededEnglishModels)")


def opennlp_tokenize(text: str, models: NLPModels) -> list[NLPToken]:
    """OpenNLPTokenizer: sentence detection, then per-sentence model
    tokenization; tokens carry absolute offsets."""
    out = []
    for s_start, s_end in models.detect_sentences(text):
        sentence = text[s_start:s_end]
        for t_start, t_end in models.tokenize(sentence):
            out.append(NLPToken(sentence[t_start:t_end], "word",
                                s_start + t_start, s_start + t_end))
    return out


def opennlp_pos(text: str, models: NLPModels) -> list[NLPToken]:
    """OpenNLPPOSFilter: one sentence buffered at a time, tags written
    to the token type."""
    out = []
    for s_start, s_end in models.detect_sentences(text):
        sentence = text[s_start:s_end]
        spans = models.tokenize(sentence)
        words = [sentence[a:b] for a, b in spans]
        tags = models.pos_tags(words)
        for (a, b), w, tag in zip(spans, words, tags):
            out.append(NLPToken(w, tag, s_start + a, s_start + b))
    return out


def opennlp_chunk(text: str, models: NLPModels) -> list[NLPToken]:
    """OpenNLPChunkerFilter: chunk labels replace the POS types."""
    out = []
    for s_start, s_end in models.detect_sentences(text):
        sentence = text[s_start:s_end]
        spans = models.tokenize(sentence)
        words = [sentence[a:b] for a, b in spans]
        tags = models.pos_tags(words)
        labels = models.chunks(words, tags)
        for (a, b), w, lab in zip(spans, words, labels):
            out.append(NLPToken(w, lab, s_start + a, s_start + b))
    return out


def opennlp_lemmatize(tokens: list[NLPToken],
                      dictionary: dict[tuple[str, str], str] | None,
                      models: NLPModels | None = None,
                      keywords: frozenset = frozenset()) -> list[NLPToken]:
    """OpenNLPLemmatizerFilter + NLPLemmatizerOp: dictionary first
    ((word, tag) key; "O" sentinel = absent), model fallback with the
    "_" sentinel, else the original word; keyword tokens bypass."""
    words = [t.text for t in tokens]
    tags = [t.type for t in tokens]
    max_ent = None
    out = []
    for i, tok in enumerate(tokens):
        if tok.text in keywords:
            out.append(tok)
            continue
        lemma = "O"
        if dictionary is not None:
            lemma = dictionary.get((tok.text, tok.type), "O")
        if lemma == "O":
            if models is not None:
                if max_ent is None:
                    max_ent = models.lemmas(words, tags)
                lemma = max_ent[i]
                if lemma == "_":
                    lemma = tok.text
            else:
                lemma = tok.text
        out.append(NLPToken(lemma, tok.type, tok.start, tok.end))
    return out
