"""Solr /analysis/field debugging surface: per-stage token traces
(AnalysisRequestHandlerBase role). Contract: the last stage equals
tokenize_one for EVERY registered analyzer — the trace can't drift."""

import pytest

from lucene_spark.analysis.analyzers import (_REGISTRY,
                                             analyze_stages, get_analyzer)

SAMPLES = [
    "The QuickBrown foxes_Jumped over 3 lazyDogs",
    "der läufer und die häuser liefen schneller",
    "",
    None,
    "one",
]


def test_last_stage_equals_tokenize_one_all_analyzers():
    for name, a in sorted(_REGISTRY.items()):
        if a.payload_delimiter:
            continue  # payload chains trace via positions+payloads path
        for s in SAMPLES:
            stages = analyze_stages(s, a)
            assert stages, (name, s)
            assert stages[-1][1] == a.tokenize_one(s), (name, s)


def test_stage_names_and_order():
    a = get_analyzer("english")  # stopwords + porter stemmer
    stages = analyze_stages("The runner was running quickly", a)
    names = [n for n, _ in stages]
    assert names[0].startswith("pattern_tokenizer")
    assert "stop+length_filter" in names
    assert any(n.startswith("stemmer:") for n in names)
    # the stop filter really dropped 'the'
    tok_stage = dict(stages)[names[0]]
    stop_stage = dict(stages)["stop+length_filter"]
    assert "the" in tok_stage and "the" not in stop_stage


def test_code_analyzer_trace():
    a = get_analyzer("code")
    stages = analyze_stages("HTTPServer fooBar_baz", a)
    assert "http" in stages[-1][1] and "server" in stages[-1][1]
