"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Role analogue: the reference benchmark content sources
(lucene/benchmark/.../byTask/feeds/ — ReutersContentSource, LineDocSource)
and the randomized-corpus philosophy of
test-framework/.../similarities/BaseSimilarityTestCase.java:252.

Properties (seeded; every row is a pure function of (seed, row index)):
- schema (repo, path, commit, lang, content) per BASELINE.json input_hint
- Zipfian vocabulary + repeated license headers → ≥5 hot terms with
  df > 20% of N (hot-term/salting exercise)
- unique per-doc identifiers → ≥30% of terms with df == 1 (singleton path)
- a few docs of length ~1 and a few very long docs (doclen extremes)
- camelCase / snake_case identifiers (code-aware tokenization exercise)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KEYWORDS = [
    "public", "static", "void", "return", "if", "else", "for", "while",
    "class", "import", "new", "try", "catch", "final", "int", "long",
    "string", "float", "double", "null", "true", "false", "def", "self",
]
_LICENSE = (
    "Licensed under the Apache License Version 2 0 see the NOTICE file "
    "distributed with this work for additional information regarding copyright"
)
_IDENT_STEMS = [
    "index", "writer", "reader", "search", "query", "term", "doc", "field",
    "merge", "segment", "token", "filter", "score", "boost", "cache", "store",
]
_LANGS = ["java", "py", "c", "go", "md"]


def make_corpus_rows(ids, seed: int = 42) -> pd.DataFrame:
    """Rows for an arbitrary set of doc indices — every row is a pure
    function of (seed, i), so generation distributes trivially
    (spark.range(n) → mapInPandas over id batches)."""
    zipf_vocab = [f"zw{i}" for i in range(2000)]
    zipf_p = 1.0 / np.arange(1, len(zipf_vocab) + 1) ** 1.1
    zipf_p /= zipf_p.sum()

    rows = []
    for i in ids:
        i = int(i)
        r = np.random.default_rng(seed * 1_000_003 + i)  # per-row determinism
        repo = f"org/project-{int(r.zipf(1.5)) % 20}"
        path = f"src/main/File{i}.java"
        commit = "".join(r.choice(list("0123456789abcdef"), 40))
        lang = _LANGS[i % len(_LANGS)]
        if i % 97 == 0:
            length = 1                      # doclen extreme: tiny
        elif i % 101 == 0:
            length = int(r.integers(5000, 12000))  # doclen extreme: huge
        else:
            length = int(r.integers(10, 400))
        parts = []
        if i % 3 != 0:
            parts.append(_LICENSE)          # hot header terms
        n_kw = max(1, length // 4)
        parts.append(" ".join(r.choice(_KEYWORDS, n_kw)))
        n_z = max(1, length // 3)
        parts.append(" ".join(r.choice(zipf_vocab, n_z, p=zipf_p)))
        stem1, stem2 = r.choice(_IDENT_STEMS, 2)
        parts.append(f"{stem1}{stem2.capitalize()}Impl {stem1}_{stem2}_util uid{i}sing")
        n_fill = max(0, length - n_kw - n_z)
        if n_fill:
            parts.append(" ".join(r.choice(_IDENT_STEMS, n_fill)))
        rows.append((repo, path, commit, lang, " ".join(parts)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def make_corpus(n_docs: int, seed: int = 42) -> pd.DataFrame:
    return make_corpus_rows(range(n_docs), seed)


def corpus_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed corpus generation: spark.range → mapInPandas — the
    generator never materializes on the driver."""

    def gen(batches):
        for pdf in batches:
            yield make_corpus_rows(pdf["id"].to_numpy(), seed)

    rng = spark.range(n_docs)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )


def make_query_set() -> list[tuple[int, str, int]]:
    """(query_id, classic-syntax query, k) — shaped like
    /root/reference/lucene/benchmark/conf/query-terms.txt (AND/OR mixes)
    plus the edge cases FIXTURES.md §2 requires."""
    qs = [
        "index",                         # plain term
        "index AND writer",              # 2-term AND (query-terms.txt:1-10 shape)
        "index OR writer",               # 2-term OR
        "(index OR writer) AND merge",   # OR-in-AND
        "index AND writer AND merge",    # 3-term AND
        "license AND uid42sing",         # hot term AND df=1 term (leapfrog order)
        "score boost",                   # bare juxtaposition = OR (default op)
        "nonexistentterm12345",          # absent term → empty
        "index AND nonexistentterm12345",
        "index OR nonexistentterm12345",
        "index AND index",               # duplicate terms
        "license",                       # hot term alone (header, df > 20%)
        "index AND NOT writer",          # negation
        "search -cache",                 # minus negation
        "+query +term",                  # plus operator
        "licensed apache version",       # multi-OR over header terms (ties)
        "writer^2 OR reader",            # boost
        "index*",                        # prefix
        "quer?",                         # wildcard
        "term~1",                        # fuzzy
        "[index TO merge]",              # term range
        "index_writer",                  # snake_case → split by code analyzer
        "indexWriter",                   # camelCase → split
    ]
    out = []
    for i, q in enumerate(qs):
        out.append((i, q, 10))
    out.append((len(out), "index", 1))      # k=1 edge
    out.append((len(out), "index OR writer OR merge", 100))  # k=100 edge
    return out
