"""Extract the KStem dictionary data from the reference repo into a
compact npz the runtime loads.

Provenance: /root/reference/lucene/analysis/common/src/java/org/apache/
lucene/analysis/en/KStemmer.java (exceptionWords :75-118,
directConflations :119-161, countryNationality :162-314, supplementDict
:315-333, properNouns :334-590) and KStemData1..8.java (the ~30k-entry
headword list) — DATA of Bob Krovetz's published KStem algorithm
("Viewing morphology as an inference process", SIGIR'93; UMass CIIR
distribution), same adjudicated category as the Snowball Among tables /
RSLP rules / stempel table this repo already extracts by script.
Rerun: python scripts/gen_kstem_data.py
"""

from __future__ import annotations

import os
import re

import numpy as np

REF = "/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/en"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lucene_spark", "analysis", "data", "kstem.npz")

_STR = re.compile(r'"([^"]*)"')


def _java_block(src: str, name: str) -> str:
    """The initializer text of `name` = {...};"""
    start = src.index(name)
    open_b = src.index("{", start)
    depth, i = 0, open_b
    while True:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                return src[open_b:i + 1]
        i += 1


def _strings(block: str) -> list[str]:
    return _STR.findall(block)


def _pairs(block: str) -> list[tuple[str, str]]:
    ss = _STR.findall(block)
    assert len(ss) % 2 == 0
    return list(zip(ss[0::2], ss[1::2]))


def main() -> None:
    with open(os.path.join(REF, "KStemmer.java"), encoding="utf-8") as f:
        src = f.read()
    exception_words = _strings(_java_block(src, "exceptionWords"))
    direct = _pairs(_java_block(src, "directConflations"))
    country = _pairs(_java_block(src, "countryNationality"))
    supplement = _strings(_java_block(src, "supplementDict"))
    proper = _strings(_java_block(src, "properNouns"))

    headwords: list[str] = []
    for n in range(1, 9):
        with open(os.path.join(REF, f"KStemData{n}.java"),
                  encoding="utf-8") as f:
            headwords.extend(_strings(_java_block(f.read(), "data")))

    np.savez_compressed(
        OUT,
        exception_words=np.array(exception_words),
        direct_from=np.array([a for a, _ in direct]),
        direct_to=np.array([b for _, b in direct]),
        country_from=np.array([a for a, _ in country]),
        country_to=np.array([b for _, b in country]),
        supplement=np.array(supplement),
        proper=np.array(proper),
        headwords=np.array(headwords))
    print(f"wrote {OUT}: {len(exception_words)} exceptions, "
          f"{len(direct)} direct, {len(country)} country, "
          f"{len(supplement)} supplement, {len(proper)} proper, "
          f"{len(headwords)} headwords")


if __name__ == "__main__":
    main()
