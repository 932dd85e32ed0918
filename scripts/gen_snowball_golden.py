"""Generate golden (word, stem) fixtures for the 6 Snowball languages
that have NO voc.zip in the reference test data (Armenian, Basque,
Catalan, Lithuanian, Estonian, French).

The reference's own machine-generated stemmers
(org/tartarus/snowball/ext/<Lang>Stemmer.java) are compiled with javac
into /tmp/snowjava and run over a DETERMINISTIC synthetic word list
(seeded RNG; stems x every suffix from the language's Among tables,
double-suffix combos to exercise repeat loops, plus random
syllable-structured words). Output: tests/data/snowball_<lang>.tsv.

Run:  python scripts/gen_snowball_golden.py
Requires: javac/java (JDK 17 in the container), the reference checkout.
"""
from __future__ import annotations

import random
import subprocess
import zlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from lucene_spark.analysis import snowball_tables as T  # noqa: E402

JAVA_DIR = "/tmp/snowjava"
OUT_DIR = Path(__file__).resolve().parents[1] / "tests" / "data"

LANGS = {
    "armenian": ("Armenian", T.HY_VOWELS,
                 [T.HY_ADJ, T.HY_VERB, T.HY_NOUN, T.HY_ENDING]),
    "basque": ("Basque", T.EU_VOWELS,
               [T.EU_ADITZAK, T.EU_IZENAK, T.EU_ADJ]),
    "catalan": ("Catalan", T.CA_VOWELS,
                [T.CA_PRONOUN, T.CA_STANDARD, T.CA_VERB, T.CA_RESIDUAL]),
    "lithuanian": ("Lithuanian", T.LT_VOWELS,
                   [T.LT_STEP1, T.LT_STEP2, T.LT_CONFLICTS, T.LT_CHDZ,
                    T.LT_GD]),
    "estonian": ("Estonian", T.ET_V1,
                 [T.ET_EMPHASIS, T.ET_VERB, T.ET_LONGV, T.ET_IPLURAL,
                  T.ET_SPECIAL_NOUN, T.ET_CASE, T.ET_PLURAL3, T.ET_NU,
                  T.ET_DEGREES, T.ET_VERB_EXC]),
    # French has no voc.zip in the reference test data either
    "french": ("French", T.FR_VOWELS,
               [T.FR_A2, T.FR_A3, T.FR_A4, T.FR_A5, T.FR_A6, T.FR_A7,
                T.FR_A8]),
}


def build_words(vowels, tables, seed):
    rng = random.Random(seed)
    sufs = [s for tab in tables for s, _ in tab]
    alphabet = sorted({c for s in sufs for c in s} | set(vowels))
    vow = sorted(set(vowels) & set(alphabet))
    cons = sorted(set(alphabet) - set(vowels)) or vow

    def syllables(n):
        w = []
        for _ in range(n):
            w.append(rng.choice(cons))
            w.append(rng.choice(vow))
            if rng.random() < 0.3:
                w.append(rng.choice(cons))
        return "".join(w)

    words = set(sufs)
    for s in sufs:
        for _ in range(8):
            words.add(syllables(rng.randint(1, 4)) + s)
    # double-suffix combos: repeat loops / multi-step interactions
    for _ in range(4000):
        words.add(syllables(rng.randint(1, 3)) + rng.choice(sufs)
                  + rng.choice(sufs))
    for _ in range(3000):
        words.add(syllables(rng.randint(1, 5)))
    return sorted(words)


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for lang, (cls, vowels, tables) in LANGS.items():
        words = build_words(vowels, tables, seed=zlib.crc32(lang.encode()))
        proc = subprocess.run(
            ["java", "StemMain", cls], cwd=JAVA_DIR,
            input="\n".join(words), capture_output=True, text=True,
            check=True)
        out = OUT_DIR / f"snowball_{lang}.tsv"
        out.write_text(proc.stdout, encoding="utf-8")
        print(lang, len(words), "->", out)


if __name__ == "__main__":
    main()
