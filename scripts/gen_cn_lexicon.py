"""Generate the seeded large Chinese model (VERDICT r4 item 4).

The reference's trained coredict/bigramdict .mem binaries are not in
its checkout (analysis/smartcn/src/resources/.../hhmm/ holds only the
directory marker), so this generates a DETERMINISTIC ~12k-word unigram
model + ~30k bigram pairs with smartcn-like structure: 2-char words as
the bulk (Zipf frequencies), 3/4-char words including AMBIGUOUS
overlaps (for every seeded 3-char word ABC, both AB and BC 2-char words
exist, so the segmenter must use bigram evidence — the 研究生命 shape
the demo model pins), single-char fallbacks for every used hanzi, and
bigram counts concentrated on sentence-plausible pairs.

Writes lucene_spark/analysis/data/cn_model.npz. Same seed → same file.
"""

from __future__ import annotations

import os
import random

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "lucene_spark", "analysis", "data",
                   "cn_model.npz")
SEED = 44

HANZI = (
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得"
    "就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日"
    "于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同"
    "三已老从动两长知民样现分将外但身些与高意进把法此实回二理美点月"
    "明其种声全工己话儿者向情部正名定女问力机给等几很业最间新什打便"
    "位因重被走电四第门相次东政海口使教西再平真听世气信北少关并内加"
    "化由却代军产入先山五太水万市眼体别处总才场师书比住员九笑性通目"
    "华报立马命张活难神数件安表原车白应路期叫死常提感金何更反题建度"
)


def main() -> None:
    rng = random.Random(SEED)
    words: dict[str, int] = {}

    def zipf(lo, hi, rank_max=8000):
        r = rng.randint(1, rank_max)
        return max(lo, min(hi, int(hi / r)))

    two: list[str] = []
    while len(two) < 8000:
        w = rng.choice(HANZI) + rng.choice(HANZI)
        if w not in words:
            words[w] = zipf(50, 200000)
            two.append(w)
    # ambiguous 3-char words: ABC where AB and BC both exist
    three = 0
    while three < 2000:
        ab = rng.choice(two)
        c = rng.choice(HANZI)
        bc = ab[1] + c
        w = ab + c
        if w in words:
            continue
        if bc not in words:
            words[bc] = zipf(50, 150000)
            two.append(bc)
        words[w] = zipf(30, 80000)
        three += 1
    # 4-char words (idiom shape)
    four = 0
    while four < 1200:
        w = rng.choice(two) + rng.choice(two)
        if len(w) == 4 and w not in words:
            words[w] = zipf(20, 40000)
            four += 1
    # single-char fallback for every used hanzi (the coredict always
    # carries single chars so the graph stays connected)
    for ch in HANZI:
        if ch not in words:
            words[ch] = zipf(10, 30000)

    # bigrams: plausible pair chains over frequent words + START/END
    START, END = "始##始", "末##末"
    STRING, NUMBER = "未##串", "未##数"
    words[START] = words[END] = 100000
    words[STRING] = words[NUMBER] = 1000
    freq_sorted = sorted((w for w in two), key=lambda w: -words[w])
    top = freq_sorted[:2500]
    bigrams: dict[tuple[str, str], int] = {}
    for _ in range(26000):
        a, b = rng.choice(top), rng.choice(top)
        bigrams[(a, b)] = bigrams.get((a, b), 0) + rng.randint(50, 3000)
    for _ in range(2000):
        w = rng.choice(top)
        bigrams[(START, w)] = bigrams.get((START, w), 0) + rng.randint(100, 4000)
        w2 = rng.choice(top)
        bigrams[(w2, END)] = bigrams.get((w2, END), 0) + rng.randint(100, 4000)

    surfaces = np.array(list(words), dtype=object)
    freqs = np.array([words[w] for w in surfaces], dtype=np.int64)
    b_l = np.array([a for a, _ in bigrams], dtype=object)
    b_r = np.array([b for _, b in bigrams], dtype=object)
    b_f = np.array(list(bigrams.values()), dtype=np.int64)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, surfaces=surfaces, freqs=freqs,
                        bigram_l=b_l, bigram_r=b_r, bigram_f=b_f)
    print(f"wrote {OUT}: {len(words)} words, {len(bigrams)} bigrams")


if __name__ == "__main__":
    main()
