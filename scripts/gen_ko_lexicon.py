"""Generate the seeded large Korean lexicon (VERDICT r4 item 4).

The reference bundles compiled mecab-ko-dic fragments without the word
buffer (analysis/nori/src/resources/.../ko/dict/ lacks $buffer.dat), so
extraction is impossible — this generates a DETERMINISTIC ~8k-entry
lexicon with mecab-ko-dic-like structure: NNG nouns over a composed
syllable pool, NNP proper nouns, 4-syllable COMPOUND entries whose two
NNG halves exist (decompound coverage for all three modes), the josa
(J) and ending (E) function sets the POS stop filter drops, VV verbs,
MAG adverbs, and a structured connection matrix.

Writes lucene_spark/analysis/data/ko_lexicon.npz. Same seed → same file.
"""

from __future__ import annotations

import os
import random

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "lucene_spark", "analysis", "data",
                   "ko_lexicon.npz")
SEED = 43

# composed syllable pool: common initials x vowels (no final) plus a few
# finals — deterministic Unicode composition, no external data
_INITIALS = [0, 2, 3, 5, 6, 7, 9, 11, 12, 14, 15, 16, 17, 18]   # ㄱㄴㄷㄹㅁㅂㅅㅇㅈㅊㅋㅌㅍㅎ
_VOWELS = [0, 4, 8, 13, 17, 18, 20]                              # ㅏㅓㅗㅜㅡㅣ…
_FINALS = [0, 1, 4, 8, 16, 21]                                   # none ㄱ ㄴ ㄹ ㅁ ㅇ


def _syllables():
    out = []
    for i in _INITIALS:
        for v in _VOWELS:
            for f in _FINALS:
                out.append(chr(0xAC00 + (i * 21 + v) * 28 + f))
    return out

N_NNG, N_NNP, N_NUM = 10, 11, 14
V_VV, V_VA = 30, 31
MAG = 40
J_ID, E_ID = 60, 61


def main() -> None:
    rng = random.Random(SEED)
    syl = _syllables()
    entries: list[tuple] = []   # (surface, lid, rid, cost, pos, pos_type, morphemes)
    seen: set[str] = set()

    def add(surface, lid, rid, cost, pos, pos_type="MORPHEME",
            morphemes=()):
        if surface in seen:
            return False
        seen.add(surface)
        entries.append((surface, lid, rid, cost, pos, pos_type,
                        morphemes))
        return True

    two = []
    while len(two) < 4500:
        w = rng.choice(syl) + rng.choice(syl)
        if add(w, N_NNG, N_NNG, rng.randint(2500, 4500), "NNG"):
            two.append(w)
    while sum(1 for e in entries if len(e[0]) == 3 and e[4] == "NNG") < 1200:
        w = rng.choice(two) + rng.choice(syl)
        add(w, N_NNG, N_NNG, rng.randint(3000, 5000), "NNG")
    comp = 0
    while comp < 800:
        a, b = rng.choice(two), rng.choice(two)
        w = a + b
        if add(w, N_NNG, N_NNG, rng.randint(3600, 5200), "NNG",
               "COMPOUND", (("NNG", a), ("NNG", b))):
            comp += 1
    nnp = 0
    while nnp < 500:
        w = rng.choice(syl) + rng.choice(syl) + rng.choice(syl)
        if add(w, N_NNP, N_NNP, rng.randint(2800, 4200), "NNP"):
            nnp += 1
    for surf in ["는", "은", "이", "가", "을", "를", "에", "에서",
                 "의", "와", "과", "도", "로", "으로", "부터", "까지",
                 "만", "조차", "마저"]:
        add(surf, J_ID, J_ID, rng.randint(400, 900), "J")
    for surf in ["다", "요", "며", "고", "지만", "어서", "으니까",
                 "습니다", "ㅂ니다", "었다", "았다", "겠다"]:
        add(surf, E_ID, E_ID, rng.randint(500, 1100), "E")
    for surf in ["하", "보", "가", "오", "먹", "마시", "읽", "쓰",
                 "듣", "말하", "만들", "배우", "가르치", "일하"]:
        add(surf, V_VV, V_VV, rng.randint(3800, 5200), "VV")
    for surf in ["크", "작", "높", "낮", "좋", "나쁘", "빠르", "느리"]:
        add(surf, V_VA, V_VA, rng.randint(3800, 5200), "VA")
    for surf in ["매우", "아주", "조금", "빨리", "천천히", "자주"]:
        add(surf, MAG, MAG, rng.randint(3000, 4200), "MAG")
    for surf in "일이삼사오육칠팔구십백천만":
        add(surf, N_NUM, N_NUM, rng.randint(2600, 3200), "NNG")

    ids = [N_NNG, N_NNP, N_NUM, V_VV, V_VA, MAG, J_ID, E_ID]
    nouns = (N_NNG, N_NNP, N_NUM)
    conn: dict[tuple[int, int], int] = {}
    for r in ids + [0]:
        for l in ids + [0]:
            if r == 0 and l == 0:
                continue
            if r == 0:
                c = 400 if l in nouns else 2200
            elif l == 0:
                c = 500 if r in (J_ID, E_ID) else 1100
            elif r in nouns and l == J_ID:
                c = -1700
            elif r == J_ID and l in nouns:
                c = -1200
            elif r in (V_VV, V_VA) and l == E_ID:
                c = -1900
            elif r == E_ID and l in nouns:
                c = -600
            elif r in nouns and l in nouns:
                c = 2400
            elif r == MAG and l in (V_VV, V_VA):
                c = -900
            elif r == J_ID and l in (V_VV, V_VA):
                c = -700
            else:
                c = 1200
            conn[(r, l)] = c + rng.randint(-100, 100)

    surfaces = np.array([e[0] for e in entries], dtype=object)
    lids = np.array([e[1] for e in entries], dtype=np.int32)
    rids = np.array([e[2] for e in entries], dtype=np.int32)
    costs = np.array([e[3] for e in entries], dtype=np.int32)
    poss = np.array([e[4] for e in entries], dtype=object)
    ptypes = np.array([e[5] for e in entries], dtype=object)
    morphs = np.array(["|".join(f"{t}:{s}" for t, s in e[6])
                       for e in entries], dtype=object)
    ckeys = np.array(sorted(conn), dtype=np.int32)
    cvals = np.array([conn[tuple(k)] for k in sorted(conn)],
                     dtype=np.int32)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, surfaces=surfaces, left_ids=lids,
                        right_ids=rids, costs=costs, pos=poss,
                        pos_types=ptypes, morphemes=morphs,
                        conn_keys=ckeys, conn_vals=cvals,
                        default_conn=np.int32(1400))
    print(f"wrote {OUT}: {len(entries)} entries, {len(conn)} conn pairs")


if __name__ == "__main__":
    main()
