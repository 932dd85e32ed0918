"""Generate the seeded large Japanese lexicon (VERDICT r4 item 4).

The reference bundles the compiled IPADIC binary
(analysis/kuromoji/src/resources/.../dict/TokenInfoDictionary$fst.dat);
its word-cost buffer ($buffer.dat) is NOT present in the reference
checkout, so a faithful extraction is impossible. This script instead
generates a DETERMINISTIC ~12k-entry lexicon with IPADIC-like structure
(seeded RNG): kanji nouns and compounds WITH their parts, katakana
loanwords, the full particle/auxiliary function-word set, verb stems
with conjugated forms, and a structured connection-cost matrix over ~20
context-id classes (particle glue cheap, noun-noun juncture expensive —
the cost shape the demo dictionary pins and the ja tests verify against
a brute-force all-segmentations oracle).

Writes lucene_spark/analysis/data/ja_lexicon.npz (surfaces, left/right
ids, costs, POS tags + the conn matrix as parallel arrays). Rerunnable:
same seed → identical file.
"""

from __future__ import annotations

import os
import random

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "lucene_spark", "analysis", "data",
                   "ja_lexicon.npz")

SEED = 42

# ~200 common kanji (Joyo subset, public character data)
KANJI = (
    "日本人年大出中子見国上分生行二間時気十女三前入小後長下学月何来"
    "話山高今書五名金男外四先川東聞語九食八水天木六万白七円電父読校"
    "友毎午帰百新聞社員会事自動車駅道路地鉄北南西京都府県市町村空港"
    "関際国際政治経済産業工場商店街病院医者薬局銀行郵便局公園図書館"
    "映画音楽美術歴史文化科学技術情報通信電話手紙写真旅行料理野菜魚"
    "肉米茶酒花鳥風雨雪春夏秋冬朝昼夜心思愛楽苦悲喜怒青赤黒色光闇"
)
KATA = "アイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"
KATA2 = ["ー", "ッ"]

# context ids
N_NOUN, N_PROP, N_KATA, N_NUM, N_SUF = 10, 11, 12, 14, 15
V_STEM, V_MASU, V_TA, V_TE = 30, 31, 32, 33
ADJ = 40
AUX = 50
P_WA, P_GA, P_WO, P_NI, P_DE, P_TO, P_MO, P_NO, P_HE, P_KARA = \
    60, 61, 62, 63, 64, 65, 66, 67, 68, 69
IDS = [N_NOUN, N_PROP, N_KATA, N_NUM, N_SUF, V_STEM, V_MASU, V_TA,
       V_TE, ADJ, AUX, P_WA, P_GA, P_WO, P_NI, P_DE, P_TO, P_MO,
       P_NO, P_HE, P_KARA]


def _kata_reading(rng) -> str:
    return "".join(rng.choice(KATA) for _ in range(2))


def _hira_to_kata(s: str) -> str:
    return "".join(chr(ord(c) + 0x60) if 0x3041 <= ord(c) <= 0x3096 else c
                   for c in s)


def main() -> None:
    rng = random.Random(SEED)
    entries: list[tuple[str, int, int, int, str, str, str]] = []
    seen: set[tuple[str, int]] = set()
    kanji_read: dict[str, str] = {}      # per-kanji seeded reading

    def read_of(word: str) -> str:
        out = []
        for ch in word:
            if ch in KANJI:
                if ch not in kanji_read:
                    kanji_read[ch] = _kata_reading(rng)
                out.append(kanji_read[ch])
            else:
                out.append(_hira_to_kata(ch))
        return "".join(out)

    def add(surface, lid, rid, cost, pos, base="", reading=""):
        key = (surface, lid)
        if key in seen:
            return
        seen.add(key)
        if not reading:
            reading = read_of(surface)
        entries.append((surface, lid, rid, cost, pos, base, reading))

    # 2-kanji nouns (the IPADIC bulk)
    two_kanji = set()
    while len(two_kanji) < 6000:
        w = rng.choice(KANJI) + rng.choice(KANJI)
        if w not in two_kanji:
            two_kanji.add(w)
            add(w, N_NOUN, N_NOUN, rng.randint(2500, 4800), "名詞")
    two_list = sorted(two_kanji)
    # 3-kanji nouns
    three = set()
    while len(three) < 1200:
        w = rng.choice(two_list) + rng.choice(KANJI)
        if w not in three and w not in two_kanji:
            three.add(w)
            add(w, N_NOUN, N_NOUN, rng.randint(3200, 5200), "名詞")
    # 4-kanji compounds built from two 2-kanji parts that BOTH exist —
    # cost below parts-sum so NORMAL keeps the compound and SEARCH's
    # pruneAndRescore splits it
    comp = set()
    while len(comp) < 900:
        a, b = rng.choice(two_list), rng.choice(two_list)
        w = a + b
        if w in comp or len(w) != 4:
            continue
        comp.add(w)
        add(w, N_PROP, N_PROP, rng.randint(3500, 5200), "名詞-固有")
    # katakana loanwords
    kw = set()
    while len(kw) < 1500:
        n = rng.randint(3, 6)
        w = "".join(rng.choice(KATA) for _ in range(n))
        if rng.random() < 0.3:
            i = rng.randint(1, n - 1)
            w = w[:i] + "ー" + w[i:]
        if w not in kw:
            kw.add(w)
            add(w, N_KATA, N_KATA, rng.randint(3500, 5500), "名詞-外来")
    # particles (cheap, the lattice glue)
    for surf, pid in [("は", P_WA), ("が", P_GA), ("を", P_WO),
                      ("に", P_NI), ("で", P_DE), ("と", P_TO),
                      ("も", P_MO), ("の", P_NO), ("へ", P_HE),
                      ("から", P_KARA), ("まで", P_KARA),
                      ("より", P_KARA), ("や", P_TO), ("ね", P_WA),
                      ("よ", P_WA), ("か", P_WA)]:
        add(surf, pid, pid, rng.randint(4200, 5200), "助詞")
    # auxiliaries / copula
    for surf in ["です", "ます", "でした", "ました", "だ", "た",
                 "て", "ない", "たい", "れる", "られる", "せる"]:
        add(surf, AUX, AUX, rng.randint(4000, 5000), "助動詞")
    # verbs: stems + conjugations
    stems = ["行", "見", "食べ", "飲", "読", "書", "話", "聞", "来",
             "帰", "入", "出", "立", "座", "歩", "走", "泳", "買",
             "売", "作", "使", "待", "持", "思", "知", "住", "働"]
    for st in stems:
        base = rng.randint(4500, 6500)
        dict_form = st + "く" if st in ("行", "書", "聞") else st + "る"
        add(dict_form, V_STEM, V_STEM, base, "動詞")
        # conjugations carry the dictionary form (JapaneseBaseFormFilter)
        add(st + "きます" if st in ("行", "書", "聞") else st + "ます",
            V_MASU, V_MASU, base + 300, "動詞", base=dict_form)
        add(st + "った" if st in ("行", "買", "待", "持") else st + "た",
            V_TA, V_TA, base + 200, "動詞", base=dict_form)
        add(st + "って" if st in ("行", "買", "待", "持") else st + "て",
            V_TE, V_TE, base + 250, "動詞", base=dict_form)
    # adjectives
    for surf in ["高い", "安い", "大きい", "小さい", "新しい", "古い",
                 "良い", "悪い", "早い", "遅い", "長い", "短い",
                 "広い", "狭い", "白い", "黒い", "赤い", "青い"]:
        add(surf, ADJ, ADJ, rng.randint(4200, 5800), "形容詞")
    # numbers
    for surf in "一二三四五六七八九十百千万":
        add(surf, N_NUM, N_NUM, rng.randint(2800, 3400), "名詞-数")
    # suffixes
    for surf in ["さん", "くん", "ちゃん", "様", "的", "性", "者",
                 "化", "間", "中", "後", "前"]:
        add(surf, N_SUF, N_SUF, rng.randint(3000, 4200), "接尾")

    # connection matrix: structured base + jitter
    conn: dict[tuple[int, int], int] = {}
    particles = [P_WA, P_GA, P_WO, P_NI, P_DE, P_TO, P_MO, P_NO,
                 P_HE, P_KARA]
    nouns = [N_NOUN, N_PROP, N_KATA, N_NUM]
    for r in IDS + [0]:
        for l in IDS + [0]:
            if r == 0 and l == 0:
                continue
            if r == 0:                      # BOS →
                c = 400 if l in nouns else 2500
            elif l == 0:                    # → EOS
                c = (300 if l == 0 and r in (AUX, V_MASU, V_TA)
                     else 900 if r in nouns else 2000)
            elif r in nouns and l in particles:
                c = -1800                   # noun→particle glue
            elif r in particles and l in nouns:
                c = -1400                   # particle→noun glue
            elif r in particles and l in (V_STEM, V_MASU, V_TA, V_TE):
                c = -1200
            elif r in nouns and l == N_SUF:
                c = -900                    # noun+suffix tight
            elif r in nouns and l in nouns:
                c = 2600                    # noun-noun juncture expensive
            elif r in (V_TE,) and l == AUX:
                c = -800
            elif r in (V_STEM, V_TA, V_MASU) and l == AUX:
                c = -500
            elif r in particles and l in particles:
                c = 3200
            else:
                c = 1100
            conn[(r, l)] = c + rng.randint(-120, 120)

    surfaces = np.array([e[0] for e in entries], dtype=object)
    lids = np.array([e[1] for e in entries], dtype=np.int32)
    rids = np.array([e[2] for e in entries], dtype=np.int32)
    costs = np.array([e[3] for e in entries], dtype=np.int32)
    poss = np.array([e[4] for e in entries], dtype=object)
    bases = np.array([e[5] for e in entries], dtype=object)
    readings = np.array([e[6] for e in entries], dtype=object)
    ckeys = np.array(sorted(conn), dtype=np.int32)
    cvals = np.array([conn[tuple(k)] for k in sorted(conn)],
                     dtype=np.int32)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, surfaces=surfaces, left_ids=lids,
                        right_ids=rids, costs=costs, pos=poss,
                        base_forms=bases, readings=readings,
                        conn_keys=ckeys, conn_vals=cvals,
                        default_conn=np.int32(1300))
    print(f"wrote {OUT}: {len(entries)} entries, {len(conn)} conn pairs")


if __name__ == "__main__":
    main()
