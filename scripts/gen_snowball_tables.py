"""Generate lucene_spark/analysis/snowball_tables.py from the reference.

Decodes the machine-generated Snowball `Among` tables and character
groupings for the five remaining languages (Armenian, Basque, Catalan,
Lithuanian, Estonian) out of the reference's
org/tartarus/snowball/ext/<Lang>Stemmer.java. The tables are DATA from
the published Snowball algorithms (snowballstem.org); the control flow
is re-implemented by hand in lucene_spark/analysis/snowball.py.

Run: python scripts/gen_snowball_tables.py  (rewrites the data module)
"""
from __future__ import annotations

import re

BASE = ("/root/reference/lucene/analysis/common/src/java/org/tartarus/"
        "snowball/ext/")
OUT = "lucene_spark/analysis/snowball_tables.py"


def groupings(src: str) -> dict[str, list[int]]:
    out = {}
    for m in re.finditer(
            r'private static final char (g_\w+)\[\] = \{([^}]*)\};', src):
        out[m.group(1)] = [int(x) for x in m.group(2).split(",")]
    return out


def decode_chars(bitmap: list[int], mn: int) -> str:
    chars = []
    for i, b in enumerate(bitmap):
        for bit in range(8):
            if b >> bit & 1:
                chars.append(chr(mn + i * 8 + bit))
    return "".join(chars)


def amongs(src: str) -> dict[str, list[tuple[str, int]]]:
    out = {}
    for m in re.finditer(
            r'private final static Among (a_\d+)\[\] = \{(.*?)\};', src,
            re.S):
        entries = []
        for em in re.finditer(
                r'new Among\("((?:[^"\\]|\\.)*)",\s*(-?\d+),\s*(-?\d+)'
                r'(?:,\s*"(r_\w+)",\s*methodObject)?',
                m.group(2)):
            s = em.group(1).encode().decode("unicode_escape")
            if em.group(4):  # among-level condition method
                entries.append((s, int(em.group(3)), em.group(4)))
            else:
                entries.append((s, int(em.group(3))))
        # longest-first so a linear scan == find_among_b's longest match
        entries.sort(key=lambda e: len(e[0]), reverse=True)
        out[m.group(1)] = entries
    return out


# (language, grouping ranges {g_name: min_char}, table renames)
LANGS = [
    ("Armenian", {"g_v": 1377},
     {"a_0": "HY_ADJ", "a_1": "HY_VERB", "a_2": "HY_NOUN",
      "a_3": "HY_ENDING"}),
    ("Basque", {"g_v": 97},
     {"a_0": "EU_ADITZAK", "a_1": "EU_IZENAK", "a_2": "EU_ADJ"}),
    ("Catalan", {"g_v": 97},
     {"a_0": "CA_CLEAN", "a_1": "CA_PRONOUN", "a_2": "CA_STANDARD",
      "a_3": "CA_VERB", "a_4": "CA_RESIDUAL"}),
    ("Lithuanian", {"g_v": 97},
     {"a_0": "LT_STEP1", "a_1": "LT_STEP2", "a_2": "LT_CONFLICTS",
      "a_3": "LT_CHDZ", "a_4": "LT_GD"}),
    ("Estonian", {"g_V1": 97, "g_RV": 97, "g_GI": 97, "g_KI": 98},
     {"a_0": "ET_EMPHASIS", "a_1": "ET_VERB", "a_2": "ET_LONGV",
      "a_3": "ET_IPLURAL", "a_4": "ET_SPECIAL_NOUN", "a_5": "ET_CASE",
      "a_6": "ET_PLURAL3", "a_7": "ET_DOUBLE_KPT", "a_8": "ET_NU",
      "a_9": "ET_DEGREES", "a_10": "ET_VERB_EXC"}),
    ("Swedish", {"g_v": 97, "g_s_ending": 98},
     {"a_0": "SV_MAIN", "a_1": "SV_CONS", "a_2": "SV_OTHER"}),
    ("Norwegian", {"g_v": 97, "g_s_ending": 98},
     {"a_0": "NO_MAIN", "a_1": "NO_CONS", "a_2": "NO_OTHER"}),
    ("Russian", {"g_v": 1072},
     {"a_0": "RU_PERF_GERUND", "a_1": "RU_ADJECTIVE",
      "a_2": "RU_PARTICIPLE", "a_3": "RU_REFLEXIVE", "a_4": "RU_VERB",
      "a_5": "RU_NOUN", "a_6": "RU_DERIV", "a_7": "RU_TIDY"}),
    ("Finnish", {"g_AEI": 97, "g_C": 98, "g_V1": 97, "g_V2": 97,
                 "g_particle_end": 97},
     {"a_0": "FI_PARTICLE", "a_1": "FI_SA", "a_2": "FI_SAE",
      "a_3": "FI_LLE", "a_4": "FI_POSSESSIVE", "a_5": "FI_LONGV",
      "a_6": "FI_CASE", "a_7": "FI_OTHER", "a_8": "FI_IPLURAL",
      "a_9": "FI_TPLURAL"}),
    ("Spanish", {"g_v": 97},
     {"a_0": "ES_CLEAN", "a_1": "ES_PRONOUN", "a_2": "ES_PRE_PRONOUN",
      "a_3": "ES_SUB6", "a_4": "ES_SUB7", "a_5": "ES_SUB8",
      "a_6": "ES_STANDARD", "a_7": "ES_Y_VERB", "a_8": "ES_VERB",
      "a_9": "ES_RESIDUAL"}),
    ("Italian", {"g_v": 97, "g_AEIO": 97, "g_CG": 99},
     {"a_0": "IT_PRELUDE1", "a_1": "IT_PRELUDE2", "a_2": "IT_PRONOUN",
      "a_3": "IT_PRE_PRONOUN", "a_4": "IT_SUB_ABIL", "a_5": "IT_SUB_OS",
      "a_6": "IT_STANDARD", "a_7": "IT_VERB"}),
    ("Portuguese", {"g_v": 97},
     {"a_0": "PT_PRELUDE", "a_1": "PT_POSTLUDE", "a_2": "PT_SUB_IC",
      "a_3": "PT_SUB_LOG", "a_4": "PT_SUB_UC", "a_5": "PT_STANDARD",
      "a_6": "PT_VERB", "a_7": "PT_RESIDUAL", "a_8": "PT_RESID2"}),
    ("German", {"g_v": 97, "g_s_ending": 98, "g_st_ending": 98},
     {"a_0": "DE_EXCEPTION", "a_1": "DE_STEP1", "a_2": "DE_STEP2",
      "a_3": "DE_STEP3_GU", "a_4": "DE_STEP3"}),
    ("German2", {"g_v": 97, "g_s_ending": 98, "g_st_ending": 98},
     {"a_0": "DE2_PRELUDE1", "a_1": "DE2_PRELUDE2", "a_2": "DE2_STEP1",
      "a_3": "DE2_STEP2", "a_4": "DE2_STEP3_GU", "a_5": "DE2_STEP3"}),
    ("French", {"g_v": 97, "g_keep_with_s": 97},
     {"a_0": "FR_A0", "a_1": "FR_A1", "a_2": "FR_A2",
      "a_3": "FR_A3", "a_4": "FR_A4", "a_5": "FR_A5",
      "a_6": "FR_A6", "a_7": "FR_A7", "a_8": "FR_A8"}),
    ("Kp", {"g_v": 97, "g_v_WX": 97, "g_AOU": 97, "g_AIOU": 97},
     {"a_0": "KP_STEP1", "a_1": "KP_STEP2", "a_2": "KP_STEP3",
      "a_3": "KP_STEP4A", "a_4": "KP_STEP4B", "a_5": "KP_STEP7",
      "a_6": "KP_STEP6", "a_7": "KP_STEP1C"}),
    ("Lovins", {},
     {"a_0": "LOV_AA", "a_1": "LOV_ENDINGS", "a_2": "LOV_DOUBLE",
      "a_3": "LOV_RESPELL"}),
    ("Hungarian", {"g_v": 97},
     {"a_0": "HU_DOUBLECONS_F", "a_1": "HU_V_ENDING", "a_2": "HU_DOUBLE",
      "a_3": "HU_INSTRUM", "a_4": "HU_CASE", "a_5": "HU_CASE_SPECIAL",
      "a_6": "HU_CASE_OTHER", "a_7": "HU_FACTIVE", "a_8": "HU_PLURAL",
      "a_9": "HU_OWNED", "a_10": "HU_SING_OWNER",
      "a_11": "HU_PLUR_OWNER"}),
]

GROUP_RENAME = {
    ("Armenian", "g_v"): "HY_VOWELS",
    ("Basque", "g_v"): "EU_VOWELS",
    ("Catalan", "g_v"): "CA_VOWELS",
    ("Lithuanian", "g_v"): "LT_VOWELS",
    ("Estonian", "g_V1"): "ET_V1",
    ("Estonian", "g_RV"): "ET_RV",
    ("Estonian", "g_GI"): "ET_GI",
    ("Estonian", "g_KI"): "ET_KI",
    ("Swedish", "g_v"): "SV_VOWELS",
    ("Swedish", "g_s_ending"): "SV_S_END",
    ("Norwegian", "g_v"): "NO_VOWELS",
    ("Norwegian", "g_s_ending"): "NO_S_END",
    ("Russian", "g_v"): "RU_VOWELS",
    ("Finnish", "g_AEI"): "FI_AEI",
    ("Finnish", "g_C"): "FI_C",
    ("Finnish", "g_V1"): "FI_V1",
    ("Finnish", "g_V2"): "FI_V2",
    ("Finnish", "g_particle_end"): "FI_PARTICLE_END",
    ("Hungarian", "g_v"): "HU_VOWELS",
    ("Spanish", "g_v"): "ES_VOWELS",
    ("Italian", "g_v"): "IT_VOWELS",
    ("Italian", "g_AEIO"): "IT_AEIO",
    ("Italian", "g_CG"): "IT_CG",
    ("Portuguese", "g_v"): "PT_VOWELS",
    ("German", "g_v"): "DE_VOWELS",
    ("German", "g_s_ending"): "DE_S_END",
    ("German", "g_st_ending"): "DE_ST_END",
    ("German2", "g_v"): "DE2_VOWELS",
    ("German2", "g_s_ending"): "DE2_S_END",
    ("German2", "g_st_ending"): "DE2_ST_END",
    ("French", "g_v"): "FR_VOWELS",
    ("Kp", "g_v"): "KP_V",
    ("Kp", "g_v_WX"): "KP_V_WX",
    ("Kp", "g_AOU"): "KP_AOU",
    ("Kp", "g_AIOU"): "KP_AIOU",
    ("French", "g_keep_with_s"): "FR_KEEP_S",
}


def main() -> None:
    lines = [
        '"""Snowball among tables — AUTO-GENERATED, do not edit.',
        "",
        "Generated by scripts/gen_snowball_tables.py from the reference's",
        "org/tartarus/snowball/ext/*.java (data of the published Snowball",
        'algorithms, snowballstem.org). Each table is [(suffix, code), ...]',
        "sorted longest-first; groupings are frozensets of characters.",
        '"""',
        "",
    ]
    for lang, ranges, renames in LANGS:
        src = open(BASE + lang + "Stemmer.java", encoding="utf-8").read()
        lines.append(f"# ---- {lang} "
                     f"(ref ext/{lang}Stemmer.java) ----")
        for g, bm in groupings(src).items():
            name = GROUP_RENAME[(lang, g)]
            chars = decode_chars(bm, ranges[g])
            lines.append(f"{name} = frozenset({chars!r})")
        for a, entries in amongs(src).items():
            name = renames[a]
            lines.append(f"{name} = [")
            for e in entries:
                lines.append(f"    {e!r},")
            lines.append("]")
        lines.append("")
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
