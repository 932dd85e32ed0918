"""Hunspell dictionary stemming — the lucene/analysis/common hunspell
role (Dictionary.java + Stemmer.java + HunspellStemFilter.java).

Re-implements the non-compound analysis path from the reference's
semantics (no code taken; every behavior below is pinned by the
reference's own .aff/.dic fixture tests in tests/test_hunspell.py):

- .aff parsing (Dictionary.java:640-740): FLAG single/long/num, PFX/SFX
  blocks with strip, append, continuation classes (``append/flags``),
  and condition patterns (suffix matches ``.*cond``, prefix ``cond.*``
  — Dictionary.java:84-85; a missing condition means ``.``), FULLSTRIP,
  IGNORE, NEEDAFFIX, CIRCUMFIX, KEEPCASE.
- .dic parsing (Dictionary.java:1020-1095): escaped separators (\\/),
  morph data after tab, IGNORE char cleanup, and hidden title-case
  variants for MIXED-case words or UPPER-case words with flags
  (addHiddenCapitalizedWord, :1064-1082) carrying HIDDEN_FLAG.
- stemming (Stemmer.java:415-785): root lookup (needaffix pseudostems
  excluded), prefix then suffix removal with cross-product recursion
  (depth <= 2; a second suffix must be reachable via the previous
  affix's continuation class — isAffixCompatible:578-607), strip+append
  reconstruction checked against the condition on the CONCATENATION
  (checkCondition:620-640), prefix-flag re-check when a suffix follows
  a prefix (applyAffix:677-688), circumfix pairing and needaffix via
  needsAnotherAffix (:765-779), and UPPER/TITLE case-variant stemming
  (stem:84-152 — UPPER tries the title fold then the lower fold; the
  hidden dictionary variants only accept case-variant lookups,
  acceptCase:295-308).
- HunspellStemFilter: original term kept when no stems exist; stems
  replace the term with posInc 0 continuation; dedup on by default;
  longestOnly keeps the single longest stem; keyword set bypass.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

FLAG_UNSET = None


@dataclass(frozen=True)
class AffixRule:
    flag: str
    cross_product: bool
    strip: str
    append: str
    cont: frozenset          # continuation flags on the append
    cond: object             # compiled regex or None
    is_prefix: bool


@dataclass(frozen=True)
class DicEntry:
    word: str
    flags: frozenset
    hidden: bool = False


def _case_of(word: str) -> str:
    letters = [c for c in word if c.isalpha()]
    if not letters:
        return "neutral"
    if all(c.islower() for c in letters):
        return "lower"
    if all(c.isupper() for c in letters):
        return "upper"
    if letters[0].isupper() and all(c.islower() for c in letters[1:]):
        return "title"
    return "mixed"


def _title_fold(word: str) -> str:
    return word[0] + word[1:].lower() if word else word


class HunspellDictionary:
    """Parsed .aff + .dic pair (strings or line lists)."""

    def __init__(self, aff, dic):
        if isinstance(aff, str):
            aff = aff.splitlines()
        if isinstance(dic, str):
            dic = dic.splitlines()
        self.flag_mode = "single"
        self.full_strip = False
        self.ignore = ""
        self.needaffix = FLAG_UNSET
        self.circumfix = FLAG_UNSET
        self.keepcase = FLAG_UNSET
        self.prefixes_by_append: dict[str, list[AffixRule]] = {}
        self.suffixes_by_append: dict[str, list[AffixRule]] = {}
        self._parse_aff(aff)
        self.two_stage = any(
            r.cont for rules in list(self.prefixes_by_append.values())
            + list(self.suffixes_by_append.values()) for r in rules)
        self.entries: dict[str, list[DicEntry]] = {}
        self._parse_dic(dic)

    # ---- parsing ---------------------------------------------------

    def _parse_flags(self, s: str) -> frozenset:
        if self.flag_mode == "long":
            return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
        if self.flag_mode == "num":
            return frozenset(p.strip() for p in s.split(",") if p.strip())
        return frozenset(s)

    def _one_flag(self, s: str) -> str:
        flags = sorted(self._parse_flags(s))
        return flags[0] if flags else FLAG_UNSET

    def _parse_aff(self, lines) -> None:
        it = iter(lines)
        for raw in it:
            line = raw.rstrip("\n")
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num",
                                  "UTF-8": "single"}.get(parts[1], "single")
            elif key == "FULLSTRIP":
                self.full_strip = True
            elif key == "IGNORE" and len(parts) > 1:
                self.ignore = parts[1]
            elif key == "NEEDAFFIX" and len(parts) > 1:
                self.needaffix = self._one_flag(parts[1])
            elif key == "CIRCUMFIX" and len(parts) > 1:
                self.circumfix = self._one_flag(parts[1])
            elif key == "KEEPCASE" and len(parts) > 1:
                self.keepcase = self._one_flag(parts[1])
            elif key in ("PFX", "SFX") and len(parts) >= 4:
                is_prefix = key == "PFX"
                flag_s, cross, count = parts[1], parts[2], int(parts[3])
                flag = self._one_flag(flag_s)
                for _ in range(count):
                    rule_parts = next(it).split()
                    # PFX flag strip append [condition [morph...]]
                    strip = "" if rule_parts[2] == "0" else rule_parts[2]
                    append_raw = rule_parts[3]
                    if "/" in append_raw:
                        append, cont_s = append_raw.split("/", 1)
                        cont = self._parse_flags(cont_s)
                    else:
                        append, cont = append_raw, frozenset()
                    if append == "0":
                        append = ""
                    cond_s = rule_parts[4] if len(rule_parts) > 4 else "."
                    if cond_s.startswith("[") and "]" not in cond_s:
                        cond_s += "]"          # Dictionary.java:705-707
                    if cond_s == "." or cond_s == strip:
                        cond = None            # zero condition (:714-718)
                    else:
                        pat = (f"{cond_s}(?s:.*)" if is_prefix
                               else f"(?s:.*){cond_s}")
                        cond = re.compile(pat)
                    rule = AffixRule(flag, cross == "Y", strip, append,
                                     cont, cond, is_prefix)
                    target = (self.prefixes_by_append if is_prefix
                              else self.suffixes_by_append)
                    target.setdefault(append, []).append(rule)

    def _clean(self, word: str) -> str:
        for ch in self.ignore:
            word = word.replace(ch, "")
        return word

    def _parse_dic(self, lines) -> None:
        first = True
        for raw in lines:
            line = raw.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            if first and line.strip().isdigit():
                first = False
                continue
            first = False
            line = line.split("\t", 1)[0]       # strip morph data
            # find the flag separator: first unescaped '/' past index 0
            word_chars, flags_s, i = [], None, 0
            while i < len(line):
                c = line[i]
                if c == "\\" and i + 1 < len(line):
                    word_chars.append(line[i + 1])
                    i += 2
                    continue
                if c == "/" and i > 0:
                    flags_s = line[i + 1:]
                    break
                word_chars.append(c)
                i += 1
            word = self._clean("".join(word_chars))
            if not word:
                continue
            flags = self._parse_flags(flags_s) if flags_s else frozenset()
            self.entries.setdefault(word, []).append(DicEntry(word, flags))
            case = _case_of(word)
            if case == "mixed" or (case == "upper" and flags):
                hidden = _title_fold(word)
                self.entries.setdefault(hidden, []).append(
                    DicEntry(hidden, flags, hidden=True))

    # ---- stemming --------------------------------------------------

    def _appends(self, rule: AffixRule | None, flag) -> bool:
        return (rule is not None and flag is not FLAG_UNSET
                and flag in rule.cont)

    def _needs_another(self, rule: AffixRule, previous, is_suffix: bool,
                       prefix_rule) -> bool:
        # Stemmer.needsAnotherAffix (java:765-779)
        if is_suffix and (self._appends(prefix_rule, self.circumfix)
                          != self._appends(rule, self.circumfix)):
            return True
        if self._appends(rule, self.needaffix):
            return (not is_suffix or previous is None
                    or self._appends(previous, self.needaffix))
        return False

    def _compatible(self, rule: AffixRule, prev_flag, depth: int,
                    previous_was_prefix: bool) -> bool:
        # Stemmer.isAffixCompatible, non-compound path (java:578-607)
        if depth == 0:
            return True
        if rule.cross_product:
            return previous_was_prefix or (
                prev_flag is not FLAG_UNSET and prev_flag in rule.cont)
        return False

    def _accept_case(self, original_case, entry: DicEntry) -> bool:
        if original_case is not None:
            return not (self.keepcase is not FLAG_UNSET
                        and self.keepcase in entry.flags)
        return not entry.hidden

    def _apply(self, stripped: str, rule: AffixRule, previous,
               prefix_rule, depth: int, is_prefix: bool, original_case,
               out: list) -> None:
        # Stemmer.applyAffix (java:657-755)
        if not self._needs_another(rule, previous, not is_prefix,
                                   prefix_rule):
            for entry in self.entries.get(stripped, ()):
                if not (rule.flag in entry.flags
                        or self._appends(prefix_rule, rule.flag)):
                    continue
                if prefix_rule is not None and not is_prefix:
                    if not (prefix_rule.flag in entry.flags
                            or self._appends(rule, prefix_rule.flag)):
                        continue
                if not self._accept_case(original_case, entry):
                    continue
                out.append(stripped)
        if rule.cross_product and depth <= 1:
            if depth == 0:
                if is_prefix:
                    prefix_rule = rule
                elif not self.two_stage:
                    return
            else:
                if is_prefix or not self.two_stage:
                    return
            self._walk(stripped, rule, rule.flag, prefix_rule, depth + 1,
                       False, is_prefix, original_case, out)

    def _walk(self, word: str, previous, prev_flag, prefix_rule,
              depth: int, do_prefix: bool, previous_was_prefix: bool,
              original_case, out: list) -> None:
        # Stemmer.stem (java:415-535): try prefix removals, then suffix
        n = len(word)
        if do_prefix and self.prefixes_by_append:
            limit = n + 1 if self.full_strip else n
            for i in range(min(limit, n + 1)):
                for rule in self.prefixes_by_append.get(word[:i], ()):
                    if rule is previous:
                        continue
                    if not self._compatible(rule, prev_flag, depth, False):
                        continue
                    stripped = rule.strip + word[i:]
                    if rule.cond is not None \
                            and not rule.cond.fullmatch(stripped):
                        continue
                    self._apply(stripped, rule, previous, None, depth,
                                True, original_case, out)
        if self.suffixes_by_append:
            limit = 0 if self.full_strip else 1
            for i in range(n, limit - 1, -1):
                for rule in self.suffixes_by_append.get(word[i:], ()):
                    if rule is previous:
                        continue
                    if not self._compatible(rule, prev_flag, depth,
                                            previous_was_prefix):
                        continue
                    stripped = word[:i] + rule.strip
                    if rule.cond is not None \
                            and not rule.cond.fullmatch(stripped):
                        continue
                    self._apply(stripped, rule, previous, prefix_rule,
                                depth, False, original_case, out)

    def _do_stem(self, word: str, original_case, out: list) -> None:
        # Stemmer.doStem (java:239-294), non-compound
        for entry in self.entries.get(word, ()):
            if not self._accept_case(original_case, entry):
                continue
            if self.needaffix is not FLAG_UNSET \
                    and self.needaffix in entry.flags:
                continue
            out.append(word)
        self._walk(word, None, FLAG_UNSET, None, 0, True, False,
                   original_case, out)

    def stems(self, word: str) -> list[str]:
        """All stems of `word` (Stemmer.stem:84-152), including case
        variants for UPPER/TITLE inputs."""
        word = self._clean(word)
        if not word:
            return []
        out: list[str] = []
        self._do_stem(word, None, out)
        case = _case_of(word)
        if case == "upper":
            title = _title_fold(word)
            self._do_stem(title, "upper", out)
            self._do_stem(title.lower(), "upper", out)
        elif case == "title":
            self._do_stem(word.lower(), "title", out)
        return out

    def unique_stems(self, word: str) -> list[str]:
        seen, out = set(), []
        for s in self.stems(word):
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out


@dataclass(frozen=True)
class StemToken:
    text: str
    position_increment: int


def hunspell_stem_tokens(tokens: list[str],
                         dictionary: HunspellDictionary,
                         dedup: bool = True,
                         longest_only: bool = False,
                         keywords: frozenset = frozenset()) -> list[StemToken]:
    """HunspellStemFilter over a flat token list: a token with no stems
    passes through; otherwise the stems replace it (first at posInc 1,
    the rest stacked at posInc 0); longestOnly keeps the single longest
    stem; keyword-marked tokens bypass stemming."""
    out: list[StemToken] = []
    for tok in tokens:
        if tok in keywords:
            out.append(StemToken(tok, 1))
            continue
        stems = (dictionary.unique_stems(tok) if dedup
                 else dictionary.stems(tok))
        if not stems:
            out.append(StemToken(tok, 1))
            continue
        if longest_only:
            stems = [max(stems, key=len)]
        out.append(StemToken(stems[0], 1))
        out.extend(StemToken(s, 0) for s in stems[1:])
    return out
