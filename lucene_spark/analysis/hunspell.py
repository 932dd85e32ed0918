"""Hunspell — the lucene/analysis/common hunspell role
(Dictionary.java + Stemmer.java + HunspellStemFilter.java +
SpellChecker.java + ModifyingSuggester.java + GeneratingSuggester.java
+ CompoundRule.java + CheckCompoundPattern.java).

Re-implements the analysis, spell-checking, suggestion, and
compounding paths from the reference's semantics (no code taken;
every behavior below is pinned by the reference's own .aff/.dic
fixture tests in tests/test_hunspell.py — every directive those
fixtures exercise is implemented):

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
- spell checking (SpellChecker.java): FORBIDDENWORD via the first
  root, BREAK pattern recursion (second-occurrence retry), trailing
  dots, numbers, UPPER/TITLE case variants, COMPLEXPREFIXES chained
  prefixes, AF flag aliases, ICONV input cleanup.
- compounding: COMPOUNDRULE flag patterns (*/? quantifiers, (..)
  groups) and COMPOUNDFLAG/BEGIN-MIDDLE-END concatenation threaded
  through the stemmer's word contexts, with COMPOUNDPERMITFLAG
  affixed parts, COMPOUNDFORBIDFLAG, CHECKCOMPOUNDCASE/DUP/TRIPLE/
  REP, SIMPLIFIEDTRIPLE, CHECKCOMPOUNDPATTERN (incl. replacement
  re-expansion), COMPOUNDWORDMAX and FORCEUCASE.
- suggestions: ModifyingSuggester edit candidates (REP/MAP/KEY,
  splits, dash-chunk repair, case handling) plus the n-gram
  GeneratingSuggester fallback, NOSUGGEST filtering, forceUCase
  capitalized suggestion, OCONV output conversion.
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


class RepEntry:
    """One REP table row (RepEntry.java): ^/$ anchor the pattern,
    '_' in the replacement means a space."""

    def __init__(self, raw_pattern: str, raw_replacement: str):
        self.must_start = raw_pattern.startswith("^")
        self.must_end = raw_pattern.endswith("$")
        self.pattern = raw_pattern[1 if self.must_start else 0:
                                   len(raw_pattern)
                                   - (1 if self.must_end else 0)]
        self.replacement = raw_replacement.replace("_", " ")

    def substitute(self, word: str) -> list[str]:
        p, n = self.pattern, len(self.pattern)
        if self.must_start:
            ok = word == p if self.must_end else word.startswith(p)
            return [self.replacement + word[n:]] if ok else []
        if self.must_end:
            return ([word[:len(word) - n] + self.replacement]
                    if word.endswith(p) else [])
        out, pos = [], word.find(p)
        while pos >= 0:
            out.append(word[:pos] + self.replacement + word[pos + n:])
            pos = word.find(p, pos + 1)
        return out


class CompoundRulePattern:
    """One COMPOUNDRULE row (CompoundRule.java): a flag pattern with *
    and ? quantifiers matched against the per-part flag sets by
    backtracking; ``fully`` distinguishes the prefix-prunability check
    (mayMatch) from the terminal full match."""

    _QUANTS = ("*", "?")

    def __init__(self, rule: str):
        # data = list of flag tokens and quantifier markers; (..) groups
        # hold one (possibly multi-char, FLAG long/num) flag each
        out: list[str] = []
        pos = 0
        while pos < len(rule):
            if rule[pos] == "(":
                rparen = rule.index(")", pos + 1)
                out.append(rule[pos + 1:rparen])
                pos = rparen + 1
                if pos < len(rule) and rule[pos] in self._QUANTS:
                    out.append(rule[pos])
                    pos += 1
            else:
                out.append(rule[pos])
                pos += 1
        self.data = out

    def _match(self, parts: list, pi: int, wi: int, fully: bool) -> bool:
        data = self.data
        if pi >= len(data):
            return wi >= len(parts)
        if wi >= len(parts) and not fully:
            return True
        flag = data[pi]
        if pi < len(data) - 1 and data[pi + 1] == "*":
            start = wi
            while wi < len(parts) and flag in parts[wi]:
                wi += 1
            while wi >= start:
                if self._match(parts, pi + 2, wi, fully):
                    return True
                wi -= 1
            return False
        cur = wi < len(parts) and flag in parts[wi]
        if pi < len(data) - 1 and data[pi + 1] == "?":
            if cur and self._match(parts, pi + 2, wi + 1, fully):
                return True
            return self._match(parts, pi + 2, wi, fully)
        return cur and self._match(parts, pi + 1, wi + 1, fully)

    def may_match(self, parts: list) -> bool:
        return self._match(parts, 0, 0, False)

    def fully_matches(self, parts: list) -> bool:
        return self._match(parts, 0, 0, True)


class _CheckCompoundPattern:
    """One CHECKCOMPOUNDPATTERN row (CheckCompoundPattern.java):
    prohibits compounding when the first part ends with `end_chars`
    and the next begins with `begin_chars` (a "0" side matches the
    whole stem instead; optional /flags constrain the stems); an
    optional replacement re-enables the compound in its modified
    surface form via expand_replacement."""

    def __init__(self, parts: list, parse_flags):
        def split(p):
            if "/" in p:
                chars, fl = p.split("/", 1)
                return chars, parse_flags(fl)
            return p, frozenset()

        self.end_chars, self.end_flags = split(parts[0])
        self.begin_chars, self.begin_flags = split(parts[1])
        self.replacement = parts[2] if len(parts) > 2 else None

    def prohibits_compounding(self, tail: str, break_pos: int,
                              stem_before: str, stem_after: str,
                              part_flags) -> bool:
        if self.end_chars == "0":
            if tail[break_pos - len(stem_before):break_pos] != stem_before:
                return False
        elif not tail.startswith(self.end_chars,
                                 break_pos - len(self.end_chars)) \
                or break_pos < len(self.end_chars):
            return False
        if self.begin_chars == "0":
            if not tail.startswith(stem_after, break_pos):
                return False
        elif not tail.startswith(self.begin_chars, break_pos):
            return False
        if self.end_flags:
            flags = part_flags(stem_before)
            if flags is None or not self.end_flags <= flags:
                return False
        if self.begin_flags:
            flags = part_flags(stem_after)
            if flags is None or not self.begin_flags <= flags:
                return False
        return True

    def expand_replacement(self, word: str, break_pos: int):
        if self.replacement is not None \
                and word.startswith(self.replacement, break_pos):
            return (word[:break_pos] + self.end_chars + self.begin_chars
                    + word[break_pos + len(self.replacement):])
        return None


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
    """Fold an UPPER word to its Title variant (first char kept)."""
    return word[0] + word[1:].lower() if word else word


def _title_case(word: str) -> str:
    """Dictionary.toTitleCase: first char uppercased, rest lowered."""
    return word[0].upper() + word[1:].lower() if word else word


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
        self.forbiddenword = FLAG_UNSET
        # BREAK directives (Dictionary.Breaks:1642-1657): ^x → starting,
        # x$ → ending, else middle; default is "-" in all three
        self.breaks_start: list[str] = ["-"]
        self.breaks_end: list[str] = ["-"]
        self.breaks_middle: list[str] = ["-"]
        # suggestion machinery (SpellChecker.suggest + ModifyingSuggester)
        self.try_chars = ""
        self.neighbor_key_groups: list[str] = []
        self.rep_table: list[RepEntry] = []
        self.map_table: list[list[str]] = []
        self.enable_split_suggestions = True
        self.max_ngram_suggestions = 4
        self.max_diff = 5
        self.only_max_diff = False
        self.nosuggest = FLAG_UNSET
        self.substandard = FLAG_UNSET
        self.forceucase = FLAG_UNSET
        self.onlyincompound = FLAG_UNSET
        self.compound_min = 3
        self.compound_rules: list[CompoundRulePattern] = []
        self.compound_flag = FLAG_UNSET
        self.compound_begin = FLAG_UNSET
        self.compound_middle = FLAG_UNSET
        self.compound_end = FLAG_UNSET
        self.compound_max = 2 ** 31 - 1
        self.compound_permit = FLAG_UNSET
        self.compound_forbid = FLAG_UNSET
        self.check_compound_dup = False
        self.check_compound_case = False
        self.check_compound_triple = False
        self.simplified_triple = False
        self.check_compound_rep = False
        self.check_compound_patterns: list[_CheckCompoundPattern] = []
        self.iconv: list[tuple[str, str]] = []
        self.oconv: list[tuple[str, str]] = []
        self.flag_aliases: list[str] = []
        self.complex_prefixes = False
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

    def _parse_flags_or_alias(self, s: str) -> frozenset:
        """AF compression (Dictionary.java): an all-digit flag field
        refers to the 1-based alias table row."""
        if self.flag_aliases and s.isdigit():
            idx = int(s)
            if 1 <= idx <= len(self.flag_aliases):
                return self._parse_flags(self.flag_aliases[idx - 1])
        return self._parse_flags(s)

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
            elif key == "FORBIDDENWORD" and len(parts) > 1:
                self.forbiddenword = self._one_flag(parts[1])
            elif key == "ONLYINCOMPOUND" and len(parts) > 1:
                self.onlyincompound = self._one_flag(parts[1])
            elif key == "COMPOUNDFLAG" and len(parts) > 1:
                self.compound_flag = self._one_flag(parts[1])
            elif key == "COMPOUNDBEGIN" and len(parts) > 1:
                self.compound_begin = self._one_flag(parts[1])
            elif key == "COMPOUNDMIDDLE" and len(parts) > 1:
                self.compound_middle = self._one_flag(parts[1])
            elif key == "COMPOUNDEND" and len(parts) > 1:
                self.compound_end = self._one_flag(parts[1])
            elif key == "COMPOUNDWORDMAX" and len(parts) > 1:
                self.compound_max = int(parts[1])
            elif key == "COMPOUNDPERMITFLAG" and len(parts) > 1:
                self.compound_permit = self._one_flag(parts[1])
            elif key == "COMPOUNDFORBIDFLAG" and len(parts) > 1:
                self.compound_forbid = self._one_flag(parts[1])
            elif key == "CHECKCOMPOUNDDUP":
                self.check_compound_dup = True
            elif key == "CHECKCOMPOUNDCASE":
                self.check_compound_case = True
            elif key == "CHECKCOMPOUNDTRIPLE":
                self.check_compound_triple = True
            elif key == "SIMPLIFIEDTRIPLE":
                self.simplified_triple = True
            elif key == "CHECKCOMPOUNDREP":
                self.check_compound_rep = True
            elif key == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif key == "AF" and len(parts) > 1 \
                    and not parts[1].isdigit():
                # alias table row ("AF 5" header is numeric); stored
                # raw — FLAG mode may be declared later in the file
                self.flag_aliases.append(parts[1])
            elif key == "ICONV" and len(parts) > 2 \
                    and not parts[1].isdigit():
                self.iconv.append((parts[1], parts[2]))
            elif key == "OCONV" and len(parts) > 2 \
                    and not parts[1].isdigit():
                self.oconv.append((parts[1], parts[2]))
            elif key == "CHECKCOMPOUNDPATTERN" and len(parts) > 2:
                self.check_compound_patterns.append(
                    _CheckCompoundPattern(parts[1:], self._parse_flags))
            elif key == "COMPOUNDMIN" and len(parts) > 1:
                self.compound_min = max(1, int(parts[1]))
            elif key == "COMPOUNDRULE" and len(parts) > 1 \
                    and not parts[1].isdigit():
                # rule line (the count header has a numeric operand)
                self.compound_rules.append(CompoundRulePattern(parts[1]))
            elif key == "TRY" and len(parts) > 1:
                self.try_chars = parts[1]
            elif key == "KEY" and len(parts) > 1:
                self.neighbor_key_groups = parts[1].split("|")
            elif key == "REP" and len(parts) > 2:
                # "REP a ei" rule line (the count header has len==2)
                self.rep_table.append(RepEntry(parts[1], parts[2]))
            elif key == "MAP" and len(parts) > 2:
                row, i, s = [], 0, parts[1]
                while i < len(s):
                    if s[i] == "(":
                        end = s.index(")", i)
                        row.append(s[i + 1:end])
                        i = end + 1
                    else:
                        row.append(s[i])
                        i += 1
                self.map_table.append(row)
            elif key == "NOSPLITSUGS":
                self.enable_split_suggestions = False
            elif key == "MAXDIFF" and len(parts) > 1:
                self.max_diff = int(parts[1])
            elif key == "ONLYMAXDIFF":
                self.only_max_diff = True
            elif key == "MAXNGRAMSUGS" and len(parts) > 1:
                self.max_ngram_suggestions = int(parts[1])
            elif key == "NOSUGGEST" and len(parts) > 1:
                self.nosuggest = self._one_flag(parts[1])
            elif key == "SUBSTANDARD" and len(parts) > 1:
                self.substandard = self._one_flag(parts[1])
            elif key == "FORCEUCASE" and len(parts) > 1:
                self.forceucase = self._one_flag(parts[1])
            elif key == "BREAK" and len(parts) > 1:
                self.breaks_start, self.breaks_end, self.breaks_middle \
                    = [], [], []
                for _ in range(int(parts[1])):
                    br = next(it).split()[1]
                    if br.startswith("^"):
                        self.breaks_start.append(br[1:])
                    elif br.endswith("$"):
                        self.breaks_end.append(br[:-1])
                    else:
                        self.breaks_middle.append(br)
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
                        cont = self._parse_flags_or_alias(cont_s)
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

    @staticmethod
    def _apply_conv(table, s: str) -> str:
        # Dictionary.applyMappings: longest match at each position,
        # advance one char after a replacement (java:947-980)
        if not table:
            return s
        by_len = sorted(table, key=lambda pr: -len(pr[0]))
        i = 0
        while i < len(s):
            for pat, rep in by_len:
                if s.startswith(pat, i):
                    s = s[:i] + rep + s[i + len(pat):]
                    break
            i += 1
        return s

    def _clean(self, word: str) -> str:
        for ch in self.ignore:
            word = word.replace(ch, "")
        return self._apply_conv(self.iconv, word)

    def _clean_output(self, word: str) -> str:
        return self._apply_conv(self.oconv, word)

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
            flags = (self._parse_flags_or_alias(flags_s) if flags_s
                     else frozenset())
            self.entries.setdefault(word, []).append(DicEntry(word, flags))
            case = _case_of(word)
            if case == "mixed" or (case == "upper" and flags):
                hidden = _title_case(word)[0] + word[1:].lower()
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

    @staticmethod
    def _has(flags, flag) -> bool:
        return flag is not FLAG_UNSET and flag in flags

    def _required_flag(self, context: str):
        # WordContext.requiredFlag
        return {"begin": self.compound_begin,
                "middle": self.compound_middle,
                "end": self.compound_end}.get(context, FLAG_UNSET)

    def _compatible(self, rule: AffixRule, prev_flag, depth: int,
                    previous_was_prefix: bool,
                    context: str = "simple") -> bool:
        # Stemmer.isAffixCompatible (java:578-607)
        if context != "simple":
            if not rule.is_prefix \
                    and self._has(rule.cont, self.compound_forbid):
                return False
            allowed = "begin" if rule.is_prefix else "end"
            if context != allowed \
                    and not self._has(rule.cont, self.compound_permit):
                return False
            if context == "end" and not rule.is_prefix \
                    and not previous_was_prefix \
                    and self._has(rule.cont, self.onlyincompound):
                return False
        if depth == 0:
            return context != "simple" \
                or not self._has(rule.cont, self.onlyincompound)
        if rule.cross_product:
            if context != "simple" \
                    or not self._has(rule.cont, self.onlyincompound):
                return previous_was_prefix or (
                    prev_flag is not FLAG_UNSET
                    and prev_flag in rule.cont)
        return False

    def _accept_case(self, original_case, entry: DicEntry) -> bool:
        if original_case is not None:
            return not (self.keepcase is not FLAG_UNSET
                        and self.keepcase in entry.flags)
        return not entry.hidden

    def _apply(self, stripped: str, rule: AffixRule, previous,
               prefix_rule, depth: int, is_prefix: bool, original_case,
               out: list, context: str = "simple") -> None:
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
                if context == "simple" \
                        and self._has(entry.flags, self.onlyincompound):
                    continue
                if context != "simple":
                    cflag = self._required_flag(context)
                    if not (self._has(entry.flags, cflag)
                            or self._appends(rule, cflag)
                            or self._has(entry.flags, self.compound_flag)
                            or self._appends(rule, self.compound_flag)):
                        continue
                out.append((stripped, entry))
        if rule.cross_product and depth <= 1:
            # applyAffix recursion branching (java:712-733), including
            # the COMPLEXPREFIXES second-prefix path
            if depth == 0:
                if is_prefix:
                    prefix_rule = rule
                    do_prefix = self.complex_prefixes and self.two_stage
                elif not self.complex_prefixes and self.two_stage:
                    do_prefix = False
                else:
                    return
            else:
                do_prefix = False
                if is_prefix and self.complex_prefixes:
                    prefix_rule = rule
                elif is_prefix or self.complex_prefixes \
                        or not self.two_stage:
                    return
            self._walk(stripped, rule, rule.flag, prefix_rule, depth + 1,
                       do_prefix, is_prefix, original_case, out, context)

    def _walk(self, word: str, previous, prev_flag, prefix_rule,
              depth: int, do_prefix: bool, previous_was_prefix: bool,
              original_case, out: list,
              context: str = "simple") -> None:
        # Stemmer.stem (java:415-535): try prefix removals, then suffix
        n = len(word)
        if do_prefix and self.prefixes_by_append:
            limit = n + 1 if self.full_strip else n
            for i in range(min(limit, n + 1)):
                for rule in self.prefixes_by_append.get(word[:i], ()):
                    if rule is previous:
                        continue
                    if not self._compatible(rule, prev_flag, depth,
                                            False, context):
                        continue
                    stripped = rule.strip + word[i:]
                    if rule.cond is not None \
                            and not rule.cond.fullmatch(stripped):
                        continue
                    self._apply(stripped, rule, previous, None, depth,
                                True, original_case, out, context)
        if self.suffixes_by_append:
            limit = 0 if self.full_strip else 1
            for i in range(n, limit - 1, -1):
                for rule in self.suffixes_by_append.get(word[i:], ()):
                    if rule is previous:
                        continue
                    if not self._compatible(rule, prev_flag, depth,
                                            previous_was_prefix, context):
                        continue
                    stripped = word[:i] + rule.strip
                    if rule.cond is not None \
                            and not rule.cond.fullmatch(stripped):
                        continue
                    self._apply(stripped, rule, previous, prefix_rule,
                                depth, False, original_case, out,
                                context)

    def _do_stem(self, word: str, original_case, out: list,
                 context: str = "simple") -> None:
        # Stemmer.doStem (java:239-294)
        for entry in self.entries.get(word, ()):
            if not self._accept_case(original_case, entry):
                continue
            if self.needaffix is not FLAG_UNSET \
                    and self.needaffix in entry.flags:
                continue
            if context == "simple":
                # onlyincompound roots are valid only inside compounds
                if self._has(entry.flags, self.onlyincompound):
                    continue
            else:
                if context != "end" \
                        and self._has(entry.flags, self.compound_forbid):
                    return      # doStem returns false: abort entirely
                if not (self._has(entry.flags, self.compound_flag)
                        or self._has(entry.flags,
                                     self._required_flag(context))):
                    continue
            out.append((word, entry))
        self._walk(word, None, FLAG_UNSET, None, 0, True, False,
                   original_case, out, context)

    def _roots(self, word: str) -> list:
        """(stem, entry) pairs in the reference's discovery order."""
        out: list = []
        self._do_stem(word, None, out)
        case = _case_of(word)
        if case == "upper":
            title = _title_fold(word)
            self._do_stem(title, "upper", out)
            self._do_stem(title.lower(), "upper", out)
        elif case == "title":
            self._do_stem(word.lower(), "title", out)
        return out

    def stems(self, word: str) -> list[str]:
        """All stems of `word` (Stemmer.stem:84-152), including case
        variants for UPPER/TITLE inputs."""
        word = self._clean(word)
        if not word:
            return []
        return [self._clean_output(s) for s, _ in self._roots(word)]

    # ---- spell checking (SpellChecker.java, non-compound path) -----

    def _first_root(self, word: str, original_case,
                    context: str = "simple"):
        out: list = []
        self._do_stem(word, original_case, out, context)
        return out[0] if out else None

    def _check_simple(self, word: str, original_case, accepts=None):
        """3-state checkSimpleWord (SpellChecker.java:104-115): True /
        False (first root found, forbidden-ness decides) or None (no
        root at all). `accepts` mirrors the suggestion speller's
        acceptsStem override (SpellChecker.suggest:452-458): a rejected
        first root reads as no-root."""
        root = self._first_root(word, original_case)
        if root is None:
            return None
        _, entry = root
        if accepts is not None and not accepts(entry):
            return None
        return not (self.forbiddenword is not FLAG_UNSET
                    and self.forbiddenword in entry.flags)

    @staticmethod
    def _is_number(s: str) -> bool:
        # SpellChecker.isNumber (java:363-380): digits with single
        # . , - separators, each followed by a digit
        i = 0
        while i < len(s):
            c = s[i]
            if c.isdigit() and c.isascii():
                i += 1
            elif c in ".,-":
                if i == 0 or i >= len(s) - 1 or not s[i + 1].isdigit():
                    return False
                i += 2
            else:
                return False
        return len(s) > 0

    def spell(self, word: str) -> bool:
        """SpellChecker.spell (java:51-102): numbers pass; the first
        root's FORBIDDENWORD flag decides; UPPER/TITLE inputs retry as
        case variants; BREAK patterns split recursively; trailing dots
        are tolerated. Compound directives are not supported (the
        documented scope cut — the stemming path covers SIMPLE_WORD)."""
        if word == "":
            return True
        word = self._clean(word)
        if word.endswith("."):
            n = len(word) - 1
            while n > 0 and word[n - 1] == ".":
                n -= 1
            return self._spell_clean(word[:n]) \
                or self._spell_clean(word[:n + 1])
        return self._spell_clean(word)

    def _spell_clean(self, word: str) -> bool:
        if self._is_number(word):
            return True
        simple = self._check_simple(word, None)
        if simple is not None:
            return simple
        if self.compound_rules and self._check_compound_rules(word, []):
            return True
        if self._has_compound_flags() \
                and self._check_compound_flag(word, None):
            return True
        case = _case_of(word)

        def check_variant(variant: str, oc: str) -> bool:
            # SpellChecker.checkWord: simple word OR compounds
            if self._check_simple(variant, oc):
                return True
            if self.compound_rules \
                    and self._check_compound_rules(variant, []):
                return True
            return bool(self._has_compound_flags()
                        and self._check_compound_flag(variant, oc))

        if case == "upper":
            title = _title_fold(word)
            if check_variant(title, "upper"):
                return True
            if check_variant(title.lower(), "upper"):
                return True
        elif case == "title":
            if check_variant(word.lower(), "title"):
                return True
        if (self.breaks_start or self.breaks_end or self.breaks_middle) \
                and not self._too_many_breaks(word):
            return self._try_breaks(word)
        return False

    def _part_flags(self, part: str):
        """Union of flags over the homonym entries of `part` (the
        lookupWord forms an IntsRef covers), or None if absent."""
        entries = self.entries.get(part)
        if not entries:
            return None
        out = set()
        for e in entries:
            out |= e.flags
        return frozenset(out)

    def _check_compound_rules(self, word: str, parts: list) -> bool:
        # SpellChecker.checkCompoundRules (java:324-361)
        if len(parts) >= 100:
            return False
        limit = len(word) - self.compound_min + 1
        for break_pos in range(self.compound_min, limit):
            flags = self._part_flags(word[:break_pos])
            if flags is None:
                continue
            parts.append(flags)
            if any(r.may_match(parts) for r in self.compound_rules):
                rest = word[break_pos:]
                last = self._part_flags(rest)
                if last is not None:
                    parts.append(last)
                    ok = any(r.fully_matches(parts)
                             for r in self.compound_rules)
                    parts.pop()
                    if ok:
                        parts.pop()
                        return True
                if self._check_compound_rules(rest, parts):
                    parts.pop()
                    return True
            parts.pop()
        return False

    # ---- COMPOUNDFLAG / BEGIN-MIDDLE-END compounding ----------------
    # (SpellChecker.checkCompounds + CompoundPart, java:162-322)

    class _CompoundPart:
        __slots__ = ("prev", "index", "length", "tail", "stem",
                     "enabling_pattern")

        def __init__(self, prev, tail: str, length: int, stem: str,
                     enabling_pattern=None):
            self.prev = prev
            self.tail = tail
            self.length = length
            self.stem = stem
            self.enabling_pattern = enabling_pattern
            self.index = 1 if prev is None else prev.index + 1

    def _has_compound_flags(self) -> bool:
        return (self.compound_flag is not FLAG_UNSET
                or self.compound_begin is not FLAG_UNSET)

    def _may_break_compound(self, word: str, break_pos: int) -> bool:
        # mayBreakIntoCompounds (java:308-322)
        if self.check_compound_case:
            if word[break_pos - 1].isupper() or word[break_pos].isupper():
                return False
        if self.check_compound_triple \
                and word[break_pos - 1] == word[break_pos]:
            if (break_pos > 1 and word[break_pos - 2] == word[break_pos - 1]) \
                    or (break_pos < len(word) - 1
                        and word[break_pos] == word[break_pos + 1]):
                return False
        return True

    def _may_compound(self, prev, next_stem: str, next_len: int,
                      original_case) -> bool:
        # CompoundPart.mayCompound (java:271-292)
        if prev.enabling_pattern is not None:
            patterns_ok = prev.enabling_pattern.prohibits_compounding(
                prev.tail, prev.length, prev.stem, next_stem,
                self._part_flags)
        else:
            patterns_ok = not any(
                p.prohibits_compounding(prev.tail, prev.length,
                                        prev.stem, next_stem,
                                        self._part_flags)
                for p in self.check_compound_patterns)
        if not patterns_ok:
            return False
        if self.check_compound_rep and self._misspelled_simple(
                prev.tail[:prev.length + next_len], original_case):
            return False
        spaced = prev.tail[:prev.length] + " " \
            + prev.tail[prev.length:prev.length + next_len]
        return not (self._check_simple(spaced, None) is True)

    def _misspelled_simple(self, word: str, original_case) -> bool:
        for entry in self.rep_table:
            if not entry.must_start and not entry.must_end:
                for sug in entry.substitute(word):
                    if self._first_root(sug, original_case) is not None:
                        return True
        return False

    def _force_ucase_problem(self, part: str, original_case) -> bool:
        if self.forceucase is FLAG_UNSET:
            return False
        if original_case in ("title", "upper"):
            return False
        flags = self._part_flags(part)
        return flags is not None and self.forceucase in flags

    def _check_compound_flag(self, word: str, original_case,
                             prev=None) -> bool:
        if prev is not None and prev.index > self.compound_max - 2:
            return False
        limit = len(word) - self.compound_min + 1
        for break_pos in range(self.compound_min, limit):
            context = "begin" if prev is None else "middle"
            if self._may_break_compound(word, break_pos):
                stem = self._first_root(word[:break_pos], original_case,
                                        context)
                if stem is None and self.simplified_triple \
                        and word[break_pos - 1] == word[break_pos]:
                    stem = self._first_root(word[:break_pos + 1],
                                            original_case, context)
                if stem is not None:
                    _, entry = stem
                    if not self._has(entry.flags, self.forbiddenword) \
                            and (prev is None or self._may_compound(
                                prev, stem[0], break_pos,
                                original_case)):
                        part = self._CompoundPart(prev, word, break_pos,
                                                  stem[0])
                        if self._check_compounds_after(original_case,
                                                       part):
                            return True
            # checkCompoundPatternReplacements (java:194-212)
            for pattern in self.check_compound_patterns:
                expanded = pattern.expand_replacement(word, break_pos)
                if expanded is None:
                    continue
                bp = break_pos + len(pattern.end_chars)
                stem = self._first_root(expanded[:bp], original_case,
                                        context)
                if stem is not None:
                    part = self._CompoundPart(prev, expanded, bp,
                                              stem[0], pattern)
                    if self._check_compounds_after(original_case, part):
                        return True
        return False

    def _check_compounds_after(self, original_case, prev) -> bool:
        word, break_pos = prev.tail, prev.length
        rest = word[break_pos:]
        tail_stem = self._first_root(rest, original_case, "end")
        if tail_stem is not None:
            stem_text, entry = tail_stem
            if not self._has(entry.flags, self.forbiddenword) \
                    and not (self.check_compound_dup
                             and prev.stem.lower() == stem_text.lower()) \
                    and not self._force_ucase_problem(rest,
                                                      original_case) \
                    and self._may_compound(prev, stem_text, len(rest),
                                           original_case):
                return True
        return self._check_compound_flag(rest, original_case, prev)

    def _too_many_breaks(self, word: str) -> bool:
        n = 0
        for br in self.breaks_middle:
            pos = word.find(br)
            while pos >= 0:
                n += 1
                if n >= 10:
                    return True
                pos = word.find(br, pos + len(br))
        return False

    def _try_breaks(self, word: str) -> bool:
        # SpellChecker.tryBreaks (java:385-435)
        for br in self.breaks_start:
            if len(word) > len(br) and word.startswith(br) \
                    and self.spell(word[len(br):]):
                return True
        for br in self.breaks_end:
            if len(word) > len(br) and word.endswith(br) \
                    and self.spell(word[:-len(br)]):
                return True
        for br in self.breaks_middle:
            pos = word.find(br)
            if self._breakable_at(word, br, pos):
                return True
            # also the second occurrence, so dictionary entries that
            # themselves contain a break char are recognized (e-mail-foo)
            if pos > 0 and self._breakable_at(word, br,
                                              word.find(br, pos + 1)):
                return True
        return False

    def _breakable_at(self, word: str, br: str, pos: int) -> bool:
        return (pos > 0 and pos < len(word) - len(br)
                and self.spell(word[:pos])
                and self.spell(word[pos + len(br):]))

    # ---- suggestions (SpellChecker.suggest + ModifyingSuggester) ---

    def suggest(self, word: str) -> list[str]:
        """SpellChecker.suggest (java:436-481): the edit-based
        ModifyingSuggester (REP/MAP/KEY tables, split suggestions,
        dash-chunk repair) plus the n-gram GeneratingSuggester fallback
        when no good edit-based suggestion exists."""
        if len(word) >= 100:
            return []
        word = self._clean(word)
        case = _case_of(word)
        if self.forceucase is not FLAG_UNSET and case == "lower":
            title = _title_case(word)
            if self.spell(title):
                return [title]
        modifier = _ModifyingSuggester(self)
        suggestions = modifier.suggest(word, case)
        if not modifier.has_good and self.max_ngram_suggestions > 0:
            suggestions = suggestions + [
                s for s in _GeneratingSuggester(self, modifier._accepts)
                .suggest(word.lower(), case, suggestions)
                if s not in suggestions]
        if "-" in word and not any("-" in s for s in suggestions):
            suggestions += [s for s in self._modify_dash_chunks(word)
                            if s not in suggestions]
        out = []
        for cand in suggestions:
            adj = self._clean_output(
                self._adjust_suggestion_case(cand, case, word))
            if adj not in out:
                out.append(adj)
        return out

    def _modify_dash_chunks(self, word: str) -> list[str]:
        # SpellChecker.modifyChunksBetweenDashes (java:483-507)
        out, start = [], 0
        while start < len(word):
            end = word.find("-", start)
            if end < 0:
                end = len(word)
            if end > start:
                chunk = word[start:end]
                if not self.spell(chunk):
                    for chunk_sug in self.suggest(chunk):
                        replaced = word[:start] + chunk_sug + word[end:]
                        if self.spell(replaced):
                            out.append(replaced)
            start = end + 1
        return out

    def _adjust_suggestion_case(self, cand: str, original_case,
                                original: str) -> str:
        if original_case == "upper":
            upper = cand.upper()
            if " " in upper or self.spell(upper):
                return upper
        if original and original[0].isupper():
            title = cand[0].upper() + cand[1:] if cand else cand
            if " " in title or self.spell(title):
                return title
        return cand

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


_MAX_CHAR_DISTANCE = 4


class _ModifyingSuggester:
    """ModifyingSuggester.java: ordered edit-based candidate generation,
    each candidate verified by a direct dictionary checkWord with the
    NOSUGGEST/SUBSTANDARD-filtering root acceptor."""

    def __init__(self, d: HunspellDictionary):
        self.d = d
        self.result: list[str] = []
        self._seen: set[str] = set()
        self.has_good = False

    def _accepts(self, entry: DicEntry) -> bool:
        d = self.d
        if d.nosuggest is not FLAG_UNSET and d.nosuggest in entry.flags:
            return False
        if d.substandard is not FLAG_UNSET \
                and d.substandard in entry.flags:
            return False
        return True

    def _check_word(self, word: str) -> bool:
        return self.d._check_simple(word, None, self._accepts) is True

    def _try(self, cand: str) -> bool:
        if self._check_word(cand) and cand not in self._seen:
            self._seen.add(cand)
            self.result.append(cand)
            return True
        return False

    def suggest(self, word: str, case: str) -> list[str]:
        low = word.lower() if case != "lower" else word
        if case in ("upper", "mixed"):
            self._try(low)
        self._variations(word)
        if case == "title":
            self._variations(low)
        elif case == "upper":
            self._variations(low)
            self._variations(_title_fold(word))
        elif case == "mixed":
            dot = word.find(".")
            if 0 < dot < len(word) - 1 \
                    and _case_of(word[dot + 1:]) == "title":
                cand = word[:dot + 1] + " " + word[dot + 1:]
                if cand not in self._seen:
                    self._seen.add(cand)
                    self.result.append(cand)
            capitalized = word[0].isupper()
            if capitalized:
                self._variations(word[0].lower() + word[1:])
            self._variations(low)
            if capitalized:
                self._variations(_title_case(low))
            return [self._capitalize_after_space(low, s)
                    for s in self.result]
        return self.result

    def _capitalize_after_space(self, low: str, cand: str) -> str:
        # aNew -> "a New" instead of "a new" (java:80-90)
        space = cand.find(" ")
        tail = len(cand) - space - 1
        if space > 0 and low[len(low) - tail:] == cand[space + 1:]:
            return (cand[:space + 1] + cand[space + 1].upper()
                    + cand[space + 2:])
        return cand

    def _variations(self, word: str) -> None:
        self.has_good |= self._try(word.upper())
        self.has_good |= self._rep(word)
        if self.d.map_table:
            self._map_replacements(word, "", 0)
        self._swapping(word)
        self._long_swap(word)
        self._neighbor_keys(word)
        self._removing(word)
        self._adding(word)
        self._moving(word)
        self._replacing(word)
        self._two_duplicates(word)
        good_split = self._dict_splits(word)
        if good_split:
            copy = self.result
            self.result = [s for s in good_split]
            self._seen.update(good_split)
            if self.has_good:
                self.result += [s for s in copy
                                if s not in self.result]
            self.has_good = True
        if not self.has_good and self.d.enable_split_suggestions:
            self._splitting(word)

    def _rep(self, word: str) -> bool:
        before = len(self.result)
        for entry in self.d.rep_table:
            for cand in entry.substitute(word):
                if self._try(cand):
                    continue
                if " " in cand and all(
                        self.d._check_simple(p, None, self._accepts)
                        is True for p in cand.split(" ")):
                    if cand not in self._seen:
                        self._seen.add(cand)
                        self.result.append(cand)
        return len(self.result) > before

    def _map_replacements(self, word: str, acc: str, off: int) -> None:
        if off == len(word):
            self._try(acc)
            return
        for entries in self.d.map_table:
            for entry in entries:
                if word.startswith(entry, off):
                    for repl in entries:
                        if repl != entry:
                            self._map_replacements(
                                word, acc + repl, off + len(entry))
        self._map_replacements(word, acc + word[off], off + 1)

    def _swapping(self, word: str) -> None:
        n = len(word)
        for i in range(n - 1):
            self._try(word[:i] + word[i + 1] + word[i] + word[i + 2:])
        if n in (4, 5):
            # ahev -> have, owudl -> would (java:181-195)
            c = list(word)
            c[0], c[1] = word[1], word[0]
            c[n - 1], c[n - 2] = word[n - 2], word[n - 1]
            self._try("".join(c))
            if n == 5:
                c[0] = word[0]
                c[1], c[2] = word[2], word[1]
                self._try("".join(c))

    def _neighbor_keys(self, word: str) -> None:
        for i, ch in enumerate(word):
            up = ch.upper()
            if up != ch:
                self._try(word[:i] + up + word[i + 1:])
            for group in self.d.neighbor_key_groups:
                if ch in group:
                    for g in group:
                        if g != ch:
                            self._try(word[:i] + g + word[i + 1:])

    def _long_swap(self, word: str) -> None:
        for i in range(len(word)):
            for j in range(i + 2,
                           min(len(word), i + _MAX_CHAR_DISTANCE + 1)):
                self._try(word[:i] + word[j] + word[i + 1:j]
                          + word[i] + word[j + 1:])

    def _removing(self, word: str) -> None:
        for i in range(len(word)):
            self._try(word[:i] + word[i + 1:])

    def _adding(self, word: str) -> None:
        for i in range(len(word) + 1):
            for ch in self.d.try_chars:
                self._try(word[:i] + ch + word[i:])

    def _moving(self, word: str) -> None:
        for i in range(len(word)):
            for j in range(i + 2,
                           min(len(word), i + _MAX_CHAR_DISTANCE + 1)):
                self._try(word[:i] + word[i + 1:j] + word[i] + word[j:])
                self._try(word[:i] + word[j] + word[i:j] + word[j + 1:])

    def _replacing(self, word: str) -> None:
        for i, cur in enumerate(word):
            for ch in self.d.try_chars:
                if ch != cur:
                    self._try(word[:i] + ch + word[i + 1:])

    def _two_duplicates(self, word: str) -> None:
        # vacacation -> vacation (java:270-284)
        dup = 0
        for i in range(2, len(word)):
            if word[i] == word[i - 2]:
                dup += 1
                if dup == 3 or (dup == 2 and i >= 4):
                    self._try(word[:i - 1] + word[i + 1:])
                    dup = 0
            else:
                dup = 0

    def _should_split_by_dash(self) -> bool:
        return "-" in self.d.try_chars or "a" in self.d.try_chars

    def _dict_splits(self, word: str) -> list[str]:
        out = []
        for i in range(1, len(word) - 1):
            w1, w2 = word[:i], word[i:]
            spaced = w1 + " " + w2
            if self._check_word(spaced):
                out.append(spaced)
            if self._should_split_by_dash():
                dashed = w1 + "-" + w2
                if self._check_word(dashed):
                    out.append(dashed)
        return out

    def _splitting(self, word: str) -> None:
        for i in range(1, len(word) - 1):
            w1, w2 = word[:i], word[i:]
            if self.d._check_simple(w1, None, self._accepts) is True \
                    and self.d._check_simple(w2, None,
                                             self._accepts) is True:
                for cand in ([w1 + " " + w2]
                             + ([w1 + "-" + w2]
                                if self._should_split_by_dash() else [])):
                    if cand not in self._seen:
                        self._seen.add(cand)
                        self.result.append(cand)


class _GeneratingSuggester:
    """GeneratingSuggester.java: n-gram-similarity root search over the
    whole dictionary, affix expansion of the best roots, similarity
    re-ranking with the excellent/bad thresholds."""

    MAX_ROOTS = 100
    MAX_WORDS = 100
    MAX_GUESSES = 200

    def __init__(self, d: HunspellDictionary, accepts):
        self.d = d
        self._accepts = accepts

    # ---- scoring helpers (java:312-397) ----------------------------

    @staticmethod
    def _common_prefix(s1: str, s2: str) -> int:
        i = 0
        while i < min(len(s1), len(s2)) and s1[i] == s2[i]:
            i += 1
        return i

    @staticmethod
    def _ngram(n: int, s1: str, s2: str, weighted=False,
               longer_worse=False, any_mismatch=False) -> int:
        l1, l2 = len(s1), len(s2)
        if l2 == 0:
            return 0
        score = 0
        for j in range(1, n + 1):
            ns = 0
            for i in range(l1 - j + 1):
                if s1[i:i + j] in s2:
                    ns += 1
                elif weighted:
                    ns -= 1
                    if i == 0 or i == l1 - j:
                        ns -= 1          # side weight
            score += ns
            if ns < 2 and not weighted:
                break
        ns = 0
        if longer_worse:
            ns = (l2 - l1) - 2
        if any_mismatch:
            ns = abs(l2 - l1) - 2
        return score - max(ns, 0)

    @staticmethod
    def _lcs(s1: str, s2: str) -> int:
        lengths = [0] * (len(s2) + 1)
        for i in range(1, len(s1) + 1):
            prev = 0
            for j in range(1, len(s2) + 1):
                cur = lengths[j]
                lengths[j] = (prev + 1 if s1[i - 1] == s2[j - 1]
                              else max(cur, lengths[j - 1]))
                prev = cur
        return lengths[len(s2)]

    @staticmethod
    def _common_char_position_score(s1: str, s2: str) -> int:
        num = diff = 0
        dp1 = dp2 = -1
        i = 0
        while i < len(s1) and i < len(s2):
            if s1[i] == s2[i]:
                num += 1
            else:
                if diff == 0:
                    dp1 = i
                elif diff == 1:
                    dp2 = i
                diff += 1
            i += 1
        common = 1 if num > 0 else 0
        if diff == 2 and i == len(s1) == len(s2) \
                and s1[dp1] == s2[dp2] and s1[dp2] == s2[dp1]:
            return common + 10
        return common

    # ---- pipeline --------------------------------------------------

    def suggest(self, word: str, case, prev: list[str]) -> list[str]:
        roots = self._similar_roots(word, case)
        expanded = self._expand_roots(word, roots)
        ranked = self._rank(word, expanded)
        return self._most_relevant(ranked, prev)

    def _similar_roots(self, word: str, case):
        scored = []
        for root in sorted(self.d.entries):
            if abs(len(root) - len(word)) > 4:
                continue
            entries = [e for e in self.d.entries[root]
                       if not e.hidden and self._accepts(e)
                       and not (self.d.forbiddenword is not FLAG_UNSET
                                and self.d.forbiddenword in e.flags)]
            if not entries:
                continue
            if case == "lower" and _case_of(root) == "title":
                continue
            sc = self._ngram(3, word, root.lower(), longer_worse=True) \
                + self._common_prefix(word, root)
            for e in entries:
                scored.append((-sc, root, e))
        scored.sort(key=lambda t: (t[0], t[1]))
        return [(e, -neg) for neg, _, e in scored[:self.MAX_ROOTS]]

    def _expand_root(self, entry: DicEntry, misspelled: str) -> list[str]:
        # expandRoot (java:160-229)
        result: list[str] = []
        seen = set()

        def add(w: str) -> None:
            if w not in seen:
                seen.add(w)
                result.append(w)

        d = self.d
        if not (d.needaffix is not FLAG_UNSET
                and d.needaffix in entry.flags):
            add(entry.word)
        cross_products = []
        suffix_appends = sorted(d.suffixes_by_append,
                                key=lambda a: a[::-1])
        for append in suffix_appends:
            if not append or len(misspelled) <= len(append) \
                    or not misspelled.endswith(append):
                continue
            for rule in d.suffixes_by_append[append]:
                if not self._compatible_flags(entry, rule):
                    continue
                if not self._condition_ok(rule, entry.word):
                    continue
                with_suffix = entry.word[:len(entry.word)
                                         - len(rule.strip)] + append \
                    if rule.strip else entry.word + append
                add(with_suffix)
                if rule.cross_product:
                    cross_products.append(with_suffix)
        for prefix in sorted(d.prefixes_by_append):
            if not prefix or len(misspelled) <= len(prefix) \
                    or not misspelled.startswith(prefix):
                continue
            for rule in d.prefixes_by_append[prefix]:
                if rule.flag in entry.flags and rule.cross_product:
                    for suffixed in cross_products:
                        if self._condition_ok(rule, suffixed):
                            add(prefix + suffixed[len(rule.strip):])
        for prefix in sorted(d.prefixes_by_append):
            if not prefix or len(misspelled) <= len(prefix) \
                    or not misspelled.startswith(prefix):
                continue
            for rule in d.prefixes_by_append[prefix]:
                if self._compatible_flags(entry, rule) \
                        and self._condition_ok(rule, entry.word):
                    add(prefix + entry.word[len(rule.strip):])
        return result[:self.MAX_WORDS]

    def _compatible_flags(self, entry: DicEntry, rule: AffixRule) -> bool:
        if rule.flag not in entry.flags:
            return False
        d = self.d
        for special in (d.needaffix, d.circumfix):
            if special is not FLAG_UNSET and special in rule.cont:
                return False
        return True

    def _condition_ok(self, rule: AffixRule, stem: str) -> bool:
        return rule.cond is None or bool(rule.cond.fullmatch(stem))

    def _expand_roots(self, misspelled: str, roots):
        # threshold: mangle the word three ways (java:138-158)
        thresh = 0
        for sp in range(1, 4):
            mw = list(misspelled)
            for k in range(sp, len(misspelled), 4):
                mw[k] = "*"
            thresh += self._ngram(len(misspelled), misspelled,
                                  "".join(mw), any_mismatch=True)
        thresh = thresh // 3 - 1
        scored = []
        seen = set()
        for entry, _sc in roots:
            for guess in self._expand_root(entry, misspelled):
                lower = guess.lower()
                sc = self._ngram(len(misspelled), misspelled, lower,
                                 any_mismatch=True) \
                    + self._common_prefix(misspelled, guess)
                if sc > thresh and (guess, sc) not in seen:
                    seen.add((guess, sc))
                    scored.append((-sc, guess))
        scored.sort()
        return [(g, -neg) for neg, g in scored[:self.MAX_GUESSES]]

    def _rank(self, word: str, expanded):
        fact = (10.0 - self.d.max_diff) / 5.0
        ranked = []
        for guess, sc in expanded:
            lower = guess.lower()
            if lower == word:
                ranked.append((-(sc + 2000), guess))
                break
            re_sc = self._ngram(2, word, lower, weighted=True,
                                any_mismatch=True) \
                + self._ngram(2, lower, word, weighted=True,
                              any_mismatch=True)
            score = (2 * self._lcs(word, lower)
                     - abs(len(word) - len(lower))
                     + self._common_char_position_score(word, lower)
                     + self._common_prefix(word, lower)
                     + self._ngram(4, word, lower, any_mismatch=True)
                     + re_sc
                     + (-1000 if re_sc < (len(word) + len(lower)) * fact
                        else 0))
            ranked.append((-score, guess))
        ranked.sort()
        return [(g, -neg) for neg, g in ranked]

    def _most_relevant(self, ranked, prev: list[str]) -> list[str]:
        out: list[str] = []
        has_excellent = False
        check = self.d._check_simple
        for guess, score in ranked:
            if score > 1000:
                has_excellent = True
            elif has_excellent:
                break       # keep only excellent suggestions, if any
            bad = score < -100
            if bad and (out or self.d.only_max_diff):
                break
            if all(p not in guess for p in prev) \
                    and all(p not in guess for p in out) \
                    and check(guess, None, self._accepts) is True:
                out.append(guess)
                if len(out) > self.d.max_ngram_suggestions:
                    break
            if bad:
                break
        return out
