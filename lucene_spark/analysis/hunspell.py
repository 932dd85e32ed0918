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
        self.nosuggest = FLAG_UNSET
        self.substandard = FLAG_UNSET
        self.forceucase = FLAG_UNSET
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
            elif key == "FORBIDDENWORD" and len(parts) > 1:
                self.forbiddenword = self._one_flag(parts[1])
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
                out.append((stripped, entry))
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
            out.append((word, entry))
        self._walk(word, None, FLAG_UNSET, None, 0, True, False,
                   original_case, out)

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
        return [s for s, _ in self._roots(word)]

    # ---- spell checking (SpellChecker.java, non-compound path) -----

    def _first_root(self, word: str, original_case):
        out: list = []
        self._do_stem(word, original_case, out)
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
        case = _case_of(word)
        if case == "upper":
            title = _title_fold(word)
            if self._check_simple(title, "upper"):
                return True
            if self._check_simple(title.lower(), "upper"):
                return True
        elif case == "title":
            if self._check_simple(word.lower(), "title"):
                return True
        if (self.breaks_start or self.breaks_end or self.breaks_middle) \
                and not self._too_many_breaks(word):
            return self._try_breaks(word)
        return False

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
        """SpellChecker.suggest (java:436-481) minus the n-gram
        GeneratingSuggester (documented scope cut — the edit-based
        ModifyingSuggester, REP/MAP/KEY tables, split suggestions, and
        dash-chunk repair are all implemented)."""
        if len(word) >= 100:
            return []
        word = self._clean(word)
        case = _case_of(word)
        if self.forceucase is not FLAG_UNSET and case == "lower":
            title = _title_fold(word)
            if self.spell(title):
                return [title]
        modifier = _ModifyingSuggester(self)
        suggestions = modifier.suggest(word, case)
        if "-" in word and not any("-" in s for s in suggestions):
            suggestions += [s for s in self._modify_dash_chunks(word)
                            if s not in suggestions]
        out = []
        for cand in suggestions:
            adj = self._adjust_suggestion_case(cand, case, word)
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
                self._variations(_title_fold(low))
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
