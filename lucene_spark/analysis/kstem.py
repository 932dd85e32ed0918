"""KStem — Bob Krovetz's dictionary-hybrid English stemmer (the
lucene/analysis/en KStemFilter role).

Algorithm: R. Krovetz, "Viewing morphology as an inference process"
(SIGIR'93): inflectional/derivational endings are removed or rewritten
step by step, each candidate checked against a ~28k-headword lexicon;
the first dictionary hit wins, and a small table of direct conflations
(irregulars, country→nationality) overrides everything. Semantics
follow KStemmer.java (en/KStemmer.java:846-1877): the ordered pipeline
plural → pastTense → aspect → ity → ness → ion → er/or → ly → al →
ive → ize → ment → ble → ism → ic → ncy → nce with the reference's
exact lookup placement (a failing lookup CLEARS the previous match —
matchedEntry is overwritten on every lookup, :920-936), its exception
semantics (exception entries never cache, :829-845), and its buffer
mutations. The dictionary data ships as data/kstem.npz extracted by
scripts/gen_kstem_data.py (provenance there); the reference's own
12,130-word golden vocabulary (kstemTestData.zip) is pinned at
0-mismatch in tests/test_kstem.py.

Words shorter than 3 chars, longer than 49, or containing non a-z
characters are returned unchanged (:1760-1781 — input must already be
lowercased, as the factory chains LowerCaseFilter first).
"""

from __future__ import annotations

import os

_MAX_WORD_LEN = 50
_VOWELS = frozenset("aeiou")


class _Entry:
    __slots__ = ("root", "exception")

    def __init__(self, root, exception):
        self.root = root
        self.exception = exception


_DICT: dict[str, _Entry] | None = None


def _dictionary() -> dict[str, _Entry]:
    global _DICT
    if _DICT is None:
        import numpy as np

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "kstem.npz")
        z = np.load(path, allow_pickle=False)
        d: dict[str, _Entry] = {}
        for w in z["exception_words"]:
            d[str(w)] = _Entry(str(w), True)
        for a, b in zip(z["direct_from"], z["direct_to"]):
            d[str(a)] = _Entry(str(b), False)
        for a, b in zip(z["country_from"], z["country_to"]):
            d[str(a)] = _Entry(str(b), False)
        default = _Entry(None, False)
        for key in ("headwords", "supplement", "proper"):
            for w in z[key]:
                d.setdefault(str(w), default)
        _DICT = d
    return _DICT


class KStemmer:
    """Single-word stemmer; not thread-safe (mirrors the reference's
    per-filter instance usage)."""

    def __init__(self):
        self._dict = _dictionary()
        self.w: list[str] = []   # the working buffer
        self.j = 0               # index of final letter in stem
        self.k = 0               # index of final letter in word
        self.matched: _Entry | None = None

    # ---- primitives ------------------------------------------------

    def _is_cons(self, i: int) -> bool:
        ch = self.w[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _vowel_in_stem(self) -> bool:
        return any(not self._is_cons(i) for i in range(self.j + 1))

    def _double_c(self, i: int) -> bool:
        return i >= 1 and self.w[i] == self.w[i - 1] and self._is_cons(i)

    def _ends(self, s: str) -> bool:
        """endsIn: sets j to the index before the suffix on a match;
        the multi-char-array variant leaves j=k on a miss (:786-797),
        the fixed-arity variants leave j untouched (:798-827) — both
        behaviors matter and both call sites are preserved."""
        n = len(s)
        if n > self.k:
            return False
        if "".join(self.w[len(self.w) - n:]) == s:
            self.j = len(self.w) - n - 1
            return True
        return False

    def _ends_arr(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        self.j = self.k
        if "".join(self.w[len(self.w) - len(s):]) == s:
            self.j = len(self.w) - len(s) - 1
            return True
        return False

    def _set_len(self, n: int) -> None:
        del self.w[n:]

    def _set_suffix(self, s: str) -> None:
        self._set_len(self.j + 1)
        self.w.extend(s)
        self.k = self.j + len(s)

    def _lookup(self) -> bool:
        self.matched = self._dict.get("".join(self.w))
        return self.matched is not None

    def _word_in_dict(self) -> _Entry | None:
        if self.matched is not None:
            return self.matched
        e = self._dict.get("".join(self.w))
        if e is not None and not e.exception:
            self.matched = e
        return e

    # ---- ending routines (KStemmer.java:846-1716) ------------------

    def _plural(self) -> None:
        w = self.w
        if w[self.k] != "s":
            return
        if self._ends("ies"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():          # calories -> calorie
                return
            self.k += 1
            self.w.append("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends("es"):
            self._set_len(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (w[self.j] == "s"
                                        and w[self.j - 1] == "s")
            if try_e and self._lookup():
                return
            self._set_len(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            self.w.append("e")          # default: retain the "e"
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if len(w) > 3 and w[self.k - 1] != "s" and not self._ends("ous"):
                self._set_len(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self) -> None:
        if len(self.w) <= 4:
            return
        if self._ends("ied"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():          # died -> die
                return
            self.k += 1
            self.w.append("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends("ed") and self._vowel_in_stem():
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry.exception:
                return
            self._set_len(self.j + 1)   # try removing the "ed"
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.w.append(self.w[self.k])
                self.k += 1
                self._lookup()
                return
            if self.w[0] == "u" and self.w[1] == "n":
                self.w.append("e")
                self.w.append("d")
                self.k += 2
                return                  # leave `un-' words alone
            self._set_len(self.j + 1)   # prefer the `e' ending
            self.w.append("e")
            self.k = self.j + 1
            return

    def _aspect(self) -> None:
        if len(self.w) <= 5:
            return
        if self._ends("ing") and self._vowel_in_stem():
            self.w[self.j + 1] = "e"
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry.exception:
                return
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                self._set_len(self.k + 1)
                if self._lookup():
                    return
                self.w.append(self.w[self.k])
                self.k += 1             # default: leave doubled
                self._lookup()
                return
            if self.j > 0 and self._is_cons(self.j) \
                    and self._is_cons(self.j - 1):
                self.k = self.j
                self._set_len(self.k + 1)
                return
            self._set_len(self.j + 1)
            self.w.append("e")          # microcoding -> microcode
            self.k = self.j + 1
            return

    def _ity(self) -> None:
        old_k = self.k
        if not self._ends("ity"):
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self.w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self.w[self.j + 1] = "i"
        self.w.extend("ty")
        self.k = old_k
        if self.j > 0 and self.w[self.j - 1] == "i" \
                and self.w[self.j] == "l":
            self._set_len(self.j - 1)
            self.w.extend("le")         # -ability/-ibility -> -ble
            self.k = self.j
            self._lookup()
            return
        if self.j > 0 and self.w[self.j - 1] == "i" \
                and self.w[self.j] == "v":
            self._set_len(self.j + 1)
            self.w.append("e")          # -ivity -> -ive
            self.k = self.j + 1
            self._lookup()
            return
        if self.j > 0 and self.w[self.j - 1] == "a" \
                and self.w[self.j] == "l":
            self._set_len(self.j + 1)   # -ality: just drop -ity
            self.k = self.j
            self._lookup()
            return
        if self._lookup():              # immunity -> immune (variant)
            return
        self._set_len(self.j + 1)       # default: remove -ity
        self.k = self.j

    def _ness(self) -> None:
        if self._ends("ness"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self.w[self.j] == "i":
                self.w[self.j] = "y"
            self._lookup()

    def _ism(self) -> None:
        if self._ends("ism"):
            self._set_len(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ment(self) -> None:
        old_k = self.k
        if self._ends("ment"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self.w.extend("ment")
            self.k = old_k

    def _ize(self) -> None:
        old_k = self.k
        if not self._ends("ize"):
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self.w.append("i")
        if self._double_c(self.j):
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self.w.append(self.w[self.j - 1])
        self._set_len(self.j + 1)
        self.w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("ize")
        self.k = old_k

    def _ncy(self) -> None:
        if self._ends("ncy"):
            if self.w[self.j] not in ("e", "a"):
                return
            self.w[self.j + 2] = "t"    # -ncy -> -nt
            self._set_len(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            self.w[self.j + 2] = "c"    # default -> -nce
            self.w.append("e")
            self.k = self.j + 3
            self._lookup()

    def _nce(self) -> None:
        old_k = self.k
        if self._ends("nce"):
            ch = self.w[self.j]
            if ch not in ("e", "a"):
                return
            self._set_len(self.j)
            self.w.append("e")          # adherance -> adhere
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)       # disappearance -> disappear
            self.k = self.j - 1
            if self._lookup():
                return
            self.w.append(ch)
            self.w.extend("nce")
            self.k = old_k

    def _ble(self) -> None:
        old_k = self.k
        if not self._ends("ble"):
            return
        if self.w[self.j] not in ("a", "i"):
            return
        ch = self.w[self.j]
        self._set_len(self.j)
        self.k = self.j - 1
        if self._lookup():
            return
        if self._double_c(self.k):
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            self.w.append(self.w[self.k - 1])
        self._set_len(self.j)
        self.w.append("e")
        self.k = self.j
        if self._lookup():
            return
        self._set_len(self.j)
        self.w.extend("ate")            # compensable -> compensate
        self.k = self.j + 2
        if self._lookup():
            return
        self._set_len(self.j)
        self.w.append(ch)
        self.w.extend("ble")
        self.k = old_k

    def _ic(self) -> None:
        if self._ends("ic"):
            self._set_len(self.j + 3)
            self.w.extend("al")         # canonic -> canonical
            self.k = self.j + 4
            if self._lookup():
                return
            self.w[self.j + 1] = "y"
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self.w[self.j + 1] = "e"
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self.w.extend("ic")
            self.k = self.j + 2

    def _ion(self) -> None:
        old_k = self.k
        if not self._ends("ion"):
            return
        if self._ends_arr("ization"):
            self._set_len(self.j + 3)
            self.w.append("e")          # -ization -> -ize, always
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_arr("ition"):
            self._set_len(self.j + 1)
            self.w.append("e")
            self.k = self.j + 1
            if self._lookup():          # definition -> define
                return
            self._set_len(self.j + 1)
            self.w.extend("ition")
            self.k = old_k
        elif self._ends_arr("ation"):
            self._set_len(self.j + 3)
            self.w.append("e")
            self.k = self.j + 3
            if self._lookup():          # elimination -> eliminate
                return
            self._set_len(self.j + 1)
            self.w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)   # resignation -> resign
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.w.extend("ation")
            self.k = old_k
        if self._ends_arr("ication"):
            self._set_len(self.j + 1)
            self.w.append("y")
            self.k = self.j + 1
            if self._lookup():          # amplification -> amplify
                return
            self._set_len(self.j + 1)
            self.w.extend("ication")
            self.k = old_k
        self.j = self.k - 3             # the plain -ion case
        self._set_len(self.j + 1)
        self.w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("ion")
        self.k = old_k

    def _er_or(self) -> None:
        # The reference's buffer here relies on OpenStringBuilder's
        # setLength exposing unerased chars after a shrink (e.g.
        # `word.setLength(j + 2)` regrows over the stale 'e' of "er",
        # KStemmer.java:1519-1521), so each probe is reconstructed
        # explicitly from the original ending instead of by in-place
        # truncation.
        old_k = self.k
        if self.w[self.k] != "r":
            return
        if self._ends("izer"):
            self._set_len(self.j + 4)   # -izer -> -ize, always
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends("er") or self._ends("or"):
            orig = "".join(self.w)
            j = self.j
            ch = orig[j + 1]
            if self._double_c(j):
                self.w = list(orig[:j])     # drop doubled C + "er"
                self.k = j - 1
                if self._lookup():
                    return
            if orig[j] == "i":              # -ier -> -y
                self.w = list(orig[:j] + "y")
                self.k = j
                if self._lookup():
                    return
            if orig[j] == "e":              # -eer -> drop "eer"
                self.w = list(orig[:j])
                self.k = j - 1
                if self._lookup():
                    return
            self.w = list(orig[:j + 2])     # remove the -r
            self.k = j + 1
            if self._lookup():
                return
            self.w = list(orig[:j + 1])     # remove -er/-or
            self.k = j
            if self._lookup():
                return
            self.w = list(orig[:j + 1] + "e")   # -or -> -e
            self.k = j + 1
            if self._lookup():
                return
            self.w = list(orig[:j + 1] + ch + "r")
            self.j = j
            self.k = old_k

    def _ly(self) -> None:
        old_k = self.k
        if not self._ends("ly"):
            return
        self.w[self.j + 2] = "e"        # -ly -> -le
        if self._lookup():
            return
        self.w[self.j + 2] = "y"
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        if self.j > 0 and self.w[self.j - 1] == "a" \
                and self.w[self.j] == "l":
            return                      # -ally -> -al, always
        self.w.extend("ly")
        self.k = old_k
        if self.j > 0 and self.w[self.j - 1] == "a" \
                and self.w[self.j] == "b":
            self.w[self.j + 2] = "e"    # -ably -> -able, always
            self.k = self.j + 2
            return
        if self.w[self.j] == "i":       # militarily -> military
            self._set_len(self.j)
            self.w.append("y")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self.w.extend("ily")
            self.k = old_k
        self._set_len(self.j + 1)       # default: remove -ly
        self.k = self.j

    def _al(self) -> None:
        old_k = self.k
        if len(self.w) < 4:
            return
        if not self._ends("al"):
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        if self._double_c(self.j):
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self.w.append(self.w[self.j - 1])
        self._set_len(self.j + 1)
        self.w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("um")             # optimal -> optimum
        self.k = self.j + 2
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("al")
        self.k = old_k
        if self.j > 0 and self.w[self.j - 1] == "i" \
                and self.w[self.j] == "c":
            self._set_len(self.j - 1)   # remove -ical
            self.k = self.j - 2
            if self._lookup():
                return
            self._set_len(self.j - 1)
            self.w.append("y")          # bibliographical -> -y
            self.k = self.j - 1
            if self._lookup():
                return
            self._set_len(self.j - 1)
            self.w.extend("ic")         # default: -ical -> -ic
            self.k = self.j
            self._lookup()
            return
        if self.w[self.j] == "i":       # -ial
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self.w.extend("ial")
            self.k = old_k
            self._lookup()

    def _ive(self) -> None:
        old_k = self.k
        if not self._ends("ive"):
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self.w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.w.extend("ive")
        if self.j > 0 and self.w[self.j - 1] == "a" \
                and self.w[self.j] == "t":
            self.w[self.j - 1] = "e"    # determinative -> determine
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self._set_len(self.j - 1)
            if self._lookup():
                return
            self.w.extend("ative")
            self.k = old_k
        self.w[self.j + 2] = "o"        # injunctive -> injunction
        self.w[self.j + 3] = "n"
        if self._lookup():
            return
        self.w[self.j + 2] = "v"
        self.w[self.j + 3] = "e"
        self.k = old_k

    # ---- driver ----------------------------------------------------

    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= _MAX_WORD_LEN - 1:
            return term
        entry = self._dict.get(term)
        if entry is not None:
            return entry.root if entry.root is not None else term
        if any(not ("a" <= c <= "z") for c in term):
            return term
        self.w = list(term)
        self.k = k
        self.matched = None
        pipeline = (self._plural, self._past_tense, self._aspect,
                    self._ity, self._ness, self._ion, self._er_or,
                    self._ly, self._al)
        done = False
        for step in pipeline:
            step()
            if self.matched is not None:
                done = True
                break
        if not done:
            self._word_in_dict()
            for step in (self._ive, self._ize, self._ment, self._ble,
                         self._ism, self._ic, self._ncy, self._nce):
                step()
                if self.matched is not None:
                    break
        if self.matched is not None and self.matched.root is not None:
            return self.matched.root
        return "".join(self.w)


_STEMMER: KStemmer | None = None


def kstem(word: str) -> str:
    """Stem one (already lowercased) word — the KStemFilter per-token
    operation."""
    global _STEMMER
    if _STEMMER is None:
        _STEMMER = KStemmer()
    return _STEMMER.stem(word)
