"""Stempel Polish stemmer — the Egothor trie stemmer behind Lucene's
PolishAnalyzer (analysis/stempel/src/java/org/apache/lucene/analysis/pl/
PolishAnalyzer.java: StandardTokenizer → LowerCase → Stop → StempelFilter).

Runtime re-implementation of the published Egothor algorithm against the
reference's trained table (extracted by scripts/gen_stempel_table.py —
DATA of the published model, provenance there):

- Trie.getLastOnPath  (egothor/stemmer/Trie.java:269-291): walk the row
  matrix along the key (forward or reversed per the trie's flag),
  remembering the last patch command seen; the final char reads its cell
  command directly.
- MultiTrie2.getLastOnPath (egothor/stemmer/MultiTrie2.java:139-173):
  concatenate the per-trie commands with the cannotFollow guard
  (:286-293), the '-'-triggered key skipping by lengthPP (:295-330), and
  the IndexOutOfBounds-ends-the-loop contract (the empty-key probe).
- Diff.apply          (egothor/stemmer/Diff.java:103-148): the 2-char
  patch opcodes ('-' seek, 'R' replace, 'D' delete, 'I' insert) applied
  right-to-left with the same silent out-of-bounds abort.
- StempelStemmer.stem (StempelStemmer.java:79-94): null command or empty
  result → no stem; StempelFilter (StempelFilter.java:67-78): only words
  LONGER than min_length (3) are stemmed, failures pass through.
"""

from __future__ import annotations

import os

import numpy as np

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "data", "stempel_pl.npz")
_EOM = "*"


class _Trie:
    __slots__ = ("forward", "root", "cmds", "row_off", "chars", "cmd",
                 "ref", "skip")

    def __init__(self, forward, root, cmds, row_off, chars, cmd, ref, skip):
        self.forward = forward
        self.root = root
        self.cmds = cmds
        self.row_off = row_off
        self.chars = chars
        self.cmd = cmd
        self.ref = ref
        self.skip = skip

    def _cell(self, row: int, ch: int) -> int:
        """Index of (row, ch) cell in the flat arrays, or -1. Cells are
        stored in TreeMap (sorted-char) order per row → binary search."""
        lo, hi = self.row_off[row], self.row_off[row + 1]
        i = lo + int(np.searchsorted(self.chars[lo:hi], ch))
        return i if i < hi and self.chars[i] == ch else -1

    def get_last_on_path(self, key: str) -> str | None:
        # Trie.java:269-291
        n_rows = len(self.row_off) - 1
        row = self.root
        if not (0 <= row < n_rows) or not key:
            return None
        seq = key if self.forward else key[::-1]
        last = None
        for i in range(len(key) - 1):
            ch = ord(seq[i])
            c = self._cell(row, ch)
            if c >= 0 and self.cmd[c] >= 0:
                last = self.cmds[self.cmd[c]]
            ref = self.ref[c] if c >= 0 else -1
            if 0 <= ref < n_rows:
                row = ref
            else:
                return last
        c = self._cell(row, ord(seq[len(key) - 1]))
        if c >= 0 and self.cmd[c] >= 0:
            return self.cmds[self.cmd[c]]
        return last


class StempelStemmer:
    def __init__(self, path: str = _DATA):
        z = np.load(path, allow_pickle=True)
        fw, by, n = (int(x) for x in z["meta"])
        self.forward = bool(fw)
        self.tries = []
        for i in range(n):
            tfw, root = (int(x) for x in z[f"t{i}_meta"])
            self.tries.append(_Trie(
                bool(tfw), root, [str(s) for s in z[f"t{i}_cmds"]],
                z[f"t{i}_row_off"], z[f"t{i}_chars"], z[f"t{i}_cmd"],
                z[f"t{i}_ref"], z[f"t{i}_skip"]))

    # -- MultiTrie2.getLastOnPath (java:139-173) -------------------------
    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in "-D" and after == goes

    def _skip(self, s: str, count: int) -> str:
        return s[count:] if self.forward else s[:len(s) - count]

    @staticmethod
    def _length_pp(cmd: str) -> int:
        ln, i = 0, 0
        while i < len(cmd):
            c = cmd[i]
            i += 1
            if c in "-D":
                ln += ord(cmd[i]) - ord("a") + 1
            elif c == "R":
                ln += 1
            # 'I' adds nothing
            i += 1
        return ln

    def get_last_on_path(self, key: str) -> str | None:
        result = []
        lastkey = key
        lastch = " "
        prev = None
        try:
            for t in self.tries:
                r = t.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == _EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, r[0]):
                    return "".join(result)
                lastch = r[-2]          # IndexError on len<2 ends loop
                if r[0] == "-":
                    if prev is not None:
                        key = self._skip(key, self._length_pp(prev))
                    key = self._skip(key, self._length_pp(r))
                prev = r
                result.append(r)
                if len(key) != 0:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result)

    # -- Diff.apply (java:103-148) ---------------------------------------
    @staticmethod
    def apply_patch(dest: str, diff: str) -> str:
        if not diff or not dest:
            return dest
        buf = list(dest)
        pos = len(buf) - 1
        try:
            for i in range(len(diff) // 2):
                cmd, param = diff[2 * i], diff[2 * i + 1]
                par_num = ord(param) - ord("a") + 1
                if cmd == "-":
                    pos = pos - par_num + 1
                elif cmd == "R":
                    if not (0 <= pos < len(buf)):
                        raise IndexError
                    buf[pos] = param
                elif cmd == "D":
                    o = pos
                    pos -= par_num - 1
                    if not (0 <= pos <= o + 1 <= len(buf)):
                        raise IndexError
                    del buf[pos:o + 1]
                elif cmd == "I":
                    pos += 1
                    if not (0 <= pos <= len(buf)):
                        raise IndexError
                    buf.insert(pos, param)
                pos -= 1
        except IndexError:
            pass     # Diff.apply swallows out-of-bounds (java:143-147)
        return "".join(buf)

    def stem(self, word: str) -> str | None:
        """StempelStemmer.stem: None when no stem can be generated."""
        cmd = self.get_last_on_path(word)
        if not cmd:
            return None
        out = self.apply_patch(word, cmd)
        return out if out else None


_SINGLETON: StempelStemmer | None = None


def stempel_stem(word: str, min_length: int = 3) -> str:
    """StempelFilter semantics (StempelFilter.java:67-78): words longer
    than min_length are stemmed; null stems pass the word through."""
    global _SINGLETON
    if len(word) <= min_length:
        return word
    if _SINGLETON is None:
        _SINGLETON = StempelStemmer()
    out = _SINGLETON.stem(word)
    return out if out is not None else word
