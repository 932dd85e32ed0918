"""User dictionaries for the Japanese and Korean tokenizers — the
kuromoji and nori UserDictionary roles.

Both references load a user-supplied text file into an FST consulted
BEFORE the system dictionary at every lattice position; a user match
suppresses system-dictionary lookups starting there and enters the
lattice with a massively negative word cost (-100000) so it always wins:

- kuromoji (analysis/ja/dict/UserDictionary.java): CSV lines
  ``surface,segmentation,readings,pos`` — the segmentation defines a
  custom split (日本経済新聞 → 日本 経済 新聞) emitted at backtrace
  (JapaneseTokenizer.java:1973-2000); every final prefix adds an arc
  (java:873-903); arcs carry LEFT_ID = RIGHT_ID = 5 and user tokens are
  exempt from SEARCH-mode decomposition (java:548, 1818). The number of
  segments must equal the number of readings, and the concatenated
  segmentation must equal the surface (java:110-132).
- nori (analysis/ko/dict/UserDictionary.java): whitespace lines
  ``token [seg1 seg2 ...]`` — segmented entries are NNG COMPOUNDs whose
  morphemes the decompound modes split; only the LONGEST user match at
  a position is added, and only when it reaches past every previous
  user match (KoreanTokenizer.java:745-780); the right id depends on
  whether the last hangul char carries a coda (3533/3534/3535 in
  mecab-ko-dic's id space — here mapped into the seeded lexicon's id
  space via the ``right_id``/``right_id_t``/``right_id_f`` knobs).

Comment lines (#...) and blank lines are skipped in both formats, as in
the reference test fixtures (ja/userdict.txt, ko/userdict.txt).
"""

from __future__ import annotations

from dataclasses import dataclass

JA_USER_WORD_COST = -100000     # ja/dict/UserDictionary.java:48
JA_USER_LEFT_ID = 5             # :50
JA_USER_RIGHT_ID = 5            # :52
KO_USER_WORD_COST = -100000     # ko/dict/UserDictionary.java:39


@dataclass(frozen=True)
class JaUserEntry:
    surface: str
    segments: tuple[str, ...]
    readings: tuple[str, ...]
    pos: str

    # duck-typed DictEntry fields so lattice arcs carry the entry
    @property
    def base_form(self) -> str:
        return ""

    @property
    def reading(self) -> str:
        return self.readings[0] if len(self.segments) == 1 else ""


class JaUserDictionary:
    """Parsed kuromoji user dictionary with prefix lookup."""

    def __init__(self, lines):
        if isinstance(lines, str):
            lines = lines.splitlines()
        self.entries: list[JaUserEntry] = []
        self._by_surface: dict[str, JaUserEntry] = {}
        self._max_len = 0
        for raw in lines:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            values = [v.strip() for v in line.split(",")]
            if len(values) < 4:
                raise ValueError(f"illegal user dictionary entry: {raw!r}")
            surface = "".join(values[0].split())
            segments = tuple(values[1].split())
            readings = tuple(values[2].split())
            pos = values[3]
            if len(segments) != len(readings):
                raise ValueError(
                    f"Illegal user dictionary entry {values[0]} - the "
                    f"number of segmentations ({len(segments)}) does not "
                    f"the match number of readings ({len(readings)})")
            if "".join(segments) != surface:
                raise ValueError(
                    f"Illegal user dictionary entry {values[0]} - the "
                    f"concatenated segmentation ({''.join(segments)}) "
                    f"does not match the surface form ({surface})")
            e = JaUserEntry(surface, segments, readings, pos)
            # first entry per surface wins (FST key uniqueness)
            if surface not in self._by_surface:
                self._by_surface[surface] = e
                self.entries.append(e)
                self._max_len = max(self._max_len, len(surface))

    def matches(self, text: str, pos: int):
        """All user surfaces starting at `pos` → (end, entry) — every
        final arc of the user FST walk (JapaneseTokenizer.java:873-903
        adds each one, unlike nori's longest-only)."""
        out = []
        limit = min(len(text), pos + self._max_len)
        for end in range(pos + 1, limit + 1):
            e = self._by_surface.get(text[pos:end])
            if e is not None:
                out.append((end, e))
        return out


def _hangul_has_coda(ch: str) -> bool:
    cp = ord(ch)
    return 0xAC00 <= cp <= 0xD7A3 and (cp - 0xAC00) % 28 != 0


def parse_ko_user_dict(lines, left_id: int = 10, right_id: int = 10,
                       right_id_t: int | None = None,
                       right_id_f: int | None = None) -> list:
    """Parse a nori user dictionary into KoDictEntry rows (NNG
    MORPHEMEs, or NNG COMPOUNDs with NNG morphemes for segmented
    entries) carrying WORD_COST = -100000. The id knobs map the
    reference's NNG-left/right trio (1781 / 3533 / 3534 / 3535,
    ko/dict/UserDictionary.java:41-48) into the caller's seeded-lexicon
    id space; the coda-aware split defaults to the plain right id.
    Duplicate tokens keep the first occurrence after the reference's
    sort-by-token ordering (java:82,95-97)."""
    from lucene_spark.analysis.ko import KoDictEntry

    if isinstance(lines, str):
        lines = lines.splitlines()
    cleaned = []
    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if line:
            cleaned.append(line)
    cleaned.sort(key=lambda ln: ln.split()[0])
    entries, seen = [], set()
    for line in cleaned:
        splits = line.split()
        token = splits[0]
        if token in seen:
            continue
        seen.add(token)
        last = line[-1]
        if 0xAC00 <= ord(last) <= 0xD7A3:
            rid = (right_id_t if _hangul_has_coda(last) else right_id_f)
            rid = right_id if rid is None else rid
        else:
            rid = right_id
        if len(splits) == 1:
            entries.append(KoDictEntry(token, left_id, rid,
                                       KO_USER_WORD_COST, pos="NNG"))
        else:
            total = sum(len(s) for s in splits[1:])
            if total > len(token):
                raise ValueError(
                    f"Illegal user dictionary entry {line} - the "
                    f"segmentation is bigger than the surface form "
                    f"({token})")
            morphemes = tuple(("NNG", s) for s in splits[1:])
            entries.append(KoDictEntry(
                token, left_id, rid, KO_USER_WORD_COST, pos="NNG",
                pos_type="COMPOUND", morphemes=morphemes))
    return entries


class KoUserDictionary:
    """Nori user dictionary: longest-match-only prefix lookup over
    parse_ko_user_dict entries."""

    def __init__(self, lines, **id_kwargs):
        self.entries = parse_ko_user_dict(lines, **id_kwargs)
        self._by_surface = {e.surface: e for e in self.entries}
        self._max_len = max((len(e.surface) for e in self.entries),
                            default=0)

    def longest_match(self, text: str, pos: int):
        """(end, entry) of the LONGEST user surface starting at `pos`,
        plus whether ANY match was found (KoreanTokenizer.java:745-770:
        anyMatches suppresses system lookups even when the arc is
        dropped by the userWordMaxPosAhead rule)."""
        best = None
        limit = min(len(text), pos + self._max_len)
        for end in range(pos + 1, limit + 1):
            e = self._by_surface.get(text[pos:end])
            if e is not None:
                best = (end, e)
        return best
