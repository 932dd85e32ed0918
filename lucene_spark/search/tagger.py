"""Dictionary text tagging — the Solr Tagger role
(solr/core/src/java/org/apache/solr/handler/tagger/TaggerRequestHandler.java
:1-386 and the SolrTextTagger it absorbed).

Semantics mapping:
- dictionary: a set of (entity, name) pairs; names analyze into token
  sequences. The reference drives matching from the indexed field's FST
  (TermPrefixCursor.java walks term prefixes); here the analyzed name
  sequences build a token TRIE broadcast to every task — the same
  in-RAM-dictionary bound the reference has (its FST lives on the
  searcher heap), guarded by `max_dict_entries`.
- matching: from every token position, walk the trie as far as tokens
  match; every terminal node passed emits a tag spanning those tokens
  with CHARACTER offsets (Tagger.java's advancing tag linked-list).
- overlap policy (TagClusterReducer.java:32-102): ALL keeps everything;
  NO_SUB removes tags contained in an earlier-starting tag (and the
  shorter of two equal-start tags — :38-56); LONGEST_DOMINANT_RIGHT
  repeatedly marks the longest (rightmost on ties — the forward scan
  with `>=` at :69-72) and removes unmarked overlappers (:73-86).

Scale shape: the corpus is tagged in ONE mapInPandas pass — no shuffle,
no join; the dictionary trie rides the closure (PySpark broadcasts
>1 MB pickled commands automatically). Tokenization is offset-aware
regex (the handler requires an analyzer whose terms align to input
offsets; posInc>1 gaps behave as stop positions, same as the reference's
TaggingAttribute contract).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_POLICIES = ("ALL", "NO_SUB", "LONGEST_DOMINANT_RIGHT")


def build_trie(pairs, token_pattern: str = r"\w+", lowercase: bool = True):
    """(entity, name) pairs → token trie {tok: subtrie, None: [entities]}."""
    rx = re.compile(token_pattern)
    root: dict = {}
    for entity, name in pairs:
        toks = rx.findall(name.lower() if lowercase else name)
        if not toks:
            continue
        node = root
        for t in toks:
            node = node.setdefault(t, {})
        node.setdefault(None, []).append(entity)
    return root


def _reduce_no_sub(tags: list) -> list:
    # TagClusterReducer.NO_SUB (java:38-56); tags sorted by (start, end)
    out = list(tags)
    removed = set()
    for i, tag in enumerate(out):
        for j in range(i - 1, -1, -1):
            if j in removed:
                continue
            prev = out[j]
            if prev[1] >= tag[1]:          # prev covers tag's end
                removed.add(i)
                break
            if prev[0] == tag[0]:          # equal start: drop shorter prev
                removed.add(j)
    return [t for i, t in enumerate(out) if i not in removed]


def _reduce_ldr(tags: list) -> list:
    # TagClusterReducer.LONGEST_DOMINANT_RIGHT (java:59-102)
    alive = list(tags)
    marked: list = []
    while True:
        longest = None
        for t in alive:
            if t in marked:
                continue
            if longest is None or (t[1] - t[0]) >= (longest[1] - longest[0]):
                longest = t
        if longest is None:
            break
        marked.append(longest)
        alive = [t for t in alive
                 if t in marked or not (t[0] < longest[1] and longest[0] < t[1])]
    return sorted(marked)


def tag_text(text: str, trie: dict, rx: re.Pattern,
             lowercase: bool, overlaps: str) -> list[tuple]:
    """All dictionary tags in one text → [(start, end, substring,
    entity)], offsets in characters, reduced per the overlap policy.
    Tokenization runs on the ORIGINAL text (offsets must index it);
    only each token's trie key is case-folded — str.lower() can change
    string length (e.g. İ → i̇), which would shift every later offset."""
    toks = [(m.group(0).lower() if lowercase else m.group(0),
             m.start(), m.end()) for m in rx.finditer(text)]
    raw: list[tuple] = []       # (start_char, end_char, entities)
    for i in range(len(toks)):
        node = trie
        for j in range(i, len(toks)):
            node = node.get(toks[j][0])
            if node is None:
                break
            ents = node.get(None)
            if ents:
                raw.append((toks[i][1], toks[j][2], tuple(ents)))
    raw.sort(key=lambda t: (t[0], t[1]))
    if overlaps == "NO_SUB":
        raw = _reduce_no_sub(raw)
    elif overlaps == "LONGEST_DOMINANT_RIGHT":
        raw = _reduce_ldr(raw)
    out = []
    for start, end, ents in raw:
        for e in ents:
            out.append((start, end, text[start:end], e))
    return out


def tag_documents(docs: DataFrame, text_col: str, key_col: str,
                  dictionary, token_pattern: str = r"\w+",
                  lowercase: bool = True,
                  overlaps: str = "LONGEST_DOMINANT_RIGHT",
                  max_dict_entries: int = 1_000_000) -> DataFrame:
    """Tag every document against the dictionary. `dictionary` is a
    DataFrame(entity string, name string) or an iterable of (entity,
    name) pairs. Returns (key, start, end, matched, entity) — one row
    per emitted tag per entity sharing the matched name."""
    if overlaps not in _POLICIES:
        raise ValueError(f"overlaps must be one of {_POLICIES}")
    if isinstance(dictionary, DataFrame):
        cnt = dictionary.count()
        if cnt > max_dict_entries:
            raise ValueError(
                f"dictionary has {cnt} entries > max_dict_entries="
                f"{max_dict_entries}; the trie must fit the task heap "
                "(the reference's FST-on-searcher-heap bound)")
        pairs = [(r[0], r[1]) for r in dictionary.collect()]
    else:
        pairs = list(dictionary)
    trie = build_trie(pairs, token_pattern, lowercase)
    pat = token_pattern
    low = lowercase
    pol = overlaps

    def run(batches):
        rx = re.compile(pat)
        for pdf in batches:
            keys, starts, ends, matched, ents = [], [], [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                for s, e, m, ent in tag_text(text or "", trie, rx, low, pol):
                    keys.append(key)
                    starts.append(s)
                    ends.append(e)
                    matched.append(m)
                    ents.append(ent)
            yield pd.DataFrame({"key": keys, "start": starts, "end": ends,
                                "matched": matched, "entity": ents})

    key_type = docs.schema[key_col].dataType.simpleString()
    schema = (f"key {key_type}, start int, end int, "
              "matched string, entity string")
    return (docs.select(F.col(key_col), F.col(text_col))
            .mapInPandas(run, schema))
