"""Extract the stempel Polish stemmer table from the reference repo into
a compact npz the runtime loads.

Provenance: /root/reference/lucene/analysis/stempel/src/resources/org/
apache/lucene/analysis/pl/stemmer_20000.tbl — the Egothor project's
trained Polish stemming table shipped with Apache Lucene (Apache-2.0;
DATA of the published Egothor stemmer, same adjudicated category as the
Snowball Among tables / RSLP rules this repo already extracts by
script). The binary layout is java.io.DataInput as read by
Trie.java:84-95, Row.java:76-86, MultiTrie.java:83-90 and dispatched by
StempelStemmer.load (StempelStemmer.java:58-72: header readUTF with 'M'
→ MultiTrie2). Rerun: python scripts/gen_stempel_table.py
"""

from __future__ import annotations

import os
import struct

import numpy as np

SRC = ("/root/reference/lucene/analysis/stempel/src/resources/org/apache/"
       "lucene/analysis/pl/stemmer_20000.tbl")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "lucene_spark", "analysis", "data", "stempel_pl.npz")


class R:
    def __init__(self, buf: bytes):
        self.b = buf
        self.i = 0

    def boolean(self) -> bool:
        v = self.b[self.i] != 0
        self.i += 1
        return v

    def int32(self) -> int:
        v = struct.unpack_from(">i", self.b, self.i)[0]
        self.i += 4
        return v

    def char(self) -> int:
        v = struct.unpack_from(">H", self.b, self.i)[0]
        self.i += 2
        return v

    def utf(self) -> str:
        n = struct.unpack_from(">H", self.b, self.i)[0]
        self.i += 2
        raw = self.b[self.i:self.i + n]
        self.i += n
        # modified UTF-8: 0xC0 0x80 encodes NUL; surrogates 3-byte each
        return raw.replace(b"\xc0\x80", b"\x00").decode(
            "utf-8", errors="surrogatepass")


def read_trie(r: R) -> dict:
    forward = r.boolean()
    root = r.int32()
    cmds = [r.utf() for _ in range(r.int32())]
    n_rows = r.int32()
    row_off = [0]
    chars, cmd, ref, skip = [], [], [], []
    for _ in range(n_rows):
        n_cells = r.int32()
        for _ in range(n_cells):
            chars.append(r.char())
            cmd.append(r.int32())
            r.int32()                 # cnt — unused for lookup
            ref.append(r.int32())
            skip.append(r.int32())
        row_off.append(len(chars))
    return {
        "forward": forward, "root": root, "cmds": cmds,
        "row_off": np.asarray(row_off, dtype=np.int64),
        "chars": np.asarray(chars, dtype=np.uint32),
        "cmd": np.asarray(cmd, dtype=np.int32),
        "ref": np.asarray(ref, dtype=np.int32),
        "skip": np.asarray(skip, dtype=np.int32),
    }


def main() -> None:
    with open(SRC, "rb") as f:
        r = R(f.read())
    method = r.utf().upper()
    assert "M" in method, f"expected MultiTrie2 table, got header {method!r}"
    forward = r.boolean()
    by = r.int32()
    tries = [read_trie(r) for _ in range(r.int32())]
    assert r.i == len(r.b), f"trailing bytes: {len(r.b) - r.i}"
    out = {"meta": np.asarray([int(forward), by, len(tries)], dtype=np.int64)}
    for i, t in enumerate(tries):
        out[f"t{i}_meta"] = np.asarray(
            [int(t["forward"]), t["root"]], dtype=np.int64)
        out[f"t{i}_cmds"] = np.asarray(t["cmds"], dtype=object)
        for k in ("row_off", "chars", "cmd", "ref", "skip"):
            out[f"t{i}_{k}"] = t[k]
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    np.savez_compressed(DST, **out)
    print(f"{len(tries)} tries, {sum(t['chars'].size for t in tries)} cells "
          f"→ {DST} ({os.path.getsize(DST)} bytes)")


if __name__ == "__main__":
    main()
