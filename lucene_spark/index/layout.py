"""Versioned derived-directory layout — the segments_N role.

Lucene publishes a commit by writing an immutable file set and pointing
segments_N at it; readers pinned to an older segments_N keep their files
until IndexFileDeleter retires them. The derived artifacts here
(postings/, termdict/, docstats/, fieldstats/) get the same treatment:
each rebuild writes a NEW generation directory (`postings.g3`), the
manifest's `derived` map is swapped atomically (os.replace of
manifest.json), and old generations are garbage-collected with a
ONE-GENERATION grace so readers opened against the previous manifest
finish their scans. Legacy indexes (no `derived` map) resolve to the
plain directory names.
"""

from __future__ import annotations

import os
import re
import shutil

DERIVED_NAMES = ("postings", "termdict", "docstats", "fieldstats")

_GEN_RE = re.compile(r"^(postings|termdict|docstats|fieldstats)\.g(\d+)$")


def derived_path(index_dir: str, manifest: dict | None, name: str) -> str:
    """Resolve the CURRENT directory of a derived artifact."""
    d = (manifest or {}).get("derived") or {}
    return os.path.join(index_dir, d.get(name, name))


def derived_gen(manifest: dict | None, name: str) -> int:
    """Current generation of an artifact; -1 for the legacy plain dir."""
    d = (manifest or {}).get("derived") or {}
    m = _GEN_RE.match(d.get(name, name))
    return int(m.group(2)) if m else -1


def next_derived_name(manifest: dict | None, name: str) -> str:
    """Directory name for the NEXT generation of an artifact."""
    return f"{name}.g{derived_gen(manifest, name) + 1}"


def gc_derived(index_dir: str, manifest: dict,
               min_age_seconds: float = 300.0) -> list[str]:
    """Retire derived generations. Call AFTER the manifest swap (single
    writer at a time). Removes:
    - generations BELOW current-1 (one-generation grace), but only once
      older than `min_age_seconds` — streaming bumps termdict every
      micro-batch, so a pure generation-count grace would give pinned
      readers only one batch interval of wall-clock time to finish;
    - generations ABOVE current: under the single-writer rule those are
      leftovers of a crashed rebuild — or of a full re-build that reset
      the map to g0, in which case they WERE the previous manifest's
      current generation and a pinned reader may still be scanning them.
      They therefore get the same age grace as below-current gens
      (a crashed-rebuild orphan just waits one grace period longer).
    The legacy plain dir counts as gen -1. Returns removed names."""
    import time

    removed: list[str] = []
    now = time.time()
    current = {n: derived_gen(manifest, n) for n in DERIVED_NAMES}
    for entry in os.listdir(index_dir):
        m = _GEN_RE.match(entry)
        if m:
            name, g = m.group(1), int(m.group(2))
        elif entry in DERIVED_NAMES:
            name, g = entry, -1
        else:
            continue
        cur = current.get(name, -1)
        path = os.path.join(index_dir, entry)
        old_enough = True
        try:
            old_enough = (now - os.path.getmtime(path)) >= min_age_seconds
        except OSError:
            pass
        if (g < cur - 1 or g > cur) and old_enough:
            shutil.rmtree(path, ignore_errors=True)
            removed.append(entry)
    return removed
