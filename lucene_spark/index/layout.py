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


def gc_derived(index_dir: str, manifest: dict) -> list[str]:
    """Remove derived generations older than current-1 (one-generation
    grace for pinned readers). The legacy plain dir counts as gen -1.
    Call AFTER the manifest swap. Returns the removed directory names."""
    removed: list[str] = []
    current = {n: derived_gen(manifest, n) for n in DERIVED_NAMES}
    for entry in os.listdir(index_dir):
        m = _GEN_RE.match(entry)
        if m:
            name, g = m.group(1), int(m.group(2))
        elif entry in DERIVED_NAMES:
            name, g = entry, -1
        else:
            continue
        if g < current.get(name, -1) - 1:
            shutil.rmtree(os.path.join(index_dir, entry), ignore_errors=True)
            removed.append(entry)
    return removed
