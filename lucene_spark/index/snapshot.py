"""Index snapshots — hot backup of a committed point-in-time view.

Role analogue: lucene/core index/SnapshotDeletionPolicy.java (pin a
commit so its files survive while a backup copies them) + Solr's
ReplicationHandler backup command (solr/core/src/java/org/apache/solr/
handler/ReplicationHandler.java — copy the pinned commit's file set to
a backup location).

This engine's commit is `manifest.json` (the segments_N analogue) and
its file set is: `raw/` (the source-of-truth segment groups), `parts/`
(lineage manifests) and the CURRENT generation of each derived
artifact (the `derived` map).  Because generations are immutable and
the manifest swap is atomic, snapshotting = read the manifest once,
then copy exactly the files it references — precisely the reference's
pinned-commit contract; a concurrent writer can keep compacting (old
generations enjoy the one-generation + age grace, and `raw/` group
swaps are two-phase), though like the reference a snapshot taken MID
raw-group retirement should simply be retried.

Scale note: the copies here are local shutil trees; at cluster scale
the same manifest-driven file list feeds a distributed copy (distcp /
object-store copy) — the logic that decides WHAT to copy is the part
this module owns.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from lucene_spark.index.layout import DERIVED_NAMES, derived_path

__all__ = ["snapshot_index"]


def snapshot_index(index_dir: str, dest_dir: str,
                   overwrite: bool = False) -> dict:
    """Copy the current commit of `index_dir` to `dest_dir`.  The
    result is a fully functional, independent index (same manifest,
    generation names normalized to the copied set).  Returns
    {"files": n, "doc_count": n, "seconds": s}."""
    t0 = time.time()
    src_manifest = os.path.join(index_dir, "manifest.json")
    with open(src_manifest) as fh:
        manifest = json.load(fh)
    if os.path.exists(dest_dir):
        if not overwrite:
            raise FileExistsError(f"{dest_dir} already exists")
        shutil.rmtree(dest_dir)
    os.makedirs(dest_dir)

    n_files = 0

    def _copy(rel_src: str, rel_dst: str | None = None) -> None:
        nonlocal n_files
        s = os.path.join(index_dir, rel_src)
        d = os.path.join(dest_dir, rel_dst or rel_src)
        if os.path.isdir(s):
            shutil.copytree(s, d)
            n_files += sum(len(fs) for _, _, fs in os.walk(d))
        elif os.path.exists(s):
            shutil.copy2(s, d)
            n_files += 1

    _copy("raw")
    _copy("parts")
    for name in DERIVED_NAMES:
        cur = os.path.basename(derived_path(index_dir, manifest, name))
        _copy(cur)
    # doc-values update generations and the bloom sidecar ride along
    for entry in os.listdir(index_dir):
        if entry.startswith("dv_updates") or entry.startswith("term_bloom"):
            _copy(entry)
    with open(os.path.join(dest_dir, "manifest.json"), "w") as fh:
        json.dump({**manifest, "snapshot_of": os.path.abspath(index_dir),
                   "snapshot_at": time.time()}, fh, indent=2)
    n_files += 1
    return {"files": n_files, "doc_count": int(manifest["doc_count"]),
            "seconds": round(time.time() - t0, 3)}
