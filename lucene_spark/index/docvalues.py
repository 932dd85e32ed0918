"""Numeric doc-values updates — IndexWriter.updateNumericDocValue restated.

Role analogue: `lucene/core/src/java/org/apache/lucene/index/
IndexWriter.java` updateNumericDocValue / updateBinaryDocValue and the
per-segment docValues *update generation* files
(`index/ReadersAndUpdates.java`, `BufferedUpdatesStream.java`): a field's
value can be rewritten per document WITHOUT reindexing the document.
Lucene stacks gen-N sidecar files over the original .dvd; readers resolve
newest-gen-wins; segment merges fold the stack back into a single file.

Spark shape: the index directory grows a `dv_updates/` sidecar of
parquet rows partitioned by (field, gen):

    dv_updates/field=<name>/gen=<G>/part-*.parquet   (doc_id, value)

- Writes are APPEND-ONLY (a new gen dir per update batch) — no rewrite
  of any committed artifact, safe to take while readers are live, and at
  100 TB each update batch is one small parquet write, never a scan of
  the base.
- Reads resolve newest-gen-wins with one `max_by(value, gen)` aggregate
  over the (tiny, doc-sparse) update stack, then overlay the base column
  by a left join + coalesce. The update frame is broadcast when small —
  the common case: updates touch a sliver of a 100 TB corpus.
- doc_ids are stable across compaction (groups move verbatim), so the
  sidecar survives merges untouched; `fold_doc_values` is the explicit
  merge-folds-the-stack step when the stack grows deep.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

_DV_DIR = "dv_updates"


def _field_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, _DV_DIR, f"field={field}")


def _gens(index_dir: str, field: str) -> list[int]:
    d = _field_dir(index_dir, field)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(e.split("=", 1)[1]) for e in os.listdir(d) if e.startswith("gen=")
    )


def update_doc_values(
    spark: SparkSession, index_dir: str, field: str, updates: DataFrame,
    num_files: int = 1,
) -> int:
    """Apply one batch of numeric doc-values updates: `updates` is a
    (doc_id, value) frame; returns the generation number committed.
    Later generations win over earlier ones and over the base column —
    updateNumericDocValue semantics (last update for a doc wins).

    num_files: output files for the generation. The default 1 matches
    the intended small-update path (one gen file ≈ Lucene's .dvd update
    gen); BULK updates should pass partitions (e.g. cfg.partitions) so
    the write isn't serialized through one task — or better, rebuild the
    column via fold_doc_values at the next compaction."""
    cols = updates.columns
    if "doc_id" not in cols:
        raise ValueError("updates must carry a doc_id column")
    others = [c for c in cols if c != "doc_id"]
    # unambiguous value selection: a column literally named `value`, or a
    # two-column frame — never "whatever column happens to come first"
    if "value" in others:
        val_col = "value"
    elif len(others) == 1:
        val_col = others[0]
    else:
        raise ValueError(
            f"ambiguous updates frame (columns {cols}): name the value "
            "column 'value' or pass exactly (doc_id, <value>)")
    gen = (_gens(index_dir, field) or [0])[-1] + 1
    out = os.path.join(_field_dir(index_dir, field), f"gen={gen}")
    (
        updates.select(
            F.col("doc_id").cast("long"),
            F.col(val_col).cast("double").alias("value"))
        # repartition, not coalesce: coalesce can only REDUCE partition
        # count (a 1-partition bulk frame would still serialize through
        # one task) and collapses upstream compute into the same tasks
        .repartition(max(1, int(num_files)))
        .write.mode("errorifexists").parquet(out)
    )
    return gen


def _update_stack(reader, field: str) -> DataFrame | None:
    """Newest-gen-wins resolution of the update sidecar: one row per
    updated doc_id. None when the field has no updates."""
    d = _field_dir(reader.index_dir, field)
    if not _gens(reader.index_dir, field):
        return None
    stack = reader.spark.read.option("basePath", d).parquet(d)
    # newest gen wins; a gen TIE (duplicate doc_id inside one update
    # batch — a DataFrame has no row order to make "last call" win, so
    # Lucene's last-call-wins has no analogue) resolves deterministically
    # to the largest value instead of max_by's arbitrary pick
    return stack.groupBy("doc_id").agg(
        F.max_by("value", F.struct("gen", "value")).alias("__dv_new"))


def doc_values(reader, field: str, base: DataFrame | None = None,
               broadcast_updates: bool = True) -> DataFrame:
    """Point-in-time numeric doc values for `field`: (doc_id, value).

    Base values come from the docstats carry column of the same name when
    one exists (FeatureField written at index time), else from `base`
    (doc_id, <field>), else null — exactly a field that only ever
    received updates. The update stack overlays newest-gen-wins.

    broadcast_updates: the resolved stack is broadcast by default (update
    sets are normally small and the overlay join stays shuffle-free);
    pass False when updates have touched a large fraction of the corpus
    — a forced broadcast of hundreds of millions of rows would exceed
    the broadcast limit and fail the read path. fold_doc_values()
    shrinks the stack back to one snapshot either way.
    """
    if base is None:
        ds = reader.docstats()
        if field in ds.columns:
            base = ds.select("doc_id", F.col(field).cast("double").alias("__dv_base"))
        else:
            base = ds.select("doc_id").withColumn(
                "__dv_base", F.lit(None).cast("double"))
    else:
        if field not in base.columns:
            raise ValueError(f"base frame lacks column {field!r}")
        base = base.select("doc_id", F.col(field).cast("double").alias("__dv_base"))
    stack = _update_stack(reader, field)
    if stack is None:
        return base.select("doc_id", F.col("__dv_base").alias("value"))
    if broadcast_updates:
        stack = F.broadcast(stack)
    return (
        base.join(stack, "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("__dv_new"), F.col("__dv_base")).alias("value"))
    )


def fold_doc_values(spark: SparkSession, index_dir: str, field: str) -> int:
    """Merge the gen stack to a single gen-1 snapshot — the role of
    Lucene's segment merge folding dv update files into the merged
    segment's single .dvd. Returns the number of gens folded away.
    Readers opened after the fold see identical values; the fold is
    crash-safe (new snapshot committed under a temp name, swap, then
    retire the old gens)."""
    gens = _gens(index_dir, field)
    if len(gens) <= 1:
        return 0
    d = _field_dir(index_dir, field)
    # the temp snapshot is UNDERSCORE-prefixed: Spark's partition
    # discovery ignores _-paths, so a crash that leaves it behind (or a
    # live reader listing d mid-fold) never sees a conflicting directory;
    # clear any such leftover BEFORE reading the stack
    tmp = os.path.join(d, "_gen_folding.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    resolved = (
        spark.read.option("basePath", d).parquet(d)
        # same tie rule as _update_stack (gen tie → largest value): a
        # fold must never change the values a reader resolves
        .groupBy("doc_id").agg(
            F.max_by("value", F.struct("gen", "value")).alias("value"))
    )
    resolved.select("doc_id", "value").coalesce(1).write.parquet(tmp)
    # commit: fold target becomes gen=<max+1>; old gens retire after —
    # a crash mid-retire still resolves correctly (the fold gen is
    # newest, so max_by over the union equals the folded values)
    new_gen = gens[-1] + 1
    os.replace(tmp, os.path.join(d, f"gen={new_gen}"))
    for g in gens:
        shutil.rmtree(os.path.join(d, f"gen={g}"), ignore_errors=True)
    return len(gens)
