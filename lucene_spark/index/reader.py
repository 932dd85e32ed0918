"""Point-in-time index view — the IndexReader analogue.

Role analogue: index/DirectoryReader.java + search/IndexSearcher.java's
leafContexts: a composite, immutable view over the committed index
(manifest.json = segments_N). Stats lookups (CollectionStatistics /
TermStatistics — search/CollectionStatistics.java:51-55,
TermStatistics.java:54-56) are tiny driver-side collects against the
sorted term dictionary; the postings scan is always bucket-pruned
(partition pruning on the term-hash bucket) plus Parquet row-group
pruning on the sorted `term` column.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        cfg = self.manifest["config"]
        self.analyzer_name: str = cfg["analyzer"]
        self.key_cols: list[str] = cfg["key_cols"]
        self.carry_cols: list[str] = cfg.get("carry_cols", [])
        self.num_buckets: int = cfg["num_buckets"]
        self.has_positions: bool = bool(cfg.get("index_positions", False))
        self.layout: int = int(self.manifest.get("layout", 1))
        self.doc_count: int = int(self.manifest["doc_count"])
        self.sum_doclen: int = int(self.manifest["sum_doclen"])

    # ---- DataFrames ------------------------------------------------------
    def _raw(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "raw"))

    def postings(self) -> DataFrame:
        if self.layout >= 2:
            # raw/ has no bucket column (it only exists in the derived
            # postings/ dir) — compute it on the fly, matching the build-
            # time pmod(xxhash64(term), num_buckets) exactly
            cols = ["term", "part_id", "slice", "local_df", "local_cf",
                    "doc_blob", "tf_blob", "dl_blob", "pos_blob",
                    "block_last", "block_max_tf", "block_min_dl"]
            return (
                self._raw().filter(F.col("kind") == "posting").select(*cols)
                .withColumn("bucket", F.pmod(F.xxhash64("term"),
                                             F.lit(self.num_buckets)).cast("int"))
            )
        return self.spark.read.parquet(os.path.join(self.index_dir, "postings"))

    def termdict(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "termdict"))

    def docstats(self) -> DataFrame:
        if self.layout >= 2:
            cols = [*self.key_cols, *self.carry_cols, "doc_id", "doclen", "sha256"]
            return self._raw().filter(F.col("kind") == "docstat").select(*cols)
        return self.spark.read.parquet(os.path.join(self.index_dir, "docstats"))

    def fieldstats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, "fieldstats"))

    # ---- stats lookups (driver-side, small) ------------------------------
    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term -> (df, cf); missing terms are absent from the result.
        Results are memoized for the reader's lifetime (the index snapshot
        is immutable — Lucene TermStates caching per reader), so repeated
        queries over hot terms cost zero driver round-trips."""
        if not terms:
            return {}
        if not hasattr(self, "_stats_cache"):
            self._stats_cache: dict[str, tuple[int, int] | None] = {}
        todo = [t for t in set(terms) if t not in self._stats_cache]
        if todo:
            rows = (
                self.termdict()
                .filter(F.col("term").isin(todo))
                .select("term", "df", "cf")
                .collect()
            )
            found = {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}
            for t in todo:
                self._stats_cache[t] = found.get(t)
        return {t: self._stats_cache[t] for t in terms
                if self._stats_cache.get(t) is not None}

    def expand_prefix(self, prefix: str, max_terms: int = 1024) -> list[str]:
        """Sorted-dict prefix scan (the FST prefix→block role —
        BlockTreeTermsWriter.java:204-210); Parquet min/max row-group stats
        prune the scan because termdict is written term-sorted."""
        rows = (
            self.termdict()
            .filter(F.col("term").startswith(prefix))
            .select("term").orderBy("term").limit(max_terms).collect()
        )
        return [r["term"] for r in rows]

    def expand_regexp(self, pattern: str, max_terms: int = 1024) -> list[str]:
        rows = (
            self.termdict()
            .filter(F.col("term").rlike(f"^(?:{pattern})$"))
            .select("term").orderBy("term").limit(max_terms).collect()
        )
        return [r["term"] for r in rows]

    def expand_fuzzy(self, term: str, max_edits: int = 2, max_terms: int = 50) -> list[str]:
        """FuzzyQuery expansion: Levenshtein ≤ max_edits over the dictionary
        (search/FuzzyQuery.java). Uses Spark's levenshtein with a cheap
        length pre-filter; top terms by df like TopTermsRewrite."""
        tlen = len(term)
        rows = (
            self.termdict()
            .filter(F.length("term").between(tlen - max_edits, tlen + max_edits))
            .withColumn("ed", F.levenshtein(F.col("term"), F.lit(term)))
            .filter(F.col("ed") <= max_edits)
            .orderBy(F.col("df").desc(), "term")
            .limit(max_terms)
            .collect()
        )
        return [r["term"] for r in rows]

    def expand_range(
        self, lower: str | None, upper: str | None,
        include_lower: bool = True, include_upper: bool = True,
        max_terms: int = 1024,
    ) -> list[str]:
        td = self.termdict()
        c = F.col("term")
        if lower is not None:
            td = td.filter(c >= lower if include_lower else c > lower)
        if upper is not None:
            td = td.filter(c <= upper if include_upper else c < upper)
        return [r["term"] for r in td.select("term").orderBy("term").limit(max_terms).collect()]

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Bucket-pruned postings scan for a query's term set."""
        from pyspark.sql.functions import col

        if not terms:
            return self.postings().limit(0)
        uniq = sorted(set(terms))
        buckets = sorted(set(self.buckets_of(uniq).values()))
        return (
            self.postings()
            .filter(col("bucket").isin(buckets))   # partition pruning
            .filter(col("term").isin(uniq))        # row-group pruning + filter
        )

    def buckets_of(self, terms: list[str]) -> dict[str, int]:
        """term -> bucket, matching F.pmod(F.xxhash64(term), num_buckets)
        used at build time. Computed driver-side with a bit-exact
        pure-Python XXH64 (codec/xxhash.py) — zero Spark jobs; JVM parity
        is asserted in tests over the whole dictionary."""
        from lucene_spark.codec.xxhash import bucket_of

        return {t: bucket_of(t, self.num_buckets) for t in terms}
