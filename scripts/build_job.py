"""spark-submit entry point for the distributed index build.

The north rule requires the build to run `via spark-submit --py-files on
a multi-executor cluster`. Package + submit:

    python scripts/package_pyfiles.py                 # → /tmp/lucene_spark.zip
    spark-submit --master local[8] \
        --py-files /tmp/lucene_spark.zip \
        scripts/build_job.py \
        --corpus /tmp/bench_corpus_200000 \
        --index-dir /tmp/submit_idx \
        --partitions 64 --buckets 32 --analyzer code

On a real cluster, swap --master for the cluster manager and the same
zip ships the package to every executor (the python workers import
`lucene_spark` from it). The job prints a one-line JSON manifest summary.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="parquet dir of (repo,path,commit,lang,content)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--groups", type=int, default=1)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--analyzer", default="code")
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    # spark-submit provides the session config/master; just get-or-create
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lucene_spark-build").getOrCreate()

    from lucene_spark.index import IndexBuilder, IndexConfig

    cfg = IndexConfig(partitions=args.partitions, num_groups=args.groups,
                      num_buckets=args.buckets, analyzer=args.analyzer,
                      index_positions=args.positions)
    src = spark.read.parquet(args.corpus)
    manifest = IndexBuilder(spark, cfg).build(src, args.index_dir,
                                              overwrite=args.overwrite)
    print(json.dumps({
        "doc_count": manifest["doc_count"],
        "sum_doclen": manifest["sum_doclen"],
        "build_seconds": manifest["build_seconds"],
        "phases": manifest["phases"],
        "groups": len(manifest["groups"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
