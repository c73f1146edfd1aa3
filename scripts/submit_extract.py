"""spark-submit entry point for the extraction job.

Usage (the north rule's deployment shape — identical at N and 4N
executors, only --master/cluster size changes):

    python scripts/make_pyfiles.py                  # builds dist/dfss.zip
    spark-submit --master local[8]  --py-files dist/dfss.zip \
        scripts/submit_extract.py --sf-dir /root/testdata/sf0.1 \
        --out /tmp/run_out --lineage /tmp/run_lineage
    spark-submit --master local[32] --py-files dist/dfss.zip ...  # 4N

On a real cluster the same command takes --master yarn/k8s and
--num-executors N; nothing in the job changes (no local-mode code paths).
Resume: re-running with the same --out continues from committed output
(anti-join, see plans/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--skew", action="store_true", help="size-skewed corpus")
    args = ap.parse_args()

    # spark-submit provides the session; build via getOrCreate so configs
    # passed on the command line win
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dfss-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from docling_fast_server_spark.corpus import docs_raw
    from docling_fast_server_spark.plans.pipeline import run_extraction
    from docling_fast_server_spark.sources.io import read_table

    raw = docs_raw(spark, args.sf_dir, which="all", skew=args.skew)
    t0 = time.time()
    run_id = run_extraction(
        spark, raw, args.out, args.lineage,
        run_id=args.run_id, partitions=args.partitions,
    )
    elapsed = time.time() - t0
    n = read_table(spark, args.out).count()
    print(json.dumps({
        "run_id": run_id,
        "elapsed_sec": round(elapsed, 3),
        "docs_committed": n,
        "docs_per_sec": round(n / elapsed, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
