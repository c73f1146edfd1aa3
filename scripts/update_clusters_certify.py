"""Certify the incremental cluster-maintenance path (round-7 verdict
item 5): fold a second-pass delta into an existing assignment with
update_clusters and prove it equals a from-scratch dedup_clusters run,
with the MERGE sink appending ONLY the new survivors.

This is the 100 TB operating mode — nobody recomputes the closure from
scratch daily; each ingest pass registers its new pairs against the
standing assignment (the batch analog of the reference registering each
arriving job against the content-hash index, queue_manager.py:917-929).

Scenario: pass 1 ingests the even-base-id half of the mutated near-dup
corpus (originals + their copies) and commits its survivors; pass 2
ingests the odd half, discovers only the DELTA pairs (those touching a
pass-2 doc), folds them in incrementally, and appends exactly the new
survivors.

Usage:  python scripts/update_clusters_certify.py [sf_dir]
        (default /root/testdata/sf0.001; sf1: /tmp/dfss_sf1 via make_sf1)
Also imported by tests/test_components.py to run the same certification
at the test scale. Prints one JSON line with the recorded facts.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def certify(spark, sf_dir: str, kept_path: str) -> dict:
    from pyspark.sql import functions as F

    from docling_fast_server_spark.operators import components, dedup
    from docling_fast_server_spark.sources import io as sio

    components.ensure_checkpoint_dir(spark)
    corpus = dedup.mutated_corpus(spark, sf_dir)
    base_id = F.col("doc_id") % dedup.NEAR_STEP  # copies share their base id
    pass1 = corpus.filter(base_id % 2 == 0)
    pass2 = corpus.filter(base_id % 2 == 1)

    def assign(docs, labels):
        return (
            docs.select(F.col("doc_id").alias("node"))
            .join(labels, "node", "left")
            .select(
                F.col("node").alias("doc_id"),
                F.coalesce("component", F.col("node")).alias("component"),
            )
        )

    # ---- pass 1: cluster the first half, persist the assignment ------
    # (the standing assignment lives in a TABLE between passes — pass 2
    # reads it back; a fixpoint frame is consume-before-clear and never
    # crosses run boundaries)
    assign_path = kept_path + "_assignment"
    t0 = time.time()
    labels1 = assign(
        pass1, components.connected_components(dedup.minhash_pairs(pass1))
    )
    labels1.write.mode("overwrite").parquet(assign_path)
    labels1 = spark.read.parquet(assign_path)
    n1, dem1 = components.sync_survivor_table(spark, labels1, kept_path)
    t_pass1 = time.time() - t0
    dedup.clear_caches(spark)

    # ---- pass 2 (incremental): fold only the DELTA pairs in ----------
    t0 = time.time()
    all_pairs = dedup.minhash_pairs(corpus)
    delta_a = all_pairs.join(
        pass2.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    )
    delta_b = all_pairs.join(
        pass2.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi"
    )
    delta_pairs = delta_a.unionByName(delta_b).distinct()
    upd = components.update_clusters(
        labels1.select(F.col("doc_id").alias("node"), "component"), delta_pairs
    )
    labels_inc = assign(corpus, upd)
    surv_inc = labels_inc.filter(F.col("doc_id") == F.col("component")).select(
        "doc_id"
    )
    # sync, not append-only: the delta can bridge two pass-1 clusters,
    # DEMOTING an already-committed survivor (the larger root)
    n2, n_demoted = components.sync_survivor_table(spark, labels_inc, kept_path)
    t_incremental = time.time() - t0

    # ---- batch reference: from-scratch closure over everything -------
    # (materialize labels_inc to a table first so the comparison below
    # survives the cache clear; then time the batch run COLD, the same
    # footing as the incremental pass above)
    inc_path = kept_path + "_labels_inc"
    labels_inc.write.mode("overwrite").parquet(inc_path)
    labels_inc = spark.read.parquet(inc_path)
    surv_inc = labels_inc.filter(F.col("doc_id") == F.col("component")).select(
        "doc_id"
    )
    dedup.clear_caches(spark)
    t0 = time.time()
    labels_batch = components.dedup_clusters(spark, sf_dir).select(
        "doc_id", "component"
    )
    labels_batch.count()  # force the full assignment, not just the fixpoint
    t_batch = time.time() - t0

    diff = (
        labels_inc.exceptAll(labels_batch).count()
        + labels_batch.exceptAll(labels_inc).count()
    )
    n_surv = surv_inc.count()
    n_again, dem_again = components.sync_survivor_table(
        spark, labels_inc, kept_path
    )
    kept_total = sio.read_table(spark, kept_path).count()
    dedup.clear_caches(spark)
    return {
        "sf_dir": sf_dir,
        "n_docs": corpus.count(),
        "pass1_survivors": n1,
        "pass1_demoted": dem1,
        "delta_appended": n2,
        "delta_demoted": n_demoted,
        "incremental_equals_batch": diff == 0,
        "label_diff_rows": diff,
        "survivors_total": n_surv,
        "reappend_rows": n_again,
        "redemote_rows": dem_again,
        "kept_table_rows": kept_total,
        "sink_exactly_survivors": kept_total == n_surv
        and n_again == 0
        and dem_again == 0
        and n1 + n2 - n_demoted == n_surv,
        "t_pass1_s": round(t_pass1, 2),
        "t_incremental_s": round(t_incremental, 2),
        "t_batch_s": round(t_batch, 2),
    }


if __name__ == "__main__":
    from docling_fast_server_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        "update-clusters-certify",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    kept = tempfile.mkdtemp(prefix="dfss_cert_") + "/kept"
    out = certify(spark, sf_dir, kept)
    print(json.dumps(out))
    spark.stop()
