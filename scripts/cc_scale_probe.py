"""Connected-components scale probe — millions of edges, local[32].

The pytest oracle (DuckDB WITH RECURSIVE closure) is exact but cannot
scale past toy graphs (transitive closure materializes node×reachable
rows), so the scale probe validates with distributed invariants that
are each ONE join/aggregate — the checks themselves scale exactly as
far as the operator does:

  consistency: every input edge's endpoints carry the SAME label
               (join labels onto both ends; mismatches must be 0)
  minimality:  every label is the minimum node of its member set
               (groupBy(component).min(node) == component)
  closure:     every label is itself a node labelled with itself

Together with convergence (the star fixpoint), consistency says the
labelling never splits a real component, and minimality+closure pin
the canonical representative — the full CC contract without a closure
oracle.

Graph shapes:
  functional: node i -> (i*2654435761 + 12345) % N  (pseudo-random
              out-degree-1; components are the rho-shaped basins —
              many mid-size components, the hard general case)
  hub:        node i -> i % K  (K hubs, N/K-deep stars — the
              duplicate-clique shape a crawl corpus produces)
  chain:      node i -> i+1 in blocks of 10k (worst diameter)

Usage: python scripts/cc_scale_probe.py [n_nodes] [n_cores]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from docling_fast_server_spark.operators import components, dedup
from docling_fast_server_spark.session import get_spark


def _invariants(spark, edges, labels) -> dict:
    lab_a = labels.select(
        F.col("node").alias("doc_a"), F.col("component").alias("ca")
    )
    lab_b = labels.select(
        F.col("node").alias("doc_b"), F.col("component").alias("cb")
    )
    mismatches = (
        edges.join(lab_a, "doc_a").join(lab_b, "doc_b")
        .where(F.col("ca") != F.col("cb"))
        .count()
    )
    bad_min = (
        labels.groupBy("component").agg(F.min("node").alias("mn"))
        .where(F.col("component") != F.col("mn"))
        .count()
    )
    roots = labels.where(F.col("node") == F.col("component")).count()
    n_components = labels.select("component").distinct().count()
    return {
        "edge_label_mismatches": mismatches,
        "non_minimal_labels": bad_min,
        "roots": roots,
        "components": n_components,
    }


def run(n_nodes: int, cores: int) -> None:
    spark = get_spark("cc-scale-probe", cores=cores, shuffle_partitions=cores)
    base = spark.range(n_nodes)
    shapes = {
        "functional": base.select(
            F.col("id").alias("doc_a"),
            ((F.col("id") * F.lit(2654435761) + F.lit(12345)) % F.lit(n_nodes)).alias("doc_b"),
        ),
        "hub": base.select(
            F.col("id").alias("doc_a"), (F.col("id") % F.lit(1000)).alias("doc_b")
        ),
        "chain": base.select(
            F.col("id").alias("doc_a"),
            F.when((F.col("id") + 1) % 10_000 == 0, F.col("id"))
            .otherwise(F.col("id") + 1)
            .alias("doc_b"),
        ),
    }
    for name, edges in shapes.items():
        t0 = time.perf_counter()
        stars, rounds = components.cc_fixpoint(edges)
        t_fix = time.perf_counter() - t0
        # derive labels from the already-computed fixpoint (same shape
        # as connected_components, without re-running the loop)
        nodes = (
            edges.select(F.col("doc_a").alias("node"))
            .unionAll(edges.select(F.col("doc_b").alias("node")))
            .distinct()
        )
        members = stars.select(
            F.col("u").alias("node"), F.col("v").alias("cmp")
        )
        labels = (
            nodes.join(members, "node", "left")
            .groupBy("node")
            .agg(
                F.min(F.coalesce(F.col("cmp"), F.col("node"))).alias("component")
            )
        )
        inv = _invariants(spark, edges, labels)
        t_all = time.perf_counter() - t0
        assert inv["edge_label_mismatches"] == 0, inv
        assert inv["non_minimal_labels"] == 0, inv
        assert inv["roots"] == inv["components"], inv
        print(
            f"{name:>10}: {n_nodes:,} edges  rounds={rounds}  "
            f"fixpoint={t_fix:.1f}s  +invariants={t_all:.1f}s  "
            f"components={inv['components']:,}"
        )
        dedup.clear_caches(spark)
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    run(n, cores)
