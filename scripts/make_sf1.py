"""Synthesize an sf1-scale documents/embeddings pair from sf0.1.

Round-4 verdict item 5 asks for gate headroom one more decade out:
re-verify the scale-sensitive query family (dedup_*, sim_*, chunks)
against the DuckDB oracle at ~10x the bench scale to flush band-join
skew and hash-collision effects. /root/testdata is read-only and has no
sf1, so this builds one deterministically (no external data):

- documents: 10 VERBATIM replicas of sf0.1 with doc_id' = doc_id +
  5000*rep. Round 5 rotated each replica's words to avoid 10-deep
  exact-duplicate cliques (which quadratically inflated every LSH
  candidate set) — but rotation moved formula/key-value-shaped text to
  positions the position-seeded extraction oracle does not expect, so
  the extract/export family diverged at sf1. Round 6's clique collapse
  makes rotation unnecessary: verbatim replicas ARE the degenerate
  duplicate-heavy corpus the skew guards exist for (each clique bands
  as ONE representative), and verbatim text keeps the extraction
  oracles exact, so the FULL 50-query registry is checkable at sf1.
- embeddings: 10 replicas with vec_id' = vec_id + 2000*rep (payload
  kept — Spark-vs-DuckDB parity is self-consistent either way).
- every other table symlinked from sf0.1.

Usage: python scripts/make_sf1.py [dest_dir]   (default /tmp/dfss_sf1)
Then:  SPARK_GRAFT_TEST_SF_DIR=<dest> python -m pytest \
           tests/test_oracle_parity.py -k "dedup or sim_ or chunks" -q
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10
DOC_STEP = 5_000  # sf0.1 documents row count
VEC_STEP = 2_000  # sf0.1 embeddings row count

LINK_TABLES = (
    "region nation customer supplier part orders lineitem events"
).split()


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfss_sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({REPS})) AS rep")
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + {DOC_STEP} * r.rep AS doc_id,
                 d.text, d.lang, d.source, d.n_chars
          FROM '{SRC}/documents.parquet' d
          CROSS JOIN reps r
          ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + {VEC_STEP} * r.rep AS vec_id, e.embedding, e.label
          FROM '{SRC}/embeddings.parquet' e CROSS JOIN reps r
          ORDER BY vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in LINK_TABLES:
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(f"{SRC}/{t}.parquet", p)
    n_docs = con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    n_vecs = con.execute(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    # sanity: length column consistent for every replica
    bad = con.execute(
        f"""SELECT count(*) FROM '{dst}/documents.parquet'
            WHERE length(text) != n_chars"""
    ).fetchone()[0]
    assert bad == 0, f"{bad} docs with length drift"
    print(f"sf1 at {dst}: {n_docs} documents, {n_vecs} embeddings")


if __name__ == "__main__":
    main()
