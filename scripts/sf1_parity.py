"""Resumable full-registry oracle parity run at an arbitrary sf dir.

Runs every __spark_entry__ queries()/oracle_sql() pair (Spark vs DuckDB,
order-insensitive value compare — the driver gate's semantics) and
appends one JSON line per query to the state file; already-recorded
queries are skipped, so repeated invocations converge to full coverage
no matter how often the wall-clock budget cuts a run short.

Usage: python scripts/sf1_parity.py [sf_dir] [state_file]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return f"{v:.9g}"
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from docling_fast_server_spark.operators import dedup
    from docling_fast_server_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfss_sf1"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_parity_state.jsonl"
    done = set()
    if os.path.exists(state):
        with open(state) as f:
            done = {json.loads(line)["name"] for line in f if line.strip()}
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    todo = [n for n in sorted(qs) if n not in done]
    if not todo:
        print("ALL DONE")
        return
    spark = get_spark(
        "sf1-parity",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    for name in todo:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        dedup.clear_caches(spark)
        spark.catalog.clearCache()
        t_spark = time.time() - t0
        o = oracles.get(name)
        t0 = time.time()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        cur = con.execute(o)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        con.close()
        t_duck = time.time() - t0
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and _canon(srows, scols) == _canon(drows, dcols)
        )
        rec = {
            "name": name,
            "ok": bool(ok),
            "rows": len(srows),
            "t_spark_s": round(t_spark, 1),
            "t_duckdb_s": round(t_duck, 1),
        }
        with open(state, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if not ok:
            break  # leave the mismatch recorded; do not mask it
    spark.stop()


if __name__ == "__main__":
    main()
