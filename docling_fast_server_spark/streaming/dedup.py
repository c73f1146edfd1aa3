"""Streaming exact deduplication — dedup-on-ingest with retention.

The reference suppresses an arriving job whose content hash matches an
existing one (queue_manager.py:917-929 find_duplicate_job; the client
sees 409 Conflict, src/routes/ocr.py:96-103) and expires job records
after JOB_RETENTION_HOURS (job_db.py:241-260). On a continuously
arriving corpus those two rules compose into one stateful streaming
operator: every document is verdict-tagged against the standing
content-hash index, first-seen documents pass, duplicates are flagged
with their keeper, and hash entries idle past the retention window are
evicted (a duplicate arriving after expiry is re-admitted — the
reference's semantics exactly, since its job row is gone by then).

Shape notes for 100 TB/day:
- the groupBy key is the 112-bit content-hash PAIR (the same
  EXACT_B1/EXACT_P1+EXACT_B2/EXACT_P2 fold as batch dedup_exact), so
  the only shuffle ships (doc_id, h1, h2) — document text never rides
  an exchange, identical to the batch discipline;
- state is one (keeper_id, n_seen) pair per LIVE distinct document
  within the retention window, timeout-evicted — bounded by the
  retention horizon, not the stream's lifetime;
- output is append-mode verdicts (doc_id, keeper_doc_id,
  is_duplicate): a downstream sink keeps `NOT is_duplicate` rows, the
  streaming analog of the batch keep-min survivor rule. Within one
  micro-batch the keeper is the min doc_id of the batch's unseen group
  (deterministic); across batches it is first-arrival, which is the
  reference's own first-job-wins rule.

The batch twin (dedup.q_dedup_exact / min-per-text-group) defines the
semantics; tests replay an ordered multi-file corpus one file per
trigger and assert the verdict table equals the batch mapping.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import EXACT_B1, EXACT_B2, EXACT_P1, EXACT_P2, poly_hash

DEDUP_RETENTION_S = 24 * 3600  # the reference's JOB_RETENTION_HOURS analog

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("keeper_doc_id", T.LongType()),
        T.StructField("is_duplicate", T.BooleanType()),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keeper", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def streaming_dedup_exact(
    docs_stream: DataFrame, retention_s: int = DEDUP_RETENTION_S
) -> DataFrame:
    """(doc_id, text) stream -> append-mode dedup verdicts
    (doc_id, keeper_doc_id, is_duplicate) via applyInPandasWithState,
    keyed on the 112-bit content-hash pair. See module docstring."""
    retention_ms = int(retention_s) * 1000

    def verdict_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # retention expiry for an IDLE hash: drop the entry — the
            # next arrival of this content is first-seen again
            state.remove()
            return
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(d) for d in pdf["doc_id"])
        ids.sort()  # deterministic within-batch keeper: min doc_id
        now_ms = state.getCurrentProcessingTimeMs()
        keeper, n_seen, last_ms = (
            state.get if state.exists else (None, 0, None)
        )
        if last_ms is not None and now_ms - last_ms > retention_ms:
            # the idle timeout only fires for keys with NO new data in a
            # batch; a duplicate arriving after the retention window
            # must still be re-admitted, so expiry is also checked
            # against the stored last-seen processing time
            keeper, n_seen = None, 0
        out = {"doc_id": [], "keeper_doc_id": [], "is_duplicate": []}
        for d in ids:
            if keeper is None:
                keeper = d
                out["doc_id"].append(d)
                out["keeper_doc_id"].append(d)
                out["is_duplicate"].append(False)
            else:
                out["doc_id"].append(d)
                out["keeper_doc_id"].append(keeper)
                out["is_duplicate"].append(True)
            n_seen += 1
        state.update((keeper, n_seen, now_ms))
        state.setTimeoutDuration(retention_ms)
        if out["doc_id"]:
            yield pd.DataFrame(out)

    keyed = docs_stream.select(
        "doc_id",
        poly_hash(F.col("text"), EXACT_B1, EXACT_P1).alias("h1"),
        poly_hash(F.col("text"), EXACT_B2, EXACT_P2).alias("h2"),
    )
    return keyed.groupBy("h1", "h2").applyInPandasWithState(
        verdict_fn,
        outputStructType=VERDICT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
