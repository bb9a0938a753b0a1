"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8 — additive surface; the reference has no streaming at all).

``running_user_totals`` keeps one (count, sum) state row per user and emits
the updated running totals every micro-batch — the minimal custom stateful
operator shape: arbitrary per-key Python state that Spark's built-in
windowed aggregations can't express (e.g. counters with business rules,
model state, per-key rate limits all follow this template).

Scale notes: state lives in the executor state store keyed by user_id —
O(distinct keys), not O(stream). Arrow batches cross the Python boundary
(pandas per group), so per-batch cost is vectorized, not per-row. On a real
cluster the same code runs with RocksDB state store + checkpointing; the
memory-sink replay here is the deterministic local harness."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in custom state;
    emits the post-batch totals for every user seen in the batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
