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


CENTS_OUTPUT_SCHEMA = "user_id long, n_events long, value_cents long"
CENTS_STATE_SCHEMA = "n long, cents long"


def _update_user_totals_cents(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-element floor(v*100 + 0.5): the same single-IEEE-op
        # quantization SQL's FLOOR applies, then an exact integer sum —
        # accumulation order (arrival vs batch) can never move the state.
        # NULL values arrive as NaN and must be SKIPPED like SQL SUM
        # skips NULLs — np.floor(NaN).astype('int64') would otherwise
        # silently poison the state with INT64_MIN. +/-Inf gets neither
        # treatment: skipping would hide upstream corruption, and
        # including would ALSO poison the state (floor(inf).astype
        # int64 → INT64_MIN, not SQL's Infinity) — so it FAILS LOUDLY,
        # which is the only honest option for an exact-integer state.
        v = pdf["value"].to_numpy(dtype="float64")
        v = v[~np.isnan(v)]
        if not np.isfinite(v).all():
            raise ValueError(
                "non-finite event value reached the cents state — "
                "upstream corruption; an exact-integer accumulator "
                "cannot represent Inf"
            )
        cents += int(np.floor(v * 100.0 + 0.5).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
    )


def running_user_totals_cents(events: DataFrame) -> DataFrame:
    """Exact-integer variant of ``running_user_totals``: state carries the
    value sum as QUANTIZED CENTS (floor(v·100+0.5) per row, summed as
    int64), so the final state is an order-independent exact number — the
    decimal-sum discipline (functions/numeric.py) applied to streaming
    state, which is what makes a custom stateful operator
    ORACLE-CHECKABLE: a batch SQL sum of the same per-row quantization
    must match bit-for-bit, however the stream was micro-batched."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals_cents,
        outputStructType=CENTS_OUTPUT_SCHEMA,
        stateStructType=CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


def _make_totals_processor():
    """Build the transformWithState processor class lazily — the
    stateful_processor module imports cleanly, but instantiating is only
    useful where the runtime deps below exist."""
    import pandas as pd  # local: keep module import light on executors
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotalsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running-totals operator on Spark 4's successor API,
    ``transformWithStateInPandas`` — typed per-key state handles
    (value/list/map state, timers, TTL) instead of one opaque state
    tuple; the API Spark is consolidating custom stateful processing on.

    Sandbox status (2026-08-14): the TWS Python runner speaks a
    protobuf-based state-server protocol and crashes at init without
    ``google.protobuf`` ([STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE]
    → ``ImportError: cannot import name 'descriptor'``), and the sandbox
    cannot pip-install. Probed end-to-end 2026-08-14 with the RocksDB
    state store provider; this function therefore gates on protobuf and
    raises a descriptive RuntimeError where it is absent —
    ``running_user_totals`` (applyInPandasWithState) is the working
    equivalent everywhere. tests/test_streaming.py pins whichever branch
    the environment offers (same contract as the Iceberg writer gate)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf (the TWS "
            "state-server protocol), which is not installed; use "
            "running_user_totals (applyInPandasWithState) instead"
        ) from exc
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_totals_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
