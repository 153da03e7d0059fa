"""Custom stateful streaming operators (SURVEY.md §2.9).

The reference carries identity/cluster state in driver memory across
its whole run (reference: src/KissmetricsToDatabase.php:493-497 —
the scalability wall). Structured Streaming's
``applyInPandasWithState`` holds the same kind of per-key state in
the state store instead: partitioned, checkpointed, recoverable.

``running_user_totals`` is the canonical shape: per-user event
counter + value accumulator that survives across micro-batches. The
same operator works in batch tests via ``applyInPandas`` (state
seeded empty), which is how the unit tests pin its semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) per user across micro-batches."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming: per-user running totals via the state store.

    Update-mode output: one row per user per micro-batch with the
    accumulated totals. State is partitioned by user_id — the 100 TB
    story is the state store scaling with keys across executors, not
    driver memory.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = (
    "key string, n long, ewma double, ratio double, is_anomaly boolean"
)
EWMA_STATE_SCHEMA = "ewma double, n_seen long"


def _update_ewma_state(alpha: float, ratio_hi: float, ratio_lo: float):
    """Kernel factory: per-key streaming EWMA rate monitor.

    State = (ewma of per-batch event counts, batches seen). Each
    micro-batch contributes its count for the key; the batch is
    scored against the PRIOR ewma (forecast residual — the same
    contract as the batch operator features.ewma_forecast_anomalies,
    with micro-batches standing in for hours), then the recurrence
    ``ewma ← α·n + (1-α)·ewma`` advances. The first batch per key
    seeds the state and never flags.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            prior, seen = state.get
            ratio = round(n / prior, 6) if prior > 0 else None
            anom = ratio is not None and (
                ratio >= ratio_hi or ratio <= ratio_lo
            )
            new = round(alpha * n + (1.0 - alpha) * prior, 6)
            state.update((new, seen + 1))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n": [n],
                    "ewma": [prior],
                    "ratio": [ratio],
                    "is_anomaly": [anom],
                }
            )
        else:
            state.update((float(n), 1))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n": [n],
                    "ewma": [None],
                    "ratio": [None],
                    "is_anomaly": [False],
                }
            )

    return update


def ewma_rate_monitor_stream(
    events_stream: DataFrame,
    key_col: str = "event_type",
    alpha: float = 0.3,
    ratio_hi: float = 2.0,
    ratio_lo: float = 0.5,
) -> DataFrame:
    """Streaming per-key EWMA rate monitor via the state store: each
    key holds TWO numbers (ewma, batches-seen) no matter how many
    events stream through — the fixed-size-state complement to the
    batch trailing-window monitor. Update-mode output: one scored
    row per key per micro-batch."""
    return events_stream.groupBy(key_col).applyInPandasWithState(
        _update_ewma_state(alpha, ratio_hi, ratio_lo),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
