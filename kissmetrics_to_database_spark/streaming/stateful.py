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
