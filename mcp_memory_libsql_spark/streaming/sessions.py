"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the Structured Streaming twin of
``analytics.events.sessionize``.

State is keyed by user_id and holds the open session (id, last-seen
epoch, running count/sum). Each micro-batch advances the state and
emits the sessions it touched; a session closes when the gap between
events exceeds ``gap_minutes`` (a production build would add a
ProcessingTimeTimeout to flush idle sessions).

Scale: state lives in the executor state store partitioned by
user_id — the same key the batch sessionizer shuffles on, so the
two paths have identical distribution behavior.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_MINUTES = 30

STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("last_epoch", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _make_updater(gap_minutes: int):
    gap = gap_minutes * 60

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            session_id, last_epoch, n_events, sum_value = state.get
        else:
            session_id, last_epoch, n_events, sum_value = 1, None, 0, 0.0

        emitted: dict[int, tuple[int, float]] = {}
        # Concatenate ALL chunks before sorting: a key's events can
        # span multiple Arrow batches, and sorting each independently
        # would let cross-chunk disorder spuriously split/merge
        # sessions (diverging from the batch sessionizer, which sorts
        # the whole partition).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("epoch")
            for epoch, value in zip(pdf["epoch"], pdf["value"]):
                epoch = int(epoch)
                if last_epoch is not None and epoch - last_epoch > gap:
                    session_id += 1
                    n_events, sum_value = 0, 0.0
                # never move the frontier BACKWARDS: an event arriving
                # late (epoch < last_epoch, delivered in a later
                # micro-batch) joins the current session but must not
                # rewind last_epoch — otherwise the next on-time event
                # measures its gap from the stale late timestamp and
                # spuriously opens a new session
                last_epoch = (
                    epoch if last_epoch is None else max(last_epoch, epoch)
                )
                n_events += 1
                sum_value += float(value)
                emitted[session_id] = (n_events, sum_value)

        state.update((session_id, last_epoch, n_events, sum_value))
        if emitted:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_id": sid,
                        "n_events": n,
                        "sum_value": round(s, 2),
                    }
                    for sid, (n, s) in emitted.items()
                ]
            )

    return update


def sessionize_stream(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """events stream (needs ts, user_id, value) → per-session updates
    (user_id, session_id, n_events, sum_value)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        F.unix_timestamp("ts").alias("epoch"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_updater(gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
