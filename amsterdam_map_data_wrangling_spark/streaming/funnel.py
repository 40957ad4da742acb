"""Streaming funnel state machine via ``applyInPandasWithState``: the
ordered view → click → purchase conversion flags per user, maintained
across micro-batches.

The batch twin is ``plans/queries.py:funnel_conversion`` (three chained
running-max window flags). In streaming form the per-user state IS those
three monotone bits: within each batch the handler sorts the user's rows
by event time (so intra-batch disorder cannot skip a stage), and across
batches the bits only ever turn on, so the stream converges to the batch
answer whenever each user's events arrive in event-time order across
micro-batches — the file-source replay used in tests, and the common
Kafka-per-key ordering in production. For sources that interleave
batches OUT of event-time order, bound the disorder with a watermark and
re-feed late rows (the flags are monotone, so replays are idempotent —
never wrong, at worst late).

Scale: state per user is three bits + nothing else — no event list, no
timestamps — so a billion-user stream holds state linear in users, and
the RocksDB provider spills it. Output mode ``update`` emits only users
whose flags could have changed (those with rows in the batch).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("reached_view", T.IntegerType()),
        T.StructField("reached_click", T.IntegerType()),
        T.StructField("reached_purchase", T.IntegerType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("r1", T.IntegerType()),
        T.StructField("r2", T.IntegerType()),
        T.StructField("r3", T.IntegerType()),
    ]
)

_STEPS = ("view", "click", "purchase")


def _update_funnel(
    key: tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterable["pd.DataFrame"]:
    import numpy as np
    import pandas as pd

    r1, r2, r3 = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        # event-time order within the batch: intra-batch disorder must
        # not let a click that precedes the first view count as stage 2
        t = pdf.sort_values(["ts", "event_id"])["event_type"].to_numpy()

        def first_at_or_after(etype: str, start: int):
            idx = np.flatnonzero(t == etype)
            idx = idx[idx > start]
            return int(idx[0]) if idx.size else None

        # vectorized stage cascade: each stage needs only the FIRST
        # qualifying index — no per-row Python loop
        view_pos = -1 if r1 else first_at_or_after(_STEPS[0], -1)
        if view_pos is not None:
            r1 = 1
        click_pos = -1 if r2 else (
            first_at_or_after(_STEPS[1], view_pos) if r1 else None
        )
        if click_pos is not None:
            r2 = 1
        if r2 and not r3 and first_at_or_after(_STEPS[2], click_pos) is not None:
            r3 = 1
    state.update((r1, r2, r3))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "reached_view": [r1],
            "reached_click": [r2],
            "reached_purchase": [r3],
        }
    )


def streaming_funnel_flags(events: DataFrame) -> DataFrame:
    """Per-user funnel flags as a streaming query (update mode): one
    row per user per micro-batch with the monotone stage bits."""
    return events.select("user_id", "event_type", "ts", "event_id").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
