"""Streaming SCD2 (type-2 slowly-changing-dimension) maintenance via
``applyInPandasWithState``: the stateful twin of the batch
``plans/r08_queue.py:scd2_build`` gate. Each event opens a per-user
state interval; the user's NEXT event closes it — in a stream, "next"
arrives later, so the open interval is exactly the per-user state.

Per-user state is TWO fields — the open interval's start microsecond
and its event_type — nothing else (no buffer), so state is linear in
users and RocksDB-spillable, same contract as streaming/sessionize.py.
Each micro-batch emits the intervals it CLOSED as per-(user, type)
deltas (n_closed, closed_us); a downstream batch rollup of the drained
sink reproduces the batch gate's closed-interval totals exactly
(stream == batch pinned in tests/test_streaming.py). Cross-batch
correctness: the carried (last_us, last_type) closes the boundary
interval against the true previous event; within a batch the handler
concatenates ALL Arrow chunks then sorts once by (us, event_id) — the
same total order the batch twin's lead() window pins (the r6 ADVICE
chunk-ordering lesson, inherited from sessionize).

Citing the reference's streaming north star (SURVEY §2.8): dimension
maintenance from a change stream is the canonical warehouse-feed task
its single-pass batch script cannot express.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SCD2_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_closed", T.LongType()),
        T.StructField("closed_us", T.LongType()),
    ]
)

SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _update_scd2(
    key: tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterable["pd.DataFrame"]:
    import pandas as pd

    last_us, last_type = state.get if state.exists else (None, None)

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        state.update((last_us, last_type))
        return
    full = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    full = full.sort_values(["us", "event_id"])
    us = full["us"].to_list()
    types = full["event_type"].to_list()

    # the interval sequence: carried open interval first, then the
    # batch's events; consecutive elements close one interval each,
    # attributed to the OPENING event's type (the batch twin's lead()).
    if last_us is not None:
        us = [last_us] + us
        types = [last_type] + types
    closed: dict[str, list[int]] = {}
    for i in range(1, len(us)):
        acc = closed.setdefault(types[i - 1], [0, 0])
        acc[0] += 1
        acc[1] += us[i] - us[i - 1]
    state.update((int(us[-1]), types[-1]))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "event_type": list(closed),
                "n_closed": [v[0] for v in closed.values()],
                "closed_us": [v[1] for v in closed.values()],
            }
        )


def streaming_scd2_closed_intervals(events: DataFrame) -> DataFrame:
    """Closed-interval deltas per (user, event_type) per micro-batch
    (append mode — deltas are immutable facts, unlike running totals).
    ``events`` needs (user_id, ts, event_id, event_type); time converts
    to exact integer microseconds JVM-side. Summing the drained deltas
    per event_type reproduces the batch SCD2 gate's
    (n_intervals − n_open, total_state_us) exactly."""
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        "event_type",
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_scd2,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
