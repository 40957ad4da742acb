"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user running statistics that survive across micro-batches.

This is the §2.8/§2.10 extension point for stateful logic the built-in
window aggregations can't express — arbitrary per-key state (here: event
count, value sum, last-seen timestamp) updated with pandas batches and
GroupState. State is keyed by user_id; with a watermark + state timeout it
stays bounded on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterable["pd.DataFrame"]:
    import datetime as dt

    import pandas as pd

    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [
                dt.datetime.fromtimestamp(last_us / 1e6, dt.timezone.utc).replace(
                    tzinfo=None
                )
            ],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running stats (count, value sum, last event
    time), emitted per micro-batch in update mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The Spark 4 ``transformWithStateInPandas`` twin of
    :func:`running_user_stats` — the modern arbitrary-stateful-operator
    API (SPARK-49564): named state variables on a
    :class:`StatefulProcessor` instead of a single GroupState blob, with
    timers/TTL available per variable, and state schema evolution across
    restarts. Semantics here are identical (per-user count/sum/last-ts in
    update mode), so the two operators are drain-equivalent on any input
    — pinned by the stream==batch pytest.

    Runtime requirements (both are standard on a real Spark 4 cluster,
    and the second is absent in THIS container — the operator is complete
    and its processor logic is unit-tested, but the end-to-end drain test
    skips here):

    - the RocksDB state store provider (the HDFS-backed default does not
      implement transformWithState); set
      ``spark.sql.streaming.stateStore.providerClass`` to
      ``...state.RocksDBStateStoreProvider`` before starting the query —
      the right provider at 100 TB anyway (incremental checkpoints, state
      far larger than executor heap);
    - ``google.protobuf`` in the Python environment: the operator's
      driver-side state server speaks protobuf
      (``pyspark/sql/streaming/proto``), and its worker crashes on import
      without it (no-pip environment boundary, like the multimodal
      decode stub)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def _make_running_stats_processor_class():
    """Build the StatefulProcessor subclass lazily: importing
    ``stateful_processor`` pulls streaming-proto modules that want
    protobuf in some distributions, so the import must not run at module
    load in environments that only use the applyInPandasWithState twin."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import datetime as dt

            import pandas as pd

            n, s, last_us = (
                self._stats.get() if self._stats.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                if pd.notna(batch_max):
                    last_us = max(last_us, int(batch_max.value // 1000))
            self._stats.update((n, s, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "last_ts": [
                        dt.datetime.fromtimestamp(
                            last_us / 1e6, dt.timezone.utc
                        ).replace(tzinfo=None)
                    ],
                }
            )

        def close(self) -> None:
            pass

    return _RunningStats


def RunningStatsProcessor():
    """Instantiate the transformWithState processor (see
    :func:`_make_running_stats_processor_class`)."""
    return _make_running_stats_processor_class()()
