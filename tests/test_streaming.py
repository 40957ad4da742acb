"""Structured Streaming surface: the streaming window aggregations must
produce exactly the batch-equivalent results (availableNow trigger drains
the whole parquet as a bounded stream into a memory sink)."""

from __future__ import annotations

from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES
from amsterdam_map_data_wrangling_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    sliding_counts_by_type_stream,
    tumbling_counts_stream,
)

from .conftest import SF_ORACLE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    stream = tumbling_counts_stream(read_events_stream(spark, SF_ORACLE))
    assert stream.isStreaming
    run_to_memory(stream, "t_tumbling")
    got = _rows(
        spark.table("t_tumbling"), ["window_start", "num_events", "sum_value"]
    )
    batch = QUERIES["tumbling_window_stats"].build(spark, SF_ORACLE)
    want = _rows(batch, ["window_start", "num_events", "sum_value"])
    assert got == want


def test_stream_sliding_equals_batch(spark):
    stream = sliding_counts_by_type_stream(read_events_stream(spark, SF_ORACLE))
    run_to_memory(stream, "t_sliding")
    got = _rows(spark.table("t_sliding"), ["window_start", "event_type", "num"])
    batch = QUERIES["sliding_window_by_type"].build(spark, SF_ORACLE)
    want = _rows(batch, ["window_start", "event_type", "num"])
    assert got == want
