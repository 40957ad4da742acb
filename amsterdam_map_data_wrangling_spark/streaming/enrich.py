"""Stream-static enrichment join: a streaming fact joined to a batch
dimension, the workhorse shape of every production event pipeline
(events → user/account/catalog attributes → routed aggregates).

Spark plans a stream-static equi-join STATELESSLY: the static side is
(re)read per micro-batch and — hinted here — broadcast, so there is no
join state to watermark, no stream-stream alignment, and the stream side
never shuffles for the join itself. At 100 TB/day the dimension refresh
cost is per-micro-batch, not per-event; keep dims compact or snapshot
them to a fast format.

The batch twin (``plans/queries.py:segment_event_counts``) is
oracle-gated; ``tests/test_streaming.py`` proves stream == batch under an
availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_segment_dim(customer: DataFrame) -> DataFrame:
    """The static dimension: user_id → market segment."""
    return customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )


def enriched_segment_counts(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Per (segment, event_type) counts over an enriched event stream.
    ``events`` may be a streaming OR batch DataFrame — the plan is
    identical, which is what makes the batch twin a valid oracle."""
    dim = F.broadcast(user_segment_dim(customer))
    return (
        events.join(dim, "user_id", "inner")
        .groupBy("segment", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
