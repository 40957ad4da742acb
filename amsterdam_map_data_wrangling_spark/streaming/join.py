"""Stream-stream interval join: two event streams joined on a key within
an event-time bound — the funnel/attribution shape (click → error within
30 minutes) every event pipeline eventually needs.

Spark's stream-stream inner join buffers both sides in state; the
watermarks PLUS the event-time bound in the join condition are what let it
evict: a buffered click older than (watermark - 30 min) can never match a
future error, so state is bounded by rate × horizon per side, not by the
stream length. Without the time bound the state grows forever — that
condition is not an optimization, it is the thing that makes the join
runnable on an unbounded stream. Reference parity: the reference engine
has no streaming surface at all (SURVEY.md §2.8 marks this family as the
Spark-native north star).

The join core is one function over plain DataFrames: the batch twin
(``plans/queries.py:interval_join_click_error``) passes batch frames and
is oracle-gated against DuckDB's interval join; the streaming form passes
watermarked streams — identical logical plan, which is what makes the
batch twin a valid oracle. ``tests/test_streaming.py`` proves
stream == batch under an availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_core(clicks: DataFrame, errors: DataFrame) -> DataFrame:
    """Inner-join click→error pairs for the same user with the error in
    [click_ts, click_ts + 30 min]. Input frames must carry
    (event_id, user_id, ts); works identically on batch and streaming
    frames."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return c.join(e, cond).select(
        "click_id",
        "error_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "error_ts",
    )


def click_error_interval_join_stream(
    events: DataFrame,
    click_watermark: str = "1 hour",
    error_watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form: split one event stream into two filtered streams,
    watermark each side, interval-join. The error-side watermark is wider
    because an error may match a click up to 30 min older — Spark derives
    the state horizon from (watermark delta + join interval)."""
    clicks = events.filter(F.col("event_type") == "click").withWatermark(
        "ts", click_watermark
    )
    errors = events.filter(F.col("event_type") == "error").withWatermark(
        "ts", error_watermark
    )
    return interval_join_core(clicks, errors)
