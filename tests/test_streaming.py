"""Structured Streaming surface: the streaming window aggregations must
produce exactly the batch-equivalent results (availableNow trigger drains
the whole parquet as a bounded stream into a memory sink)."""

from __future__ import annotations

import pytest

from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES
from amsterdam_map_data_wrangling_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    sliding_counts_by_type_stream,
    tumbling_counts_stream,
)

from .conftest import SF_ORACLE, SF_SMALL


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


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path_factory):
    """Exact dedup as a stream: duplicates planted in a second file (a later
    micro-batch) must not survive."""
    import os

    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.streaming.dedup import dedup_stream

    base = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "sdedup")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select("doc_id", "text")
    docs.limit(40).write.mode("overwrite").parquet(os.path.join(base, "in"))
    # second batch: 10 new docs + 15 exact duplicates with new ids
    dupes = docs.limit(15).withColumn("doc_id", F.col("doc_id") + 50_000)
    fresh = docs.filter(F.col("doc_id").between(100, 109))
    dupes.unionByName(fresh).write.mode("append").parquet(os.path.join(base, "in"))

    stream = spark.readStream.schema(docs.schema).parquet(os.path.join(base, "in"))
    deduped = dedup_stream(stream)
    (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.table("t_dedup")
    batch_distinct = (
        spark.read.parquet(os.path.join(base, "in"))
        .select(F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))))
        .distinct()
        .count()
    )
    assert out.count() == batch_distinct == 50
    assert out.select("fp").distinct().count() == out.count()


def test_stateful_running_user_stats_matches_batch(spark):
    """applyInPandasWithState: after draining the full stream, per-user
    running stats must equal the batch aggregation."""
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
    from amsterdam_map_data_wrangling_spark.streaming.stateful import (
        running_user_stats,
    )

    stream = running_user_stats(read_events_stream(spark, SF_ORACLE))
    assert stream.isStreaming
    (
        stream.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    # update mode re-emits per batch: keep the final row per user
    out = (
        spark.table("t_stateful")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
            F.max("last_ts").alias("last_ts"),
        )
    )
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 4), r.last_ts)
        for r in out.collect()
    }
    batch = (
        load_tables(spark, SF_ORACLE, ["events"])["events"]
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("ts").alias("m"),
        )
    )
    want = {r.user_id: (r.n, round(r.s, 4), r.m) for r in batch.collect()}
    assert got == want


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_processor_logic_matches_batch_semantics(spark):
    """The transformWithStateInPandas processor's accumulation logic,
    driven directly with a fake ValueState and pandas batches (the
    operator's end-to-end drain needs google.protobuf for the state
    server — absent in this container, covered by the skipping test
    below on real deployments). Split feeds must accumulate across
    handleInputRows calls exactly like one batch aggregation."""
    import pandas as pd

    from amsterdam_map_data_wrangling_spark.streaming.stateful import (
        _make_running_stats_processor_class,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    proc = _make_running_stats_processor_class()()
    proc._stats = FakeState()
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-02 12:00:00", "2024-01-02 06:00:00"]
    )
    b1 = pd.DataFrame({"value": [1.5, 2.5], "ts": ts[:2]})
    b2 = pd.DataFrame({"value": [4.0], "ts": ts[2:]})
    (out1,) = proc.handleInputRows((7,), iter([b1]), None)
    (out2,) = proc.handleInputRows((7,), iter([b2]), None)
    assert out1.iloc[0]["n_events"] == 2 and out1.iloc[0]["sum_value"] == 4.0
    row = out2.iloc[0]
    assert row["user_id"] == 7 and row["n_events"] == 3
    assert row["sum_value"] == 8.0
    # last_ts is the max event time ever seen, not the last batch's max
    assert row["last_ts"] == pd.Timestamp("2024-01-02 12:00:00")


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas driver worker requires google.protobuf "
    "(absent in this no-pip container; present on real Spark 4 deployments)",
)
def test_transform_with_state_matches_batch_and_legacy_twin(spark):
    """transformWithStateInPandas (Spark 4 arbitrary state API, RocksDB
    state store): after draining the stream, per-user stats must equal
    the batch aggregation — i.e. the modern operator is drain-equivalent
    to the applyInPandasWithState twin."""
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
    from amsterdam_map_data_wrangling_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = running_user_stats_tws(read_events_stream(spark, SF_ORACLE))
        assert stream.isStreaming
        (
            stream.writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    out = (
        spark.table("t_tws")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
            F.max("last_ts").alias("last_ts"),
        )
    )
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 4), r.last_ts)
        for r in out.collect()
    }
    batch = (
        load_tables(spark, SF_ORACLE, ["events"])["events"]
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("ts").alias("m"),
        )
    )
    want = {r.user_id: (r.n, round(r.s, 4), r.m) for r in batch.collect()}
    assert got == want


def test_watermark_bounds_streaming_state(spark):
    """The scale property of watermarks: aggregation state is bounded to
    the watermark horizon. After two micro-batches covering 30 days of
    event time with a 1-hour watermark, the state store must hold only the
    windows still inside the horizon (a handful), not all ~240 windows —
    measured via the stateOperators metrics. (Note: Spark 4's micro-batch
    append mode finalizes behind-watermark windows immediately rather than
    dropping their rows — verified empirically — so the honest assertion
    here is state bounding, which is what makes an unbounded stream
    feasible.)"""
    import os
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

    base = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "late")
    shutil.rmtree(base, ignore_errors=True)
    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    recent = events.filter(F.col("ts") >= F.lit("2024-01-25").cast("timestamp"))
    late = events.filter(F.col("ts") < F.lit("2024-01-05").cast("timestamp"))
    in_dir = os.path.join(base, "in")
    recent.coalesce(1).write.mode("overwrite").parquet(in_dir)
    _time.sleep(1.1)  # strictly later mtime → second micro-batch
    late.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(recent.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("num"))
        .select(F.col("w.start").alias("ws"), "num")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [p for p in q.recentProgress if p["stateOperators"]]
    assert len(progress) >= 2, "expected two micro-batches"
    # watermark advanced to (max recent ts - 1h) before the late batch
    assert progress[-1]["eventTime"]["watermark"].startswith("2024-01-30")
    # state bounded: far fewer windows retained than the ~240 processed
    final_state_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_state_rows <= 5, final_state_rows
    out = spark.table("t_late")
    # every recent window was still emitted exactly once
    n_recent = out.filter(F.col("ws") >= F.lit("2024-01-25").cast("timestamp")).count()
    assert n_recent + final_state_rows >= 144  # 6 days x 24h windows
    assert late.count() > 0  # the late batch genuinely existed


def test_stream_static_enrichment_equals_batch(spark):
    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
    from amsterdam_map_data_wrangling_spark.streaming.enrich import (
        enriched_segment_counts,
    )

    customer = load_tables(spark, SF_ORACLE, ["customer"])["customer"]
    stream = enriched_segment_counts(read_events_stream(spark, SF_ORACLE), customer)
    assert stream.isStreaming
    run_to_memory(stream, "t_enrich")
    got = _rows(spark.table("t_enrich"), ["segment", "event_type", "n_events"])
    want = _rows(
        QUERIES["segment_event_counts"].build(spark, SF_ORACLE),
        ["segment", "event_type", "n_events"],
    )
    assert got == want


def test_stream_stream_interval_join_equals_batch(spark):
    """Stream-stream inner join with event-time bounds: after draining
    both (filtered) streams, the pair set must equal the oracle-gated
    batch twin."""
    from amsterdam_map_data_wrangling_spark.streaming.join import (
        click_error_interval_join_stream,
    )

    stream = click_error_interval_join_stream(read_events_stream(spark, SF_ORACLE))
    assert stream.isStreaming
    run_to_memory(stream, "t_ssjoin", output_mode="append")
    cols = ["click_id", "error_id", "user_id", "click_ts", "error_ts"]
    got = _rows(spark.table("t_ssjoin"), cols)
    batch = QUERIES["interval_join_click_error"].build(spark, SF_ORACLE)
    want = _rows(batch, cols)
    assert got == want and len(got) > 0


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """foreachBatch with an idempotent overwrite-by-batch-id sink: the
    exactly-once recipe for sinks without transactional support — each
    micro-batch writes to a batch-id-keyed location, so a replayed batch
    overwrites itself instead of duplicating. Verifies the union of
    batch outputs equals the batch aggregation over all input."""
    import os

    from pyspark.sql import functions as F

    base = str(tmp_path / "fb_in")
    out = str(tmp_path / "fb_out")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "lang"
    )
    docs.limit(100).write.mode("overwrite").parquet(base)
    docs.filter(F.col("doc_id").between(200, 299)).write.mode("append").parquet(base)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(base)

    def write_batch(batch_df, batch_id):
        # idempotent: path keyed by batch_id; a retry overwrites, never appends
        (
            batch_df.groupBy("lang")
            .agg(F.count("*").alias("n"))
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"batch={batch_id}"))
        )

    (
        stream.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    merged = (
        spark.read.parquet(out)
        .groupBy("lang")
        .agg(F.sum("n").alias("n"))
    )
    want = (
        spark.read.parquet(base)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )
    got = {r.lang: r.n for r in merged.collect()}
    expect = {r.lang: r.n for r in want.collect()}
    assert got == expect and sum(got.values()) == 200


def test_streaming_funnel_flags_match_batch_funnel(spark):
    """applyInPandasWithState funnel: after draining the stream, the
    per-user monotone stage flags must equal the batch funnel's chained
    running-max window flags (the funnel_conversion per-user maxima)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
    from amsterdam_map_data_wrangling_spark.streaming.funnel import (
        streaming_funnel_flags,
    )

    stream = streaming_funnel_flags(read_events_stream(spark, SF_ORACLE))
    assert stream.isStreaming
    (
        stream.writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    # flags are monotone, so the per-user max across batch emissions is
    # the final state
    got = {
        r.user_id: (r.r1, r.r2, r.r3)
        for r in spark.table("t_funnel")
        .groupBy("user_id")
        .agg(
            F.max("reached_view").alias("r1"),
            F.max("reached_click").alias("r2"),
            F.max("reached_purchase").alias("r3"),
        )
        .collect()
    }
    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = events.withColumn(
        "r1", F.max((F.col("event_type") == "view").cast("int")).over(w)
    )
    s2 = s1.withColumn(
        "r2",
        F.max(
            ((F.col("event_type") == "click") & (F.col("r1") == 1)).cast("int")
        ).over(w),
    )
    s3 = s2.withColumn(
        "r3",
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("r2") == 1)).cast("int")
        ).over(w),
    )
    want = {
        r.user_id: (r.r1, r.r2, r.r3)
        for r in s3.groupBy("user_id")
        .agg(
            F.max("r1").alias("r1"),
            F.max("r2").alias("r2"),
            F.max("r3").alias("r3"),
        )
        .collect()
    }
    assert got == want
    # flags are a valid monotone cascade and the funnel actually fires
    # (sf0.01 gives every user ~13 events over 5 types, so full
    # conversion everywhere is the EXPECTED fixture behavior — stage
    # diversity is exercised by the synthetic split-batch test below)
    assert got, "no users emitted"
    for r1, r2, r3 in got.values():
        assert r1 >= r2 >= r3
    assert (1, 1, 1) in set(got.values())


def test_funnel_handler_gates_stages_across_batches():
    """The funnel state handler, driven directly with a fake GroupState
    and hand-built pandas batches: intra-batch disorder is repaired by
    the event-time sort, a click BEFORE the first view never counts,
    and stage bits persist and cascade across micro-batches."""
    import pandas as pd

    from amsterdam_map_data_wrangling_spark.streaming.funnel import _update_funnel

    class FakeState:
        def __init__(self):
            self.v = None

        @property
        def exists(self):
            return self.v is not None

        @property
        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    def batch(rows):
        return pd.DataFrame(
            {
                "user_id": [1] * len(rows),
                "event_type": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]),
                "event_id": [r[2] for r in rows],
            }
        )

    def run(state, rows):
        (out,) = _update_funnel((1,), iter([batch(rows)]), state)
        return tuple(out.iloc[0][c] for c in
                     ("reached_view", "reached_click", "reached_purchase"))

    # click arrives physically first but is EARLIER in event time than
    # the view: sort repairs the order, so the click must NOT count
    st = FakeState()
    assert run(st, [("click", "2024-01-01 00:00", 0),
                    ("view", "2024-01-01 00:01", 1)]) == (1, 0, 0)
    # next batch: purchase before any click → still gated
    assert run(st, [("purchase", "2024-01-01 00:02", 2)]) == (1, 0, 0)
    # click now counts (view bit persisted from batch 1)...
    assert run(st, [("click", "2024-01-01 00:03", 3)]) == (1, 1, 0)
    # ...and a same-batch purchase AFTER the click completes the funnel
    assert run(st, [("purchase", "2024-01-01 00:05", 4)]) == (1, 1, 1)
    # a fresh user whose events all land in one disordered batch
    st2 = FakeState()
    assert run(st2, [("purchase", "2024-01-01 00:03", 2),
                     ("view", "2024-01-01 00:01", 0),
                     ("click", "2024-01-01 00:02", 1)]) == (1, 1, 1)
    # purchase between view and click gates stage 3 (purchase must
    # follow the click, not just the view)
    st3 = FakeState()
    assert run(st3, [("view", "2024-01-01 00:01", 0),
                     ("purchase", "2024-01-01 00:02", 1),
                     ("click", "2024-01-01 00:03", 2)]) == (1, 1, 0)


def test_streaming_gap_sessions_match_batch_sessionization(spark):
    """applyInPandasWithState gap-sessionizer: after draining the
    stream, each user's (n_sessions, n_events) must equal the batch
    lag+cumsum sessionization (gap_sessionization's per-user relation).
    Counts only grow, so the per-user max across emissions is the final
    state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
    from amsterdam_map_data_wrangling_spark.streaming.sessionize import (
        streaming_gap_sessions,
    )
    from amsterdam_map_data_wrangling_spark.streaming.windows import (
        read_events_stream,
    )

    stream = streaming_gap_sessions(read_events_stream(spark, SF_ORACLE))
    assert stream.isStreaming
    (
        stream.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r.user_id: (r.ns, r.ne)
        for r in spark.table("t_sessions")
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("ns"), F.max("n_events").alias("ne")
        )
        .collect()
    }
    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = events.select(
        "user_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    want = {
        r.user_id: (r.ns, r.ne)
        for r in flagged.groupBy("user_id")
        .agg(F.sum("is_new").alias("ns"), F.count("*").alias("ne"))
        .collect()
    }
    assert got == want


def test_session_handler_carries_state_across_batches():
    """Direct handler check of the CROSS-batch path (the file drain above
    runs in one batch): the carried last_us must make the next batch's
    first event compare against the true previous event, with intra-batch
    disorder sorted away."""
    import pandas as pd

    from amsterdam_map_data_wrangling_spark.streaming.sessionize import (
        _update_sessions,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    MIN = 60_000_000
    # batch 1, deliberately out of order: events at 10min and 0min
    b1 = pd.DataFrame({"us": [10 * MIN, 0], "event_id": [2, 1]})
    out1 = list(_update_sessions((7,), [b1], st))[0]
    assert (
        out1.loc[0, "n_sessions"],
        out1.loc[0, "n_events"],
    ) == (1, 2)
    # batch 2: 20min continues the session (gap 10min); 2h opens a new one
    b2 = pd.DataFrame({"us": [120 * MIN, 20 * MIN], "event_id": [4, 3]})
    out2 = list(_update_sessions((7,), [b2], st))[0]
    assert (
        out2.loc[0, "n_sessions"],
        out2.loc[0, "n_events"],
    ) == (2, 4)
    assert st.get == (120 * MIN, 2, 4)


def test_session_handler_chunk_order_invariance():
    """r6 ADVICE regression: applyInPandasWithState delivers a group's
    micro-batch rows as MULTIPLE Arrow chunks in arbitrary shuffle
    order. The handler must concat-then-sort across chunks — a
    per-chunk sort would count the 2h-gap event as the session OPENER
    and the t=0 event as a continuation, yielding 1 session instead of
    the correct 2."""
    import pandas as pd

    from amsterdam_map_data_wrangling_spark.streaming.sessionize import (
        _update_sessions,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    MIN = 60_000_000
    # one micro-batch, two chunks, LATER event in the EARLIER chunk
    chunks = [
        pd.DataFrame({"us": [120 * MIN], "event_id": [2]}),
        pd.DataFrame({"us": [0], "event_id": [1]}),
    ]
    st = FakeState()
    out = list(_update_sessions((1,), chunks, st))[0]
    assert (
        out.loc[0, "n_sessions"],
        out.loc[0, "n_events"],
    ) == (2, 2)
    # carried state must reflect the true LAST event, not the last chunk
    assert st.get == (120 * MIN, 2, 2)


def test_session_handler_batch_split_invariance_property():
    """Hypothesis: for ANY event-time sequence and ANY split into
    event-time-ordered micro-batches, the handler's final state equals
    the single-pass sessionization — the property that makes the
    streaming twin trustworthy regardless of micro-batch boundaries."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amsterdam_map_data_wrangling_spark.streaming.sessionize import (
        GAP_US,
        _update_sessions,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    @settings(max_examples=60, deadline=None)
    @given(
        gaps=st.lists(
            st.integers(min_value=0, max_value=4 * GAP_US), min_size=1, max_size=25
        ),
        splits=st.sets(st.integers(min_value=1, max_value=24)),
    )
    def run(gaps, splits):
        times = [0]
        for g in gaps[1:]:
            times.append(times[-1] + g)
        # reference: single pass
        ref_sessions = 1 + sum(
            1 for a, b in zip(times, times[1:]) if b - a > GAP_US
        )
        # handler: split into ordered batches at the given boundaries
        bounds = sorted(x for x in splits if x < len(times))
        chunks, lo = [], 0
        for b in bounds:
            if b > lo:
                chunks.append(times[lo:b])
                lo = b
        chunks.append(times[lo:])
        st_ = FakeState()
        for chunk in chunks:
            pdf = pd.DataFrame(
                {"us": chunk, "event_id": list(range(len(chunk)))}
            )
            out = list(_update_sessions((1,), [pdf], st_))[0]
        assert out.loc[0, "n_events"] == len(times)
        assert out.loc[0, "n_sessions"] == ref_sessions

    run()


def test_tws_session_processor_logic_matches_legacy_handler():
    """The transformWithState sessionizer must implement the exact
    session algebra of the legacy applyInPandasWithState handler —
    verified at the processor level (the e2e drain needs protobuf,
    env-gated like the running-stats tws twin)."""
    import pandas as pd
    import pytest as _pytest

    try:
        from amsterdam_map_data_wrangling_spark.streaming.sessionize import (
            GapSessionsProcessor,
        )

        proc = GapSessionsProcessor()
    except ImportError:
        _pytest.skip("stateful_processor import needs protobuf here")

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.vs = FakeValueState()

        def getValueState(self, name, schema):
            return self.vs

    h = FakeHandle()
    proc.init(h)
    MIN = 60_000_000
    b1 = pd.DataFrame({"us": [10 * MIN, 0], "event_id": [2, 1]})
    out1 = list(proc.handleInputRows((5,), [b1], None))[0]
    assert (out1.loc[0, "n_sessions"], out1.loc[0, "n_events"]) == (1, 2)
    b2 = pd.DataFrame({"us": [120 * MIN, 20 * MIN], "event_id": [4, 3]})
    out2 = list(proc.handleInputRows((5,), [b2], None))[0]
    assert (out2.loc[0, "n_sessions"], out2.loc[0, "n_events"]) == (2, 4)
    assert h.vs.get() == (120 * MIN, 2, 4)


def test_session_handler_timeout_path_emits_final_and_drops_state():
    """State-expiry path: a timed-out invocation (empty rows,
    hasTimedOut=True) must emit the final per-user totals and REMOVE
    the state row — the bounding that keeps live state proportional to
    active users."""
    import pandas as pd

    from amsterdam_map_data_wrangling_spark.streaming.sessionize import (
        _update_sessions,
    )

    class FakeState:
        def __init__(self, v):
            self._v = v
            self.hasTimedOut = False
            self.removed = False

        @property
        def exists(self):
            return self._v is not None and not self.removed

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self.removed = True

    st = FakeState((1_000_000, 3, 17))
    st.hasTimedOut = True
    out = list(_update_sessions((9,), iter([]), st))
    assert len(out) == 1
    assert (
        out[0].loc[0, "n_sessions"],
        out[0].loc[0, "n_events"],
    ) == (3, 17)
    assert st.removed


def test_checkpoint_recovery_resumes_exactly_once(spark, tmp_path):
    """Kill-and-resume: a streaming aggregation stopped mid-source and
    RESTARTED from its checkpoint must end at exactly the batch answer —
    no dropped and no double-counted files. This is the recovery
    contract every production streaming job leans on; availableNow +
    maxFilesPerTrigger=1 makes the file source deliver one file per
    micro-batch deterministically."""
    import time

    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # 4 single-file slices of deterministic rows
    base = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3 + 1).alias("v"),
    )
    for i in range(4):
        base.filter((F.col("id") % 4) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def start(query_name):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q1 = start("t_ckpt_a")
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            p = q1.lastProgress
            if p and p["batchId"] >= 1:
                break
            time.sleep(0.2)
        assert q1.lastProgress and q1.lastProgress["batchId"] >= 1
    finally:
        q1.stop()  # killed mid-source: >= 2 of the file-batches processed

    # resume from the SAME checkpoint; availableNow drains the remainder
    q2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .writeStream.format("memory")
        .queryName("t_ckpt_b")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = {
        r["k"]: (r["n"], r["sv"])
        for r in spark.table("t_ckpt_b").collect()
    }
    want = {
        r["k"]: (r["n"], r["sv"])
        for r in base.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == want


def test_streaming_scd2_closed_intervals_match_batch(spark):
    """Streaming SCD2 maintenance: summing the drained closed-interval
    deltas per event_type must reproduce the batch SCD2 gate's closed
    portion exactly — (n_intervals − n_open, total_state_us)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
    from amsterdam_map_data_wrangling_spark.streaming.scd2 import (
        streaming_scd2_closed_intervals,
    )
    from amsterdam_map_data_wrangling_spark.streaming.windows import (
        read_events_stream,
    )

    stream = streaming_scd2_closed_intervals(
        read_events_stream(spark, SF_ORACLE)
    )
    assert stream.isStreaming
    (
        stream.writeStream.format("memory")
        .queryName("t_scd2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r.event_type: (r.nc, r.cu)
        for r in spark.table("t_scd2")
        .groupBy("event_type")
        .agg(
            F.sum("n_closed").alias("nc"), F.sum("closed_us").alias("cu")
        )
        .collect()
    }
    events = load_tables(spark, SF_ORACLE, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    h = events.select(
        "event_type",
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    want = {
        r.event_type: (r.nc, r.cu)
        for r in h.groupBy("event_type")
        .agg(
            F.count("*").alias("nc"),
            F.sum(F.col("next_us") - F.col("us")).alias("cu"),
        )
        .collect()
    }
    assert got == want


def test_scd2_handler_closes_boundary_interval_across_batches():
    """Direct handler check of the cross-batch path: the interval left
    open by batch 1 must close against batch 2's first event with the
    CARRIED type and start time, and intra-batch disorder (multiple
    unsorted Arrow chunks) must be repaired by the concat+sort."""
    import pandas as pd

    from amsterdam_map_data_wrangling_spark.streaming.scd2 import _update_scd2

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    # batch 1: two chunks delivered OUT of time order
    b1a = pd.DataFrame({"us": [2_000_000], "event_id": [2],
                        "event_type": ["click"]})
    b1b = pd.DataFrame({"us": [1_000_000], "event_id": [1],
                        "event_type": ["view"]})
    out1 = pd.concat(list(_update_scd2((7,), iter([b1a, b1b]), st)))
    # one interval closed: the sorted order opens with "view"
    assert out1.to_dict("records") == [
        {"user_id": 7, "event_type": "view", "n_closed": 1,
         "closed_us": 1_000_000}
    ]
    assert st.get == (2_000_000, "click")

    # batch 2: the boundary interval (open "click" @2s) must close
    # against 5s with the carried type.
    b2 = pd.DataFrame({"us": [5_000_000], "event_id": [3],
                       "event_type": ["purchase"]})
    out2 = pd.concat(list(_update_scd2((7,), iter([b2]), st)))
    assert out2.to_dict("records") == [
        {"user_id": 7, "event_type": "click", "n_closed": 1,
         "closed_us": 3_000_000}
    ]
    assert st.get == (5_000_000, "purchase")


def test_scd2_handler_batch_split_invariance_property():
    """Hypothesis: for ANY typed event-time sequence and ANY split into
    event-time-ordered micro-batches, summing the handler's emitted
    closed-interval deltas equals the single-pass lead() computation —
    micro-batch boundaries cannot change the dimension history."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amsterdam_map_data_wrangling_spark.streaming.scd2 import _update_scd2

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    @settings(max_examples=60, deadline=None)
    @given(
        gaps=st.lists(
            st.integers(min_value=0, max_value=10_000_000),
            min_size=1,
            max_size=25,
        ),
        types=st.data(),
        splits=st.sets(st.integers(min_value=1, max_value=24)),
    )
    def run(gaps, types, splits):
        times = [0]
        for g in gaps[1:]:
            times.append(times[-1] + g)
        tlist = [
            types.draw(st.sampled_from(["a", "b", "c"]))
            for _ in times
        ]
        # reference single pass: interval i-1 closes at i, attributed
        # to the opening event's type
        want: dict[str, list[int]] = {}
        for i in range(1, len(times)):
            acc = want.setdefault(tlist[i - 1], [0, 0])
            acc[0] += 1
            acc[1] += times[i] - times[i - 1]

        bounds = sorted(b for b in splits if b < len(times))
        pieces, prev = [], 0
        for b in bounds + [len(times)]:
            if b > prev:
                pieces.append((times[prev:b], tlist[prev:b]))
                prev = b
        st_obj = FakeState()
        got: dict[str, list[int]] = {}
        for ts_piece, ty_piece in pieces:
            out = list(
                _update_scd2(
                    (1,),
                    iter(
                        [
                            pd.DataFrame(
                                {
                                    "us": ts_piece,
                                    "event_id": list(range(len(ts_piece))),
                                    "event_type": ty_piece,
                                }
                            )
                        ]
                    ),
                    st_obj,
                )
            )
            for pdf in out:
                for r in pdf.to_dict("records"):
                    acc = got.setdefault(r["event_type"], [0, 0])
                    acc[0] += r["n_closed"]
                    acc[1] += r["closed_us"]
        assert got == want

    run()


def test_streaming_scd2_multi_batch_e2e_matches_batch(spark, tmp_path):
    """END-TO-END cross-batch proof for the streaming SCD2: the event
    log split into two time-ordered files, streamed with
    maxFilesPerTrigger=1 so boundary intervals MUST close via carried
    state in a real streaming query (the unit/property tests cover the
    handler; this covers the full applyInPandasWithState state store
    path). Totals must still equal the batch lead() relation."""
    import glob
    import os
    import shutil
    import time as _time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.sources.registry import load_tables
    from amsterdam_map_data_wrangling_spark.streaming.scd2 import (
        streaming_scd2_closed_intervals,
    )

    events = load_tables(spark, SF_SMALL, ["events"])["events"]
    cut = events.agg(
        F.percentile_approx("ts", 0.5).alias("m")
    ).collect()[0].m
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    for i, part in enumerate(
        [events.filter(F.col("ts") <= cut), events.filter(F.col("ts") > cut)]
    ):
        d = str(tmp_path / f"w{i}")
        part.coalesce(1).write.parquet(d)
        (src,) = glob.glob(os.path.join(d, "part-*.parquet"))
        shutil.copy(src, os.path.join(stream_dir, f"{i:03d}.parquet"))
        _time.sleep(1.1)  # distinct mtimes pin file → batch order

    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        streaming_scd2_closed_intervals(stream)
        .writeStream.format("memory")
        .queryName("t_scd2_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    data_batches = [
        p for p in q.recentProgress if p["numInputRows"] > 0
    ]
    assert len(data_batches) >= 2, "expected a genuinely multi-batch run"

    got = {
        r.event_type: (r.nc, r.cu)
        for r in spark.table("t_scd2_mb")
        .groupBy("event_type")
        .agg(F.sum("n_closed").alias("nc"), F.sum("closed_us").alias("cu"))
        .collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    h = events.select(
        "event_type", us.alias("us"), F.lead(us).over(w).alias("next_us")
    ).filter(F.col("next_us").isNotNull())
    want = {
        r.event_type: (r.nc, r.cu)
        for r in h.groupBy("event_type")
        .agg(
            F.count("*").alias("nc"),
            F.sum(F.col("next_us") - F.col("us")).alias("cu"),
        )
        .collect()
    }
    assert got == want


def test_stream_warc_ingest_equals_batch_and_tracks_new_files(spark, tmp_path):
    """Streaming crawl ingestion (streaming/ingest.py): shards shredded
    via the SAME kernel as the batch reader, exactly-once across
    restarts — batch 1 commits, new shards land, a resumed query picks
    up ONLY the new files, and the union equals the batch read."""
    import hashlib

    from amsterdam_map_data_wrangling_spark.sources.archives import (
        read_warc_records,
    )
    from amsterdam_map_data_wrangling_spark.streaming.ingest import (
        stream_warc_records,
    )

    from .test_archives import _warc_record

    land = tmp_path / "landing"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def shard(a, n):
        (land / f"shard_{a:02d}.warc").write_bytes(
            b"".join(
                _warc_record(f"s{a}r{i}", "metadata", f"http://s{a}/{i}",
                             f"payload {a}:{i}".encode())
                for i in range(n)
            )
        )

    def drain():
        # parquet sink: fault-tolerant, so the second start RESUMES the
        # same checkpoint (a memory sink cannot recover from one)
        q = (
            stream_warc_records(spark, str(land), max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.record_id, hashlib.md5(bytes(r.payload)).hexdigest())
            for r in spark.read.parquet(out).collect()
        }

    shard(0, 3)
    shard(1, 4)
    first = drain()
    assert len(first) == 7

    shard(2, 5)  # lands after the first drain committed
    both = drain()  # resumes from the SAME checkpoint
    assert len(both) == 12  # only the new shard added — no re-shredding

    batch = {
        (r.record_id, hashlib.md5(bytes(r.payload)).hexdigest())
        for r in read_warc_records(spark, str(land)).collect()
    }
    assert both == batch and first < both


def test_stream_warc_oversized_shard_fails_loud(spark, tmp_path):
    """Landing-zone size policy (r8/r9 verdict): binaryFile materializes
    a shard as ONE row, so a shard over max_file_bytes must kill the
    query with a named, actionable error — never a silent straggler."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from amsterdam_map_data_wrangling_spark.streaming.ingest import (
        stream_warc_records,
    )

    from .test_archives import _warc_record

    land = tmp_path / "landing"
    land.mkdir()
    (land / "big.warc").write_bytes(
        _warc_record("r0", "metadata", "http://x/0", b"p" * 4096)
    )
    q = (
        stream_warc_records(spark, str(land), max_file_bytes=1024)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException) as exc:
        q.awaitTermination()
    msg = str(exc.value)
    assert "max_file_bytes" in msg and "start_ranged_warc_ingest" in msg
    assert "big.warc" in msg


def test_ranged_warc_ingest_splits_and_resumes(spark, tmp_path):
    """start_ranged_warc_ingest: the giant-shard streaming route — the
    file stream carries metadata only; each epoch reads its shards
    through warc_split byte ranges and writes an idempotent epoch dir.
    Exactly-once across restart: a resumed stream ingests ONLY shards
    that landed after the first drain, and the union equals the batch
    ranged read."""
    import hashlib

    from amsterdam_map_data_wrangling_spark.streaming.ingest import (
        start_ranged_warc_ingest,
    )

    from .test_archives import _warc_record

    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def shard(a, n):
        (land / f"shard_{a:02d}.warc").write_bytes(
            b"".join(
                _warc_record(f"s{a}r{i}", "metadata", f"http://s{a}/{i}",
                             (f"payload {a}:{i} ".encode()) * 40)
                for i in range(n)
            )
        )

    def drain():
        q = start_ranged_warc_ingest(
            spark, str(land), out, ckpt,
            split_bytes=2048,  # tiny splits: a shard really becomes many ranges
            available_now=True,
        )
        q.awaitTermination()
        return {
            (r.record_id, hashlib.md5(bytes(r.payload)).hexdigest())
            for r in spark.read.parquet(out).collect()
        }

    shard(0, 6)
    shard(1, 4)
    first = drain()
    assert len(first) == 10

    shard(2, 8)
    both = drain()
    assert len(both) == 18 and first < both

    # parity with the batch ranged reader over the same landing dir
    from amsterdam_map_data_wrangling_spark.sources.warc_split import (
        SplitWarcDataSource,
    )

    try:
        spark.dataSource.register(SplitWarcDataSource)
    except Exception:
        pass
    batch = (
        spark.read.format("warc_split")
        .option("path", str(land))
        .option("split_bytes", 2048)
        .load()
    )
    want = {
        (r.record_id, hashlib.md5(bytes(r.payload)).hexdigest())
        for r in batch.collect()
    }
    assert both == want
