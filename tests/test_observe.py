"""Observation metrics (df.observe): production pipelines piggyback
row-count / invariant metrics on an existing action instead of paying a
second pass — the monitoring hook a 100 TB job uses to self-audit
(rows in vs rows out, null-key counts) at zero extra scan cost."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_ORACLE


def test_observe_metrics_match_direct_aggregates(spark):
    orders = load_tables(spark, SF_ORACLE, ["orders"])["orders"]
    obs = Observation("orders_audit")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "sum_cents"
        ),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("null_keys"),
    )
    # the downstream "real" work — one action drives both the result and
    # the metrics
    kept = observed.filter(F.col("o_orderstatus") != "P").count()
    m = obs.get
    direct = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "sum_cents"
        ),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_keys"
        ),
    ).collect()[0]
    assert m["n_rows"] == direct["n_rows"]
    assert m["sum_cents"] == direct["sum_cents"]
    assert m["null_keys"] == direct["null_keys"] == 0
    # the observation sees PRE-filter rows (it sits above the scan, not
    # the filter) — the audit is of what entered the stage
    assert kept < m["n_rows"]


def test_map_in_arrow_matches_jvm_norms(spark):
    """mapInArrow — the lowest-level Arrow extension point (§2.10's last
    uncovered flavor after pandas_udf / mapInPandas / applyInPandas /
    transformWithState / UDTF / DataSource): recompute embedding L2
    norms from raw Arrow RecordBatches with pyarrow.compute and match
    the JVM-side HOF result to double precision."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    emb = load_tables(spark, SF_ORACLE, ["embeddings"])["embeddings"].limit(
        200
    )

    def norms(batches):
        import numpy as np

        for batch in batches:
            vecs = batch.column(batch.schema.get_field_index("embedding"))
            flat = pc.list_flatten(vecs).cast(pa.float64())
            sq = pc.multiply(flat, flat)
            lens = pc.list_value_length(vecs)
            arr = sq.to_numpy(zero_copy_only=False)
            offs = np.cumsum(lens.to_numpy(zero_copy_only=False))[:-1]
            sums = [float(x.sum()) for x in np.split(arr, offs)]
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": batch.column(
                        batch.schema.get_field_index("vec_id")
                    ),
                    "nrm": pa.array(
                        [s ** 0.5 for s in sums], type=pa.float64()
                    ),
                }
            )

    got = {
        r["vec_id"]: r["nrm"]
        for r in emb.mapInArrow(norms, "vec_id bigint, nrm double").collect()
    }
    want = {
        r["vec_id"]: r["nrm"]
        for r in emb.select(
            "vec_id",
            F.sqrt(
                F.aggregate(
                    F.transform(
                        F.col("embedding").cast("array<double>"),
                        lambda x: x * x,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ).alias("nrm"),
        ).collect()
    }
    assert set(got) == set(want)
    import pytest as _pt

    for k in want:
        assert got[k] == _pt.approx(want[k], rel=1e-12)
