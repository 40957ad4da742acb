"""Degenerate-corpus robustness for the ENTIRE r08 queue: a 1-row
corpus (one user, one event, one document, one order, one vector) must
never crash a queued plan — divisions by empty strata return NULL, pair
stages return empty, ANSI mode stays on. This is the preemptive version
of the NULL/degenerate-input findings past ADVICE rounds raised against
winsorize and robust-z."""

from __future__ import annotations

import datetime

import pytest

from amsterdam_map_data_wrangling_spark.plans.r08_queue import QUEUE


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_sf"))
    spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 12, 0, 0), 7, "purchase", 5.0,
          "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        [(0, "one tiny document", "en", "web", 17)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [(1, 3, "O", 100.0, datetime.datetime(1995, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(0, [0.1] * 64, 2)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{d}/embeddings.parquet")
    spark.createDataFrame(
        [(3, "Customer#3", "addr", 1, "p", 10.0, "BUILDING", "c")],
        "c_custkey long, c_name string, c_address string, "
        "c_nationkey long, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string",
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(1, 1, 1, 1, 5.0, 100.0, 0.1, 0.02, "N", "O",
          datetime.datetime(1995, 2, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).write.parquet(f"{d}/lineitem.parquet")
    return d


@pytest.mark.parametrize("name", sorted(QUEUE))
def test_queue_build_survives_one_row_corpus(spark, tiny_sf, name):
    build, _oracle = QUEUE[name]
    rows = build(spark, tiny_sf).collect()  # must not raise
    assert isinstance(rows, list)
