"""Recursive struct flattening + array shredding."""

from __future__ import annotations

import pytest

from amsterdam_map_data_wrangling_spark.functions.nested import flatten_structs


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame(
        [(1, {"a": 10, "geo": {"lat": 52.0, "lon": 4.9}}, "x")],
        "id long, meta struct<a:long, geo:struct<lat:double, lon:double>>, "
        "tag string",
    )
    out = flatten_structs(df)
    assert out.columns == ["id", "meta_a", "meta_geo_lat", "meta_geo_lon",
                           "tag"]
    r = out.collect()[0]
    assert (r.id, r.meta_a, r.meta_geo_lat, r.meta_geo_lon, r.tag) == (
        1, 10, 52.0, 4.9, "x",
    )
    # plan is a pure projection — no exchange anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_flatten_explodes_struct_arrays_outer(spark):
    df = spark.createDataFrame(
        [
            (1, [{"k": "a", "v": 1}, {"k": "b", "v": 2}]),
            (2, []),
            (3, None),
        ],
        "id long, items array<struct<k:string, v:long>>",
    )
    out = flatten_structs(df, explode_arrays=True).orderBy("id", "items_k")
    rows = [(r.id, r.items_k, r.items_v) for r in out.collect()]
    assert rows == [
        (1, "a", 1), (1, "b", 2), (2, None, None), (3, None, None),
    ]


def test_flatten_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, {"b": 2}, 3)], "id long, a struct<b:long>, a_b long"
    )
    with pytest.raises(ValueError, match="collide"):
        flatten_structs(df)
