"""Smoke test for scripts/make_scale_dir.py's replication semantics:
key disjointness across replicas, FK preservation (joins scale exactly
N×), replica-tagged document vocabulary disjointness, and perturbed
(non-identical) embeddings — the invariants the sf1 soak's validity
rests on."""

from __future__ import annotations

import importlib.util
import os
import sys

from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "make_scale_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "make_scale_dir.py",
    ),
)
_MOD = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("make_scale_dir", _MOD)
_SPEC.loader.exec_module(_MOD)


def test_replicate_preserves_joins_and_disjointness(spark):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    o2 = _MOD._replicate(orders, "orders", 3)
    l2 = _MOD._replicate(lineitem, "lineitem", 3)
    assert o2.count() == 3 * orders.count()
    # keys disjoint across replicas
    assert o2.select("o_orderkey").distinct().count() == o2.count()
    # FK joins scale EXACTLY 3x (every lineitem still finds its order
    # within its own replica, never across replicas)
    base = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
    assert (
        l2.join(o2, l2.l_orderkey == o2.o_orderkey).count() == 3 * base
    )

    d2 = _MOD._replicate(docs, "documents", 2)
    # replica token tagging: vocabulary disjoint across replicas, so no
    # cross-replica shingle/near-dup collisions
    vocab = (
        d2.withColumn("r", (F.col("doc_id") / _MOD.KEY_STRIDE).cast("int"))
        .select("r", F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .groupBy("t")
        .agg(F.countDistinct("r").alias("nr"))
        .agg(F.max("nr").alias("m"))
        .collect()[0]["m"]
    )
    assert vocab == 1
