r"""Round-8 registration queue: (build, oracle) pairs VALIDATED this
round but deliberately NOT registered — round 7 closed with the gate
window exactly at its capacity-math balance (every further registration
would displace an r05-green name whose verdict hits the 3-round ceiling
at r08; the r08 front is already owed to the 26-name park — see
plans/catalog.py). This module is not imported by catalog._load_all;
tests/test_r08_queue.py keeps every pair hash-green against DuckDB at
both SFs so round 8 can register by adding @query decorators + rotation
entries + an ORACLE_HASHES.json "8" snapshot only.

Float-gate conventions as the registered catalog (plans/catalog.py
module docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: deterministic 80/10/10 split on the portable hash — the dataset-split
#: stage every training pipeline runs; retry-stable like the samplers.
SPLIT_ORACLE = """
    WITH keyed AS (
      SELECT source,
             ('0x' || substr(md5('split|spark-graft|'
               || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM keyed GROUP BY source, split
"""


def split_build(spark, sf_dir):
    """Deterministic hash train/val/test split, counted per source: the
    portable md5 bucket means the SAME document lands in the same split
    on any engine, any retry, any cluster size — the reproducibility
    property random splits lack. Scale: a narrow map + one (source,
    split) aggregation; no data movement beyond the count shuffle."""
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit("split"),
                        F.lit("spark-graft"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        documents.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


#: per-label centroid of the embedding corpus with EXACT-INT arithmetic:
#: components quantize (floor(x*1000 + 0.5) — the similarity family's
#: portable anchor), per-(label, dim) integer sums are exact, and the
#: single division per output value is correctly-rounded IEEE → both
#: engines emit identical doubles (rounded to 6 anyway).
CENTROID_ORACLE = """
    WITH e AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), comp AS (
      SELECT label, d.i,
             CAST(floor(v[d.i] * 1000 + 0.5) AS BIGINT) AS q
      FROM e, unnest(range(1, 65)) AS d(i)
    )
    SELECT label, CAST(i AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / COUNT(*) / 1000.0,
                 6) AS mean_r
    FROM comp GROUP BY label, i
"""


def centroid_build(spark, sf_dir):
    """Per-label embedding centroids in long (label, dim) form — the
    class-prototype builder (nearest-centroid classification, cluster
    drift monitoring). Components quantize to exact ints BEFORE the
    sum so the aggregation is accumulation-order-free; one division at
    the end. Scale: posexplode is a narrow map; one (label, dim)
    aggregation — 64·|labels| output rows regardless of corpus size."""
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (embeddings,) = _t(spark, sf_dir, "embeddings")
    comp = embeddings.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i0", "x"
        ),
    ).select(
        "label",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x") * 1000 + 0.5).cast("long").alias("q"),
    )
    return comp.groupBy("label", "i").agg(
        F.count("*").alias("n"), F.sum("q").alias("sq")
    ).select(
        "label",
        F.col("i").cast("bigint").alias("dim"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("sq").cast("double") / F.col("n") / 1000.0, 6
        ).alias("mean_r"),
    )


QUEUE = {
    "dataset_split_stats": (split_build, SPLIT_ORACLE),
    "embedding_label_centroids": (centroid_build, CENTROID_ORACLE),
}
