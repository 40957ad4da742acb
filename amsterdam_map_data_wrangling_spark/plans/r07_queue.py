"""Round-7 registration queue: (build, oracle) pairs VALIDATED this
round but deliberately NOT registered — the round-6 gate window is at
its documented overflow limit (plans/catalog.py capacity math), so
registering them now would break the freshness policy. This module is
not imported by catalog._load_all (no registration side effects);
tests/test_r07_queue.py keeps every pair hash-green against DuckDB so
round 7 can move them into the registry by adding @query decorators and
rotation entries only.

Float-gate conventions as the registered catalog: cosines rounded to 4
(the tfidf family's convention), winsorized sums gated in exact integer
cents."""

from __future__ import annotations

from pyspark.sql import functions as F

SPARSE_COSINE_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ), th AS (
      SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS t FROM toks
    ), tf AS (
      SELECT id, t, COUNT(*) AS tf FROM th GROUP BY id, t
    ), dfreq AS (
      SELECT t, COUNT(*) AS df FROM tf GROUP BY t
    ), nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    w AS (
      SELECT id, tf.t,
             CAST(tf AS DOUBLE) * (ln(CAST(n_docs + 1 AS DOUBLE)
               / CAST(df + 1 AS DOUBLE)) + 1.0) AS w
      FROM tf JOIN dfreq ON tf.t = dfreq.t CROSS JOIN nd
      WHERE df <= 50
    ), norms AS (
      SELECT id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY id
    ), dots AS (
      SELECT a.id AS id_a, b.id AS id_b, SUM(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.t = b.t AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 4) AS cosine_r
    FROM dots
    JOIN norms na ON na.id = id_a
    JOIN norms nb ON nb.id = id_b
    WHERE dot / (na.nrm * nb.nrm) >= 0.3
"""


def sparse_cosine_build(spark, sf_dir):
    """Spark side of the r07 `sparse_cosine_pairs` query (threshold 0.3,
    df_cap 50, cosine rounded to 4 to match the oracle alias)."""
    from amsterdam_map_data_wrangling_spark.operators.sparse import (
        sparse_cosine_pairs,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    return sparse_cosine_pairs(
        documents.select("doc_id", "text"),
        "doc_id",
        "text",
        threshold=0.3,
        df_cap=50,
    ).select("id_a", "id_b", F.round("cosine", 4).alias("cosine_r"))


WINSORIZE_ORACLE = """
    WITH cuts AS (
      SELECT quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders
    )
    SELECT CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS clipped_lo,
           CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS clipped_hi,
           CAST(SUM(CAST(round(least(greatest(o_totalprice, lo), hi) * 100)
                    AS BIGINT)) AS BIGINT) AS winsorized_cents
    FROM orders CROSS JOIN cuts
"""


def winsorize_build(spark, sf_dir):
    """Spark side of the r07 winsorization query: exact percentile cut
    points (Spark percentile == DuckDB quantile_cont, the equivalence
    value_percentiles_by_type already gates), totals in exact cents."""
    from amsterdam_map_data_wrangling_spark.operators.features import winsorize
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (orders,) = _t(spark, sf_dir, "orders")
    w = winsorize(orders, "o_totalprice", 0.05, 0.95)
    return w.agg(
        F.sum(F.when(F.col("clip_flag") == -1, 1).otherwise(0)).alias(
            "clipped_lo"
        ),
        F.sum(F.when(F.col("clip_flag") == 1, 1).otherwise(0)).alias(
            "clipped_hi"
        ),
        F.sum(
            F.round(F.col("o_totalprice_w") * 100).cast("bigint")
        ).alias("winsorized_cents"),
    )


#: name -> (build, oracle) — everything round 7 needs to register
QUEUE = {
    "sparse_cosine_pairs": (sparse_cosine_build, SPARSE_COSINE_ORACLE),
    "winsorize_price_stats": (winsorize_build, WINSORIZE_ORACLE),
}
