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


UNIFORM_SAMPLE_ORACLE = """
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5('samp|spark-graft|'
                 || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id
             ) AS rnk
      FROM documents
    )
    SELECT source, doc_id FROM ranked WHERE rnk <= 5
"""


def uniform_sample_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.features import (
        hash_rank_sample_per_group,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    return hash_rank_sample_per_group(
        documents, "source", "doc_id", k=5
    ).select("source", "doc_id")


WEIGHTED_SAMPLE_ORACLE = """
    WITH keyed AS (
      SELECT source, doc_id,
             ln((('0x' || substr(md5('wsamp|spark-graft|'
                 || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
                / 4503599627370496.0) / n_chars AS k
      FROM documents WHERE n_chars > 0
    ), ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source ORDER BY k DESC, doc_id) AS rnk
      FROM keyed
    )
    SELECT source, doc_id FROM ranked WHERE rnk <= 4
"""


def weighted_sample_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.features import (
        weighted_sample_per_group,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    return weighted_sample_per_group(
        documents, "source", "doc_id", "n_chars", k=4
    ).select("source", "doc_id")


SORTED_NEIGHBORHOOD_ORACLE = r"""
    WITH ranked AS (
      SELECT doc_id AS id,
             substr(lower(trim(text)), 1, 12) AS k,
             row_number() OVER (
               ORDER BY substr(lower(trim(text)), 1, 12), doc_id) AS r
      FROM documents
    ), offs AS (
      SELECT id, r, r + o.off AS r2, o.off
      FROM ranked, (SELECT unnest([1, 2, 3]) AS off) o
    )
    SELECT offs.id AS id_a, ranked.id AS id_b,
           CAST(offs.off AS BIGINT) AS rank_gap
    FROM offs JOIN ranked ON ranked.r = offs.r2
"""


def sorted_neighborhood_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    key = F.substring(F.lower(F.trim(F.col("text"))), 1, 12)
    return sorted_neighborhood_pairs(documents, "doc_id", key, window=4).select(
        "id_a", "id_b", F.col("rank_gap").cast("bigint").alias("rank_gap")
    )


TRIANGLE_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS l
      FROM documents
    ), sh AS (
      SELECT DISTINCT id,
             l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                  || ' ' || l[i+4] AS shingle
      FROM toks, unnest(range(1, len(l) - 3)) AS r(i)
      WHERE len(l) >= 5
    ), rare AS (
      SELECT id, shingle FROM sh
      WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle
                        HAVING COUNT(*) <= 50)
    ), sizes AS (SELECT id, COUNT(*) AS n_sh FROM rare GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM inter
      JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.3
    ), wedges AS (
      SELECT w1.a, w1.b AS m, w2.b AS c
      FROM e w1 JOIN e w2 ON w1.b = w2.a
    ), tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM wedges JOIN e ON e.a = wedges.a AND e.b = wedges.c
    ), deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
      ) GROUP BY n
    ), triads AS (
      SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_triads FROM deg
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           (SELECT n_triads FROM triads) AS n_triads,
           CAST((SELECT n_triangles FROM tri) AS BIGINT) AS n_triangles,
           CASE WHEN (SELECT n_triads FROM triads) > 0
                THEN round(3.0 * (SELECT n_triangles FROM tri)
                     / CAST((SELECT n_triads FROM triads) AS DOUBLE), 6)
                ELSE 0.0 END AS clustering
"""


def triangle_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.dedup import (
        ngram_jaccard_pairs,
        triangle_stats,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        documents, "doc_id", "text", w=5, threshold=0.3, df_cap=50
    )
    return triangle_stats(pairs.select("id_a", "id_b"))


UNIGRAM_LM_ORACLE = r"""
    WITH th AS (
      SELECT doc_id AS id,
             ('0x' || substr(md5(unnest(
               string_split_regex(trim(text), '\s+'))), 1, 15))::BIGINT AS t
      FROM documents
    ), model AS (
      SELECT t, COUNT(*) AS c FROM th GROUP BY t
    ), totals AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS n_vocab
      FROM model
    )
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(AVG(ln(CAST(c + 1 AS DOUBLE)
                 / CAST(n_total + n_vocab AS DOUBLE))), 6) AS mean_lp_r
    FROM th JOIN model USING (t) CROSS JOIN totals
    GROUP BY id
"""


def unigram_lm_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.features import (
        unigram_logprob_scores,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    return unigram_logprob_scores(documents, "doc_id", "text").select(
        "id",
        "n_tokens",
        F.round("mean_logprob", 6).alias("mean_lp_r"),
    )


QUEUE.update(
    {
        "uniform_sample_per_group": (uniform_sample_build, UNIFORM_SAMPLE_ORACLE),
        "weighted_sample_per_group": (weighted_sample_build, WEIGHTED_SAMPLE_ORACLE),
        "sorted_neighborhood_window": (
            sorted_neighborhood_build,
            SORTED_NEIGHBORHOOD_ORACLE,
        ),
        "near_dup_transitivity": (triangle_build, TRIANGLE_ORACLE),
        "unigram_lm_scores": (unigram_lm_build, UNIGRAM_LM_ORACLE),
    }
)


#: DuckDB dialect note: ``1::BIGINT << 63`` raises Out of Range (Spark
#: wraps into the sign bit), so bit 63 is spelled as the literal
#: INT64_MIN on the oracle side.
BLOOM_OVERLAP_ORACLE = r"""
    WITH toks AS (
      SELECT source AS g,
             unnest(list_distinct(string_split_regex(trim(text), '\s+')))
               AS t
      FROM documents
    ), pos AS (
      SELECT g, unnest([
               ('0x' || substr(md5(t), 1, 8))::BIGINT % 4096,
               ('0x' || substr(md5(t), 9, 8))::BIGINT % 4096,
               ('0x' || substr(md5(t), 17, 8))::BIGINT % 4096
             ]) AS p
      FROM toks
    ), blocks AS (
      SELECT g, p // 64 AS block,
             bit_or(CASE WHEN p % 64 = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << CAST(p % 64 AS INT)) END)
               AS bits
      FROM pos GROUP BY g, p // 64
    )
    SELECT a.g AS g_a, b.g AS g_b,
           CAST(SUM(bit_count(a.bits)) AS BIGINT)
             AS bits_a_in_shared_blocks,
           CAST(SUM(bit_count(b.bits)) AS BIGINT)
             AS bits_b_in_shared_blocks,
           CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS inter_bits
    FROM blocks a JOIN blocks b ON a.block = b.block AND a.g < b.g
    GROUP BY a.g, b.g
"""


def bloom_overlap_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.sparse import (
        bloom_blocks,
        bloom_pairwise_overlap,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    blocks = bloom_blocks(
        documents, "source", "text", m_bits=4096, n_hashes=3
    )
    return bloom_pairwise_overlap(blocks)


QUEUE["bloom_vocab_overlap"] = (bloom_overlap_build, BLOOM_OVERLAP_ORACLE)


ROBUST_Z_ORACLE = """
    WITH med AS (
      SELECT o_orderpriority AS g, quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY g
    ), mad AS (
      SELECT o.o_orderpriority AS g,
             quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad
      FROM orders o JOIN med m ON o.o_orderpriority = m.g
      GROUP BY o.o_orderpriority
    )
    SELECT m.g, round(m.med, 4) AS med_r, round(d.mad, 4) AS mad_r,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_orderpriority = m.g
                   AND abs((o.o_totalprice - m.med) / (1.4826 * d.mad)) > 2)
                AS BIGINT) AS n_outliers
    FROM med m JOIN mad d ON m.g = d.g
    ORDER BY m.g
"""


def robust_z_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.features import (
        robust_zscores,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (orders,) = _t(spark, sf_dir, "orders")
    g = F.col("o_orderpriority").alias("g")
    med = orders.groupBy(g).agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    mad = (
        orders.join(
            F.broadcast(med), orders["o_orderpriority"] == med["g"]
        )
        .groupBy(F.col("o_orderpriority").alias("g2"))
        .agg(
            F.percentile(
                F.abs(F.col("o_totalprice") - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
    )
    rz = robust_zscores(orders, "o_totalprice", by="o_orderpriority")
    outliers = rz.groupBy(F.col("o_orderpriority").alias("g3")).agg(
        F.sum(
            F.when(F.abs(F.col("o_totalprice_rz")) > 2, 1).otherwise(0)
        ).alias("n_outliers")
    )
    return (
        med.join(mad, med["g"] == mad["g2"])
        .join(outliers, med["g"] == outliers["g3"])
        .select(
            "g",
            F.round("med", 4).alias("med_r"),
            F.round("mad", 4).alias("mad_r"),
            "n_outliers",
        )
        .orderBy("g")
    )


QUEUE["robust_z_by_priority"] = (robust_z_build, ROBUST_Z_ORACLE)


#: built by rewrapping SPARSE_COSINE_ORACLE's CTE chain as a subquery —
#: one source of truth for the weight/dot algebra; the queue test pins
#: the composed SQL end-to-end on both SFs.
SPARSE_TOPK_ORACLE = (
    SPARSE_COSINE_ORACLE.replace(
        "SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 4) AS cosine_r",
        "SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine",
    ).replace("WHERE dot / (na.nrm * nb.nrm) >= 0.3", "")
    .replace("WITH toks AS (", "WITH pairs_base AS (WITH toks AS (")
    + """
    ), sym AS (
      SELECT id_a AS id, id_b AS partner, cosine FROM pairs_base
      UNION ALL
      SELECT id_b AS id, id_a AS partner, cosine FROM pairs_base
    ), ranked AS (
      SELECT id, partner, cosine,
             row_number() OVER (
               PARTITION BY id ORDER BY cosine DESC, partner) AS rnk
      FROM sym
    )
    SELECT id, partner, round(cosine, 4) AS cosine_r,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
"""
)


def sparse_topk_build(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.sparse import (
        sparse_cosine_topk_per_doc,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import _t

    (documents,) = _t(spark, sf_dir, "documents")
    return sparse_cosine_topk_per_doc(
        documents.select("doc_id", "text"), "doc_id", "text", k=3, df_cap=50
    ).select(
        "id",
        "partner",
        F.round("cosine", 4).alias("cosine_r"),
        F.col("rnk").cast("bigint").alias("rnk"),
    )


QUEUE["sparse_cosine_topk"] = (sparse_topk_build, SPARSE_TOPK_ORACLE)
