"""Similarity search over an embedding column (``array<float>``).

Everything stays JVM-side: dot products via ``zip_with`` + ``aggregate``
higher-order functions in double precision (whole-stage codegen — no
Python, no Arrow hop). Two search paths:

- **Brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set, score every (query, candidate) pair, per-query top-k
  via a rank window. Linear in |corpus|·|queries|; right up to ~10⁶ rows
  per executor-core-second, and the verifier for any ANN path.
- **Sign-LSH ANN** — the scale path: deterministic b-bit bucket code from
  the signs of the first b components (a fixed axis-aligned hyperplane
  family); candidates are only same-bucket rows, so the join is blocked on
  the code. Expected candidate fraction 2^-b of the corpus per query.
  Deterministic by construction → oracle-checkable (unlike random
  hyperplanes, whose planes differ per engine).

At 100 TB the same shapes hold: the query side is always broadcast; the
bucket join shuffles the corpus once on an 8-bit key (optionally salted by
a second code byte when a bucket is hot); brute force becomes per-partition
top-k + driver merge (TakeOrderedAndProject-like) rather than a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sign_lsh_code(a: Column, bits: int = 8) -> Column:
    """Deterministic bucket code: bit i set iff component i ≥ 0."""
    return sum(
        F.when(F.element_at(a, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    )


def _prep(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias("vec_id"), v.alias("v"), l2_norm(v).alias("nrm")
    )


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k of a (qid, vec_id, sim) relation WITHOUT exchanging
    the full scored set: per-partition partial top-k (mapInPandas — a
    bounded heap per qid across the partition's Arrow batches, emitting
    ≤ |queries|·k rows per partition), then a rank window over the tiny
    survivor set (≤ partitions·|queries|·k rows). The previous shape — a
    global rank window straight over the scored relation — shuffled every
    scored row onto |queries| reducers; this is the per-partition-top-k +
    merge the 100 TB plan needs. Only the 3 narrow columns cross the Arrow
    boundary (the vectors and dot products stay JVM-side), and ranking is
    on (sim desc, vec_id asc) at both levels, so the partial reduction is
    exact under the same total order as the merge."""
    from pyspark.sql import Window

    def _local_topk(batches):
        import pandas as pd

        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pd.concat([best, pdf]) if best is not None else pdf
            cur = cur.sort_values(
                ["qid", "sim", "vec_id"], ascending=[True, False, True]
            )
            best = cur.groupby("qid", sort=False).head(k)
        if best is not None and len(best):
            yield best

    partial = scored.mapInPandas(_local_topk, "qid bigint, vec_id bigint, sim double")
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "sim")
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, sim) — k best candidates per query,
    self excluded. Ranking is on round(sim, 4) with vec_id tie-break so the
    ordering is engine-portable. Reduction is per-partition partial top-k +
    tiny merge (:func:`_topk_per_query`) — the full scored relation is never
    exchanged."""
    emb = _prep(df, id_col, vec_col)
    q = F.broadcast(
        emb.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
        )
    )
    scored = (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 4).alias(
                "sim"
            ),
        )
    )
    return _topk_per_query(scored, k)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 3,
    centroid_stride: int = 100,
    centroid_offset: int = 7,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest centroid
    cell, then search only the query's cell.

    Centroids are picked deterministically (ids ≡ offset mod stride) so the
    whole computation is engine-portable and oracle-checkable; a production
    IVF would k-means them, which changes recall, not the plan shape. The
    plan: centroids broadcast → per-vector argmax via ``max_by`` on a
    (csim, -c_id) struct — ties break to the lowest centroid id, matching
    the oracle's rank ordering. ``max_by`` partially aggregates map-side,
    so the assignment shuffle carries ≤ N rows (one per vector seen per
    partition) instead of the N×C scored rows a rank-window would move —
    the difference between shuffling the corpus once and shuffling it
    |centroids| times at 100 TB. nprobe > 1 is the same join with an
    IN-list of the query's top-n cells.

    The assignment subtree is read by both the query side and the search
    side; at bench scale the fused recompute and a checkpoint measure the
    same, so no cut — on a real cluster persist the (id, cell) assignment
    before the search join."""
    from pyspark.sql import Window

    emb = _prep(df, id_col, vec_col)
    cents = F.broadcast(
        emb.filter(F.col("vec_id") % centroid_stride == centroid_offset).select(
            F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
        )
    )
    sim_c = F.round(dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6)
    assign = (
        emb.crossJoin(cents)
        .select("vec_id", "v", "nrm", "c_id", sim_c.alias("csim"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "c_id", F.struct(F.col("csim"), (-F.col("c_id")).alias("neg"))
            ).alias("cell"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
        .select("vec_id", "v", "nrm", "cell")
    )
    q = F.broadcast(
        assign.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("cell").alias("qcell"),
        )
    )
    scored = (
        assign.join(q, F.col("cell") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 4).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "sim")
    )


def ann_sign_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 3,
    bits: int = 8,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    sign-LSH bucket. Same output shape as :func:`cosine_topk`."""
    from pyspark.sql import Window

    emb = _prep(df, id_col, vec_col).withColumn("code", sign_lsh_code(F.col("v"), bits))
    q = F.broadcast(
        emb.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("code").alias("qcode"),
        )
    )
    scored = (
        emb.join(q, F.col("code") == F.col("qcode"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 4).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "sim")
    )


def label_norm_zscores(
    df: DataFrame, id_col: str, vec_col: str, label_col: str
) -> DataFrame:
    """Per-label z-score of embedding L2 norms via grouped
    ``applyInPandas`` — the grouped-map corner of the §2.10 UDF surface
    (mapInPandas covers the scalar-batch corner in operators/multimodal).

    The norm itself stays JVM-side (cheap, codegen); only the tiny
    (label, norm) projection crosses the Arrow boundary, grouped by
    label — the pattern for any per-group sklearn/scipy step at 100 TB:
    push everything expressible down to Spark expressions, ship the
    minimal grouped frame to Python, one group per pandas DataFrame.
    Sample stddev (ddof=1) matches SQL ``stddev_samp``."""
    prep = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        l2_norm(F.col(vec_col).cast("array<double>")).alias("nrm"),
    )

    def _z(pdf):
        mu = pdf["nrm"].mean()
        sd = pdf["nrm"].std(ddof=1)
        pdf = pdf.assign(z=((pdf["nrm"] - mu) / sd).round(4))
        return pdf[["vec_id", "label", "z"]]

    return prep.groupBy("label").applyInPandas(
        _z, "vec_id bigint, label int, z double"
    )
