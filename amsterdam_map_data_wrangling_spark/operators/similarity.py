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


def rand_hyperplanes(
    bits: int = 8, dim: int = 64, seed: str = "spark-graft"
) -> list[list[int]]:
    """Seeded SPARSE ternary random hyperplane family (Achlioptas 2003,
    "Database-friendly random projections"): coefficient
    h[i][d] ∈ {-1, 0, +1} with P(±1) = 1/6 each, drawn from
    md5("rh|seed|i|d") mod 6 — reproducible anywhere from the seed alone.

    Ternary coefficients make the projection a short add/subtract chain
    over exact integers (no multiplications, no float summation order to
    diverge across engines at the sign boundary), with the same
    Johnson-Lindenstrauss guarantees as dense Gaussian planes. Unlike the
    axis-aligned :func:`sign_lsh_code` (which reads the signs of the
    FIRST b raw components and collapses when components are biased or
    correlated), every bit mixes ~dim/3 random dimensions."""
    import hashlib

    def coeff(i: int, d: int) -> int:
        r = int(hashlib.md5(f"rh|{seed}|{i}|{d}".encode()).hexdigest()[:15], 16) % 6
        return -1 if r == 0 else (1 if r == 5 else 0)

    return [[coeff(i, d) for d in range(dim)] for i in range(bits)]


def rand_lsh_code_sql(
    qv: str = "qv",
    bits: int = 8,
    dim: int = 64,
    seed: str = "spark-graft",
    one_based: bool = False,
) -> str:
    """SQL text for the random-hyperplane bucket code over a quantized
    int-vector column: bit i set iff Σ_d h[i][d]·qv[d] ≥ 0. The plane
    coefficients are inlined literals (computed from the seed at
    plan-build time), so the IDENTICAL arithmetic runs on Spark
    (``one_based=False``, 0-based brackets) and DuckDB (``one_based=True``)
    — every term and partial sum an exact int64. Sparse ternary planes
    keep the expression to ~bits·dim/3 add/sub terms; flat arithmetic on
    purpose: lambda-bearing HOF expressions cost ~0.5 s of Catalyst
    analysis per plan (measured in the Lloyd build), and the dense
    512-multiply variant paid ~1.5 s/query in interpreted eval."""
    off = 1 if one_based else 0
    bits_sql = []
    for i, plane in enumerate(rand_hyperplanes(bits, dim, seed)):
        terms = [
            ("+ " if c > 0 else "- ") + f"{qv}[{d + off}]"
            for d, c in enumerate(plane)
            if c != 0
        ]
        proj = " ".join(terms).lstrip("+ ") or "0"
        bits_sql.append(f"(CASE WHEN ({proj}) >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(bits_sql)


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


#: Quantization scale for the engine-exact Lloyd arithmetic: components in
#: [-1, 1]-ish map to integers ≤ ~1000, keeping every downstream integer
#: (dots, norms, centroid sums) exact in int64 AND below 2^53, so a DuckDB
#: oracle computing the same quantities through DOUBLEs gets the exact same
#: values (doubles represent integers < 2^53 exactly).
_QUANT_SCALE = 1000


#: Exact int64 dot of two long-array columns, Spark SQL text.
_SPARK_IDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
    " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)

#: Narrow argmax over the broadcast centroid array ``cs``: csim from
#: exact-integer dot/norms (bit-identical IEEE on any engine), ties to the
#: lowest c_id inside the fold (order-independent).
_SPARK_BEST = (
    "aggregate("
    " transform(cs, c -> struct("
    f"  CAST({_SPARK_IDOT.format(a='qv', b='c.cv')} AS DOUBLE)"
    "   / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS sim,"
    "  c.c_id AS cid)),"
    " struct(CAST(-2.0 AS DOUBLE) AS sim,"
    "        CAST(4611686018427387904 AS BIGINT) AS cid),"
    " (acc, e) -> IF(e.sim > acc.sim"
    "               OR (e.sim = acc.sim AND e.cid < acc.cid), e, acc))"
)

#: Quantize + self-norm: {emb} → (vec_id, v, qv, qn2).
_SPARK_EQN_SQL = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM {{emb}}),
    eqn0 AS (
      SELECT vec_id, v,
             transform(v, x -> CAST(floor(x * {_QUANT_SCALE} + 0.5) AS BIGINT)) AS qv
      FROM e
    )
    SELECT vec_id, v, qv, {_SPARK_IDOT.format(a='qv', b='qv')} AS qn2 FROM eqn0
"""


def _spark_lloyd_iter_sql(dim: int) -> str:
    """One Lloyd iteration: {eqn} × {cents} → next centroid generation
    (c_id, cv, cn2). Assignment is the ZERO-shuffle fold against the
    single collected centroid row; the update is ONE map-side-combined
    aggregation of dim partial sums per cell (Spark bracket indexing is
    0-based). Centroids are exact int64 SUM vectors — cosine is
    scale-invariant, so the sum IS the mean for assignment purposes, with
    no float division to diverge across engines; empty cells drop out of
    the aggregation on both engines."""
    sums = ", ".join(f"sum(qv[{j}])" for j in range(dim))
    return f"""
    WITH carr AS (SELECT collect_list(struct(c_id, cv, cn2)) AS cs FROM {{cents}}),
    a AS (SELECT qv, ({_SPARK_BEST}).cid AS cell FROM {{eqn}} CROSS JOIN carr)
    SELECT c_id, cv, {_SPARK_IDOT.format(a='cv', b='cv')} AS cn2 FROM (
      SELECT cell AS c_id, array({sums}) AS cv FROM a GROUP BY cell
    )
"""


_SPARK_FINAL_ASSIGN_SQL = f"""
    WITH carr AS (SELECT collect_list(struct(c_id, cv, cn2)) AS cs FROM {{cents}})
    SELECT vec_id, v, ({_SPARK_BEST}).cid AS cell FROM {{eqn}} CROSS JOIN carr
"""


def lloyd_assign_sql(
    iters: int = 2,
    dim: int = 64,
    stride: int = 100,
    offset: int = 7,
) -> str:
    """DuckDB CTE chain computing the SAME (vec_id, v, cell) assignment as
    the Spark-side Lloyd steps above — the oracle twin. Values agree
    bit-for-bit because every compared double derives from exact integers
    (< 2^53): the float dot DuckDB computes over the quantized arrays IS
    the exact integer Spark's int64 fold produces, and
    dot/(sqrt(qn2)·sqrt(cn2)) is correctly-rounded IEEE on both engines.
    Shape differs by dialect on purpose (cross join + row_number argmax
    here; the fold shape needs Spark HOF syntax) — shape is not what the
    gate compares."""
    idot = (
        "CAST(list_dot_product(CAST({a} AS DOUBLE[]),"
        " CAST({b} AS DOUBLE[])) AS BIGINT)"
    )
    # DuckDB list indexing is 1-based; sum(BIGINT) widens to HUGEINT
    sums = ", ".join(f"CAST(sum(qv[{j + 1}]) AS BIGINT)" for j in range(dim))
    csim = (
        "list_dot_product(CAST(eqn.qv AS DOUBLE[]), CAST(c.cv AS DOUBLE[]))"
        " / (sqrt(CAST(eqn.qn2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE)))"
    )

    def assign(i: int, prev: str, out_cols: str) -> str:
        return (
            f", s{i} AS (SELECT eqn.vec_id, c.c_id, {csim} AS csim"
            f"           FROM eqn, {prev} c)\n"
            f", a{i} AS (SELECT {out_cols}, r.cell FROM ("
            f"    SELECT vec_id, c_id AS cell FROM ("
            f"      SELECT vec_id, c_id, row_number() OVER ("
            f"        PARTITION BY vec_id ORDER BY csim DESC, c_id) AS rn"
            f"      FROM s{i}) WHERE rn = 1"
            f"  ) r JOIN eqn USING (vec_id))"
        )

    parts = [
        f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    eqn0 AS (
      SELECT vec_id, v,
             list_transform(v, x -> CAST(floor(x * {_QUANT_SCALE} + 0.5)
                                         AS BIGINT)) AS qv
      FROM e
    ), eqn AS (
      SELECT vec_id, v, qv, {idot.format(a='qv', b='qv')} AS qn2 FROM eqn0
    ), c0 AS (
      SELECT vec_id AS c_id, qv AS cv, qn2 AS cn2 FROM eqn
      WHERE vec_id % {stride} = {offset}
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append("\n" + assign(i, f"c{i - 1}", "vec_id, qv"))
        parts.append(
            f"""
    , c{i} AS (
      SELECT c_id, cv, {idot.format(a='cv', b='cv')} AS cn2 FROM (
        SELECT cell AS c_id, list_value({sums}) AS cv
        FROM a{i} GROUP BY cell
      )
    )"""
        )
    parts.append("\n" + assign(iters + 1, f"c{iters}", "vec_id, v"))
    parts.append(f"\n    SELECT vec_id, v, cell FROM a{iters + 1}\n")
    return "".join(parts)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 3,
    centroid_stride: int = 100,
    centroid_offset: int = 7,
    lloyd_iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF ANN with LEARNED coarse cells: ``lloyd_iters`` seeded Lloyd
    (k-means) iterations refine the deterministic id-stride seed set, then
    every vector searches only its cell.

    Engine-exact Lloyd (the whole chain is oracle-checkable value-for-value
    in DuckDB — :func:`lloyd_assign_sql` — no float-aggregation drift
    anywhere): components quantized to ints (floor(x·S + 0.5), bit-exact
    IEEE on any engine); centroids carried as exact int64 SUM vectors —
    never divided into float means (cosine is scale-invariant); assignment
    similarity from exact-integer dots and norms, so both engines compare
    bit-identical doubles; empty cells drop out of the update aggregation
    on both engines.

    Plan shape at 100 TB: each iteration is a ZERO-shuffle narrow argmax
    against the broadcast centroid array plus one tiny centroid-update
    aggregation (dim partial sums × cells, map-side combined); the final
    search join shuffles the corpus once on the cell key. Final ranking
    uses the true double cosine (round 4, vec_id tie-break) over original
    vectors, identical to the brute path. nprobe > 1 would be the same
    join with an IN-list of top-n cells.

    Driver-cost note (why stepwise spark.sql + lazy checkpoints): the
    whole chain as ONE query makes Catalyst inline every multiply-
    referenced CTE, so optimizer time grows combinatorially with
    iterations (measured ~1.7 s); chaining the DataFrame Column API
    instead re-analyzes the growing subtree per operator call (~0.7 s per
    iteration). Each step below is one small spark.sql whose inputs are
    LogicalRDD leaves (lazy localCheckpoint), so analysis+planning stays
    O(step) and build() still launches zero jobs; the first action
    materializes the chain once, each generation exactly once."""
    from pyspark.sql import Window

    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    embq = spark.sql(_SPARK_EQN_SQL, emb=src).localCheckpoint(eager=False)
    cents = embq.filter(
        F.col("vec_id") % centroid_stride == centroid_offset
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("qv").alias("cv"),
        F.col("qn2").alias("cn2"),
    )
    iter_sql = _spark_lloyd_iter_sql(dim)
    for _ in range(lloyd_iters):
        cents = spark.sql(iter_sql, eqn=embq, cents=cents).localCheckpoint(
            eager=False
        )
    assign = (
        spark.sql(_SPARK_FINAL_ASSIGN_SQL, eqn=embq, cents=cents)
        .localCheckpoint(eager=False)
        .withColumn("nrm", l2_norm(F.col("v")))
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
    emb = _prep(df, id_col, vec_col).withColumn("code", sign_lsh_code(F.col("v"), bits))
    return _bucket_topk(emb, query_ids, k)


def ann_rand_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 3,
    bits: int = 8,
    dim: int = 64,
    seed: str = "spark-graft",
) -> DataFrame:
    """Approximate cosine top-k with the seeded RANDOM-hyperplane bucket
    code (:func:`rand_lsh_code_sql`) — the production-grade LSH family
    (axis-aligned :func:`sign_lsh_code` skews buckets on correlated
    embeddings). Same bucket-join plan shape; the code arithmetic is
    exact-int over quantized components, so the buckets — and hence the
    whole result — are oracle-reproducible in DuckDB."""
    emb = (
        _prep(df, id_col, vec_col)
        .withColumn(
            "qv",
            F.expr(
                f"transform(v, x -> CAST(floor(x * {_QUANT_SCALE} + 0.5)"
                " AS BIGINT))"
            ),
        )
        .withColumn("code", F.expr(rand_lsh_code_sql("qv", bits, dim, seed)))
        .drop("qv")
    )
    return _bucket_topk(emb, query_ids, k)


def _bucket_topk(emb: DataFrame, query_ids: list[int], k: int) -> DataFrame:
    """Shared bucket-search tail: broadcast the query rows, equi-join the
    corpus on the bucket code (the ONLY shuffle, on the code key), exact
    cosine + rank within the bucket."""
    from pyspark.sql import Window

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
