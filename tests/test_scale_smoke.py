"""Scale smoke: the dedup stack on an 8x-replicated corpus (~40k docs,
~2M shingle rows). Catches quadratic blowups (pair-space explosions,
all-pairs joins) that sf0.01 hides — runtime here is asserted only loosely;
the real check is that results scale linearly with the replication."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_near_dup_pairs,
)

from .conftest import SF_ORACLE

REPL = 8


@pytest.fixture(scope="module")
def big_docs(spark):
    base = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "big_docs")
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select("doc_id", "text")
    replicated = docs.crossJoin(
        spark.range(REPL).withColumnRenamed("id", "rep")
    ).select((F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text")
    replicated.repartition(16).write.mode("overwrite").parquet(base)
    return spark.read.parquet(base)


def test_exact_dedup_scales(spark, big_docs):
    n = big_docs.count()
    assert n == 500 * REPL
    t0 = time.perf_counter()
    groups = exact_dedup_groups(big_docs, "doc_id", "text")
    # every fingerprint now has exactly REPL copies (all docs replicated)
    dist = groups.groupBy("n_copies").count().collect()
    assert {r.n_copies for r in dist} == {REPL}
    assert sum(r["count"] for r in dist) == 500
    assert time.perf_counter() - t0 < 60


def test_minhash_pair_space_stays_bounded(spark, big_docs):
    """Replicated docs make every doc an exact dup of REPL-1 twins; the
    banded join must produce pairs ~linear in docs x REPL (identical docs
    always collide), not corpus²."""
    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(big_docs, "doc_id", "text", threshold=0.5)
    n_pairs = pairs.count()
    elapsed = time.perf_counter() - t0
    # 500 groups x C(8,2)=28 exact-twin pairs = 14000, plus the original
    # corpus's ~24 true near-dup pairs x 8x8 cross copies ≈ +1500.
    assert n_pairs >= 500 * (REPL * (REPL - 1) // 2)
    assert n_pairs < 25_000, f"pair space exploded: {n_pairs}"
    assert elapsed < 120, f"minhash took {elapsed:.0f}s at 8x"


def test_embedding_blocking_bounds_candidate_fraction(spark):
    """Sign-LSH blocking must confine the embedding pair join to in-bucket
    candidates: sum over buckets of C(n_b, 2) — the exact candidate count
    — must be far below C(N, 2), and the largest bucket must hold a
    bounded fraction of the corpus (no degenerate all-in-one-bucket
    blocking)."""
    from amsterdam_map_data_wrangling_spark.operators.similarity import (
        sign_lsh_code,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    n = emb.count()
    v = F.col("embedding").cast("array<double>")
    buckets = (
        emb.select(sign_lsh_code(v, 6).alias("code"))
        .groupBy("code")
        .count()
        .collect()
    )
    candidates = sum(r["count"] * (r["count"] - 1) // 2 for r in buckets)
    all_pairs = n * (n - 1) // 2
    assert candidates < all_pairs * 0.15, (
        f"blocking too weak: {candidates}/{all_pairs}"
    )
    assert max(r["count"] for r in buckets) < n * 0.35, "degenerate bucket"


def test_chunking_output_scales_linearly(spark, big_docs):
    """Chunk count on the 8x corpus must be exactly 8x the base corpus's
    chunk count — chunking is per-row, so any cross-row interaction is a
    bug."""
    from amsterdam_map_data_wrangling_spark.functions.text import (
        chunk_starts,
        tokens,
    )

    def n_chunks(df):
        toked = df.select(tokens(F.col("text")).alias("toks"))
        return toked.select(
            F.explode(chunk_starts(F.col("toks"), 96)).alias("s")
        ).count()

    base = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    assert n_chunks(big_docs) == REPL * n_chunks(base)


def test_dup_span_gram_stream_scales_linearly(spark, big_docs):
    """dup_span_coverage's shape on 8x: the gram stream is linear in the
    corpus and the per-doc coverage becomes TOTAL under replication
    (every 4-gram now appears in >= REPL docs), while the join output
    stays linear — no pair blowup (the op joins gram->doc, never
    doc->doc)."""
    import time as _t

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.functions.text import tokens

    t0 = _t.perf_counter()
    toked = big_docs.select("doc_id", tokens(F.col("text")).alias("l"))
    grams = F.when(
        F.size("l") >= 4,
        F.transform(
            F.sequence(F.lit(1), F.size("l") - 3),
            lambda i: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", *[F.element_at("l", i + j) for j in range(4)]
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = toked.select(
        "doc_id", F.posexplode(grams).alias("p0", "h")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    n_grams = g.count()
    dup_h = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dupg = g.join(dup_h, "h").select("doc_id", "pos")
    n_dup_positions = dupg.count()
    elapsed = _t.perf_counter() - t0
    # join output is bounded by the gram stream itself — linear, never N²
    assert n_dup_positions <= n_grams
    # replication makes every gram duplicated: coverage must be total
    assert n_dup_positions == n_grams
    assert elapsed < 120, f"dup-span stages took {elapsed:.0f}s at 8x"


def test_sparse_cosine_candidate_space_bounded_by_df_cap(spark, big_docs):
    """sparse_cosine_pairs on 8x: with df_cap ~ corpus-frequency scale,
    surviving terms bound the per-term fan-out, so the dot-accumulation
    join output is SUM over terms of C(df,2) <= df_cap * term-rows —
    never corpus². With df_cap below the replication factor every term
    appearing in any two replicas dies, so the pair space collapses to
    near zero — the stop-term bound working as designed."""
    from amsterdam_map_data_wrangling_spark.operators.sparse import (
        tfidf_weights,
    )

    w = tfidf_weights(big_docs, "doc_id", "text", df_cap=REPL - 1)
    # every token appears in >= REPL docs (replicas) -> all terms are
    # stop-terms under df_cap = REPL-1 -> zero surviving term rows: the
    # cap collapses the candidate space entirely instead of exploding
    assert w.count() == 0
    # with the cap scaled by the replication factor (how a deployment
    # would set it from the df histogram), terms survive but per-term
    # fan-out — and therefore the dot-join's output, sum over terms of
    # C(df, 2) — stays bounded by the cap, never corpus²
    from pyspark.sql import functions as F

    cap = 50 * REPL
    w2 = tfidf_weights(big_docs, "doc_id", "text", df_cap=cap)
    n2 = w2.count()
    max_df = (
        w2.groupBy("t").agg(F.count("*").alias("c")).agg(F.max("c")).first()[0]
    )
    assert n2 > 0 and max_df <= cap
