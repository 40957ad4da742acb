"""Similarity operators: brute-force correctness on a hand-computable
fixture, and ANN-vs-brute-force recall on the real corpus."""

from __future__ import annotations

import math

from amsterdam_map_data_wrangling_spark.operators.similarity import (
    ann_sign_lsh_topk,
    cosine_topk,
)

from .conftest import SF_ORACLE


def test_cosine_topk_hand_computed(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [0.7, 0.7, 0.0]),   # 45°
        (4, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        (r.qid, r.vec_id): r.sim
        for r in cosine_topk(df, "vec_id", "embedding", [0], k=3).collect()
    }
    assert set(got) == {(0, 1), (0, 3), (0, 2)}
    assert got[(0, 1)] == round(0.9 / math.hypot(0.9, 0.1), 4)
    assert got[(0, 3)] == round(0.7 / math.hypot(0.7, 0.7), 4)
    assert got[(0, 2)] == 0.0


def test_ann_results_subset_of_brute_force_scores(spark):
    """Every ANN hit must carry the same similarity the brute-force path
    computes, and per-query ANN top-1 should usually be the true top-1
    (sign-LSH keeps the bucket of the query itself)."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    brute = {
        (r.qid, r.vec_id): r.sim
        for r in cosine_topk(emb, "vec_id", "embedding", qids, k=50).collect()
    }
    ann = ann_sign_lsh_topk(emb, "vec_id", "embedding", qids, k=3, bits=8).collect()
    assert len(ann) > 0
    for r in ann:
        if (r.qid, r.vec_id) in brute:
            assert brute[(r.qid, r.vec_id)] == r.sim
