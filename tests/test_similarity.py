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


def test_ivf_learned_centroids_recall_at_least_seed_recall(spark):
    """The point of the Lloyd iterations: data-adapted cells must recall at
    least as much of the true (brute-force) top-3 as the raw id-stride
    seed cells, and every IVF hit must carry the brute-force similarity."""
    from amsterdam_map_data_wrangling_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    brute = {
        (r.qid, r.vec_id): r.sim
        for r in cosine_topk(emb, "vec_id", "embedding", qids, k=3).collect()
    }
    learned = {
        (r.qid, r.vec_id): r.sim
        for r in ivf_topk(emb, "vec_id", "embedding", qids, k=3).collect()
    }
    seed = {
        (r.qid, r.vec_id): r.sim
        for r in ivf_topk(
            emb, "vec_id", "embedding", qids, k=3, lloyd_iters=0
        ).collect()
    }
    assert len(set(learned) & set(brute)) >= len(set(seed) & set(brute))
    for key, sim in learned.items():
        if key in brute:
            assert brute[key] == sim
