"""Session-shared TF-IDF cosine pair relation (plans/sparse.
shared_sparse_pairs — the plans/dedup._GRAPH_MEMO pattern extended to
the lexical family) and the operator-level sharing hooks (precomputed
``tf`` / ``pairs`` / gram legs). Each shared path must be
VALUE-IDENTICAL to the per-query build it can replace — the driver's
DuckDB gates verify the registered consumers end-to-end; these tests
pin the sharing mechanics themselves.

Why only the pair relation is memoized (and e.g. term_tf is not): the
pair relation is small (df-cap-bounded blocking) and expensive (term
self-join + dot agg) with two consumers; the token-proportional
relations measured SLOWER read back from a row-based checkpoint than
recomputed under whole-stage codegen. The operator hooks still accept
precomputed relations for callers with a real materialization boundary
(e.g. a parquet-persisted feature relation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.sparse import (
    bm25_topk,
    decontaminate,
    gram_hashes,
    sparse_cosine_pairs,
    sparse_cosine_topk_per_doc,
    term_tf,
)
from amsterdam_map_data_wrangling_spark.plans import dedup as plans_dedup
from amsterdam_map_data_wrangling_spark.plans.dedup import clear_graph_memo
from amsterdam_map_data_wrangling_spark.plans.sparse import (
    shared_sparse_pairs,
)
from amsterdam_map_data_wrangling_spark.sources.registry import load_tables

from .conftest import SF_SMALL


def _docs(spark):
    return load_tables(spark, SF_SMALL, ["documents"])["documents"]


def test_shared_sparse_pairs_is_unthresholded_and_nonnegative(spark):
    """The shared relation is stored at threshold 0 so BOTH gates are
    pure derivations: the 0.3 gate must equal a post-filter, and no
    cosine may be negative (the invariant that makes threshold 0 the
    floor — a negative cosine would mean the 0.3 filter and a rebuilt
    0.3 relation could disagree)."""
    clear_graph_memo()
    pairs = shared_sparse_pairs(spark, SF_SMALL, df_cap=50)
    rows = pairs.collect()
    assert rows, "planted near-dups must produce at least one pair"
    assert all(r.cosine >= 0.0 for r in rows)
    # every pair is id_a < id_b exactly once
    seen = {(r.id_a, r.id_b) for r in rows}
    assert len(seen) == len(rows)
    assert all(a < b for a, b in seen)


def test_shared_pairs_threshold_filter_matches_direct_build(spark):
    """filter(cosine >= 0.3) over the shared relation == a from-scratch
    threshold-0.3 build (same algebra, the threshold is a pure
    post-filter of the aggregated dot)."""
    clear_graph_memo()
    docs = _docs(spark).select("doc_id", "text")
    direct = sparse_cosine_pairs(
        docs, "doc_id", "text", threshold=0.3, df_cap=50
    )
    shared = shared_sparse_pairs(spark, SF_SMALL, df_cap=50).filter(
        F.col("cosine") >= 0.3
    )

    def rounded(df):
        return sorted(
            (r.id_a, r.id_b, round(r.cosine, 9)) for r in df.collect()
        )

    assert rounded(shared) == rounded(direct)


def test_topk_pairs_hook_matches_internal_build(spark):
    docs = _docs(spark).select("doc_id", "text")
    base = sparse_cosine_topk_per_doc(docs, "doc_id", "text", k=3, df_cap=50)
    via_pairs = sparse_cosine_topk_per_doc(
        docs,
        "doc_id",
        "text",
        k=3,
        df_cap=50,
        pairs=sparse_cosine_pairs(
            docs, "doc_id", "text", threshold=0.0, df_cap=50
        ),
    )

    def rounded(df):
        return sorted(
            (r.id, r.partner, round(r.cosine, 9), r.rnk)
            for r in df.collect()
        )

    assert rounded(base) == rounded(via_pairs)


def test_bm25_tf_hook_matches_token_scan_path(spark):
    """bm25_topk(tf=...) derives dl and n_toks from the tf relation —
    exact-integer rollups, so the two paths must agree to the score."""
    docs = _docs(spark).select("doc_id", "text")
    queries = {0: "the and of", 1: "amsterdam canal"}
    base = bm25_topk(docs, "doc_id", "text", queries, k=5)
    via_tf = bm25_topk(
        docs,
        "doc_id",
        "text",
        queries,
        k=5,
        tf=term_tf(docs, "doc_id", "text"),
    )

    def rounded(df):
        return sorted(
            (r.q_id, r.id, round(r.score, 9), r.rnk) for r in df.collect()
        )

    assert rounded(base) == rounded(via_tf)


def test_decontaminate_gram_hooks_match_internal_build(spark):
    docs = _docs(spark).select("doc_id", "text")
    is_bench = F.col("doc_id") % 13 == 0
    corpus, bench = docs.filter(~is_bench), docs.filter(is_bench)
    base = decontaminate(corpus, bench, "doc_id", "text", n=5)
    via_grams = decontaminate(
        corpus,
        bench,
        "doc_id",
        "text",
        n=5,
        docs_grams=gram_hashes(corpus, "doc_id", "text", n=5),
        bench_grams=gram_hashes(bench, "doc_id", "text", n=5)
        .select("h")
        .distinct(),
    )
    assert sorted(r.doc_id for r in base.collect()) == sorted(
        r.doc_id for r in via_grams.collect()
    )


def test_memo_reuse_and_reset(spark):
    clear_graph_memo()
    a = shared_sparse_pairs(spark, SF_SMALL, df_cap=50)
    b = shared_sparse_pairs(spark, SF_SMALL, df_cap=50)
    assert a is b, "second call must return the memoized frame"
    assert len(plans_dedup._GRAPH_MEMO) == 1
    clear_graph_memo()
    assert not plans_dedup._GRAPH_MEMO
    c = shared_sparse_pairs(spark, SF_SMALL, df_cap=50)
    assert c is not a, "reset must force a fresh build"


def test_leakage_free_split_reuses_graph_memo(spark):
    """leakage_free_split must READ the session-shared pair/component
    relations, never rebuild the blocking: after one build primes the
    memo, building the query again must add no new memo entries, and its
    leaked-pairs audit must consume the same cached pair relation (the
    plan shows checkpoint scans, not a fresh shingle aggregation)."""
    import __spark_entry__  # noqa: F401
    from amsterdam_map_data_wrangling_spark.plans import dedup as pd_mod
    from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES

    clear_graph_memo()
    df = QUERIES["leakage_free_split"].build(spark, SF_SMALL)
    n_entries = len(pd_mod._GRAPH_MEMO)
    assert n_entries >= 2  # pairs + components primed by one build
    df2 = QUERIES["leakage_free_split"].build(spark, SF_SMALL)
    assert len(pd_mod._GRAPH_MEMO) == n_entries  # pure cache hits
    plan = df2._jdf.queryExecution().optimizedPlan().toString()
    # both graph inputs arrive as materialized scans; the only shingle
    # work in the plan would betray a rebuild
    assert "shingle" not in plan.lower()
    assert df.collect() == df2.collect()
