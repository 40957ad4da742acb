"""Chunking + token-budget operators: structural contracts beyond the
oracle gate (the gate proves value equality; these prove the invariants
a training pipeline actually relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.functions.text import (
    chunk_fingerprint,
    chunk_starts,
    tokens,
)

from .conftest import SF_ORACLE

CHUNK, STRIDE = 128, 96


def _chunks(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.posexplode(chunk_starts(F.col("toks"), STRIDE)).alias(
            "chunk_idx", "start"
        ),
        F.least(
            F.lit(CHUNK), F.size("toks") - F.col("start") + 1
        ).alias("n_chunk_tokens"),
    )


def test_every_token_is_covered_and_overlap_is_exact(spark):
    """Chunks must tile the token stream: union of [start, start+len)
    covers [1, n_tokens], consecutive chunks overlap by exactly
    CHUNK - STRIDE (except a shorter final chunk)."""
    ch = _chunks(spark)
    # coverage: max(start + len - 1) == n_tokens, min(start) == 1
    agg = ch.groupBy("doc_id", "n_tokens").agg(
        F.min("start").alias("first_start"),
        F.max(F.col("start") + F.col("n_chunk_tokens") - 1).alias("last_end"),
        F.count("*").alias("n_chunks"),
    )
    bad = agg.filter(
        (F.col("first_start") != 1) | (F.col("last_end") != F.col("n_tokens"))
    )
    assert bad.count() == 0
    # chunk count = ceil((n_tokens - CHUNK) / STRIDE) + 1 for docs > CHUNK,
    # else exactly ceil(n/STRIDE)... derive directly: starts are
    # 1, 1+STRIDE, ... <= n_tokens
    expect = agg.select(
        "doc_id",
        (F.floor((F.col("n_tokens") - 1) / STRIDE) + 1).alias("want"),
        F.col("n_chunks").alias("got"),
    ).filter(F.col("want") != F.col("got"))
    assert expect.count() == 0


def test_chunk_fingerprints_detect_content(spark):
    """Identical docs produce identical chunk fingerprint sequences; a
    changed token changes exactly the fingerprints of chunks containing
    that position."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "a b c d e f g X")],
        ["doc_id", "text"],
    )
    toked = df.select("doc_id", tokens(F.col("text")).alias("toks"))
    ch = toked.select(
        "doc_id",
        F.posexplode(chunk_starts(F.col("toks"), 4)).alias("chunk_idx", "start"),
        F.col("toks"),
    ).select(
        "doc_id",
        "chunk_idx",
        chunk_fingerprint(F.col("toks"), F.col("start"), 6).alias("fp"),
    )
    rows = {(r.doc_id, r.chunk_idx): r.fp for r in ch.collect()}
    # docs 1 and 2 identical → identical fps
    assert rows[(1, 0)] == rows[(2, 0)] and rows[(1, 1)] == rows[(2, 1)]
    # doc 3 differs only in the last token (position 8): chunk 0 covers
    # tokens 1-6 (unchanged), chunk 1 covers 5-8 (changed)
    assert rows[(3, 0)] == rows[(1, 0)]
    assert rows[(3, 1)] != rows[(1, 1)]


def test_token_budget_pack_is_prefix_closed(spark):
    """The kept set per language must be a doc_id-prefix: if doc d is
    kept, every doc of the same lang with a smaller id is kept too (the
    defining property of a deterministic budget cutoff)."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    sized = docs.select(
        "lang", "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sized.withColumn("cum", F.sum("n_tokens").over(w))
    kept = cum.filter(F.col("cum") <= 10_000)
    # prefix property: within each lang, max kept id < min dropped id
    dropped = cum.filter(F.col("cum") > 10_000)
    j = (
        kept.groupBy("lang").agg(F.max("doc_id").alias("max_kept"))
        .join(
            dropped.groupBy("lang").agg(F.min("doc_id").alias("min_dropped")),
            "lang",
        )
    )
    assert j.filter(F.col("max_kept") >= F.col("min_dropped")).count() == 0
    assert kept.count() > 0


def test_sharded_pack_equals_onelevel_on_skewed_langs(spark, tmp_path):
    """token_budget_pack_sharded must produce the IDENTICAL kept set as
    the 1-level packing under pathological language skew (one lang with
    ~98% of the docs), and both must match a driver-side brute force."""
    import random

    from amsterdam_map_data_wrangling_spark.plans.text import (
        token_budget_pack,
        token_budget_pack_sharded,
    )

    rng = random.Random(7)
    rows = []
    doc_id = 0
    for lang, n in [("hot", 5000), ("a", 60), ("b", 3)]:
        for _ in range(n):
            n_tok = rng.randint(1, 40)
            rows.append((doc_id, lang, " ".join(["w"] * n_tok), n_tok))
            doc_id += 1
    rng.shuffle(rows)
    df = spark.createDataFrame(
        [(d, lang, text) for d, lang, text, _ in rows],
        "doc_id bigint, lang string, text string",
    )
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    one = {
        r["lang"]: (r["n_docs_kept"], r["tokens_kept"])
        for r in token_budget_pack(spark, sf_dir).collect()
    }
    two = {
        r["lang"]: (r["n_docs_kept"], r["tokens_kept"])
        for r in token_budget_pack_sharded(spark, sf_dir).collect()
    }
    assert one == two

    # brute force: per lang, doc_id order, cut at 10k
    expect = {}
    for lang in ("hot", "a", "b"):
        cum = kept = tok = 0
        for d, lg, _, n_tok in sorted(rows):
            if lg != lang:
                continue
            cum += n_tok
            if cum <= 10_000:
                kept += 1
                tok += n_tok
        if kept:
            expect[lang] = (kept, tok)
    assert one == expect


def test_dup_span_interval_union_formula_matches_brute_force(spark):
    """dup_span_coverage computes |union of fixed-width intervals| with a
    single lag() window: first hit contributes w, later hits contribute
    min(w, pos - prev_pos). Pin the formula against the brute-force set
    union on randomized position sets (one Spark job for all cases)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(42)
    w = 4
    cases = {}
    rows = []
    for case_id in range(60):
        n = rng.randint(1, 30)
        pos = sorted(rng.sample(range(1, 80), n))
        cases[case_id] = pos
        rows += [(case_id, p) for p in pos]
    df = spark.createDataFrame(rows, "case_id int, pos int")
    win = Window.partitionBy("case_id").orderBy("pos")
    contrib = F.when(F.lag("pos").over(win).isNull(), F.lit(w)).otherwise(
        F.least(F.lit(w), F.col("pos") - F.lag("pos").over(win))
    )
    got = {
        r["case_id"]: r["covered"]
        for r in df.select("case_id", contrib.alias("c"))
        .groupBy("case_id")
        .agg(F.sum("c").alias("covered"))
        .collect()
    }
    for case_id, pos in cases.items():
        brute = len(set().union(*[set(range(p, p + w)) for p in pos]))
        assert got[case_id] == brute, (case_id, pos)
