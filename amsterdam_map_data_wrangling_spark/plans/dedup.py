"""Deduplication queries over the documents table.

``dedup_exact_groups`` and ``dedup_ngram_jaccard`` are fully oracle-gated
(DuckDB computes the identical md5-fingerprint grouping / w-gram Jaccard).
``dedup_minhash_pairs`` and ``dedup_simhash_bands`` run the PRODUCTION
xxhash64 paths, whose raw codes have no DuckDB twin; since round 4 they are
hash-gated anyway via engine-portable INVARIANTS (every exact-duplicate
pair/group — portable md5 fingerprint — must be recalled / share one code
in ANY hash family, asserted TRUE by the oracle). Their value algebra is
additionally gated through ``dedup_minhash_portable`` /
``dedup_minhash_portable_pairs`` / ``dedup_simhash_portable`` (same
signature algebra, md5-derived family), and their pair *semantics* are
pytest-verified against the exact-Jaccard query (tests/test_dedup.py).
No query in this module is rows-only at the driver gate.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from amsterdam_map_data_wrangling_spark.operators.dedup import (
    connected_components,
    exact_dedup_groups,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from amsterdam_map_data_wrangling_spark.plans.catalog import _t, query


def _with_copies(documents):
    """Union the corpus with re-keyed copies of every 10th doc — the
    'two crawls overlap' scenario that gives exact dedup real groups."""
    copies = documents.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return documents.unionByName(copies)


# ---------------------------------------------------------------------------
# Session-scoped shared materialization of the near-dup graph
# ---------------------------------------------------------------------------
#
# Seven registered queries derive from the SAME exact-Jaccard pair relation
# over the plain documents corpus (w=5, df_cap=50): the pair listing, the
# connected components and both of their rollups, the degree histogram, and
# the two graph-analytics queries at threshold 0.3. Run back to back in one
# session (the driver gate, bench.py, any real pipeline composing
# pairs → clusters → keep-canonical → reports), each used to re-block the
# corpus and re-run label propagation from scratch — the r08/r09 verdicts'
# standing perf ask. This memo shares ONE localCheckpoint'd pair relation
# (and one components relation) per (session, sf_dir, params) — the
# DataFrame analog of materializing a CTE once for a report suite.
#
# Correctness is unaffected: the cached frame is the same plan, cut after
# its first materialization; every consumer applies its own downstream ops,
# and the driver's per-query DuckDB hash gate re-verifies each consumer
# end-to-end. A higher-threshold request is served by FILTERING a cached
# lower-threshold relation (identical semantics: the threshold is a pure
# post-filter on the jaccard column). Keyed by applicationId, so a fresh
# session never sees another session's (invalid) checkpoint blocks.
#
# Scale note: at 100 TB the same pattern holds — the pair/component
# relations are the SMALL derived artifacts (linear in true near-dups, not
# corpus bytes); a production pipeline would persist them to parquet
# between stages, which is exactly what this memo stands in for in-session.
#
# The memo also hosts the OTHER session-shared derived relations that
# clear the materialization bar (the TF-IDF cosine pair relation,
# plans/sparse.shared_sparse_pairs) — one reset point (clear_graph_memo)
# covers all of them, so bench.py's once-per-pass reset stays a single
# call. Relations that do NOT clear the bar are deliberately absent:
# token-proportional streams (term_tf, gram hashes) and the tiny
# portable-signature relation all measured SLOWER read back from a
# row-based checkpoint than recomputed under whole-stage codegen
# (PLANS.md round-10 "what does NOT pay to share").
_GRAPH_MEMO: dict[tuple, object] = {}

#: bounded memo: a long-lived session touching many sf_dirs (pytest,
#: notebooks) must not pin an unbounded set of checkpointed relations
#: in the block manager — insertion-ordered dicts make FIFO eviction
#: one line, and the evicted frames' blocks are reclaimed by the
#: ContextCleaner once unreferenced. 16 = ample headroom above the ~6
#: distinct (kind, params) keys one full catalog pass touches for a
#: single sf_dir, so FIFO never evicts mid-pass (an eviction inside a
#: pass would silently re-pay a build the sharing exists to avoid).
_GRAPH_MEMO_MAX = 16


def _memo_put(key: tuple, value: object) -> None:
    # eviction + insert run under the master lock: with the per-key
    # build locks, two threads putting DIFFERENT keys at capacity could
    # both select the same oldest key and the second unguarded pop
    # raised KeyError (r16 ADVICE — concurrent catalog execution is
    # exactly the scenario the locks added). pop(..., None) is
    # belt-and-braces against any future caller outside the lock.
    with _GRAPH_MEMO_MASTER:
        while len(_GRAPH_MEMO) >= _GRAPH_MEMO_MAX:
            _GRAPH_MEMO.pop(next(iter(_GRAPH_MEMO)), None)
        _GRAPH_MEMO[key] = value


#: per-key build locks (r16 concurrent-catalog probe): the memo's
#: check-then-act was race-free in value (both builds yield equivalent
#: checkpointed relations; last put wins) but not in COST — a real
#: cluster runs the catalog concurrently, and two consumers missing the
#: same key both paid the full blocking+checkpoint build. Double-checked
#: locking serializes builders of the SAME key only; different keys
#: build in parallel. The master lock guards only the lock-dict itself.
import threading as _threading  # noqa: E402

_GRAPH_MEMO_MASTER = _threading.Lock()
_GRAPH_MEMO_LOCKS: dict[tuple, "_threading.Lock"] = {}


def _memo_lock(key: tuple) -> "_threading.Lock":
    with _GRAPH_MEMO_MASTER:
        return _GRAPH_MEMO_LOCKS.setdefault(key, _threading.Lock())


def memo_get_or_build(key: tuple, build):
    """Shared-memo read with a per-key build critical section: at most
    one caller per key runs ``build()``; the rest block on the lock and
    read the freshly-stored value. (A thread still holding a lock object
    evicted by :func:`clear_graph_memo` only risks one duplicate build
    right after a clear — a perf hiccup, never a wrong value.)"""
    v = _GRAPH_MEMO.get(key)
    if v is not None:
        return v
    with _memo_lock(key):
        v = _GRAPH_MEMO.get(key)
        if v is None:
            v = build()
            _memo_put(key, v)
        return v


def clear_graph_memo() -> None:
    """Drop every memoized graph relation (checkpoint blocks are
    reclaimed by the ContextCleaner once unreferenced). bench.py calls
    this at the start of every timed pass so each pass pays the pair
    build exactly ONCE — the honest cost of running the suite once —
    instead of the warm pass hiding pair generation from the timings
    entirely."""
    _GRAPH_MEMO.clear()
    with _GRAPH_MEMO_MASTER:
        _GRAPH_MEMO_LOCKS.clear()


def _table_fingerprint(sf_dir: str, table: str = "documents") -> tuple:
    """Cheap driver-side identity of a table's bytes: the
    (relpath, size, mtime_ns) listing of <table>.parquet (file or
    directory, RECURSIVE — a Hive-partitioned table keeps its data files
    in subdirectories, and a top-level-only listing would let a
    partition rewrite hit a stale memo entry; round-11 ADVICE). Part of
    every memo key so a session that REWRITES the data under an sf_dir
    between consumers misses the memo instead of being served a
    checkpoint of the old bytes (r10 verdict hygiene note — gate/bench
    inputs are read-only, but the memo should not depend on that). Pure
    os metadata: no Spark job, ~µs."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            entries = []
            for root, _dirs, files in os.walk(path):
                for f in files:
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    entries.append(
                        (os.path.relpath(fp, path), st.st_size, st.st_mtime_ns)
                    )
            return tuple(sorted(entries))
        st = os.stat(path)
        return ((f"{table}.parquet", st.st_size, st.st_mtime_ns),)
    except OSError:
        return ()  # non-local / missing: fall back to sf_dir-only keying


def _memo_key(spark, sf_dir, kind, w, df_cap, table="documents"):
    return (
        spark.sparkContext.applicationId,
        sf_dir,
        _table_fingerprint(sf_dir, table),
        kind,
        w,
        df_cap,
    )


#: Jaccard threshold of every REGISTERED consumer of the shared pair
#: relation — the single source of truth each consumer reads its
#: threshold FROM (never a literal at the call site), so the build
#: floor below is derived, not asserted: a future consumer registering
#: a lower threshold here automatically lowers the floor instead of
#: silently reintroducing the double build (r18 VERDICT #7 / "What's
#: wrong" #4). tests/test_dedup.py pins that the floor equals the
#: registry min and that the memo serves every registered threshold
#: from ONE build.
SHARED_PAIRS_CONSUMER_THRESHOLDS: dict[str, float] = {
    "dedup_ngram_jaccard": 0.5,
    "dedup_clusters": 0.5,  # via shared_jaccard_components
    "dedup_keep_canonical": 0.5,  # via shared_jaccard_components
    "leakage_free_split": 0.5,  # components + the leak-audit pair read
    "cluster_hist (r08_queue)": 0.5,  # via shared_jaccard_components
    "degree_hist (r08_queue)": 0.5,
    "near_dup_transitivity": 0.3,
    "near_dup_pagerank": 0.3,
}

#: Lowest registered consumer threshold — the memo BUILDS at this floor
#: regardless of which consumer arrives first: the threshold is a pure
#: post-filter on the rounded jaccard column (ngram_jaccard_pairs
#: applies it after round(jac, 4)), so build cost is
#: threshold-independent and a 0.5 relation filtered from the 0.3 build
#: is value-identical to a direct 0.5 build. Without the floor, catalog
#: order decided the cost: a 0.5-consumer running first stored
#: (0.5, pairs), and the first 0.3-consumer REBUILT the whole relation
#: to widen it — one full scan→shingle→block→jaccard pass per bench
#: pass paid twice (r18 optimization round, measured ~1.4 s/pass at
#: sf0.1).
_PAIRS_THRESHOLD_FLOOR = min(SHARED_PAIRS_CONSUMER_THRESHOLDS.values())


def shared_jaccard_pairs(spark, sf_dir, w=5, threshold=0.5, df_cap=50):
    """(id_a, id_b, jaccard ≥ threshold) over the plain documents corpus,
    shared across consumers in this session. Builds the relation at
    min(threshold, _PAIRS_THRESHOLD_FLOOR) for (w, df_cap) so every
    registered threshold is served by filtering ONE build; an
    unregistered request below the stored threshold still widens the
    memo (rebuild at the lower value)."""
    build_threshold = min(threshold, _PAIRS_THRESHOLD_FLOOR)
    key = _memo_key(spark, sf_dir, "pairs", w, df_cap)
    cached = _GRAPH_MEMO.get(key)  # (threshold, DataFrame) | None
    if cached is None or cached[0] > threshold:
        with _memo_lock(key):
            cached = _GRAPH_MEMO.get(key)  # double-check under the lock
            if cached is None or cached[0] > threshold:
                (documents,) = _t(spark, sf_dir, "documents")
                # EAGER checkpoint, deliberately: the consumers include
                # iterative plans (pagerank) whose broadcast-exchange jobs
                # and per-iteration stages each hit the boundary BEFORE a
                # lazy checkpoint would have materialized — measured
                # 13.3 s cold vs 2.5 s eager at sf0.1 for
                # near_dup_pagerank (the lazy RDD re-derived the full
                # blocking lineage per job). The pair relation is tiny
                # (linear in true near-dups), so the one materialization
                # job is noise.
                pairs = ngram_jaccard_pairs(
                    documents, "doc_id", "text", w=w,
                    threshold=build_threshold, df_cap=df_cap,
                ).localCheckpoint()
                _memo_put(key, (build_threshold, pairs))
                cached = (build_threshold, pairs)
    base_threshold, pairs = cached
    if base_threshold == threshold:
        return pairs
    return pairs.filter(F.col("jaccard") >= threshold)


def shared_jaccard_components(spark, sf_dir, w=5, threshold=0.5, df_cap=50):
    """connected_components over :func:`shared_jaccard_pairs`, shared per
    session — the three cluster consumers (clusters / keep-canonical /
    size histogram) each read the same label relation, whose backing
    blocks were cut by CC's own convergence-certificate action."""
    key = _memo_key(spark, sf_dir, ("cc", threshold), w, df_cap)
    # nested locking is acyclic: the cc build waits on the pairs key,
    # never the reverse
    return memo_get_or_build(
        key,
        lambda: connected_components(
            shared_jaccard_pairs(spark, sf_dir, w, threshold, df_cap)
        ),
    )


@query(
    "dedup_exact_groups",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM corpus GROUP BY fp
    """,
    "Exact dedup over a corpus with injected duplicate crawl: md5 of the "
    "normalized text as fingerprint, min-id canonical keeper, copy count. "
    "Scale: one groupBy shuffle on a 128-bit high-cardinality key — no "
    "skew, no pairs; THE first stage of every dedup pipeline.",
)
def dedup_exact_groups(spark, sf_dir):
    (documents,) = _t(spark, sf_dir, "documents")
    return exact_dedup_groups(_with_copies(documents), "doc_id", "text")


#: Shared CTE chain computing exact 5-gram Jaccard near-dup pairs
#: (threshold 0.5, df_cap 50) — the oracle-side twin of
#: ``ngram_jaccard_pairs(w=5, threshold=0.5, df_cap=50)``, reused by both
#: the pair query and the connected-components oracle below.
_JACCARD_PAIR_CTES = r"""
    toks AS (
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
    ), sizes AS (
      SELECT id, COUNT(*) AS n_sh FROM rare GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
"""


@query(
    "dedup_ngram_jaccard",
    "WITH "
    + _JACCARD_PAIR_CTES
    + """
    SELECT id_a, id_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    """,
    "Exact word-5-gram Jaccard near-dup pairs (threshold 0.5) via "
    "shared-shingle blocking with document-frequency capping (df ≤ 50 "
    "drops stop-shingles). Shingle width is THE blocking knob: w=5 makes "
    "the shingle vocabulary so large that unrelated docs almost never "
    "collide, so the pair space stays ~linear in the number of true "
    "near-dups — the property that survives 100 TB (w=3 already blows the "
    "pair space up 100x at sf0.1). Never an all-pairs join. Also the "
    "exactness cross-check for the MinHash estimate.",
)
def dedup_ngram_jaccard(spark, sf_dir):
    return shared_jaccard_pairs(
        spark,
        sf_dir,
        w=5,
        threshold=SHARED_PAIRS_CONSUMER_THRESHOLDS["dedup_ngram_jaccard"],
        df_cap=50,
    )


@query(
    "dedup_minhash_pairs",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    ), fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS f
      FROM corpus
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, TRUE AS lsh_recalled
    FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    """,
    "MinHash-LSH near-dup candidates on the PRODUCTION xxhash64 path: "
    "16-component signatures, 4 bands × 4 rows, bucket-join on "
    "(band_idx, band_hash), signature-estimated Jaccard ≥ 0.5, over the "
    "corpus-with-injected-copies. The gated output is the engine-portable "
    "INVARIANT: every exact-duplicate pair (identical CASE-SENSITIVE "
    "whitespace-normalized text — identical token sequence — identical "
    "shingle sets — identical signatures in ANY hash family) must be "
    "recalled with est_jaccard exactly 1.0; the oracle derives the "
    "exact-dup pairs from the same case-sensitive md5 fingerprint and "
    "asserts TRUE, so a banding/signature regression flips the boolean "
    "and fails the hash gate. (fingerprint_cs, not the lowercased "
    "fingerprint: the production shingle hash is case-sensitive, so only "
    "case-sensitive fp equality implies signature equality — round-5 "
    "ADVICE fix.) (The full candidate list is xxhash64-family-specific by "
    "nature — dedup_minhash_portable_pairs value-gates the identical "
    "join/dedup path with a portable family.) Scale: the ONLY joins are "
    "band buckets and the fingerprint block — the pair space never "
    "materializes. Since r15 the candidate relation runs the "
    "boilerplate-proof DEFAULT composition (collapse_exact=True, "
    "expand_pairs=True): banding over DISTINCT texts only, clone pairs "
    "reconstructed losslessly from the fingerprint relation — "
    "value-identical to the naive banding (pinned in tests/test_dedup)"
    " but immune to the r14 duplicate-density wall (a 15k-clone "
    "boilerplate cluster DNF'd the naive bucket join at >9 min).",
)
def dedup_minhash_pairs(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.functions.text import fingerprint_cs

    (documents,) = _t(spark, sf_dir, "documents")
    corpus = _with_copies(documents)
    # the invariant's fingerprint relation feeds BOTH legs of its
    # self-join; without a lineage cut each leg re-scans the corpus and
    # re-computes the md5 (4 corpus scans total in the query). One lazy
    # checkpoint of the tiny (id, 32-char md5) frame removes two of them
    # — measured ~25% off the whole query at sf0.1 (round 5). Since r15
    # the SAME checkpointed frame also feeds the collapse-first
    # candidate build (its internal fingerprint relation is identical),
    # saving the operator's own scan+md5 pass.
    fp = corpus.select(
        F.col("doc_id"), fingerprint_cs(F.col("text")).alias("f")
    ).localCheckpoint(eager=False)
    cand = minhash_near_dup_pairs(
        corpus,
        "doc_id",
        "text",
        w=3,
        k=16,
        bands=4,
        threshold=0.5,
        fingerprints=fp,
    )
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("f"))
    exact_pairs = (
        fp.select(F.col("doc_id").alias("id_a"), "f")
        .join(b, "f")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return exact_pairs.join(cand, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.coalesce(F.col("est_jaccard") == 1.0, F.lit(False)).alias(
            "lsh_recalled"
        ),
    )


@query(
    "dedup_clusters",
    "WITH RECURSIVE "
    + _JACCARD_PAIR_CTES
    + """
    , pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(id, label) AS (
      -- every node seeds its own label, then labels walk the (symmetric)
      -- edge set; UNION dedup bounds the row space at nodes x labels, so
      -- recursion terminates even through cycles
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
    )
    SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
    """,
    "Duplicate clusters: connected components (iterative min-label "
    "propagation, lineage cut per round via localCheckpoint) over the "
    "exact 5-gram Jaccard near-dup pairs. The step every dedup pipeline "
    "needs after pair generation — 'keep one doc per component', not one "
    "per pair. Scale: per round one join + one groupBy on the (tiny) "
    "component edge set; rounds ≈ component diameter (2-3 for near-dups). "
    "Hash-gated: DuckDB reaches the same fixed point through a recursive "
    "CTE (label reachability + min), and pytest cross-checks union-find.",
)
def dedup_clusters(spark, sf_dir):
    return shared_jaccard_components(
        spark,
        sf_dir,
        w=5,
        threshold=SHARED_PAIRS_CONSUMER_THRESHOLDS["dedup_clusters"],
        df_cap=50,
    )


@query(
    "dedup_keep_canonical",
    "WITH RECURSIVE "
    + _JACCARD_PAIR_CTES
    + """
    , pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
    ), clusters AS (
      SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
    )
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_in_clusters,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST((SELECT COUNT(*) FROM documents)
                - (COUNT(*) - COUNT(DISTINCT cluster_id)) AS BIGINT)
             AS n_kept
    FROM clusters
    """,
    "The dedup pipeline's FINAL stage — pair generation → connected "
    "components → keep ONE canonical doc (min doc_id) per component, "
    "drop the rest: the numbers every corpus-dedup report leads with "
    "(docs in, near-dup components, survivors out). Docs in no "
    "component are their own canonical, so n_kept = total − (clustered "
    "− components). Scale: everything up to the 1-row rollup is the "
    "dedup_clusters plan (blocked pair space, hop-bounded components); "
    "the rollup adds one count-distinct over one row per clustered doc.",
)
def dedup_keep_canonical(spark, sf_dir):
    (documents,) = _t(spark, sf_dir, "documents")
    cc = shared_jaccard_components(
        spark,
        sf_dir,
        w=5,
        threshold=SHARED_PAIRS_CONSUMER_THRESHOLDS["dedup_keep_canonical"],
        df_cap=50,
    )
    stats = cc.agg(
        F.count("*").alias("n_in_clusters"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )
    total = documents.agg(F.count("*").alias("n_docs"))
    return total.crossJoin(stats).select(
        "n_docs",
        "n_in_clusters",
        "n_clusters",
        (
            F.col("n_docs") - (F.col("n_in_clusters") - F.col("n_clusters"))
        ).alias("n_kept"),
    )


#: dedup_minhash_portable — RETIRED from the gate registry at round 18
#: (the N-saturation policy's retirement mechanism; slot freed for the
#: r18 front's five entrants: the three probe-affected r16-cohort
#: levers + the two new operator gates). Lowest marginal evidence in
#: the minhash family: its signature relation is a strict
#: SUB-COMPUTATION of the still-gated dedup_minhash_portable_pairs
#: (r17 green), which builds the identical md5 universal-hash
#: signatures and then value-gates the banding join and pair expansion
#: on top. The full oracle compare lives on in tests/test_retired.py.
MINHASH_PORTABLE_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS l
      FROM documents WHERE doc_id % 10 = 0
    ), sh AS (
      SELECT DISTINCT id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
      FROM toks, unnest(range(1, len(l) - 1)) AS r(i)
      WHERE len(l) >= 3
    ), hashed AS (
      SELECT id,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h
      FROM sh
    )
    SELECT id AS doc_id,
           min((7    * h + 3)   % 2147483647) AS h0,
           min((13   * h + 5)   % 2147483647) AS h1,
           min((31   * h + 11)  % 2147483647) AS h2,
           min((67   * h + 17)  % 2147483647) AS h3,
           min((127  * h + 23)  % 2147483647) AS h4,
           min((257  * h + 41)  % 2147483647) AS h5,
           min((521  * h + 83)  % 2147483647) AS h6,
           min((1031 * h + 163) % 2147483647) AS h7
    FROM hashed GROUP BY id
    """


def dedup_minhash_portable(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.dedup import (
        minhash_signatures_portable,
        shingles,
    )

    (documents,) = _t(spark, sf_dir, "documents")
    subset = documents.filter(F.col("doc_id") % 10 == 0)
    sig = minhash_signatures_portable(shingles(subset, "doc_id", "text", 3), 8)
    return sig.withColumnRenamed("id", "doc_id")


def _minhash_pairs_portable_sql(k: int = 8, bands: int = 4) -> str:
    """DuckDB twin of the FULL portable MinHash→LSH path: md5 universal-hash
    signatures, md5 band hashes, bucket self-join, per-pair signature
    agreement — the banding join itself, not just the signatures."""
    r = k // bands
    sig_mins = ",\n           ".join(
        f"min(({a} * h + {b}) % 2147483647) AS h{i}"
        for i, (a, b) in enumerate(
            zip((7, 13, 31, 67, 127, 257, 521, 1031), (3, 5, 11, 17, 23, 41, 83, 163))
        )
        if i < k
    )
    band_cases = " ".join(
        "WHEN {idx} THEN {concat}".format(
            idx=b,
            concat=" || '|' || ".join(f"h{b * r + j}::VARCHAR" for j in range(r)),
        )
        for b in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(k)
    )
    return rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    ), toks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS l
      FROM corpus
    ), sh AS (
      SELECT DISTINCT id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
      FROM toks, unnest(range(1, len(l) - 1)) AS r(i)
      WHERE len(l) >= 3
    ), hashed AS (
      SELECT id,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h
      FROM sh
    ), sig AS (
      SELECT id,
           {sig_mins}
      FROM hashed GROUP BY id
    ), banded AS (
      SELECT id, {", ".join(f"h{i}" for i in range(k))}, band_idx,
             ('0x' || substr(md5(CASE band_idx {band_cases} END), 1, 15))::BIGINT
               AS band_hash
      FROM sig, (VALUES {", ".join(f"({b})" for b in range(bands))}) bi(band_idx)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(max(({matches}) / {k}.0), 4) AS est_jaccard
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx
                 AND a.band_hash = b.band_hash
                 AND a.id < b.id
    GROUP BY a.id, b.id
    """


@query(
    "dedup_minhash_portable_pairs",
    _minhash_pairs_portable_sql(8, 4),
    "The FULL MinHash→LSH pipeline with the md5-portable hash family — "
    "signatures AND the banding bucket-join AND the pair dedup, hash-gated "
    "end-to-end (dedup_minhash_portable gates only the signatures; the "
    "production dedup_minhash_pairs hash-gates the exact-dup recall "
    "invariant rather than raw xxhash64 values, which have no DuckDB "
    "twin — this query runs the SAME banding/join/dedup code path "
    "with portable band hashes, value-gating the full output). Corpus: the "
    "1-in-10 doc subset plus re-keyed copies, so every doc has an exact "
    "duplicate and the banding provably recalls est=1.0 pairs. Scale: "
    "identical plan shape to the production path — the ONLY join is on "
    "(band_idx, band_hash) buckets. Since r15 this runs the same "
    "boilerplate-proof collapse-first composition as the production "
    "path: banding over DISTINCT texts, clone pairs reconstructed "
    "losslessly via operators.dedup.expand_rep_pairs (value-identical "
    "to the naive every-row banding the oracle replays — identical "
    "texts have identical portable signatures, so clone pairs always "
    "collide at est exactly 1.0 and member pairs inherit their "
    "representative's agreement count).",
)
def dedup_minhash_portable_pairs(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.functions.text import (
        fingerprint_cs,
    )
    from amsterdam_map_data_wrangling_spark.operators.dedup import (
        expand_rep_pairs,
        lsh_candidate_pairs,
        minhash_signatures_portable,
        shingles,
    )

    (documents,) = _t(spark, sf_dir, "documents")
    subset = documents.filter(F.col("doc_id") % 10 == 0)
    copies = subset.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    corpus = subset.unionByName(copies)
    # (id, md5) ONLY, lazily checkpointed: fp feeds the reps grouping
    # plus both expansion membership legs — the former uncut
    # (id, text, md5) frame re-ran the scan + normalize + md5 once per
    # consumer and carried the text it never needed (r19 optimization
    # round; same rewrite as operators.dedup.minhash_near_dup_pairs).
    fp = corpus.select(
        F.col("doc_id").alias("id"),
        fingerprint_cs(F.col("text")).alias("_f"),
    ).localCheckpoint(eager=False)
    # representative text fetched by min-id equi-join, never min_by
    # through a text shuffle; ids are unique so the value is identical
    reps = (
        fp.groupBy("_f")
        .agg(F.min("id").alias("id"))
        .join(corpus.select(F.col("doc_id").alias("id"), "text"), "id")
        .select("_f", "id", F.col("text").alias("_t"))
        .localCheckpoint(eager=False)
    )
    sig = minhash_signatures_portable(shingles(reps, "id", "_t", 3), 8)
    pairs = lsh_candidate_pairs(sig, k=8, bands=4, portable=True)
    return expand_rep_pairs(fp, reps, pairs, w=3)


#: dedup_simhash_portable — RETIRED from the gate registry at round 18
#: (same retirement batch as dedup_minhash_portable above). Nearest
#: twin: the still-gated dedup_simhash_bands (r17 green) shares the
#: SimHash construction (token hash → per-bit votes → sign-threshold
#: code) and value-gates its banding behavior; this query's only
#: marginal evidence was the md5-anchored value-exactness of the bit
#: votes, which lives on as a full oracle compare in
#: tests/test_retired.py.
SIMHASH_PORTABLE_ORACLE = r"""
    WITH tok AS (
      SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\s+')) AS t
      FROM documents WHERE doc_id % 10 = 0
    ), h AS (
      SELECT id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
    ), votes AS (
      SELECT id,
             {sums}
      FROM h GROUP BY id
    )
    SELECT id AS doc_id, {code} AS simhash
    FROM votes
    """.format(
        sums=",\n             ".join(
            f"sum(CASE WHEN (h & {1 << i}) <> 0 THEN 1 ELSE -1 END) AS b{i}"
            for i in range(16)
        ),
        code=" + ".join(
            f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
        ),
    )


def dedup_simhash_portable(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.dedup import simhash_portable

    (documents,) = _t(spark, sf_dir, "documents")
    subset = documents.filter(F.col("doc_id") % 10 == 0)
    return simhash_portable(subset, "doc_id", "text", 16).withColumnRenamed(
        "id", "doc_id"
    )


@query(
    "dedup_simhash_bands",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT min(doc_id) AS keep_id,
           COUNT(*) AS n_docs,
           TRUE AS same_simhash
    FROM corpus
    GROUP BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g')))
    HAVING COUNT(*) > 1
    """,
    "SimHash (16-bit, PRODUCTION xxhash64 token hash) over the "
    "corpus-with-injected-copies, gated on the engine-portable INVARIANT: "
    "every exact-duplicate group (identical CASE-SENSITIVE "
    "whitespace-normalized text — identical token multiset — identical "
    "bit votes in ANY hash family) must map to ONE simhash code. Output "
    "is one row per exact group (min-id keeper, copy count, all-same-code "
    "boolean); the oracle derives the groups from the same case-sensitive "
    "md5 fingerprint (fingerprint_cs — the lowercased fingerprint would "
    "group case-only variants whose raw-token votes legitimately differ, "
    "a spurious gate failure; round-5 ADVICE fix) and asserts TRUE, so "
    "any vote/threshold regression fails the hash gate. (Code values and "
    "near-dup — non-exact — collisions are hash-family-specific; "
    "dedup_simhash_portable value-gates the vote algebra with the md5 "
    "family.) Scale: signature is one groupBy(id); the invariant adds one "
    "fingerprint groupBy — no pairwise work.",
)
def dedup_simhash_bands(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.functions.text import fingerprint_cs

    (documents,) = _t(spark, sf_dir, "documents")
    corpus = _with_copies(documents)
    codes = simhash(corpus, "doc_id", "text", bits=16)
    fp = corpus.select(
        F.col("doc_id").alias("id"), fingerprint_cs(F.col("text")).alias("f")
    )
    return (
        fp.join(codes, "id")
        .groupBy("f")
        .agg(
            F.min("id").alias("keep_id"),
            F.count("*").alias("n_docs"),
            (F.count_distinct("simhash") == 1).alias("same_simhash"),
        )
        .filter(F.col("n_docs") > 1)
        .drop("f")
        .select("keep_id", "n_docs", "same_simhash")
    )


@query(
    "dedup_edit_refine",
    r"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % 3 = 0
        AND octet_length(encode(text)) = length(text)
    ), corpus AS (
      SELECT doc_id AS id, text FROM docs
      UNION ALL
      SELECT doc_id + 2000000 AS id,
             regexp_replace(text, '^[^ ]+[ ]+', '') AS text
      FROM docs WHERE doc_id % 7 = 0
    ), toks AS (
      SELECT id, string_split_regex(trim(text), '\s+') AS l FROM corpus
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
    ), sizes AS (
      SELECT id, COUNT(*) AS n_sh FROM rare GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ), cand AS (
      SELECT id_a, id_b,
             round(CAST(n_inter AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard_r
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE round(CAST(n_inter AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    ), capped AS (
      SELECT id_a, id_b, jaccard_r FROM cand
      QUALIFY row_number() OVER (
        PARTITION BY id_a ORDER BY jaccard_r DESC, id_b) <= 8
    )
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(substr(ta.text, 1, 500),
                            substr(tb.text, 1, 500)) AS BIGINT) AS edit_dist,
           c.jaccard_r
    FROM capped c
    JOIN corpus ta ON ta.id = c.id_a
    JOIN corpus tb ON tb.id = c.id_b
    WHERE levenshtein(substr(ta.text, 1, 500), substr(tb.text, 1, 500)) <= 64
    """,
    "Edit-distance refinement — the verify stage of a two-phase near-dup "
    "pipeline: cheap blocked candidates (exact 5-gram Jaccard blocking, "
    "threshold 0.5) capped at the top-8 per anchor doc by Jaccard rank "
    "(deterministic id_b tie-break), then re-scored with TRUE "
    "Levenshtein distance on the first 500 chars, keeping pairs within "
    "an edit budget. RE-CONTRACTED r13 (the query's own cohort-front "
    "round): (1) the corpus is the deterministic 1-in-3 doc_id subset — "
    "the family convention for value-gating operator semantics without "
    "re-paying the full-corpus blocking already gated by "
    "dedup_ngram_jaccard; (2) the top-m cap makes the DP stage "
    "budget-bounded at ANY corpus size (the r12 profile showed the "
    "uncapped candidate relation is corpus-linear, so per-round refine "
    "cost grew forever). The corpus carries injected near-duplicates "
    "(every 7th subset doc re-keyed with its first token dropped), so "
    "true edit distances are small, data-dependent integers (the "
    "prefix-drop regex uses the literal space class [^ ]+[ ]+ — "
    "dialect-free where Java and RE2 disagree on whitespace). DIALECT "
    "NOTES: Spark's levenshtein counts codepoints, DuckDB's counts "
    "BYTES — identical only on ASCII, so both sides pre-filter to "
    "ASCII docs; Spark evaluates the banded 3-arg levenshtein "
    "(O(n*threshold) instead of O(n*m)), which returns the exact "
    "distance for every pair within the threshold, so the kept rows "
    "are value-identical to the oracle's full-DP filter. Both engines "
    "rank and filter on the ROUND(...,4) Jaccard so the cap replays "
    "exactly. Scale: candidates never all-pairs (shingle blocking); "
    "the refine stage is ≤ 8 pairs per anchor by contract; texts reach "
    "the DP through ONE corpus-side shuffle (pair sides unpivoted, "
    "joined once against the 500-char projection, regrouped per pair) "
    "instead of two.",
)
def dedup_edit_refine(spark, sf_dir):
    # scoped child session: AQE off for this one plan. Every relation
    # past the scan is contract-bounded (bucket ≤ 50 ids, cap ≤ 8 pairs
    # per anchor), so runtime re-planning has nothing to discover here —
    # while its stage-wave materialization (one scheduling round per
    # exchange, ~9 exchanges in this pipeline) measured ~2x the whole
    # query at bench scale (6.9 s -> 3.5 s at the 10x dir). Same scoped
    # newSession pattern as runtime_bloom_filter_join; no other query
    # inherits the conf.
    s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    (documents,) = _t(s2, sf_dir, "documents")
    docs = documents.filter(
        (F.col("doc_id") % 3 == 0)
        & (F.octet_length("text") == F.length("text"))
    ).select("doc_id", "text")
    mut = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.regexp_replace("text", r"^[^ ]+[ ]+", "").alias("text"),
    )
    # one lazy checkpoint: the corpus feeds candidate generation AND the
    # text-side join — without the cut each consumer re-reads the scan
    corpus = docs.unionByName(mut).localCheckpoint(eager=False)
    cand = ngram_jaccard_pairs(
        corpus, "doc_id", "text", w=5, threshold=0.5, df_cap=50
    )
    # the r13 contract cap: top-8 candidates per anchor (id_a is the
    # min-id side) by Jaccard rank, ties broken by id_b — row_number
    # over a total order, replayed verbatim by the oracle's QUALIFY
    w = Window.partitionBy("id_a").orderBy(
        F.col("jaccard").desc(), F.col("id_b")
    )
    capped = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 8)
        .drop("rk")
    )
    # ONE corpus-side shuffle instead of two: unpivot each pair into its
    # two (side, id) rows, join the 500-char projection once, regroup
    # per pair. The regroup shuffles only candidate texts (≤ 8 pairs
    # per anchor by contract); the corpus moves (id, ≤500 B) exactly
    # once. NO broadcast hints (r6 VERDICT stance unchanged): the
    # candidate relation is corpus-linear even after the cap, so a
    # forced hint would pin a growing relation into executor memory.
    sides = capped.select(
        "id_a",
        "id_b",
        "jaccard",
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("s"), F.col("id_a").alias("id")),
                F.struct(F.lit("b").alias("s"), F.col("id_b").alias("id")),
            )
        ).alias("e"),
    ).select(
        "id_a", "id_b", "jaccard",
        F.col("e.s").alias("s"), F.col("e.id").alias("id"),
    )
    corpus500 = corpus.select(
        F.col("doc_id").alias("id"), F.substring("text", 1, 500).alias("t")
    )
    both = (
        sides.join(corpus500, "id")
        .groupBy("id_a", "id_b")
        .agg(
            F.max("jaccard").alias("jaccard"),
            F.max(F.when(F.col("s") == "a", F.col("t"))).alias("text_a"),
            F.max(F.when(F.col("s") == "b", F.col("t"))).alias("text_b"),
        )
    )
    # banded DP: the 3-arg levenshtein runs O(len * threshold) and
    # returns the exact distance when <= threshold (-1 above), so
    # filter(dist >= 0) is value-identical to the oracle's full-DP
    # "levenshtein(...) <= 64"
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"), 64)
    return (
        both.filter(dist >= 0)
        .select(
            "id_a",
            "id_b",
            dist.cast("bigint").alias("edit_dist"),
            F.round("jaccard", 4).alias("jaccard_r"),
        )
    )


@query(
    "sorted_neighborhood_window",
    r"""
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
    """,
    "Sorted-neighborhood blocking — the classic record-linkage "
    "alternative to hash blocking: global sort on a sort key (first 12 "
    "normalized chars), then candidate pairs are exactly the rows "
    "within a rank window of each other (window 4 → offsets 1..3). "
    "Candidate count is LINEAR in the corpus by construction (≤ w−1 "
    "per row) — no df-cap tuning, no quadratic escape hatch. Scale: "
    "one global sort (range-partitioned, the same machinery as any "
    "ORDER BY) + a narrow rank equi-join; the window knob trades "
    "recall for exactly-linear cost.",
)
def sorted_neighborhood_window(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    (documents,) = _t(spark, sf_dir, "documents")
    key = F.substring(F.lower(F.trim(F.col("text"))), 1, 12)
    return sorted_neighborhood_pairs(documents, "doc_id", key, window=4).select(
        "id_a", "id_b", F.col("rank_gap").cast("bigint").alias("rank_gap")
    )


@query(
    "near_dup_transitivity",
    r"""
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
    """,
    "Transitivity audit of the near-dup similarity graph — the sanity "
    "check before trusting connected-component clustering: edges from "
    "the exact 5-gram Jaccard blocking (threshold 0.3), then triangle "
    "count via canonical-orientation wedge joins (a<b edges only, so "
    "each triangle counts once) against open-triad count; the global "
    "clustering coefficient says how cluster-like the graph is (low → "
    "CC chains unrelated docs through weak links). Scale: wedge join "
    "fan-out is Σ deg², bounded by the same df-cap blocking that "
    "bounds the edge count; no all-pairs anywhere.",
)
def near_dup_transitivity(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.dedup import (
        triangle_stats,
    )

    pairs = shared_jaccard_pairs(
        spark,
        sf_dir,
        w=5,
        threshold=SHARED_PAIRS_CONSUMER_THRESHOLDS["near_dup_transitivity"],
        df_cap=50,
    )
    return triangle_stats(pairs.select("id_a", "id_b"))


@query(
    "near_dup_pagerank",
    r"""
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
    ), sym AS (
      SELECT a AS src, b AS dst FROM e
      UNION ALL SELECT b AS src, a AS dst FROM e
    ), deg AS (
      SELECT src, COUNT(*) AS deg FROM sym GROUP BY src
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS (
      SELECT src, deg, 1.0 / n AS r FROM deg CROSS JOIN nn
    ), c1 AS (
      SELECT s.dst AS src, SUM(r.r / r.deg) AS mass
      FROM sym s JOIN r0 r ON s.src = r.src GROUP BY s.dst
    ), r1 AS (
      SELECT d.src, d.deg,
             (1.0 - 0.85) / n + 0.85 * coalesce(c1.mass, 0.0) AS r
      FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.src = d.src
    ), c2 AS (
      SELECT s.dst AS src, SUM(r.r / r.deg) AS mass
      FROM sym s JOIN r1 r ON s.src = r.src GROUP BY s.dst
    ), r2 AS (
      SELECT d.src, d.deg,
             (1.0 - 0.85) / n + 0.85 * coalesce(c2.mass, 0.0) AS r
      FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.src = d.src
    ), c3 AS (
      SELECT s.dst AS src, SUM(r.r / r.deg) AS mass
      FROM sym s JOIN r2 r ON s.src = r.src GROUP BY s.dst
    ), r3 AS (
      SELECT d.src, d.deg,
             (1.0 - 0.85) / n + 0.85 * coalesce(c3.mass, 0.0) AS r
      FROM deg d CROSS JOIN nn LEFT JOIN c3 ON c3.src = d.src
    )
    SELECT src AS id, CAST(deg AS BIGINT) AS deg, round(r, 9) AS r_r
    FROM r3
    """,
    "Bounded-iteration PageRank over the near-dup similarity graph — "
    "which documents sit at the CENTER of duplication clusters (the "
    "canonical-pick signal beyond min-id), and the second iterative "
    "algorithm family next to connected components: 3 rounds of power "
    "iteration with teleport from the uniform start, exactly unrolled "
    "by the oracle (fixed hop budget = deterministic cost = exactly "
    "reproducible — the CC stance). Float discipline: the teleport "
    "term is written (1.0 − 0.85)/n on BOTH engines, because the "
    "IEEE result of 1−0.85 differs from the literal 0.15 in the last "
    "bit; per-edge contributions are identical doubles and only the "
    "neighbor SUM is association-sensitive — gated rounded to 9. "
    "Scale: each iteration is one vertex-key join + one aggregation "
    "(a CC hop); the REUSED edge relation is checkpointed once and "
    "per-round rank checkpoints are deliberately omitted at this hop "
    "budget (3 linear hops — operators/dedup.pagerank documents the "
    "measured trade; deeper budgets would add them).",
)
def near_dup_pagerank(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.operators.dedup import pagerank

    pairs = shared_jaccard_pairs(
        spark,
        sf_dir,
        w=5,
        threshold=SHARED_PAIRS_CONSUMER_THRESHOLDS["near_dup_pagerank"],
        df_cap=50,
    )
    pr = pagerank(pairs.select("id_a", "id_b"), damping=0.85, iters=3)
    return pr.select("id", "deg", F.round("r", 9).alias("r_r"))


@query(
    "incremental_dedup_stats",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f,
             doc_id % 5 = 4 AS is_new
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
             TRUE
      FROM documents WHERE doc_id % 10 = 0
    ), existing AS (
      SELECT DISTINCT f FROM fp WHERE NOT is_new
    ), nw AS (
      SELECT doc_id, f FROM fp WHERE is_new
    ), fresh AS (
      SELECT doc_id, f FROM nw WHERE f NOT IN (SELECT f FROM existing)
    ), grps AS (
      SELECT f, COUNT(*) AS c FROM fresh GROUP BY f
    )
    SELECT CAST((SELECT COUNT(*) FROM nw) AS BIGINT) AS new_docs,
           CAST((SELECT COUNT(*) FROM nw) - (SELECT COUNT(*) FROM fresh)
                AS BIGINT) AS dup_vs_existing,
           CAST((SELECT SUM(c) - COUNT(*) FROM grps) AS BIGINT)
             AS dup_within_shard,
           CAST((SELECT COUNT(*) FROM grps) AS BIGINT) AS admitted
    """,
    "Incremental-ingestion dedup — the production pattern a continuous "
    "crawl pipeline runs on every new shard: the shard (every 5th doc "
    "plus injected re-crawled copies) checks its exact fingerprints "
    "against the EXISTING corpus (left anti join — the new shard never "
    "re-reads corpus text, only its fingerprint relation) and then "
    "dedups WITHIN itself (min-id keeper per surviving fingerprint), "
    "reporting new/dup-vs-existing/dup-within/admitted counts. Scale: "
    "the corpus side is a fingerprint-only relation (32 B/doc, "
    "incrementally maintainable as the dedup ledger); both joins key "
    "on the high-cardinality 128-bit fingerprint — no skew, no pairs; "
    "at 100 TB this is the cheap gate IN FRONT of the expensive "
    "near-dup passes.",
)
def incremental_dedup_stats(spark, sf_dir):
    from amsterdam_map_data_wrangling_spark.functions.text import fingerprint

    (documents,) = _t(spark, sf_dir, "documents")
    # the re-crawl injection makes dup_vs_existing non-trivially > 0
    recrawl = documents.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    fps = (
        documents.select("doc_id", "text")
        .withColumn("is_new", F.col("doc_id") % 5 == 4)
        .unionByName(recrawl.withColumn("is_new", F.lit(True)))
        .select("doc_id", fingerprint(F.col("text")).alias("f"), "is_new")
        .localCheckpoint(eager=False)  # feeds existing + new legs
    )
    existing = fps.filter(~F.col("is_new")).select("f").distinct()
    new = fps.filter(F.col("is_new")).select("doc_id", "f")
    fresh = new.join(existing, "f", "left_anti")
    grps = fresh.groupBy("f").agg(F.count("*").alias("c"))
    counts = (
        new.agg(F.count("*").alias("new_docs"))
        .crossJoin(fresh.agg(F.count("*").alias("n_fresh")))
        .crossJoin(
            grps.agg(
                F.count("*").alias("admitted"),
                F.sum("c").alias("fresh_total"),
            )
        )
    )
    return counts.select(
        F.col("new_docs").cast("bigint").alias("new_docs"),
        (F.col("new_docs") - F.col("n_fresh"))
        .cast("bigint")
        .alias("dup_vs_existing"),
        (F.col("fresh_total") - F.col("admitted"))
        .cast("bigint")
        .alias("dup_within_shard"),
        F.col("admitted").cast("bigint").alias("admitted"),
    )


@query(
    "leakage_free_split",
    "WITH RECURSIVE "
    + _JACCARD_PAIR_CTES
    + """
    , pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), walk(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.id
    ), comp AS (
      SELECT id, min(label) AS cluster_id FROM walk GROUP BY id
    ), units AS (
      -- strlen = BYTE length of a VARCHAR in DuckDB (octet_length there
      -- is BLOB-only); pairs with Spark's octet_length
      SELECT d.doc_id, strlen(d.text) AS nb,
             COALESCE(c.cluster_id, d.doc_id) AS unit
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ), assigned AS (
      SELECT doc_id, nb, unit,
             CASE WHEN CAST(('0x' || substr(md5('split|'
                         || CAST(unit AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 10 < 8
                  THEN 'train' ELSE 'holdout' END AS split
      FROM units
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT unit) AS BIGINT) AS n_units,
           CAST(SUM(nb) AS BIGINT) AS n_bytes,
           CAST(0 AS BIGINT) AS leaked_pairs
    FROM assigned GROUP BY split ORDER BY split
    """,
    "Leakage-free train/holdout split — the eval-hygiene step a "
    "training-data pipeline runs AFTER near-dup detection: the unit of "
    "assignment is the near-dup CLUSTER (connected component of the "
    "exact 5-gram Jaccard pairs; singletons are their own unit), hashed "
    "whole into train (80%) or holdout, so two near-duplicate documents "
    "can never land on opposite sides of the split and leak eval "
    "content into training. The gate pins per-split doc/unit/byte "
    "censuses AND a leaked-pairs count the oracle emits as a LITERAL 0 "
    "(the decontaminate_stats contract style): the Spark side RE-JOINS "
    "the near-dup pair relation against the final assignment and "
    "counts pairs straddling the split — an assignment bug (e.g. "
    "hashing doc ids instead of cluster ids) becomes a nonzero count "
    "against the oracle's 0, it cannot hide in a recomputed value. "
    "Scale: reuses the session-shared pair/component materialization "
    "(linear in true near-dups); assignment is one md5 per doc; the "
    "leak audit joins the tiny pair relation twice against a "
    "(doc, split) projection — no corpus shuffle beyond the shared "
    "relation's own build.",
)
def leakage_free_split(spark, sf_dir):
    _thr = SHARED_PAIRS_CONSUMER_THRESHOLDS["leakage_free_split"]
    comp = shared_jaccard_components(
        spark, sf_dir, w=5, threshold=_thr, df_cap=50
    )
    pairs = shared_jaccard_pairs(
        spark, sf_dir, w=5, threshold=_thr, df_cap=50
    ).select("id_a", "id_b")
    (documents,) = _t(spark, sf_dir, "documents")
    docs = documents.select(
        "doc_id", F.octet_length("text").alias("nb")
    )
    units = (
        docs.join(comp, docs["doc_id"] == comp["id"], "left")
        .select(
            "doc_id",
            "nb",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("unit"),
        )
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("split|"), F.col("unit").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    assigned = units.select(
        "doc_id",
        "nb",
        "unit",
        F.when(bucket < 8, "train").otherwise("holdout").alias("split"),
    )
    per_split = assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("unit").alias("n_units"),
        F.sum("nb").alias("n_bytes"),
    )
    # the leak audit: every near-dup pair must sit inside one split —
    # computed from the ASSIGNMENT (never from the unit construction,
    # which would make the literal-0 gate circular)
    sa = assigned.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = assigned.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    leaks = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .agg(F.count("*").alias("leaked_pairs"))
    )
    return (
        per_split.crossJoin(leaks)
        .select("split", "n_docs", "n_units", "n_bytes", "leaked_pairs")
        .orderBy("split")
    )
