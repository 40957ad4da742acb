"""Streaming NEAR-duplicate detection: MinHash + banded LSH as a
continuous stateful operator.

The batch near-dup path (operators/dedup.py: shingle → sign → band →
bucket self-join) needs a groupBy to build signatures and a self-join to
compare buckets — both illegal or unbounded mid-stream. The streaming
twin recasts each stage:

- signatures: :func:`operators.dedup.with_minhash_sigs` — the SAME
  xxhash64 family construction as the batch path (pinned value-identical
  by tests), but per-row array expressions, so it is a narrow projection
  any stream can run;
- banding: ``posexplode`` of the per-row band hashes (stateless);
- the bucket "self-join": per-bucket GROUP STATE — each (band_idx,
  band_hash) bucket remembers up to ``max_reps_per_bucket``
  representative signatures, and every arriving doc is compared against
  its bucket's representatives (``applyInPandasWithState``).

Semantics are FIRST-WINS, the streaming analog of keep-canonical: the
first document seen in a bucket becomes its representative; later docs
whose signature agrees on ≥ threshold·k components emit a hit row
``(doc_id, band_idx, dup_of, est_jaccard)`` and are NOT added (they are
represented transitively). est_jaccard is the signature-agreement
estimate, the same statistic the batch ``lsh_candidate_pairs`` emits.

Bounded state, the property that makes an unbounded crawl feed
feasible: ≤ ``max_reps_per_bucket`` reps/bucket (k+1 longs each;
saturated buckets stop ADMITTING new representatives — a documented
recall degradation, never a memory one), and an optional processing-time
TTL expires idle buckets entirely. The production shape for a 100 TB
crawl is therefore: streaming first-wins near-dup within the state
horizon, periodic batch MinHash jobs beyond it — the same split the
exact-dedup stream documents (streaming/dedup.py).

Ordering note: within a micro-batch, rows of one bucket are compared in
``doc_id`` order (deterministic given the batch); across micro-batches,
arrival order decides representatives — inherent to ANY streaming
first-wins dedup, exact ones included.

TTL x trigger caveat: ``state_ttl_ms`` uses ``ProcessingTimeTimeout``,
whose timers are evaluated against the BATCH timestamp. Under
``trigger(availableNow=True)`` that clock stops advancing once the
input is exhausted, so pending timers never fire AND their existence
makes Spark schedule empty micro-batches forever — the query never
terminates (observed: 1,491 no-data batches over 41 min). Use the TTL
only with processing-time / continuous triggers; drain-style batch
replays should pass ``state_ttl_ms=None``. The expiry branch itself is
pinned by handler-level tests (tests/test_streaming_neardup.py).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from amsterdam_map_data_wrangling_spark.operators.dedup import (
    with_minhash_sigs,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: one row per (doc, band) whose signature matched a representative.
HITS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("dup_of", T.LongType()),
        T.StructField("est_jaccard", T.DoubleType()),
    ]
)

#: per-bucket state: representative ids + their signatures flattened to
#: one array (k components per id, same order as rep_ids).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("rep_ids", T.ArrayType(T.LongType())),
        T.StructField("rep_sigs", T.ArrayType(T.LongType())),
    ]
)


def _make_update(k: int, threshold: float, cap: int, ttl_ms: int | None):
    """Build the per-bucket GroupState update fn (closure over the knobs;
    applyInPandasWithState pickles it to the workers)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable["pd.DataFrame"],
        state: GroupState,
    ) -> Iterable["pd.DataFrame"]:
        import pandas as pd

        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {f.name: [] for f in HITS_SCHEMA.fields}
            ).astype(
                {"doc_id": "int64", "band_idx": "int32",
                 "dup_of": "int64", "est_jaccard": "float64"}
            )
            return

        if state.exists:
            rep_ids, rep_sigs = state.get
            rep_ids, rep_sigs = list(rep_ids), list(rep_sigs)
        else:
            rep_ids, rep_sigs = [], []
        sig_cols = [f"h{i}" for i in range(k)]
        band_idx = int(key[0])
        out_doc, out_band, out_dup, out_est = [], [], [], []
        # gather the group's chunks and sort ONCE so the comparison order
        # is deterministic across the whole micro-batch (a bucket's rows
        # are a near-dup group — small by construction)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        merged = (
            pd.concat(chunks).sort_values("doc_id") if chunks else None
        )
        if merged is not None:
            for row in merged[["doc_id", *sig_cols]].itertuples(index=False):
                doc_id, sig = int(row[0]), [int(v) for v in row[1:]]
                best_est, best_rep = -1.0, None
                for r_i, rid in enumerate(rep_ids):
                    off = r_i * k
                    matches = sum(
                        1
                        for j in range(k)
                        if rep_sigs[off + j] == sig[j]
                    )
                    est = matches / float(k)
                    if est > best_est or (
                        est == best_est
                        and best_rep is not None
                        and rid < best_rep
                    ):
                        best_est, best_rep = est, rid
                if best_rep is not None and best_est >= threshold:
                    out_doc.append(doc_id)
                    out_band.append(band_idx)
                    out_dup.append(best_rep)
                    out_est.append(best_est)
                elif len(rep_ids) < cap:
                    rep_ids.append(doc_id)
                    rep_sigs.extend(sig)
                # else: bucket saturated — doc neither flagged nor
                # admitted (bounded-state recall trade, see module doc)
        state.update((rep_ids, rep_sigs))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "band_idx": pd.Series(out_band, dtype="int32"),
                "dup_of": pd.Series(out_dup, dtype="int64"),
                "est_jaccard": pd.Series(out_est, dtype="float64"),
            }
        )

    return update


def near_dup_hits_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_reps_per_bucket: int = 64,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Continuous near-dup detection over a doc stream: append-mode hit
    rows ``(doc_id, band_idx, dup_of, est_jaccard)``, one per (doc,
    band) that matched that band-bucket's representative at
    signature-agreement ≥ ``threshold``. A doc may hit in several bands
    (possibly against different representatives) — resolve to per-doc
    verdicts with :func:`doc_verdicts` (inside ``foreachBatch``, or on
    the collected sink; a doc's hits all land in its own micro-batch).

    Docs shorter than ``w`` tokens have no signature and are passed
    over (never flagged, never representatives) — the batch-path
    convention. ``state_ttl_ms`` expires idle buckets by processing
    time; leave ``None`` for unbounded retention (the exact-dedup
    stream's ``dropDuplicates`` stance)."""
    if k % bands != 0:
        raise ValueError(f"bands ({bands}) must divide k ({k})")
    r = k // bands
    sig = with_minhash_sigs(docs, id_col, text_col, w, k).filter(
        F.col("h0").isNotNull()
    )
    banded = sig.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[F.col(f"h{i}") for i in range(k)],
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col(f"h{b * r + j}") for j in range(r)])
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    return banded.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _make_update(k, threshold, max_reps_per_bucket, state_ttl_ms),
        outputStructType=HITS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def doc_verdicts(
    docs: DataFrame, hits: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc near-dup verdicts from a hits relation (both BATCH
    frames — e.g. inside ``foreachBatch``, or over a drained sink):
    ``(doc_id, is_near_dup, dup_of, est_jaccard)`` where dup_of is the
    representative from the best-agreeing band hit (ties → smallest
    id) and docs with no hit row get ``is_near_dup = false``."""
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(
        F.desc("est_jaccard"), F.asc("dup_of")
    )
    best = (
        hits.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", "dup_of", "est_jaccard")
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .distinct()
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_near_dup"),
            "dup_of",
            "est_jaccard",
        )
    )
