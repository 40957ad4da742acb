#!/usr/bin/env python
"""Synthesize a WIDE-ROW (large-document) skew dir pair for PERF soaks
(r14 verdict ask #5a: volume, join-key skew, and duplicate density are
covered; row-WIDTH skew is not — tokenize/gram/regex kernels, per-doc
arrays, doc-keyed windows, and Arrow batch sizing all implicitly assume
bounded row width, and a 50 MB document in a corpus of 300 B ones is a
different failure class from many rows).

Usage:
    python scripts/make_widerow_dir.py [--src /root/testdata/sf0.1] \
        [--wide /tmp/sfwide] [--uniform /tmp/sfwideu]

NOT an oracle input — correctness gates always run on the driver's own
read-only testdata.

Scheme: both dirs carry the src tables verbatim except ``documents``,
which gains the SAME number of extra text bytes (~144 MB, ~100x the
base corpus):

- wide dir:    22 huge docs — 16 x 1 MB + 4 x 8 MB + 2 x 48 MB;
- uniform dir: the same bytes as 4,800 docs of ~30 KB (big-but-normal
  web pages), so timing ratios isolate the WIDTH DISTRIBUTION, not
  byte volume. (Doc COUNT necessarily differs — the kernels under test
  are byte-dominated, which is the point of the axis.)

Every synthetic doc is a deterministic per-doc-seeded word stream over
a 4,096-word vocabulary (LCG indices, numpy) — documents are pairwise
DISSIMILAR, so the duplicate-density axis (covered r14) stays out of
this one's measurements, and shingle df stays low so df-capped paths
do real work instead of dropping everything.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
]

#: ~6-char words, deterministic — varied lengths so tokenizers and
#: regex kernels see realistic shapes
VOCAB = np.array(
    [
        f"w{i:04d}" + "abcdefghijk"[: (i * 7) % 9]
        for i in range(4096)
    ]
)
AVG_WORD_BYTES = float(np.mean([len(w) for w in VOCAB])) + 1.0  # + space


def _doc_text(seed: int, n_bytes: int) -> str:
    """Deterministic pseudo-random word stream of ~n_bytes chars."""
    n_words = int(n_bytes / AVG_WORD_BYTES) + 1
    # LCG over the vocab index space — cheap, seeded, vectorized
    add = (seed * 1442695040888963407 + 1) % (1 << 64)
    idx = (
        np.arange(n_words, dtype=np.uint64) * np.uint64(6364136223846793005)
        + np.uint64(add)
    )
    idx = ((idx >> np.uint64(33)) ^ idx) % np.uint64(len(VOCAB))
    return " ".join(VOCAB[idx.astype(np.int64)].tolist())


def _extra_docs(sizes_bytes: list[int], id_base: int, source: str):
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i, nb in enumerate(sizes_bytes):
        t = _doc_text(id_base + i, nb)
        ids.append(id_base + i)
        texts.append(t)
        langs.append("en")
        sources.append(source)
        n_chars.append(len(t))
    return ids, texts, langs, sources, n_chars


def _build(dst: str, src: str, sizes_bytes: list[int], source: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.exists(s) and not os.path.exists(d):
            shutil.copyfile(s, d)
    base = pq.read_table(f"{src}/documents.parquet")
    ids, texts, langs, sources, n_chars = _extra_docs(
        sizes_bytes, 50_000_000, source
    )
    extra = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    base = base.select(["doc_id", "text", "lang", "source", "n_chars"])
    extra = extra.cast(base.schema)
    # bounded row groups (~6 MB per group; huge docs one per group) —
    # a single 145 MB row group would make the SCAN itself
    # unsplittable in BOTH dirs and conflate scan parallelism with the
    # row-atomicity effect this axis isolates. Real corpus writers
    # flush at a byte budget, so bounded groups are the realistic
    # layout: base docs in 2000-row (~0.6 MB) groups, synthetic docs in
    # groups of ~6 MB worth of rows (one group per doc past 6 MB).
    with pq.ParquetWriter(
        f"{dst}/documents.parquet", base.schema
    ) as w:
        w.write_table(base, row_group_size=2000)
        per_group = max(1, int(6_000_000 / max(n_chars)))
        w.write_table(extra, row_group_size=per_group)
    total = sum(n_chars)
    print(
        f"{dst}: +{len(ids)} docs, +{total / 1e6:.1f} MB text "
        f"(max doc {max(n_chars) / 1e6:.1f} MB)"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--wide", default="/tmp/sfwide")
    ap.add_argument("--uniform", default="/tmp/sfwideu")
    a = ap.parse_args()
    mb = 1_000_000
    wide_sizes = [1 * mb] * 16 + [8 * mb] * 4 + [48 * mb] * 2
    total = sum(wide_sizes)
    n_uniform = total // 30_000
    _build(a.wide, a.src, wide_sizes, "wide")
    _build(a.uniform, a.src, [30_000] * n_uniform, "wideu")


if __name__ == "__main__":
    main()
