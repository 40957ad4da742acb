"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): a
deterministic synthetic-document generator.

The extension surface SURVEY §2.10 couldn't cover before Spark 4 shipped
the Python DataSource API: a full source — schema, options, partition
planning, per-partition row generation — written in Python and consumed
through the ordinary ``spark.read.format(...)`` path. The generator is
the 100 TB-relevant instance: scale/soak tests and backfills need a
source that materializes ANY volume with zero input files, perfect
determinism, and even partition splits (each partition generates its own
id range — no driver fan-out, no shuffle, trivially linear).

Determinism contract: row content is a pure function of (seed, doc_id)
via md5 — no RNG state — so the same options always yield byte-identical
data on any cluster layout, and a DuckDB oracle can replay generation
with its own md5 (see ``python_datasource_stats``).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LANGS = ("en", "nl", "de", "fr", "xx")
WORDS_PER_DOC = 8


def synth_text(seed: int, doc_id: int) -> str:
    """The row body: 8 four-hex-char 'words' cut from
    md5('<seed>:<doc_id>') — replayable in any engine with md5."""
    import hashlib

    hx = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return " ".join(hx[i * 4 : i * 4 + 4] for i in range(WORDS_PER_DOC))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        """Even id-range splits — the planner side of the source. Each
        partition is self-describing, so executors generate
        independently; scaling the row count or the cluster never
        introduces coordination."""
        step = max(1, -(-self.n // self.parts))  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n), self.seed)
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> "Iterator":
        # ONE Arrow RecordBatch per partition instead of per-row pickled
        # tuples — the Python DataSource API accepts either, and the
        # Arrow path skips the row-at-a-time serializer entirely
        # (guide-§4 boundary rule; r18 optimization round). Row CONTENT
        # is unchanged: same (seed, doc_id)-pure generation, same column
        # order as schema().
        import pyarrow as pa

        ids = list(range(partition.start, partition.end))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array([LANGS[i % len(LANGS)] for i in ids]),
                pa.array([synth_text(partition.seed, i) for i in ids]),
            ],
            names=["doc_id", "lang", "text"],
        )


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader (Spark 4
    ``SimpleDataSourceStreamReader`` — the no-partition-planning
    streaming flavor of the Python DataSource API): offsets are plain
    id watermarks ``{"id": n_emitted}``, each micro-batch emits the next
    ``stream_batch`` ids with the SAME pure-(seed, doc_id) row content
    as the batch reader, and ``readBetweenOffsets`` replays any offset
    range deterministically — which is exactly the exactly-once recovery
    contract: a restarted query re-reads a committed-but-unprocessed
    range and gets byte-identical rows. An exhausted source returns an
    empty iterator with an unchanged offset (the stream idles)."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.batch = int(options.get("stream_batch", 250))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST, not a generator: the simple-stream prefetcher pickles
        # the returned batch for replay, and generators don't pickle
        return [
            (
                doc_id,
                LANGS[doc_id % len(LANGS)],
                synth_text(self.seed, doc_id),
            )
            for doc_id in range(lo, hi)
        ]

    def read(self, start: dict):
        lo = int(start["id"])
        hi = min(lo + self.batch, self.n)
        return self._rows(lo, hi), {"id": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["id"]), int(end["id"]))


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n", ...).load()`` and
    ``spark.readStream.format("synthdocs")...`` (micro-batched id
    ranges, deterministic replay)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, text string"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(SynthDocsDataSource)
