"""Streaming crawl ingestion: the continuously-arriving-shards shape.

A production crawl doesn't land as one batch — WARC shards trickle into
a landing directory for weeks. Structured Streaming's file source
(``readStream.format("binaryFile")``) turns that directory into an
unbounded table of archives with exactly-once file tracking
(checkpointed file log; a restarted query never re-shreds a committed
shard, never misses a new one), and the SAME Arrow-batched shredder the
batch reader uses (``sources/archives._warc_shredder``) explodes each
micro-batch's archives into records — stream and batch parse
identically by construction.

Scale shape: ``maxFilesPerTrigger`` bounds micro-batch size (ingestion
stays memory-bounded no matter how many shards back up in the landing
zone), and the shred is stateless map-only work — no watermark, no
state store, nothing to grow. Downstream, compose with the existing
streaming operators (dedup, enrich, SCD2) exactly as their tests do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amsterdam_map_data_wrangling_spark.sources.archives import (
    _WARC_SCHEMA,
    _warc_shredder,
)

#: binaryFile's fixed schema — file-stream sources require an explicit
#: schema (no inference on unbounded input)
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc_records(
    spark: SparkSession,
    path: str,
    skip_bad: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded twin of ``sources/archives.read_warc_records``: every
    WARC shard that ever lands under ``path`` is shredded into record
    rows exactly once. Returns a streaming DataFrame; attach a sink and
    checkpoint to run it."""
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    bins = reader.load(path)
    return bins.select("path", "content").mapInPandas(
        _warc_shredder(skip_bad), _WARC_SCHEMA
    )
