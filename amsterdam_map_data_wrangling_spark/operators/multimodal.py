"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step itself (image decode, audio resample, video frame-sample)
needs media libraries this container doesn't ship, so it is STUBBED behind
``decode_stub`` — but everything Spark-side is real and tested: the schema
contract, the Arrow batch shape, the mapInPandas signature, deterministic
per-batch feature extraction (byte length, sha256), and the partitioning
strategy.

Scale notes (100 TB of media):
- binary payloads ride the same parquet row groups as their metadata —
  column pruning means metadata-only queries never read the bytes;
- ``mapInPandas`` streams Arrow batches (``spark.sql.execution.arrow.
  maxRecordsPerBatch``) so a partition never materializes fully in Python;
- partition sizing: target ~128 MB of payload per task — repartition by a
  uniform key (id hash), never by a skewed media-source key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Schema contract for a multimodal asset table.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha16", T.StringType()),
    ]
)


def decode_stub(payload: bytes, mime: str) -> dict:
    """Placeholder for the real media decode (PIL/libav/etc. are not in
    this environment). Raises so nothing silently pretends to decode."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; wire a real decoder here (payload → pixels/samples)"
    )


def as_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test harness: fabricate a MEDIA_SCHEMA table from a text column
    (payload = UTF-8 bytes, fake mime). Real pipelines read parquet/tar
    shards that already carry binary payloads."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: byte length + sha256 prefix per asset. This is the
    exact plumbing a real decode/featurize stage uses — swap the body for
    ``decode_stub`` + model inference and the plan shape is unchanged."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha16": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def resize_dims(width, height, box_w: int, box_h: int):
    """Fit-in-box output dimensions (aspect-preserving, never upscale) as
    pure Column arithmetic — the metadata half of a resize stage. The
    pixel half is ``decode_stub`` territory (mapInPandas over payload);
    planning output dims JVM-side means the resize stage can be
    partitioned/filtered on target size without touching any bytes."""
    scale = F.least(
        F.lit(1.0),
        F.least(F.lit(box_w) / width, F.lit(box_h) / height),
    )
    out_w = F.greatest(F.lit(1), F.floor(width * scale).cast("int"))
    out_h = F.greatest(F.lit(1), F.floor(height * scale).cast("int"))
    return out_w, out_h


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Frame sampling: one row per (asset, frame timestamp), timestamps
    0, every_ms, … ≤ duration_ms. The row multiplication is JVM-side
    (``explode(sequence(...))``) so 100 TB of video metadata fans out
    without Python in the loop; the per-frame ``frame_sha16`` stands in
    for the decoded frame (a real decoder is a ``mapInPandas`` stage over
    (payload, frame_ts) with exactly this schema — see ``decode_stub``).
    """
    frame_ts = F.explode(
        F.sequence(
            F.lit(0).cast("long"),
            F.col("meta.duration_ms"),
            F.lit(int(every_ms)).cast("long"),
        )
    ).alias("frame_ts")
    frames = media.select("media_id", "payload", frame_ts)
    fake_frame = F.sha2(
        F.concat(F.col("payload"), F.encode(F.col("frame_ts").cast("string"), "UTF-8")),
        256,
    )
    return frames.select(
        "media_id",
        "frame_ts",
        F.substring(fake_frame, 1, 16).alias("frame_sha16"),
    )
