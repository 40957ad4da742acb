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
