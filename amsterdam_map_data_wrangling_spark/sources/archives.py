"""Distributed archive ingestion: crawl dumps and document bundles ship
as millions of small zip/tar archives, and the scalable read is "one
task per archive, members exploded to rows" — NOT driver-side
unpacking. ``spark.read.format("binaryFile")`` distributes the archive
bytes (one row per file, partitioned by Spark's file splitter), and an
Arrow-batched ``mapInPandas`` shreds each archive with stdlib
``zipfile``/``tarfile`` into (archive, member, size, payload) rows.

Scale: archives never aggregate anywhere — each executor opens only its
own partition's archives from memory (BytesIO, no temp files), so the
pattern handles any number of archives; per-archive size is bounded by
executor memory (the binaryFile source's contract). Corrupt archives
either fail loudly (default) or, with ``skip_bad=True``, drop with a
WARNING — the crawl-ingest reality where a few truncated zips must not
kill a 100 TB backfill."""

from __future__ import annotations

import warnings
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_MEMBER_SCHEMA = "archive string, member string, size long, payload binary"


def read_zip_members(
    spark: SparkSession, path: str, skip_bad: bool = False
) -> DataFrame:
    """Read every member of every ``*.zip`` under ``path`` as a row:
    (archive path, member name, uncompressed size, payload bytes).
    Directory entries are skipped. With ``skip_bad``, undecodable
    archives contribute zero rows (and a Python warning) instead of
    failing the job."""
    bins = spark.read.format("binaryFile").load(path)

    def shred(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import zipfile

        import pandas as pd

        for pdf in it:
            names, members, sizes, payloads = [], [], [], []
            for apath, content in zip(pdf["path"], pdf["content"]):
                try:
                    with zipfile.ZipFile(io.BytesIO(content)) as zf:
                        for info in zf.infolist():
                            if info.is_dir():
                                continue
                            data = zf.read(info)
                            names.append(apath)
                            members.append(info.filename)
                            sizes.append(len(data))
                            payloads.append(data)
                except Exception as exc:  # noqa: BLE001 - loud or skip
                    if not skip_bad:
                        raise
                    warnings.warn(
                        f"skipping unreadable archive {apath}: {exc}",
                        RuntimeWarning,
                        stacklevel=2,
                    )
            yield pd.DataFrame(
                {
                    "archive": names,
                    "member": members,
                    "size": pd.array(sizes, dtype="int64"),
                    "payload": payloads,
                }
            )

    return bins.select("path", "content").mapInPandas(shred, _MEMBER_SCHEMA)


def read_tar_members(
    spark: SparkSession, path: str, skip_bad: bool = False
) -> DataFrame:
    """The tar twin of :func:`read_zip_members` (plain, gz, bz2, xz —
    whatever stdlib ``tarfile`` sniffs). Same schema and error
    contract."""
    bins = spark.read.format("binaryFile").load(path)

    def shred(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import tarfile

        import pandas as pd

        for pdf in it:
            names, members, sizes, payloads = [], [], [], []
            for apath, content in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                        for info in tf.getmembers():
                            if not info.isfile():
                                continue
                            f = tf.extractfile(info)
                            data = f.read() if f else b""
                            names.append(apath)
                            members.append(info.name)
                            sizes.append(len(data))
                            payloads.append(data)
                except Exception as exc:  # noqa: BLE001
                    if not skip_bad:
                        raise
                    warnings.warn(
                        f"skipping unreadable archive {apath}: {exc}",
                        RuntimeWarning,
                        stacklevel=2,
                    )
            yield pd.DataFrame(
                {
                    "archive": names,
                    "member": members,
                    "size": pd.array(sizes, dtype="int64"),
                    "payload": payloads,
                }
            )

    return bins.select("path", "content").mapInPandas(shred, _MEMBER_SCHEMA)
