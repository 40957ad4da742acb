"""Hadoop FileSystem helpers: the tiny driver-side file operations a
pipeline needs (write a manifest, read it back, list a directory) done
through the JVM's ``org.apache.hadoop.fs.FileSystem`` so they work on
ANY Hadoop-supported scheme — ``hdfs://``, ``s3a://``, ``file:`` —
not just the driver's local disk (r7 ADVICE: ``open(os.path.join(...))``
next to Spark-written shards silently breaks off-box).

These are deliberately DRIVER-side and deliberately tiny: a manifest is
shard-count-sized and a compaction listing is file-count-sized — both
metadata, never data. Anything data-sized goes through a real Spark job
(see ``sources/export.corpus_manifest``'s binaryFile scan).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def write_text_file(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a single text file at ``path`` (any Hadoop
    scheme) with UTF-8 ``text``. Atomicity note: HDFS/local rename-free
    create is not atomic across readers; callers that use the file as a
    completion marker (the manifest contract) write it LAST."""
    fs, hpath = _fs_and_path(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text_file(spark: SparkSession, path: str) -> str:
    """Read a single UTF-8 text file from any Hadoop scheme. (py4j
    passes arrays by value, so a Python-side read(byte[]) loop cannot
    work; commons-io — a Spark classpath constant — drains the stream
    JVM-side and hands the bytes back once.)"""
    fs, hpath = _fs_and_path(spark, path)
    jvm = spark.sparkContext._jvm
    stream = fs.open(hpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def list_files(
    spark: SparkSession, dir_path: str, suffix: str | None = None
) -> list[tuple[str, int]]:
    """Non-recursive (path, size_bytes) listing of plain files under
    ``dir_path`` on any Hadoop scheme, sorted by path for deterministic
    downstream planning."""
    fs, hpath = _fs_and_path(spark, dir_path)
    out: list[tuple[str, int]] = []
    for status in fs.listStatus(hpath):
        if status.isFile():
            out.append((status.getPath().toString(), int(status.getLen())))
    return sorted(out)


def file_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))
