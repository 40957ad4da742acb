"""Range-split ZIP reading: the zip twin of ``sources/warc_split.py``.

ZIP is the one archive format where the giant-file case needs NO
boundary guessing: the central directory at the end of the file records
every member's exact local-header offset and compressed size. So the
planner reads ONLY the central directory (stdlib ``zipfile`` over a
seekable ranged-read file — it never touches member data), packs
members into partitions by uncompressed size, and each task seek+reads
exactly its members' byte ranges and inflates them with stdlib zlib.
One 200 GB imagenet-style zip becomes hundreds of independent tasks,
each reading only its slice.

Contrast with the two siblings:

- ``archives.read_zip_members``: one task per archive, whole archive in
  memory — right for millions of small zips, a straggler for one giant.
- ``warc_split``: byte ranges + marker sync, because WARC has no index.
- here: byte ranges from the FORMAT'S OWN INDEX — exact, no sync scan.

Planning cost is one central-directory read per archive (driver-side,
metadata-only); use this reader for FEW GIANT archives and
``read_zip_members`` for many small ones.

Integrity: each member's CRC-32 from the central directory is verified
against the inflated bytes — a torn range read or bit rot fails loudly,
never yields silent garbage.

Usage::

    spark.dataSource.register(SplitZipDataSource)
    df = (spark.read.format("zip_split")
          .option("path", "/data/bundles")        # file or directory
          .option("target_bytes", 64 * 1024 * 1024)
          .load())

Schema matches ``read_zip_members``: (archive, member, size, payload).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from amsterdam_map_data_wrangling_spark.sources.archives import _MEMBER_SCHEMA
from amsterdam_map_data_wrangling_spark.sources.warc_split import _open_file

_STORED, _DEFLATED = 0, 8
_LOCAL_HEADER_FIXED = 30  # bytes before the variable name/extra fields


def _plan_members(path: str) -> list[tuple[str, int, int, int, int, int]]:
    """(member, header_offset, compress_size, file_size, method, crc)
    for every plain-file member, via the central directory only. stdlib
    zipfile reads EOCD + central directory on open and never member
    data; pyarrow's input file provides the seek/read it needs, so this
    works on any pyarrow-supported scheme."""
    import zipfile

    with _open_file(path) as f, zipfile.ZipFile(f) as zf:
        out = []
        for info in zf.infolist():
            if info.is_dir():
                continue
            if info.compress_type not in (_STORED, _DEFLATED):
                raise ValueError(
                    f"{path}:{info.filename}: unsupported compression "
                    f"method {info.compress_type} (stored/deflate only)"
                )
            if info.flag_bits & 0x1:
                raise ValueError(f"{path}:{info.filename}: encrypted member")
            out.append(
                (
                    info.filename,
                    info.header_offset,
                    info.compress_size,
                    info.file_size,
                    info.compress_type,
                    info.CRC,
                )
            )
        return out


class _MemberGroupPartition(InputPartition):
    def __init__(self, path: str, members: list[tuple]):
        self.path, self.members = path, members


class SplitZipReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("zip_split requires .option('path', ...)")
        self.target_bytes = int(options.get("target_bytes", 64 * 1024 * 1024))
        if self.target_bytes <= 0:
            raise ValueError("target_bytes must be positive")

    def _zips(self) -> list[str]:
        import pyarrow.fs as pafs

        if "://" in self.path:
            fs, p = pafs.FileSystem.from_uri(self.path)
        else:
            fs, p = pafs.LocalFileSystem(), self.path
        info = fs.get_file_info(p)
        if info.type == pafs.FileType.File:
            return [self.path]
        sel = pafs.FileSelector(p, recursive=True)
        # children rebuild as <original URI> + <tail relative to the
        # listing base>: re-prefixing the scheme alone onto the fs-native
        # child path drops the URI authority (hdfs://namenode:8020/d →
        # hdfs:///d/x) — same fix as warc_split._list_warcs
        base = p.rstrip("/")
        prefix = self.path.rstrip("/")
        out = []
        for f in fs.get_file_info(sel):
            if f.type != pafs.FileType.File or not f.path.endswith(".zip"):
                continue
            tail = (
                f.path[len(base):].lstrip("/")
                if f.path.startswith(base)
                else f.path.lstrip("/")
            )
            out.append(prefix + "/" + tail if "://" in self.path else f.path)
        if not out:
            raise FileNotFoundError(f"no *.zip under {self.path}")
        return sorted(out)

    def partitions(self) -> Sequence[InputPartition]:
        """Members pack into partitions by UNCOMPRESSED size, preserving
        offset order within each archive so a task's reads are a few
        forward seeks, not random IO."""
        parts: list[InputPartition] = []
        for path in self._zips():
            group: list[tuple] = []
            acc = 0
            for m in _plan_members(path):
                group.append(m)
                acc += m[3]
                if acc >= self.target_bytes:
                    parts.append(_MemberGroupPartition(path, group))
                    group, acc = [], 0
            if group:
                parts.append(_MemberGroupPartition(path, group))
        return parts

    def read(self, partition: _MemberGroupPartition) -> Iterator[tuple]:
        import struct

        p = partition
        f = _open_file(p.path)
        try:
            for name, hdr_off, csize, fsize, method, crc in p.members:
                f.seek(hdr_off)
                fixed = f.read(_LOCAL_HEADER_FIXED)
                if fixed[:4] != b"PK\x03\x04":
                    raise ValueError(
                        f"{p.path}:{name}: bad local header at {hdr_off}"
                    )
                name_len, extra_len = struct.unpack("<HH", fixed[26:30])
                f.seek(hdr_off + _LOCAL_HEADER_FIXED + name_len + extra_len)
                raw = f.read(csize)
                data = raw if method == _STORED else zlib.decompress(raw, -15)
                if len(data) != fsize or (zlib.crc32(data) & 0xFFFFFFFF) != crc:
                    raise ValueError(
                        f"{p.path}:{name}: CRC/size mismatch after inflate "
                        f"(torn range read or corrupt archive)"
                    )
                yield (p.path, name, fsize, data)
        finally:
            f.close()


class SplitZipDataSource(DataSource):
    """``spark.read.format("zip_split")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "zip_split"

    def schema(self) -> str:
        return _MEMBER_SCHEMA

    def reader(self, schema: StructType) -> SplitZipReader:
        return SplitZipReader(self.options)
