"""Range-split WARC reading: exactly-once record claims at every split
size, parity with the whole-file reader, and real per-range parallelism
— the giant-archive straggler story, proven instead of prosed."""

from __future__ import annotations

import gzip
import hashlib

import pytest

from .test_archives import _warc_record


def _corpus():
    """~60 records with payloads from tiny to multi-KB (records that
    span several small splits), http responses with bodies, and one
    payload that CONTAINS the sync marker text (must not double-count)."""
    recs = []
    for i in range(60):
        if i % 7 == 3:
            payload = (f"filler {i} ".encode()) * 400  # ~3.6 KB, spans splits
        else:
            payload = f"payload number {i} ".encode() * (1 + i % 5)
        if i % 5 == 0:
            body = b"<html><body>doc %d</body></html>" % i
            payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            recs.append(
                _warc_record(
                    f"r{i:03d}", "response", f"http://ex.com/{i}", payload,
                    content_type="application/http; msgtype=response",
                )
            )
        elif i == 17:
            # adversarial: marker bytes inside a payload — header parse +
            # chain validation must reject this as a record start
            payload = b"quoted crawl log:\r\nWARC/1.0\r\nnot a real header\r\n" * 20
            recs.append(
                _warc_record(f"r{i:03d}", "metadata", f"http://ex.com/{i}", payload)
            )
        else:
            recs.append(
                _warc_record(f"r{i:03d}", "metadata", f"http://ex.com/{i}", payload)
            )
    return recs


def _key(row):
    return (
        row.record_id,
        row.warc_type,
        row.target_uri,
        row.content_length,
        hashlib.md5(bytes(row.payload)).hexdigest(),
        hashlib.md5(bytes(row.http_body) if row.http_body is not None else b"").hexdigest(),
    )


@pytest.fixture(scope="module")
def warc_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("split_warcs")
    recs = _corpus()
    plain = d / "big.warc"
    plain.write_bytes(b"".join(recs))
    percc = d / "big_cc.warc.gz"  # Common-Crawl: one gzip member PER record
    percc.write_bytes(b"".join(gzip.compress(r) for r in recs))
    mono = d / "mono.warc.gz"  # one gzip stream for the whole file
    mono.write_bytes(gzip.compress(b"".join(recs)))
    return d, plain, percc, mono, len(recs)


@pytest.fixture()
def registered(spark):
    from amsterdam_map_data_wrangling_spark.sources.warc_split import (
        SplitWarcDataSource,
    )

    try:
        spark.dataSource.register(SplitWarcDataSource)
    except Exception:
        pass  # already registered in this session
    return spark


def _read_split(spark, path, split_bytes):
    return (
        spark.read.format("warc_split")
        .option("path", str(path))
        .option("split_bytes", split_bytes)
        .load()
    )


@pytest.mark.parametrize("split_bytes", [512, 1777, 4096, 1 << 20])
def test_split_plain_exactly_once_any_split(registered, warc_files, split_bytes):
    spark = registered
    d, plain, _percc, _mono, n = warc_files
    from amsterdam_map_data_wrangling_spark.sources.archives import (
        read_warc_records,
    )

    baseline = sorted(_key(r) for r in read_warc_records(spark, str(plain)).collect())
    assert len(baseline) == n
    got = _read_split(spark, plain, split_bytes).collect()
    # exactly once: COUNT equality catches double-claims, key equality drops
    assert len(got) == n
    assert sorted(_key(r) for r in got) == baseline


@pytest.mark.parametrize("split_bytes", [512, 1777, 4096, 1 << 20])
def test_split_percc_gzip_exactly_once_any_split(
    registered, warc_files, split_bytes
):
    spark = registered
    d, plain, percc, _mono, n = warc_files
    from amsterdam_map_data_wrangling_spark.sources.archives import (
        read_warc_records,
    )

    baseline = sorted(_key(r) for r in read_warc_records(spark, str(plain)).collect())
    got = _read_split(spark, percc, split_bytes).collect()
    assert len(got) == n
    assert sorted(_key(r) for r in got) == baseline


def test_split_partition_count_is_range_math(registered, warc_files):
    """The parallelism claim itself: one partition per split_bytes range
    — a 100 GB WARC at 64 MB splits is ~1600 independent tasks, not one
    straggler."""
    spark = registered
    _d, plain, _percc, _mono, _n = warc_files
    size = plain.stat().st_size
    split = 1024
    df = _read_split(spark, plain, split)
    expected = -(-size // split)  # ceil
    assert df.rdd.getNumPartitions() == expected
    assert expected > 20  # the fixture is genuinely multi-range


def test_monolithic_gzip_degrades_to_one_worker_not_wrong(
    registered, warc_files
):
    """A single-stream .warc.gz is not splittable by construction; the
    correct behavior is one range does all records (the others find no
    sync point) — parity intact, no duplicates."""
    spark = registered
    _d, plain, _percc, mono, n = warc_files
    from amsterdam_map_data_wrangling_spark.sources.archives import (
        read_warc_records,
    )

    baseline = sorted(_key(r) for r in read_warc_records(spark, str(plain)).collect())
    got = _read_split(spark, mono, 2048).collect()
    assert len(got) == n
    assert sorted(_key(r) for r in got) == baseline


def test_split_dir_reads_all_files(registered, warc_files):
    spark = registered
    d, _plain, _percc, _mono, n = warc_files
    # directory mode: big.warc + big_cc.warc.gz + mono.warc.gz = 3n records
    got = _read_split(spark, d, 4096).collect()
    assert len(got) == 3 * n
    assert {r.archive for r in got} == {
        str(d / "big.warc"), str(d / "big_cc.warc.gz"), str(d / "mono.warc.gz")
    }


# ---------------------------------------------------------------------------
# Property hardening: random corpora x random split sizes -> exactly once.
# The reader logic runs WITHOUT Spark (DataSourceReader called directly),
# so Hypothesis can afford real example counts.
# ---------------------------------------------------------------------------
import gzip as _gzip

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_adversarial = st.one_of(
    st.binary(min_size=0, max_size=200),
    # payload fragments that look like sync markers
    st.just(b"\r\nWARC/1.0\r\nnot: a header"),
    st.just(b"\x1f\x8b\x08 fake gzip magic"),
    st.just(b"WARC/"),
    st.just(b"\r\n\r\nWARC/9.9\r\n"),
)


def _mk_record(i: int, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\nWARC-Type: metadata\r\n"
        f"WARC-Record-ID: <urn:uuid:p{i}>\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _read_all(path: str, split_bytes: int):
    from amsterdam_map_data_wrangling_spark.sources.warc_split import (
        SplitWarcReader,
    )

    reader = SplitWarcReader({"path": path, "split_bytes": str(split_bytes)})
    return [
        row for part in reader.partitions() for row in reader.read(part)
    ]


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    payloads=st.lists(_adversarial, min_size=1, max_size=12),
    split_bytes=st.integers(min_value=16, max_value=4096),
    gz=st.booleans(),
)
def test_split_exactly_once_property(tmp_path_factory, payloads, split_bytes, gz):
    """For ANY record payloads (including embedded sync-marker bytes)
    and ANY split size, every record is claimed exactly once and
    byte-identically."""
    import hashlib

    d = tmp_path_factory.mktemp("prop")
    recs = [_mk_record(i, p) for i, p in enumerate(payloads)]
    if gz:
        f = d / "x.warc.gz"
        f.write_bytes(b"".join(_gzip.compress(r) for r in recs))
    else:
        f = d / "x.warc"
        f.write_bytes(b"".join(recs))
    rows = _read_all(str(f), split_bytes)
    got = sorted(
        (r[1], r[4], hashlib.md5(r[5]).hexdigest()) for r in rows
    )  # (record_id, clen, payload md5)
    want = sorted(
        (f"<urn:uuid:p{i}>", len(p), hashlib.md5(p).hexdigest())
        for i, p in enumerate(payloads)
    )
    assert got == want


def test_directory_listing_preserves_uri_authority(tmp_path, monkeypatch):
    """r8 ADVICE: directory mode re-prefixed children with the SCHEME
    alone, so hdfs://namenode:8020/dir listed children as hdfs:///dir/x
    — silently losing the authority. The listing must rebuild every
    child as <original URI> + <tail relative to the listing base>.
    (Driver-side planning only: executors re-open by the returned URI,
    so a wrong prefix here is a wrong cluster connection there.)"""
    import pyarrow.fs as pafs

    from amsterdam_map_data_wrangling_spark.sources.warc_split import (
        _list_warcs,
    )

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.warc").write_bytes(b"x")
    (tmp_path / "sub" / "b.warc.gz").write_bytes(b"x")

    class _FakeFS:  # pafs.FileSystem is an immutable C type — shim it
        @staticmethod
        def from_uri(uri):
            assert uri.startswith("mock://nn:8020/")
            return pafs.LocalFileSystem(), uri[len("mock://nn:8020"):]

    monkeypatch.setattr(pafs, "FileSystem", _FakeFS)
    uri = "mock://nn:8020" + str(tmp_path)
    got = sorted(p for p, _ in _list_warcs(uri))
    assert got == [
        f"mock://nn:8020{tmp_path}/a.warc",
        f"mock://nn:8020{tmp_path}/sub/b.warc.gz",
    ]


def test_sync_rejects_parseable_fake_header_inside_payload(
    registered, tmp_path_factory
):
    """A payload embedding a fully PARSEABLE fake WARC header (valid
    version line + Content-Length pointing at in-file garbage) must be
    rejected by chain validation at every split size — this drives the
    bounded probe path (the fake's claimed end parses as nothing)."""
    import hashlib

    d = tmp_path_factory.mktemp("fakehdr")
    fake = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:fake>\r\nContent-Length: 64\r\n\r\n"
    )
    payloads = [
        b"A" * 300 + fake + b"B" * 300,   # fake header mid-payload
        b"plain second payload " * 30,
        fake + b"C" * 500,                # fake header at payload START
        b"tail payload",
    ]
    recs = [_mk_record(i, p) for i, p in enumerate(payloads)]
    f = d / "fake.warc"
    f.write_bytes(b"".join(recs))
    for split in (64, 128, 256, 1024):
        rows = _read_all(str(f), split)
        got = sorted(
            (r[1], r[4], hashlib.md5(r[5]).hexdigest()) for r in rows
        )
        want = sorted(
            (f"<urn:uuid:p{i}>", len(p), hashlib.md5(p).hexdigest())
            for i, p in enumerate(payloads)
        )
        assert got == want, f"split={split}"
