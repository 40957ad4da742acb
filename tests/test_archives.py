"""Distributed archive shredding: zips/tars → member rows, exact bytes,
corrupt-archive policy."""

from __future__ import annotations

import io
import os
import tarfile
import zipfile

import pytest

from amsterdam_map_data_wrangling_spark.sources.archives import (
    read_tar_members,
    read_zip_members,
)


@pytest.fixture()
def zip_dir(tmp_path):
    d = tmp_path / "zips"
    d.mkdir()
    expected = {}
    for a in range(3):
        p = d / f"bundle_{a}.zip"
        with zipfile.ZipFile(p, "w") as zf:
            for m in range(4):
                name = f"docs/part_{m}.txt"
                data = f"archive {a} member {m} ".encode() * (m + 1)
                zf.writestr(name, data)
                expected[(str(p), name)] = data
        # a directory entry must be skipped
        with zipfile.ZipFile(p, "a") as zf:
            zf.writestr("docs/", b"")
    return str(d), expected


def test_zip_members_exact_bytes(spark, zip_dir):
    d, expected = zip_dir
    rows = read_zip_members(spark, d).collect()
    got = {
        (r.archive.replace("file:", ""), r.member): bytes(r.payload)
        for r in rows
    }
    assert got == expected
    assert all(r.size == len(bytes(r.payload)) for r in rows)


def test_zip_corrupt_policy(spark, zip_dir, tmp_path):
    d, expected = zip_dir
    bad = os.path.join(d, "broken.zip")
    with open(bad, "wb") as f:
        f.write(b"PK\x03\x04 this is not really a zip")
    with pytest.raises(Exception):
        read_zip_members(spark, d).collect()
    rows = read_zip_members(spark, d, skip_bad=True).collect()
    assert len(rows) == len(expected)  # bad archive contributed nothing


def test_tar_members_exact_bytes(spark, tmp_path):
    d = tmp_path / "tars"
    d.mkdir()
    expected = {}
    p = d / "bundle.tar.gz"
    with tarfile.open(p, "w:gz") as tf:
        for m in range(3):
            name = f"texts/doc_{m}.txt"
            data = f"tar member {m} content".encode() * (m + 2)
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            expected[name] = data
    rows = read_tar_members(spark, str(d)).collect()
    got = {r.member: bytes(r.payload) for r in rows}
    assert got == expected
