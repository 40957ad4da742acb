"""CLI entry point: python -m amsterdam_map_data_wrangling_spark — the
reference's invocation story (script on an OSM file -> five tables +
the README workload) in one command."""

from __future__ import annotations

TINY_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="1" user="a" uid="10" version="2" lat="52.1" lon="4.9"
        changeset="5" timestamp="2015-01-01T00:00:00Z">
    <tag k="amenity" v="cafe"/>
    <tag k="addr:postcode" v="1016 DE"/>
  </node>
  <way id="7" user="b" uid="11" version="1" changeset="6"
       timestamp="2015-01-02T00:00:00Z">
    <nd ref="1"/>
    <tag k="name" v="Coffee Corner"/>
  </way>
</osm>
"""


def test_cli_shapes_and_runs_workload(spark, tmp_path, capsys):
    # reuse the session fixture: get_spark() returns the active session,
    # so main() won't spin up a second JVM
    from amsterdam_map_data_wrangling_spark.__main__ import main

    xml = tmp_path / "tiny.osm"
    xml.write_text(TINY_XML)
    out = tmp_path / "out"
    rc = main([str(xml), str(out), "--fmt", "csv", "--workload"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "wrote nodes: 1 rows" in text
    assert "wrote ways: 1 rows" in text
    assert "wrote ways_nodes: 1 rows" in text
    assert "-- " in text  # workload sections printed
    # the reference's CSV layout on disk
    import glob

    assert glob.glob(str(out / "nodes" / "*.csv"))
