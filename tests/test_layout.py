"""Z-order layout: the locality property the gated stats exist to prove."""

from __future__ import annotations

from amsterdam_map_data_wrangling_spark.plans.queries import QUERIES

from .conftest import SF_ORACLE


def test_zorder_tiles_are_16x16_boxes(spark):
    """A contiguous z-tile (top 8 of 16 Morton bits) must be a 16x16
    coordinate box: per-tile x/y spans <= 15 and bounds inside the tile's
    quadrant — the property that makes min/max file pruning work on
    EITHER column after a z-order write."""
    rows = QUERIES["zorder_layout_stats"].build(spark, SF_ORACLE).collect()
    assert len(rows) > 10
    for r in rows:
        assert 0 <= r.x_hi - r.x_lo <= 15, r
        assert 0 <= r.y_hi - r.y_lo <= 15, r
        # tile id encodes the box corner: de-interleave its 8 bits
        bx = sum(((r.tile >> (2 * i)) & 1) << i for i in range(4))
        by = sum(((r.tile >> (2 * i + 1)) & 1) << i for i in range(4))
        assert bx * 16 <= r.x_lo and r.x_hi < (bx + 1) * 16, r
        assert by * 16 <= r.y_lo and r.y_hi < (by + 1) * 16, r


def test_zorder_expression_is_a_bijection():
    """The generated Morton expression must place every (x, y) in
    [0,256)^2 at a unique z — checked in pure Python against the same
    closed form both engines run."""
    seen = set()
    for x in range(0, 256, 17):
        for y in range(0, 256, 13):
            z = sum(
                (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
                for i in range(8)
            )
            assert 0 <= z < 65536
            assert z not in seen
            seen.add(z)
