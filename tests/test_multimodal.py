"""Multimodal plumbing: schema contract, Arrow batch path, honest stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    as_media_table,
    decode_stub,
    extract_features,
)

from .conftest import SF_ORACLE


def test_decode_stub_is_honest():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG", "image/png")


def test_media_table_schema_and_features(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(25)
    media = as_media_table(docs, "doc_id", "text")
    # simpleString ignores nullability (lit() columns come back non-null)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    feats = {r.media_id: r for r in extract_features(media).collect()}
    want = {r.doc_id: r.text for r in docs.collect()}
    assert set(feats) == set(want)
    for doc_id, text in want.items():
        raw = text.encode("utf-8")
        assert feats[doc_id].n_bytes == len(raw)
        assert feats[doc_id].sha16 == hashlib.sha256(raw).hexdigest()[:16]


def test_metadata_query_prunes_payload(spark):
    """A metadata-only aggregation over the media table must not read the
    payload column (column pruning through the struct)."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    media = as_media_table(docs, "doc_id", "text")
    explained = (
        media.groupBy(F.col("meta.mime"))
        .agg(F.count("*").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in explained


def test_resize_dims_fit_in_box(spark):
    from amsterdam_map_data_wrangling_spark.operators.multimodal import resize_dims

    rows = [(1, 4000, 3000), (2, 100, 50), (3, 50, 100), (4, 1, 1), (5, 1024, 768)]
    df = spark.createDataFrame(rows, "id long, w int, h int")
    out_w, out_h = resize_dims(F.col("w"), F.col("h"), 512, 512)
    got = {
        r.id: (r.ow, r.oh)
        for r in df.select("id", out_w.alias("ow"), out_h.alias("oh")).collect()
    }
    # aspect preserved (within floor), never upscaled, fits the box
    assert got[1] == (512, 384)
    assert got[2] == (100, 50)  # already fits: untouched
    assert got[3] == (50, 100)
    assert got[4] == (1, 1)
    assert got[5] == (512, 384)
    for ow, oh in got.values():
        assert 1 <= ow <= 512 and 1 <= oh <= 512


def test_sample_frames_count_and_determinism(spark):
    from amsterdam_map_data_wrangling_spark.operators.multimodal import sample_frames

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(10)
    media = as_media_table(docs, "doc_id", "text").withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            (1000 + (F.col("media_id") % 3) * 500).cast("long").alias("duration_ms"),
        ),
    )
    frames = sample_frames(media, every_ms=500).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    for media_id, rs in by_id.items():
        dur = 1000 + (media_id % 3) * 500
        assert sorted(r.frame_ts for r in rs) == list(range(0, dur + 1, 500))
        # frame digests are deterministic and distinct per timestamp
        assert len({r.frame_sha16 for r in rs}) == len(rs)
    # determinism across runs
    again = sample_frames(media, every_ms=500).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def test_parse_image_dims_walks_real_headers():
    """The header parser does a genuine chunk/marker walk, pinned on
    hand-built byte sequences: PNG IHDR found after a leading non-IHDR
    chunk, JPEG SOF0 found only by skipping variable-length segments
    (APP0 + COM), truncated/foreign payloads degrade to None dims."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_image_dims,
    )

    def be(v, n):
        return v.to_bytes(n, "big")

    # PNG whose FIRST chunk is not IHDR (private 'abCD', 3 data bytes) —
    # a fixed-offset reader would misparse; the walk must skip it
    png = (
        b"\x89PNG\r\n\x1a\n"
        + be(3, 4) + b"abCD" + b"xyz" + b"\x00" * 4
        + be(13, 4) + b"IHDR" + be(640, 4) + be(360, 4) + b"\x08\x06\x00\x00\x00"
        + b"\x00" * 4
    )
    assert _parse_image_dims(png) == ("png", 640, 360)
    # JPEG: SOI, APP0 (16 bytes), COM (4 bytes), SOF0 h=123 w=456
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + be(16, 2) + b"JFIF\x00" + b"\x01\x01\x00" + be(1, 2) + be(1, 2) + b"\x00\x00"
        + b"\xff\xfe" + be(4, 2) + b"\xab\xcd"
        + b"\xff\xc0" + be(17, 2) + b"\x08" + be(123, 2) + be(456, 2)
        + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        + b"\xff\xd9"
    )
    assert _parse_image_dims(jpeg) == ("jpeg", 456, 123)
    # SOF2 (progressive) is also a frame header; C4 (DHT) must be skipped
    jpeg2 = (
        b"\xff\xd8"
        + b"\xff\xc4" + be(4, 2) + b"\x00\x00"  # DHT, not a frame header
        + b"\xff\xc2" + be(17, 2) + b"\x08" + be(7, 2) + be(9, 2) + b"\x03"
    )
    assert _parse_image_dims(jpeg2) == ("jpeg", 9, 7)
    # truncated after SOI: jpeg but unknown dims
    assert _parse_image_dims(b"\xff\xd8\xff\xe0") == ("jpeg", None, None)
    # PNG sig with no IHDR anywhere
    assert _parse_image_dims(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) == (
        "png", None, None,
    )
    # foreign magic
    assert _parse_image_dims(b"GIF89a\x01\x00") == ("unknown", None, None)
    assert _parse_image_dims(b"") == ("unknown", None, None)


def test_parse_wav_fmt_walks_real_chunks():
    """The RIFF parser does a genuine chunk walk, pinned on hand-built
    byte sequences: fmt found after a LIST chunk (and after an ODD-sized
    chunk, exercising the even-padding rule), truncated/foreign payloads
    degrade to None fields."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_wav_fmt,
    )

    def le(v, n):
        return int(v).to_bytes(n, "little")

    def fmt_chunk(rate, ch, bits):
        ba = ch * bits // 8
        return (
            b"fmt " + le(16, 4)
            + le(1, 2) + le(ch, 2) + le(rate, 4) + le(rate * ba, 4)
            + le(ba, 2) + le(bits, 2)
        )

    def riff(*chunks):
        body = b"WAVE" + b"".join(chunks)
        return b"RIFF" + le(len(body), 4) + body

    # LIST chunk before fmt — a fixed-offset reader would misparse
    wav = riff(
        b"LIST" + le(10, 4) + b"INFOICMTXY",
        fmt_chunk(44100, 2, 16),
    )
    assert _parse_wav_fmt(wav) == ("wav", 44100, 2, 16)
    # odd-sized chunk before fmt: the walk must skip the pad byte
    wav_odd = riff(b"junk" + le(3, 4) + b"abc\x00", fmt_chunk(8000, 1, 8))
    assert _parse_wav_fmt(wav_odd) == ("wav", 8000, 1, 8)
    # RIFF/WAVE magic but no fmt chunk anywhere
    assert _parse_wav_fmt(riff(b"data" + le(4, 4) + b"\x00" * 4)) == (
        "wav", None, None, None,
    )
    # truncated mid-header and foreign magic
    assert _parse_wav_fmt(b"RIFF\x04\x00\x00\x00WAVE") == ("wav", None, None, None)
    assert _parse_wav_fmt(b"RIFX\x00\x00\x00\x00WAVE\x00\x00") == (
        "unknown", None, None, None,
    )
    assert _parse_wav_fmt(b"") == ("unknown", None, None, None)


def test_parse_wav_fmt_roundtrip_property():
    """Generative round-trip: arbitrary fmt values and arbitrary leading
    chunk clutter (including odd sizes) must never confuse the walk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_wav_fmt,
    )

    def le(v, n):
        return int(v).to_bytes(n, "little")

    @settings(max_examples=200, deadline=None)
    @given(
        rate=st.integers(1, 2**31 - 1),
        ch=st.integers(1, 64),
        bits=st.sampled_from([8, 16, 24, 32]),
        pre_chunks=st.lists(st.binary(min_size=0, max_size=33), max_size=4),
    )
    def check(rate, ch, bits, pre_chunks):
        wav = b"RIFF" + le(0, 4) + b"WAVE"  # size field unused by the walk
        for data in pre_chunks:
            wav += b"LIST" + le(len(data), 4) + data
            if len(data) % 2:
                wav += b"\x00"  # RIFF even-padding
        ba = ch * bits // 8
        wav += (
            b"fmt " + le(16, 4)
            + le(1, 2) + le(ch, 2) + le(rate, 4) + le((rate * ba) % 2**32, 4)
            + le(ba, 2) + le(bits, 2)
        )
        assert _parse_wav_fmt(wav) == ("wav", rate, ch, bits)

    check()


def test_synthesized_wav_payloads_parse_back(spark):
    """End-to-end twin of the audio_dims gate, without DuckDB: the
    JVM-synthesized RIFF bytes parse back to the id-derived fields, and
    the variable-length LIST chunk really varies the fmt offset."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        extract_audio_fmt,
        synthesize_wav_payloads,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(40)
    media = synthesize_wav_payloads(docs, "doc_id")
    raw = {r.media_id: bytes(r.payload) for r in media.collect()}
    offsets = set()
    for mid, b in raw.items():
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        offsets.add(b.index(b"fmt "))
    assert len(offsets) > 1, "LIST chunk must vary the fmt offset"
    got = {r.media_id: r for r in extract_audio_fmt(media).collect()}
    for mid, r in got.items():
        assert r.fmt == "wav"
        assert r.sample_rate == 8000 + (mid % 8) * 1000
        assert r.channels == 1 + mid % 2
        assert r.bits == 8 + (mid % 3) * 8


def test_parse_mp4_mvhd_walks_nested_boxes():
    """The ISO-BMFF parser does a genuine box walk, pinned on hand-built
    sequences: mvhd found only by recursing into moov past nested
    clutter, version-0 and version-1 headers both dispatched, truncated/
    foreign payloads degrade to None fields."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_mp4_mvhd,
    )

    def be(v, n):
        return int(v).to_bytes(n, "big")

    def box(typ, payload):
        return be(8 + len(payload), 4) + typ + payload

    ftyp = box(b"ftyp", b"isom" + be(0x200, 4))

    def mvhd_v0(ts, dur):
        return box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8 + be(ts, 4) + be(dur, 4) + b"\x00" * 80)

    def mvhd_v1(ts, dur):
        return box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16 + be(ts, 4) + be(dur, 8) + b"\x00" * 80)

    # clutter before moov AND inside moov before mvhd
    mp4 = ftyp + box(b"free", b"xy") + box(
        b"moov", box(b"skip", b"z") + mvhd_v0(600, 3000)
    )
    assert _parse_mp4_mvhd(mp4) == ("mp4", 600, 3000)
    # version-1: 64-bit duration beyond 2^32
    mp4v1 = ftyp + box(b"moov", mvhd_v1(90000, 2**33 + 7))
    assert _parse_mp4_mvhd(mp4v1) == ("mp4", 90000, 2**33 + 7)
    # mvhd at top level (degenerate but walkable)
    assert _parse_mp4_mvhd(ftyp + mvhd_v0(1, 2)) == ("mp4", 1, 2)
    # no mvhd anywhere
    assert _parse_mp4_mvhd(ftyp + box(b"moov", box(b"skip", b""))) == (
        "mp4", None, None,
    )
    # corrupt size < 8 stops the walk instead of looping forever
    assert _parse_mp4_mvhd(ftyp + be(3, 4) + b"bad\x00") == ("mp4", None, None)
    # truncated mvhd payload
    assert _parse_mp4_mvhd(ftyp + box(b"moov", be(108, 4) + b"mvhd\x00")) == (
        "mp4", None, None,
    )
    # foreign magic
    assert _parse_mp4_mvhd(b"RIFF\x00\x00\x00\x00WAVE") == ("unknown", None, None)
    assert _parse_mp4_mvhd(b"") == ("unknown", None, None)


def test_parse_mp4_mvhd_roundtrip_property():
    """Generative round-trip: arbitrary timescale/duration, either mvhd
    version, and arbitrary box clutter before and inside moov must never
    confuse the walk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_mp4_mvhd,
    )

    def be(v, n):
        return int(v).to_bytes(n, "big")

    def box(typ, payload):
        return be(8 + len(payload), 4) + typ + payload

    @settings(max_examples=200, deadline=None)
    @given(
        ts=st.integers(1, 2**32 - 1),
        dur=st.integers(0, 2**40),
        v1=st.booleans(),
        pre=st.lists(st.binary(min_size=0, max_size=24), max_size=3),
        inner=st.lists(st.binary(min_size=0, max_size=24), max_size=3),
    )
    def check(ts, dur, v1, pre, inner):
        if not v1:
            dur %= 2**32
            mvhd = box(b"mvhd", b"\x00" * 4 + b"\x00" * 8 + be(ts, 4) + be(dur, 4) + b"\x00" * 80)
        else:
            mvhd = box(b"mvhd", b"\x01" + b"\x00" * 3 + b"\x00" * 16 + be(ts, 4) + be(dur, 8) + b"\x00" * 80)
        mp4 = box(b"ftyp", b"isom" + be(0x200, 4))
        for data in pre:
            mp4 += box(b"free", data)
        mp4 += box(b"moov", b"".join(box(b"skip", d) for d in inner) + mvhd)
        assert _parse_mp4_mvhd(mp4) == ("mp4", ts, dur)

    check()


def test_synthesized_mp4_payloads_parse_back(spark):
    """End-to-end twin of the video_dims gate, without DuckDB: the
    JVM-synthesized ISO-BMFF bytes parse back to the id-derived fields,
    and the variable free/skip boxes really vary the mvhd offset."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        extract_video_meta,
        synthesize_mp4_payloads,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(40)
    media = synthesize_mp4_payloads(docs, "doc_id")
    raw = {r.media_id: bytes(r.payload) for r in media.collect()}
    offsets = set()
    for mid, b in raw.items():
        assert b[4:8] == b"ftyp"
        offsets.add(b.index(b"mvhd"))
    assert len(offsets) > 1, "free/skip boxes must vary the mvhd offset"
    got = {r.media_id: r for r in extract_video_meta(media).collect()}
    for mid, r in got.items():
        ts = 600 + (mid % 5) * 300
        assert r.fmt == "mp4"
        assert r.timescale == ts
        assert r.duration == ts * (1 + mid % 10)


def test_parse_image_dims_roundtrip_property():
    """Generative round-trip: arbitrary dimensions and arbitrary
    leading chunk/segment clutter must never confuse the walk — the
    parser's only contract is the spec'd layout, not our fixture's."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_image_dims,
    )

    def be(v, n):
        return int(v).to_bytes(n, "big")

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(1, 65535),
        h=st.integers(1, 65535),
        pre_chunks=st.lists(st.binary(min_size=0, max_size=32), max_size=3),
        com=st.binary(min_size=0, max_size=32),
    )
    def check(w, h, pre_chunks, com):
        # PNG: arbitrary private chunks (4-byte type 'prIV') before IHDR
        png = b"\x89PNG\r\n\x1a\n"
        for data in pre_chunks:
            png += be(len(data), 4) + b"prIV" + data + b"\x00" * 4
        png += be(13, 4) + b"IHDR" + be(w, 4) + be(h, 4) + b"\x08\x06\x00\x00\x00"
        assert _parse_image_dims(png) == ("png", w, h)
        # JPEG: APP1 + COM segments of arbitrary length before SOF0
        jpeg = b"\xff\xd8"
        for data in (*pre_chunks, com):
            jpeg += b"\xff\xe1" + be(len(data) + 2, 2) + data
        jpeg += b"\xff\xc0" + be(17, 2) + b"\x08" + be(h, 2) + be(w, 2) + b"\x03"
        assert _parse_image_dims(jpeg) == ("jpeg", w, h)

    check()


def test_pcm_levels_parser_decodes_hand_built_wav():
    """Hand-assembled 16-bit stereo WAV with known samples — checks the
    two's-complement sign handling, de-interleave, and per-channel
    stats byte-for-byte, independent of the synthesizer."""
    import struct

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_wav_pcm_levels,
    )

    # frames: (L, R) = (100, -200), (-32768, 32767), (0, 5)
    samples = [100, -200, -32768, 32767, 0, 5]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out = _parse_wav_pcm_levels(wav)
    assert out == [
        (0, 3, 100 - 32768 + 0, 32768),
        (1, 3, -200 + 32767 + 5, 32767),
    ]


def test_pcm_levels_parser_rejects_foreign_and_unsupported():
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_wav_pcm_levels,
    )

    assert _parse_wav_pcm_levels(b"\x89PNG\r\n\x1a\nrest") == []
    assert _parse_wav_pcm_levels(b"RIFF\x00\x00\x00\x00AVI ") == []
    assert _parse_wav_pcm_levels(b"") == []
    # 8-bit unsigned bias: bytes 128, 0, 255 → amplitudes 0, -128, 127
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([128, 0, 255])
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert _parse_wav_pcm_levels(wav) == [(0, 3, 0 - 128 + 127, 128)]


def test_pcm_synthesizer_matches_pure_python_reference(spark):
    """The synthesized payload, decoded by an INDEPENDENT pure-Python
    walk (struct/int.from_bytes, no numpy), must reproduce the
    closed-form sample arithmetic — pinning the synthesizer and the
    Spark-side parser to the same contract the DuckDB oracle replays."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        synthesize_pcm_wav_payloads,
    )

    df = spark.range(0, 24).withColumnRenamed("id", "media_id")
    rows = synthesize_pcm_wav_payloads(df, "media_id").collect()
    for r in rows:
        mid, b = r["media_id"], bytes(r["payload"])
        c = 1 + mid % 2
        bits = 8 + 8 * ((mid // 2) % 2)
        nf = 3 + mid % 3
        # independent walk: find the data chunk
        pos = 12
        data = None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            clen = int.from_bytes(b[pos + 4 : pos + 8], "little")
            if cid == b"data":
                data = b[pos + 8 : pos + 8 + clen]
            pos += 8 + clen + (clen & 1)
        assert data is not None and len(data) == nf * c * bits // 8
        for f in range(nf):
            for ch in range(c):
                i = f * c + ch
                if bits == 8:
                    got = data[i] - 128
                    want = (mid * 31 + f * 17 + ch * 7) % 256 - 128
                else:
                    got = int.from_bytes(
                        data[2 * i : 2 * i + 2], "little", signed=True
                    )
                    u = (mid * 131 + f * 1031 + ch * 211) % 65536
                    want = u - 65536 if u >= 32768 else u
                assert got == want, (mid, f, ch)


def test_bmp_parser_honors_offset_flip_and_stride():
    """Hand-assembled 3x2 24-bit BMP with 2 gap bytes before the pixel
    array, bottom-up rows, and 3-byte row padding — all three honesty
    traps at once, verified against hand-computed per-channel stats."""
    import struct

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_bmp_pixel_stats,
    )

    w, h, gap = 3, 2, 2
    stride = (w * 3 + 3) // 4 * 4  # 12
    # visual pixels[y][x] = (B, G, R)
    visual = [
        [(10, 20, 30), (11, 21, 31), (12, 22, 32)],   # top row
        [(110, 120, 130), (111, 121, 131), (112, 122, 132)],
    ]
    rows = b""
    for y in reversed(range(h)):  # stored bottom-up
        r = b"".join(bytes(p) for p in visual[y])
        rows += r + b"\x00" * (stride - len(r))
    offset = 54 + gap
    header = b"BM" + struct.pack("<IHHI", offset + len(rows), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    bmp = header + info + b"\xee" * gap + rows
    out = {ch: rest for ch, *rest in _parse_bmp_pixel_stats(bmp)}
    # channel 0 = B: all values, max, and the VISUAL top row 10+11+12
    assert out[0] == [6, 10 + 11 + 12 + 110 + 111 + 112, 112, 33]
    assert out[1] == [6, 20 + 21 + 22 + 120 + 121 + 122, 122, 63]
    assert out[2] == [6, 30 + 31 + 32 + 130 + 131 + 132, 132, 93]


def test_bmp_parser_rejects_foreign_and_unsupported():
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_bmp_pixel_stats,
    )

    assert _parse_bmp_pixel_stats(b"") == []
    assert _parse_bmp_pixel_stats(b"PNG not bmp" + b"\x00" * 60) == []
    # 8-bpp (palette) honestly unsupported, not silently misread
    import struct

    header = b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 16, 0, 0, 0, 0)
    assert _parse_bmp_pixel_stats(header + info + b"\x00" * 46) == []


def test_bmp_synthesizer_round_trips_through_independent_decoder(spark):
    """Synthesized payloads decoded by an independent pure-Python walk
    must reproduce the closed-form channel arithmetic for every (x, y)
    — pinning synthesizer and parser to the oracle's contract."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        synthesize_bmp_payloads,
    )

    df = spark.range(0, 24).withColumnRenamed("id", "media_id")
    for r in synthesize_bmp_payloads(df, "media_id").collect():
        mid, b = r["media_id"], bytes(r["payload"])
        w, h = 2 + mid % 3, 1 + mid % 2
        offset = int.from_bytes(b[10:14], "little")
        assert offset == 54 + mid % 4
        stride = (w * 3 + 3) // 4 * 4
        assert len(b) == offset + stride * h
        for y in range(h):  # visual row y is stored at (h-1-y)
            base = offset + (h - 1 - y) * stride
            for x in range(w):
                bgr = b[base + 3 * x : base + 3 * x + 3]
                assert bgr[0] == (mid * 7 + x * 13 + y * 29) % 256
                assert bgr[1] == (mid * 11 + x * 17 + y * 31) % 256
                assert bgr[2] == (mid * 13 + x * 19 + y * 37) % 256


def test_all_binary_parsers_reject_garbage_without_crashing():
    """Fuzz: every header/content parser must return its reject value on
    arbitrary and prefix-corrupted bytes, never raise — media columns at
    100 TB WILL contain truncated and corrupt payloads. Deterministic
    seed so the corpus is reproducible."""
    import random

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_bmp_pixel_stats,
        _parse_gif_pixel_stats,
        _parse_image_dims,
        _parse_png_pixel_stats,
        _parse_tiff_pixel_stats,
        _parse_mp4_mvhd,
        _parse_wav_fmt,
        _parse_wav_g711_levels,
        _parse_wav_pcm_levels,
    )

    rng = random.Random(7)
    prefixes = (
        b"", b"RIFF", b"RIFF\x10\x00\x00\x00WAVE", b"BM",
        b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"\x00\x00\x00\x10ftyp",
        b"GIF89a", b"GIF87a", b"II*\x00", b"MM\x00*",
    )
    for _ in range(500):
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        for pre in prefixes:
            b = pre + body
            _parse_wav_pcm_levels(b)
            _parse_wav_g711_levels(b)
            _parse_bmp_pixel_stats(b)
            _parse_gif_pixel_stats(b)
            _parse_png_pixel_stats(b)
            _parse_tiff_pixel_stats(b)
            _parse_image_dims(b)
            _parse_wav_fmt(b)
            _parse_mp4_mvhd(b)


# ---------------------------------------------------------------------------
# GIF: real LZW pixel decode
# ---------------------------------------------------------------------------

#: the canonical public 1x1 black-pixel GIF89a (the web's placeholder
#: image) — an EXTERNAL fixture produced by neither our encoder nor our
#: tests, so the decoder's validity doesn't rest on encode/decode bugs
#: canceling out.
_TINY_GIF_B64 = "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"


def test_gif_decodes_external_reference_fixture():
    import base64

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_gif_pixel_stats,
    )

    stats = _parse_gif_pixel_stats(base64.b64decode(_TINY_GIF_B64))
    # 1 black pixel: every channel sums to 0, with the GCE extension
    # block and the omitted end-of-information code both handled.
    assert stats == [(0, 1, 0, 0, 0), (1, 1, 0, 0, 0), (2, 1, 0, 0, 0)]


def test_lzw_roundtrip_growth_reset_and_kwkwk():
    import random

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    random.seed(11)
    cases = [
        [0] * 500,                    # run → KwKwK codes
        [0, 1] * 400,
        [random.randrange(8) for _ in range(5000)],   # width growth
        [random.randrange(8) for _ in range(200000)],  # forces a reset
        [5],
        [],
    ]
    for mcs, ix in [(3, c) for c in cases] + [
        (2, [random.randrange(4) for _ in range(3000)]),
        (8, [random.randrange(256) for _ in range(3000)]),
    ]:
        assert _lzw_decode(_lzw_encode(ix, mcs), mcs) == ix


def test_gif_synthesize_decode_matches_closed_form(spark):
    """The Spark path end-to-end: synthesized LZW-compressed GIFs
    decode back to EXACTLY the closed-form pixel statistics implied by
    the synthesis formula — through real compression on the wire."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        extract_gif_pixels,
        synthesize_gif_payloads,
    )

    ids = list(range(40))
    df = spark.createDataFrame([(i,) for i in ids], ["media_id"])
    got = {
        (r.media_id, r.channel): (r.n_pixels, r.sum_val, r.max_val,
                                  r.top_row_sum)
        for r in extract_gif_pixels(
            synthesize_gif_payloads(df, "media_id")
        ).collect()
    }
    palette = [(k * 30, 255 - k * 30, k * 15 + 7) for k in range(8)]
    for mid in ids:
        w, h = 3 + mid % 5, 2 + mid % 3
        idx = [(x + 2 * y + mid) % 8 for y in range(h) for x in range(w)]
        for ch in range(3):
            vals = [palette[i][ch] for i in idx]
            assert got[(mid, ch)] == (
                w * h, sum(vals), max(vals), sum(vals[:w])
            )


def test_gif_parser_rejects_damage_without_crashing():
    import base64
    import random

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_gif_pixel_stats,
    )

    good = base64.b64decode(_TINY_GIF_B64)
    random.seed(3)
    assert _parse_gif_pixel_stats(b"") == []
    assert _parse_gif_pixel_stats(b"GIF89a") == []
    assert _parse_gif_pixel_stats(b"NOTGIF" + good[6:]) == []
    assert _parse_gif_pixel_stats(good[:20]) == []  # truncated mid-GCT
    assert _parse_gif_pixel_stats(good[:-3]) == []  # truncated LZW data
    for _ in range(50):
        junk = bytes(random.randrange(256) for _ in range(60))
        _parse_gif_pixel_stats(b"GIF89a" + junk)  # must not raise


# ---------------------------------------------------------------------------
# PNG: full pixel decode
# ---------------------------------------------------------------------------

#: widely-circulated 1x1 red-pixel PNG (RGBA, Sub-filtered scanline) —
#: an EXTERNAL fixture; the test below additionally cross-reads its
#: inflated scanline with stdlib only, so the expectation does not
#: depend on our filter code.
_RED_PNG_B64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def test_png_decodes_external_reference_fixture():
    import base64
    import zlib

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_png_pixel_stats,
    )

    b = base64.b64decode(_RED_PNG_B64)
    # independent stdlib-only read of the single scanline: filter must
    # be Sub(1) and the first pixel's filtered bytes ARE the values
    pos = 8
    raw = None
    while raw is None:
        ln = int.from_bytes(b[pos : pos + 4], "big")
        if b[pos + 4 : pos + 8] == b"IDAT":
            raw = zlib.decompress(b[pos + 8 : pos + 8 + ln])
        else:
            pos += 12 + ln
    assert raw[0] == 1 and (raw[1], raw[2], raw[3]) == (255, 0, 0)
    assert _parse_png_pixel_stats(b) == [
        (0, 1, 255, 255, 255),
        (1, 1, 0, 0, 0),
        (2, 1, 0, 0, 0),
    ]


def test_png_unfilter_hand_computed_vectors():
    """Each predictor pinned on hand-computed spec arithmetic (bpp=3,
    w=2, so the second pixel sees a = first pixel's byte)."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _png_unfilter,
    )

    # Sub: [10,20,30, +5,+6,+7] → second pixel = 15,26,37
    assert _png_unfilter(
        bytes([1, 10, 20, 30, 5, 6, 7]), 2, 1, 3
    ) == bytes([10, 20, 30, 15, 26, 37])
    # Up over a first None row: row2 = row1 + deltas
    assert _png_unfilter(
        bytes([0, 1, 2, 3, 4, 5, 6, 2, 10, 10, 10, 10, 10, 10]), 2, 2, 3
    ) == bytes([1, 2, 3, 4, 5, 6, 11, 12, 13, 14, 15, 16])
    # Average: pred = floor((a + b)/2). Row1 (None) = [8,0,0,6,0,0];
    # row2 filt = [1,0,0,1,0,0]: x0 pred = floor((0+8)/2) = 4 → 5;
    # x3 sees a = recon[0] = 5, b = 6 → pred = 5 → 6.
    assert _png_unfilter(
        bytes([0, 8, 0, 0, 6, 0, 0, 3, 1, 0, 0, 1, 0, 0]), 2, 2, 3
    ) == bytes([8, 0, 0, 6, 0, 0, 5, 0, 0, 6, 0, 0])
    # Paeth tie-break: a=3, b=3, c=0 → p=6, pa=pb=3, pc=6 → pick a
    assert _png_unfilter(
        bytes([0, 3, 0, 0, 3, 0, 0, 4, 0, 0, 0, 1, 0, 0]), 2, 2, 3
    ) == bytes([3, 0, 0, 3, 0, 0, 3, 0, 0, 4, 0, 0])
    # bad filter type rejects
    assert _png_unfilter(bytes([9, 0, 0, 0]), 1, 1, 3) is None


def test_png_synthesize_decode_matches_closed_form(spark):
    """Spark e2e: DEFLATE-compressed, all-five-filters synthesis
    decodes back to the exact closed-form statistics."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        extract_png_pixels,
        synthesize_png_payloads,
    )

    ids = list(range(30))
    df = spark.createDataFrame([(i,) for i in ids], ["media_id"])
    got = {
        (r.media_id, r.channel): (r.n_pixels, r.sum_val, r.max_val,
                                  r.top_row_sum)
        for r in extract_png_pixels(
            synthesize_png_payloads(df, "media_id")
        ).collect()
    }
    for mid in ids:
        w, h = 3 + mid % 4, 5 + mid % 5
        chans = [
            [(x * 7 + mid) % 256 for y in range(h) for x in range(w)],
            [(y * 11 + 2 * mid) % 256 for y in range(h) for x in range(w)],
            [(x + y + 3 * mid) % 256 for y in range(h) for x in range(w)],
        ]
        for ch, vals in enumerate(chans):
            assert got[(mid, ch)] == (
                w * h, sum(vals), max(vals), sum(vals[:w])
            )


def test_png_crc_validation_rejects_flipped_byte():
    """A single flipped pixel byte must fail the chunk CRC and reject
    the file — integrity is part of the decode, not an afterthought."""
    import base64

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_png_pixel_stats,
    )

    b = bytearray(base64.b64decode(_RED_PNG_B64))
    assert _parse_png_pixel_stats(bytes(b)) != []
    idat = bytes(b).index(b"IDAT")
    b[idat + 7] ^= 0xFF  # flip a byte inside the IDAT payload
    assert _parse_png_pixel_stats(bytes(b)) == []


def test_lzw_roundtrip_property():
    """Hypothesis: ANY index sequence round-trips through the GIF LZW
    encoder/decoder at any legal code size — including sequences that
    cross width boundaries and trigger KwKwK."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        mcs=st.integers(min_value=2, max_value=8),
        data=st.data(),
    )
    def run(mcs, data):
        ix = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=(1 << mcs) - 1),
                max_size=600,
            )
        )
        assert _lzw_decode(_lzw_encode(ix, mcs), mcs) == ix

    run()


# ---------------------------------------------------------------------------
# G.711 companded WAV
# ---------------------------------------------------------------------------


def test_g711_tables_match_stdlib_audioop():
    """Both expansion tables pinned byte-for-byte against stdlib
    audioop (an independent C implementation; deprecated in 3.13 but
    present here) — the decoder's validity doesn't rest on our own
    formula transcription."""
    import struct
    import warnings

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _g711_alaw_table,
        _g711_ulaw_table,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

        for table, ref in [
            (_g711_ulaw_table(), audioop.ulaw2lin),
            (_g711_alaw_table(), audioop.alaw2lin),
        ]:
            for b in range(256):
                want = struct.unpack("<h", ref(bytes([b]), 2))[0]
                assert table[b] == want, (b, table[b], want)


def test_g711_synthesize_decode_matches_closed_form(spark):
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _g711_alaw_table,
        _g711_ulaw_table,
        extract_g711_levels,
        synthesize_g711_wav_payloads,
    )

    ids = list(range(25))
    df = spark.createDataFrame([(i,) for i in ids], ["media_id"])
    for law, table in [("ulaw", _g711_ulaw_table()),
                       ("alaw", _g711_alaw_table())]:
        got = {
            (r.media_id, r.channel): (r.n_frames, r.sum_amp, r.peak_abs)
            for r in extract_g711_levels(
                synthesize_g711_wav_payloads(df, "media_id", law=law)
            ).collect()
        }
        for mid in ids:
            n = 64 + mid % 32
            for ch in range(2):
                amps = [
                    table[(i * 17 + ch * 29 + mid) % 256] for i in range(n)
                ]
                assert got[(mid, ch)] == (
                    n, sum(amps), max(abs(a) for a in amps)
                )


def test_g711_parser_requires_companded_format():
    """A PCM WAV (format tag 1) must NOT pass through the G.711 tables,
    and vice versa the PCM parser's output differs from G.711's on the
    same companded bytes — the format tag is load-bearing."""
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_wav_g711_levels,
    )

    # minimal PCM-tagged wav: tag 1 → reject
    hdr = (b"RIFF" + (40).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
           + b"data" + (4).to_bytes(4, "little") + bytes([1, 2, 3, 4]))
    assert _parse_wav_g711_levels(hdr) == []


# ---------------------------------------------------------------------------
# TIFF: uncompressed strip decode
# ---------------------------------------------------------------------------


def _hand_build_tiff(w, h, px, rows_strip1):
    """Independent little-endian TIFF builder for the tests (separate
    struct-packing from the operator's synthesizer)."""
    ifd_off, n_e = 8, 10
    bits_off = ifd_off + 2 + 12 * n_e + 4
    cut = rows_strip1 * w * 3
    s1, s2 = bytes(px[:cut]), bytes(px[cut:])
    s1_off = bits_off + 6
    s2_off = s1_off + len(s1)
    arr_off = s2_off + len(s2)

    def entry(tag, typ, cnt, val):
        e = tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
        e += cnt.to_bytes(4, "little")
        if typ == 3 and cnt == 1:
            e += val.to_bytes(2, "little") + b"\x00\x00"
        else:
            e += val.to_bytes(4, "little")
        return e

    ifd = (n_e).to_bytes(2, "little")
    ifd += entry(256, 3, 1, w) + entry(257, 3, 1, h)
    ifd += entry(258, 3, 3, bits_off) + entry(259, 3, 1, 1)
    ifd += entry(262, 3, 1, 2) + entry(273, 4, 2, arr_off)
    ifd += entry(277, 3, 1, 3) + entry(278, 3, 1, rows_strip1 or 1)
    ifd += entry(279, 4, 2, arr_off + 8) + entry(284, 3, 1, 1)
    ifd += (0).to_bytes(4, "little")
    return (
        b"II*\x00" + ifd_off.to_bytes(4, "little") + ifd
        + b"".join(v.to_bytes(2, "little") for v in (8, 8, 8))
        + s1 + s2
        + s1_off.to_bytes(4, "little") + s2_off.to_bytes(4, "little")
        + len(s1).to_bytes(4, "little") + len(s2).to_bytes(4, "little")
    )


def test_tiff_parser_on_hand_built_file():
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _parse_tiff_pixel_stats,
    )

    w, h = 3, 4
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([x * 5, y * 7, x + 2 * y])
    got = _parse_tiff_pixel_stats(_hand_build_tiff(w, h, px, h // 2))
    want = []
    for ch in range(3):
        vals = [px[(y * w + x) * 3 + ch] for y in range(h) for x in range(w)]
        want.append((ch, w * h, sum(vals), max(vals), sum(vals[:w])))
    assert got == want
    # big-endian and compressed files reject
    assert _parse_tiff_pixel_stats(b"MM\x00*" + bytes(60)) == []


def test_tiff_synthesize_decode_matches_closed_form(spark):
    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        extract_tiff_pixels,
        synthesize_tiff_payloads,
    )

    ids = list(range(25))
    df = spark.createDataFrame([(i,) for i in ids], ["media_id"])
    got = {
        (r.media_id, r.channel): (r.n_pixels, r.sum_val, r.max_val,
                                  r.top_row_sum)
        for r in extract_tiff_pixels(
            synthesize_tiff_payloads(df, "media_id")
        ).collect()
    }
    for mid in ids:
        w, h = 3 + mid % 4, 4 + mid % 3
        for ch in range(3):
            vals = [
                [(x * 5 + mid) % 256, (y * 7 + 2 * mid) % 256,
                 (x + 2 * y + 3 * mid) % 256][ch]
                for y in range(h)
                for x in range(w)
            ]
            assert got[(mid, ch)] == (
                w * h, sum(vals), max(vals), sum(vals[:w])
            )


def test_lossy_adapter_without_pillow_fails_loud(spark):
    """The decode_stub closure (r7 VERDICT #6): in a container without
    Pillow, the lossy-image path must raise the documented
    NotImplementedError on FIRST TOUCH — through the full Spark plumbing,
    not just the helper — never silently pretend to decode."""
    import pytest as _pytest

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _pillow,
        decode_lossy_image,
        extract_lossy_image_stats,
    )

    if _pillow() is not None:
        _pytest.skip("Pillow present — covered by the decode test below")
    with _pytest.raises(NotImplementedError):
        decode_lossy_image(b"\xff\xd8\xff\xe0 fake jpeg", "image/jpeg")
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0 fake jpeg"), "image/jpeg")],
        "media_id long, payload binary, mime string",
    )
    with _pytest.raises(Exception, match="lossy-codec decode requires"):
        extract_lossy_image_stats(df).collect()


def test_lossy_adapter_with_pillow_decodes():
    """Runs only where Pillow exists (env-dependent, recorded like the
    protobuf/avro skips): a synthetic JPEG round-trips through the
    adapter with plausible stats."""
    import pytest as _pytest

    from amsterdam_map_data_wrangling_spark.operators.multimodal import (
        _pillow,
        decode_lossy_image,
    )

    image_mod = _pillow()
    if image_mod is None:
        _pytest.skip("Pillow not in this container (recorded env skip)")
    import io

    im = image_mod.new("RGB", (8, 4), (200, 100, 50))
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=95)
    w, h, n, means = decode_lossy_image(buf.getvalue(), "image/jpeg")
    assert (w, h, n) == (8, 4, 32)
    assert abs(means[0] - 200) < 10 and abs(means[2] - 50) < 12
