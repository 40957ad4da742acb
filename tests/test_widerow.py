"""Wide-row segmentation operators (operators/widerow.py) — value
identity with the registered single-row kernels, on fixtures that
actually exercise the long path (the gate SFs never do)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.functions.text import (
    rolling_fingerprint,
)
from amsterdam_map_data_wrangling_spark.operators.widerow import (
    segmented_rolling_fingerprint,
    token_segments,
)


def _word_stream(seed: int, n_words: int) -> str:
    return " ".join(
        f"w{(i * 2654435761 + seed * 97) % 4096:04d}" for i in range(n_words)
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, _word_stream(1, 5)),              # short path
        (2, _word_stream(2, 40)),             # short path
        (3, ""),                              # empty text (short path)
        # long path, token count NOT a multiple of seg_tokens
        (4, _word_stream(4, 2_500)),
        # long path, token count EXACT multiple of seg_tokens
        (5, _word_stream(5, 3_000)),
        # long path, single-chunk boundary +1
        (6, _word_stream(6, 1_001)),
        # one giant single token (the unreduced-seed edge case: the raw
        # 32-bit token hash can exceed the modulus)
        (7, "x" * 9_000),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_segments_concat_exactly(spark, corpus):
    segs = token_segments(corpus, "doc_id", "text", 1_000)
    got = {
        r.doc_id: r.toks
        for r in segs.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("_seg", "_toks"))
                ).getField("_toks")
            ).alias("toks")
        )
        .collect()
    }
    want = {
        r.doc_id: r.toks
        for r in corpus.select(
            "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
        ).collect()
    }
    assert got == want


def test_segmented_fingerprint_identical_to_registered_fold(spark, corpus):
    """wide_chars forced low so docs 4-7 take the segmented path with
    multiple segments; values must equal the registered single-row fold
    on every doc, including the boundary and single-token edges."""
    got = {
        r.id: r.rfp
        for r in segmented_rolling_fingerprint(
            corpus, "doc_id", "text", seg_tokens=1_000, wide_chars=5_000
        ).collect()
    }
    want = {
        r.doc_id: r.rfp
        for r in corpus.select(
            "doc_id", rolling_fingerprint(F.col("text")).alias("rfp")
        ).collect()
    }
    assert got == want
    assert len(got) == 7
    # the fixture must actually exercise the long path with >1 segment
    n_long_segs = token_segments(
        corpus.filter(F.length("text") > 5_000), "doc_id", "text", 1_000
    ).count()
    assert n_long_segs >= 6  # docs 4 (3 segs), 5 (3), 6 (2), 7 (1)
    # and the single-giant-token doc's hash genuinely exceeds the
    # modulus (otherwise the unreduced-seed edge is not tested)
    h7 = corpus.filter("doc_id = 7").select(
        F.conv(F.substring(F.md5(F.trim("text")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    ).first()
    if h7.h > 2_147_483_647:
        assert got[7] > 2_147_483_647


def test_registered_gate_plan_matches_oracle_and_handles_wide(spark, tmp_path):
    """The flipped doc_rolling_fingerprint plan must stay hash-green
    against the UNCHANGED oracle on a corpus that includes a wide doc
    (the gate SFs never exercise the long branch; this pins it against
    DuckDB's list_reduce directly)."""
    import duckdb

    from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES

    rows = [(i, _word_stream(i, 30), "en", "s", 0) for i in range(20)]
    rows.append((99, _word_stream(99, 30_000), "en", "wide", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = tmp_path / "widegate"
    df.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    q = QUERIES["doc_rolling_fingerprint"]
    got = sorted(
        (r.doc_id, r.rfp) for r in q.build(spark, str(sf)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(q.oracle).fetchall())
    assert got == want and len(got) == 21


def _pii_text(seed: int, n_blocks: int) -> str:
    """Word stream densely sprinkled with emails, URLs, and spaced phone
    numbers so segment boundaries land near and between matches."""
    parts = []
    for i in range(n_blocks):
        parts.append(_word_stream(seed * 1000 + i, 12))
        if i % 3 == 0:
            parts.append(f"u{i}@ex{seed}.com")
        if i % 3 == 1:
            parts.append(f"https://ex.org/{seed}/{i}")
        if i % 3 == 2:
            parts.append(f"+31 6 {1000 + i % 9000} {seed % 10:04d}")
    return " ".join(parts)


def test_segmented_pii_redaction_equals_whole_text(spark):
    """The segmented PII pipeline (segment_text_safe + per-segment
    redact/count + ordered reassembly) must reproduce the whole-text
    redaction BYTE-FOR-BYTE and count-for-count at a tiny seg_chars
    where matches are dense around every boundary — the unit-scale
    proof of the no-spanning argument the plan relies on."""
    from pyspark.sql import functions as F

    from amsterdam_map_data_wrangling_spark.operators.widerow import (
        segment_text_safe,
    )
    from amsterdam_map_data_wrangling_spark.plans.text import (
        PII_EMAIL,
        PII_PHONE,
        PII_URL,
    )

    rows = [(i, _pii_text(i, 40)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def redact(col):
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(col, PII_EMAIL, "<EMAIL>"), PII_URL, "<URL>"
            ),
            PII_PHONE,
            "<PHONE>",
        )

    whole = {
        r.doc_id: (r.red, r.ne, r.nu)
        for r in df.select(
            "doc_id",
            redact(F.col("text")).alias("red"),
            F.size(
                F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0))
            ).alias("ne"),
            F.size(
                F.regexp_extract_all("text", F.lit(PII_URL), F.lit(0))
            ).alias("nu"),
        ).collect()
    }
    segs = segment_text_safe(
        df, "doc_id", "text", seg_chars=300, probe_chars=100
    )
    got = {
        r.id: (r.red, r.ne, r.nu, r.nseg)
        for r in segs.select(
            "id",
            "_seg",
            "n_segs",
            redact(F.col("_text")).alias("_r"),
            F.size(
                F.regexp_extract_all("_text", F.lit(PII_EMAIL), F.lit(0))
            ).alias("_ne"),
            F.size(
                F.regexp_extract_all("_text", F.lit(PII_URL), F.lit(0))
            ).alias("_nu"),
        )
        .groupBy("id")
        .agg(
            F.concat_ws(
                "",
                F.array_sort(F.collect_list(F.struct("_seg", "_r"))).getField(
                    "_r"
                ),
            ).alias("red"),
            F.sum("_ne").alias("ne"),
            F.sum("_nu").alias("nu"),
            F.max("n_segs").alias("nseg"),
        )
        .collect()
    }
    assert set(got) == set(whole)
    for d in whole:
        assert got[d][:3] == whole[d], f"doc {d} diverged"
    assert max(g[3] for g in got.values()) >= 5, "fixture under-segmented"


def test_pii_gate_plan_oracle_on_wide_corpus(spark, tmp_path):
    """The flipped pii_redaction_stats must stay hash-green against the
    UNCHANGED oracle on a corpus with a >65k-char document (the
    segmented path), including the md5 content witness over the
    reassembled redacted text."""
    import duckdb

    from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES

    rows = [(i, _pii_text(i, 20), "en", "s", 0) for i in range(12)]
    widetext = _pii_text(99, 6000)  # ~150k chars, > the 65k threshold
    rows.append((99, widetext, "en", "wide", len(widetext)))
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = tmp_path / "piiwide"
    df.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    q = QUERIES["pii_redaction_stats"]
    got = sorted(tuple(r) for r in q.build(spark, str(sf)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(q.oracle).fetchall())
    assert got == want and len(got) == 2


def test_unigram_wide_path_matches_registered_and_oracle(spark, tmp_path):
    """The wide-row unigram path (token-segmented hashing) must produce
    the same rounded contract values as the registered single-row plan
    AND stay hash-green against the unchanged oracle on a corpus with a
    >65k-char document. Token multisets are identical by construction;
    this pins the 6-decimal rounding across the partial-sum
    re-association on a real fixture."""
    import duckdb

    from amsterdam_map_data_wrangling_spark.operators.features import (
        unigram_logprob_scores,
    )
    from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES

    rows = [(i, _word_stream(i, 60), "en", "s", 0) for i in range(15)]
    widetext = _word_stream(77, 25_000)  # ~170k chars
    rows.append((77, widetext, "en", "wide", len(widetext)))
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    reg = {
        (r.id, r.n_tokens): round(r.mean_logprob, 6)
        for r in unigram_logprob_scores(df, "doc_id", "text").collect()
    }
    seg = {
        (r.id, r.n_tokens): round(r.mean_logprob, 6)
        for r in unigram_logprob_scores(
            df, "doc_id", "text", wide_chars=5_000
        ).collect()
    }
    assert seg == reg and len(seg) == 16

    sf = tmp_path / "unigramwide"
    df.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    q = QUERIES["unigram_lm_scores"]
    got = sorted(tuple(r) for r in q.build(spark, str(sf)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(q.oracle).fetchall())
    assert len(got) == len(want) == 16
    for g, w in zip(got, want):
        assert g[:2] == w[:2] and abs(g[2] - w[2]) < 1e-9, (g, w)


# ---------------------------------------------------------------------------
# bound_doc_width — the r16 ingest-width guardrail
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def guardrail_corpus(spark):
    rows = [
        (1, _word_stream(1, 10), "en", "a"),       # narrow: untouched
        (2, "", "en", "a"),                        # empty text
        (3, _word_stream(3, 4_000), "nl", "b"),    # wide: multi-part
        (4, _word_stream(4, 1_200), "en", "b"),    # wide: 2 parts
        (5, "y" * 30_000, "de", "c"),              # one giant token: loud
        (6, _word_stream(6, 900), "en", "c"),      # exactly at the cap edge
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_bound_doc_width_chunk_reassembles_exactly(spark, guardrail_corpus):
    from amsterdam_map_data_wrangling_spark.operators.widerow import (
        bound_doc_width,
    )

    cap = 6_000
    out = bound_doc_width(
        guardrail_corpus, "doc_id", "text", max_doc_chars=cap, mode="chunk"
    ).collect()
    src = {r.doc_id: r for r in guardrail_corpus.collect()}

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(src), "no document may vanish or appear"
    for did, parts in by_doc.items():
        parts.sort(key=lambda r: r.part_idx)
        # ordered parts reassemble byte-for-byte
        assert "".join(p.text for p in parts) == src[did].text
        assert [p.part_idx for p in parts] == list(range(len(parts)))
        assert all(p.n_parts == len(parts) for p in parts)
        # passenger columns ride along unchanged
        assert all(
            (p.lang, p.source) == (src[did].lang, src[did].source)
            for p in parts
        )
        for p in parts:
            if len(p.text) > cap:
                # only the no-token-boundary pathology may exceed the
                # cap, and it must be LOUD
                assert p.n_parts == 1 and p.oversize
            else:
                assert not p.oversize
    # the fixture exercises real splits and the loud path
    assert max(len(p) for p in by_doc.values()) >= 3
    assert any(r.oversize for r in out)
    # narrow docs are single-part
    assert len(by_doc[1]) == 1 and by_doc[1][0].part_idx == 0

    # token streams concatenate exactly (no token is ever cut)
    from amsterdam_map_data_wrangling_spark.functions.text import tokens as _tk

    tok_src = {
        r.doc_id: r.t
        for r in guardrail_corpus.select(
            "doc_id", _tk(F.col("text")).alias("t")
        ).collect()
    }
    for did, parts in by_doc.items():
        if src[did].text == "":
            continue  # tokens('') is [''] engine-side; nothing to split
        got: list[str] = []
        for p in parts:
            s = p.text.strip()
            got.extend(s.split()) if s else None
        assert got == tok_src[did], f"token stream changed for doc {did}"


def test_bound_doc_width_flag_mode_and_validation(spark, guardrail_corpus):
    from amsterdam_map_data_wrangling_spark.operators.widerow import (
        bound_doc_width,
    )

    flagged = bound_doc_width(
        guardrail_corpus, "doc_id", "text", max_doc_chars=6_000, mode="flag"
    )
    assert flagged.columns == [*guardrail_corpus.columns, "oversize"]
    got = {r.doc_id: r.oversize for r in flagged.collect()}
    assert got == {1: False, 2: False, 3: True, 4: True, 5: True, 6: False}
    assert flagged.count() == guardrail_corpus.count()

    with pytest.raises(ValueError, match="mode"):
        bound_doc_width(guardrail_corpus, mode="quarantine")


def test_bound_doc_width_null_text_never_vanishes(spark):
    """r16 ADVICE: length(NULL) is NULL, which matches neither <=cap nor
    >cap — an uncoalesced filter pair silently DROPPED null-text rows
    from chunk mode while flag mode kept them. Both modes must keep the
    row, agree on row count, and treat NULL as width 0 (narrow, not
    oversize)."""
    from amsterdam_map_data_wrangling_spark.operators.widerow import (
        bound_doc_width,
    )

    df = spark.createDataFrame(
        [(1, None, "en"), (2, "short", "en"), (3, "w " * 9_000, "nl")],
        "doc_id long, text string, lang string",
    )
    chunked = bound_doc_width(
        df, "doc_id", "text", max_doc_chars=6_000, mode="chunk"
    ).collect()
    flagged = bound_doc_width(
        df, "doc_id", "text", max_doc_chars=6_000, mode="flag"
    ).collect()

    assert {r.doc_id for r in chunked} == {1, 2, 3}
    assert {r.doc_id for r in flagged} == {1, 2, 3}
    null_parts = [r for r in chunked if r.doc_id == 1]
    assert len(null_parts) == 1
    p = null_parts[0]
    assert p.text is None and p.part_idx == 0 and p.n_parts == 1
    assert p.oversize is False  # False, not NULL — modes agree
    assert {r.doc_id: r.oversize for r in flagged} == {
        1: False,
        2: False,
        3: True,
    }


def test_bound_doc_width_gate_oracle_on_null_corpus(spark, tmp_path):
    """r17 review finding, closed: DuckDB's repeat(NULL || ' ', n) is
    NULL while Spark's array_join skips a NULL part — an uncoalesced
    gate would diverge (NULL/NULL/NULL vs 0/''-md5/false) on the first
    null-bearing corpus. Both engines now coalesce BEFORE widening;
    pin the gate hash-green on a corpus with NULL text (plus narrow
    and wide docs so all three branches run)."""
    import duckdb

    from amsterdam_map_data_wrangling_spark.plans.catalog import QUERIES

    rows = [
        (0, None, "en", "s", 0),
        (1, "tiny doc here", "en", "s", 13),
        (7, _word_stream(7, 400), "nl", "s", 0),  # widens past the cap
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = tmp_path / "nulldocs"
    df.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    q = QUERIES["bound_doc_width_roundtrip"]
    got = sorted(tuple(r) for r in q.build(spark, str(sf)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(q.oracle).fetchall())
    assert got == want and len(got) == 3
    by_id = {r[0]: r for r in got}
    # the null doc is a real 1-repeat ' ' document on both engines
    assert by_id[0][1] == 1 and by_id[0][4] == 0  # orig_len=1, no violations
