"""The md5 cross-engine anchor: Spark's conv(substring(md5(x),1,k),16,10)
must equal DuckDB's ('0x' || substr(md5(x),1,k))::BIGINT for arbitrary
text — this identity underpins every portable-hash gate (rolling
fingerprint, MinHash/SimHash twins). Property-tested with Hypothesis over
unicode strings, then folded through the rolling-hash recurrence."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _spark_hash(spark, texts, k):
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    h = F.conv(F.substring(F.md5("t"), 1, k), 16, 10).cast("long")
    return [r.h for r in df.select(h.alias("h")).collect()]


def _duck_hash(texts, k):
    con = duckdb.connect()
    out = []
    for t in texts:
        out.append(
            con.execute(
                f"SELECT ('0x' || substr(md5(?), 1, {k}))::BIGINT", [t]
            ).fetchone()[0]
        )
    con.close()
    return out


# moderate example count: every example costs a (tiny) Spark job
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_md5_long_anchor_matches_duckdb(spark, texts):
    for k in (8, 15):
        assert _spark_hash(spark, texts, k) == _duck_hash(texts, k)


def test_quantization_identical_numpy_spark_duckdb(spark):
    """The IVF oracle's exactness rests on floor(x*1000 + 0.5) → int64
    producing bit-identical integers in numpy (_np_quant), Spark SQL, and
    DuckDB — including adversarial halfway and negative cases where a
    round-half-even implementation would diverge."""
    import duckdb
    import numpy as np

    from amsterdam_map_data_wrangling_spark.operators.similarity import _np_quant

    xs = [0.0005, -0.0005, 0.0015, -0.0015, 0.5, -0.5, 0.0004999999999,
          0.9999995, -0.9999995, 1.0, -1.0, 0.123456789, -0.987654321,
          3.0000005, -3.0000005, 1e-12, -1e-12]
    want = _np_quant(np.array(xs, dtype=np.float64)).tolist()

    got_spark = [
        r["q"]
        for r in spark.createDataFrame([(x,) for x in xs], "x double")
        .selectExpr("CAST(floor(x * 1000 + 0.5) AS BIGINT) AS q")
        .collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT CAST(floor(? * 1000 + 0.5) AS BIGINT)", [x]
        ).fetchone()[0]
        for x in xs
    ]
    assert got_duck == want
