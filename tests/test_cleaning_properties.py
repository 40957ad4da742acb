"""Property-based tests (Hypothesis) for the cleaning rules: the Spark
Column expressions must agree with a direct Python transcription of the
reference semantics (amsterdam_map_data_wrangling.py:117-146) on arbitrary
inputs — every digit length 0..16, arbitrary separators, padding."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amsterdam_map_data_wrangling_spark.functions.cleaning import (
    normalize_phone,
    normalize_postcode,
    split_tag_key,
)


def ref_phone(v: str) -> str:
    d = "".join(re.findall(r"[0-9]*", v))
    n = len(d)
    if n in (11, 9):
        return "+" + d
    if n == 12:
        return "+" + d[:2] + d[3:]
    if n in (10, 8):
        return "+31" + d[1:]
    if n == 13:
        return "+" + d[2:]
    if n == 7:
        return "+31" + d
    return d


def ref_postcode(v: str) -> str:
    return v.lstrip()[0:4] + " " + v.rstrip()[-2:]


LOWER_COLON = re.compile(r"^([a-z]|_)+:([a-z]|_)+")


def ref_split(k: str) -> tuple[str, str]:
    if LOWER_COLON.search(k):
        i = k.find(":")
        return k[:i], k[i + 1 :]
    return "regular", k


def _spark_eval(spark, col_fn, values: list[str]) -> list:
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r.out for r in df.select(col_fn(F.col("v")).alias("out")).collect()]


phone_strings = st.text(
    alphabet="0123456789+-() .ab", min_size=0, max_size=20
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(phone_strings, min_size=1, max_size=30))
def test_phone_matches_reference_semantics(spark, values):
    got = _spark_eval(spark, normalize_phone, values)
    want = [ref_phone(v) for v in values]
    assert got == want


postcode_strings = st.text(
    alphabet="0123456789ABCDEFGHJKLZ ", min_size=4, max_size=12
).filter(lambda s: s.strip() != "")


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(postcode_strings, min_size=1, max_size=30))
def test_postcode_matches_reference_semantics(spark, values):
    got = _spark_eval(spark, normalize_postcode, values)
    want = [ref_postcode(v) for v in values]
    assert got == want


key_strings = st.text(
    alphabet="abcxyz_:ABC0 .", min_size=1, max_size=15
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(key_strings, min_size=1, max_size=30))
def test_key_split_matches_reference_semantics(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    t, k = split_tag_key(F.col("v"))
    got = [(r.t, r.k) for r in df.select(t.alias("t"), k.alias("k")).collect()]
    want = [ref_split(v) for v in values]
    assert got == want


def test_every_phone_branch_is_reachable(spark):
    """Digit lengths 0..16 all flow through and hit their documented case."""
    values = ["9" * n for n in range(17)]
    got = _spark_eval(spark, normalize_phone, values)
    want = [ref_phone(v) for v in values]
    assert got == want
    # spot-check the documented before/after vectors (Readme.md:75-82)
    vecs = {
        "+31 20 625 5537": "+31206255537",
        "020-6255975": "+31206255975",
        "0031 20 6255975": "+31206255975",
    }
    got = _spark_eval(spark, normalize_phone, list(vecs))
    assert got == list(vecs.values())
