"""k-anonymity / l-diversity audits on a hand-computable fixture."""

from __future__ import annotations

from amsterdam_map_data_wrangling_spark.operators.privacy import (
    k_anonymity_report,
    l_diversity_report,
)


def _fixture(spark):
    # quasi-identifier (zip, age_band); sensitive diagnosis.
    rows = [
        ("1011", "30-39", "flu"),
        ("1011", "30-39", "flu"),
        ("1011", "30-39", "cold"),     # class A: size 3, ndv 2
        ("1012", "40-49", "flu"),
        ("1012", "40-49", "flu"),      # class B: size 2, ndv 1 (homogeneous)
        ("1013", "50-59", "injury"),   # class C: size 1, ndv 1 (unique!)
        (None, "30-39", "flu"),        # class D: NULL zip is its own class
    ]
    return spark.createDataFrame(rows, ["zip", "age_band", "diagnosis"])


def test_k_anonymity_counts_small_classes(spark):
    row = k_anonymity_report(
        _fixture(spark), ["zip", "age_band"], k=3
    ).collect()[0]
    assert row.k == 3
    assert row.n_rows == 7
    assert row.n_classes == 4
    assert row.min_class_size == 1
    # classes below 3: B (2), C (1), D (1) → 3 classes, 4 exposed rows
    assert row.classes_below_k == 3
    assert row.rows_below_k == 4


def test_l_diversity_flags_homogeneous_classes(spark):
    row = l_diversity_report(
        _fixture(spark), ["zip", "age_band"], "diagnosis", l=2
    ).collect()[0]
    assert row.l == 2
    assert row.n_classes == 4
    assert row.min_diversity == 1
    # below l=2: B, C, D (each a single diagnosis) → 3 classes, 4 rows
    assert row.classes_below_l == 3
    assert row.rows_below_l == 4
