"""Privacy / data-governance audits: k-anonymity and l-diversity over a
quasi-identifier projection — the release gate that runs BEFORE a
dataset leaves the pipeline (the reference's domain, OSM contributor
data, is exactly the kind of corpus these audits exist for; the PII
regex family in ``functions/text.py`` finds direct identifiers, this
module measures re-identification risk of the indirect ones).

Pure DataFrame aggregations: one shuffle on the quasi-identifier tuple,
then bounded rollups — no row-Python, no collect. At 100 TB the
equivalence-class relation is the (bounded, skew-prone) derived set;
a heavy-hitter class is GOOD here (large classes are anonymous), so no
salting is needed — the risky rows are the small classes by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row k-anonymity audit of ``quasi_cols``: the equivalence
    class (rows sharing the full quasi-identifier tuple) is the unit of
    re-identification risk. Returns n_rows, n_classes, the smallest
    class (``min_class_size`` — the dataset's actual k), how many
    CLASSES fall below ``k``, and how many ROWS those classes expose.

    NULL quasi-identifier values group as their own class (Spark
    groupBy null-safe semantics), matching the conservative reading
    that NULL is itself an identifying value."""
    classes = df.groupBy(*quasi_cols).agg(F.count("*").alias("sz"))
    return classes.agg(
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("sz").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("sz") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_below_k"),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_below_k"),
    ).select(
        F.lit(k).cast("bigint").alias("k"),
        "n_rows",
        "n_classes",
        "min_class_size",
        "classes_below_k",
        "rows_below_k",
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity audit: a k-anonymous class is still unsafe
    if every member shares the same sensitive value (homogeneity
    attack). Counts, per the same equivalence classes, the DISTINCT
    sensitive values; reports classes (and their rows) with diversity
    below ``l``."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count("*").alias("sz"),
        F.countDistinct(sensitive_col).alias("ndv"),
    )
    return classes.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("ndv").cast("bigint").alias("min_diversity"),
        F.sum(F.when(F.col("ndv") < l, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_below_l"),
        F.sum(F.when(F.col("ndv") < l, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_below_l"),
    ).select(
        F.lit(l).cast("bigint").alias("l"),
        "n_classes",
        "min_diversity",
        "classes_below_l",
        "rows_below_l",
    )
