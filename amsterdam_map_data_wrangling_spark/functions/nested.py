"""Nested-schema utilities: recursive struct flattening for the
semi-structured tables a crawl/ETL pipeline produces (shredded JSON,
WARC metadata, API dumps). Pure schema-driven column algebra — the
plan stays a single Project (codegen), no UDFs, no data movement."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(
    df: DataFrame, sep: str = "_", explode_arrays: bool = False
) -> DataFrame:
    """Flatten every StructType column into top-level columns named
    ``parent<sep>child`` (recursively, stable field order). With
    ``explode_arrays``, arrays-of-structs are exploded OUTER first
    (one row per element, NULL row for empty/NULL arrays) and the
    result re-flattened — the 1NF shredder for nested JSON.

    Scale: struct flattening is a pure projection (zero shuffle, zero
    row change); array explosion is the standard generator — row counts
    multiply by array length, which is the caller's explicit choice via
    the flag. Name collisions after prefixing raise (silent override
    would corrupt downstream joins)."""
    while True:
        if explode_arrays:
            arr = next(
                (
                    f
                    for f in df.schema.fields
                    if isinstance(f.dataType, T.ArrayType)
                    and isinstance(f.dataType.elementType, T.StructType)
                ),
                None,
            )
            if arr is not None:
                others = [c for c in df.columns if c != arr.name]
                df = df.select(
                    *others,
                    F.explode_outer(F.col(arr.name)).alias(arr.name),
                )
                continue
        struct = next(
            (
                f
                for f in df.schema.fields
                if isinstance(f.dataType, T.StructType)
            ),
            None,
        )
        if struct is None:
            return df
        new_cols = []
        for f in df.schema.fields:
            if f.name != struct.name:
                new_cols.append(F.col(f"`{f.name}`"))
                continue
            for sub in f.dataType.fields:
                flat = f"{f.name}{sep}{sub.name}"
                new_cols.append(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(flat)
                )
        flat_names = []
        for f in df.schema.fields:
            if f.name == struct.name:
                flat_names.extend(
                    f"{f.name}{sep}{sub.name}" for sub in f.dataType.fields
                )
            else:
                flat_names.append(f.name)
        dupes = {n for n in flat_names if flat_names.count(n) > 1}
        if dupes:
            raise ValueError(
                f"flattening would collide on columns {sorted(dupes)}; "
                f"pick a different sep or rename first"
            )
        df = df.select(*new_cols)
