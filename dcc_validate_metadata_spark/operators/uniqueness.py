"""Salted two-phase uniqueness check.

Reference analogue: distinct-set accumulation in a driver-side ``set()``
(``validation/RelationshipsIssues.py:13-24`` — SURVEY.md A6). At 10^12 rows
a single ``groupBy(key)`` on a skewed key melts one reducer, so the count
is two-phase: partial count per (key, salt) — salt derived from the
physical partition, so hot keys split across reducers — then a final
re-aggregation over the (tiny) partial-count table. Duplicate keys are then
joined back onto the fact table to emit per-row violation rows. The join
strategy is deliberately left to AQE: "duplicates are rare" holds for
clean submissions, but a dedup-heavy training corpus can have 10-50% of
keys duplicated, and a forced broadcast of that table OOMs at 10^12 rows.
AQE broadcasts when the measured dup-table size is under the threshold and
shuffles otherwise — correct on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """(key, n) for every key value occurring more than once. Nulls are
    ignored (presence is the mandatory rule's job)."""
    partial = (
        df.filter(F.col(key).isNotNull())
        .groupBy(key, F.pmod(F.spark_partition_id(), F.lit(n_salts)).alias("_salt"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("_cnt").alias("n"))
        .filter(F.col("n") > 1)
    )


def uniqueness_violations(
    df: DataFrame,
    fields: list[str],
    keep_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Long-form violation rows for all duplicated values of each field:
    (keep_cols…, field, severity, message)."""
    keep = list(keep_cols)
    outs = []
    for fld in fields:
        dups = duplicate_keys(df, fld, n_salts=n_salts)
        v = (
            df.join(dups, on=fld, how="inner")
            .select(
                *keep,
                F.lit(fld).alias("field"),
                F.lit("error").alias("severity"),
                F.concat(
                    F.lit(f"Field '{fld}' value '"),
                    F.col(fld).cast("string"),
                    F.lit("' occurs "),
                    F.col("n").cast("string"),
                    F.lit(" times but must be unique"),
                ).alias("message"),
            )
        )
        outs.append(v)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
