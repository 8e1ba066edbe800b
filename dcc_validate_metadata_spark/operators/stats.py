"""Per-column / per-partition profiling stats.

Reference analogue: the disabled pandas summary tables (``api/helpers.py:
4-51`` — SURVEY.md A7) and the missing-value agg (A3). One wide
aggregation pass computes, per partition group, for every column:
count, null count, and for numerics min/max/mean plus approx quantiles
(``percentile_approx`` sketch — mergeable, so the same plan scales to any
partition count with a single shuffle on the small group keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)


def column_stats(
    df: DataFrame,
    group_cols: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Long-form stats: (group…, column, count, n_null, min, max, mean,
    quantiles array). String/binary columns get count/null/min/max only
    (min/max as strings); one shuffle total."""
    group_cols = group_cols or []
    aggs = [F.count(F.lit(1)).alias("_rows")]
    per_col: list[tuple[str, bool]] = []
    for f in df.schema.fields:
        if f.name in group_cols:
            continue
        c = F.col(f.name)
        is_num = isinstance(f.dataType, _NUMERIC)
        is_bin = isinstance(f.dataType, T.BinaryType)
        per_col.append((f.name, is_num))
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{f.name}__nnull"))
        if is_num:
            aggs += [
                F.min(c).cast("double").alias(f"{f.name}__min"),
                F.max(c).cast("double").alias(f"{f.name}__max"),
                F.avg(c).alias(f"{f.name}__mean"),
                F.percentile_approx(c, list(quantiles), accuracy).alias(f"{f.name}__q"),
            ]
        elif is_bin:
            aggs += [
                F.min(F.length(c)).cast("double").alias(f"{f.name}__min"),
                F.max(F.length(c)).cast("double").alias(f"{f.name}__max"),
                F.avg(F.length(c)).alias(f"{f.name}__mean"),
                F.lit(None).cast("array<double>").alias(f"{f.name}__q"),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"{f.name}__min"),
                F.lit(None).cast("double").alias(f"{f.name}__max"),
                F.lit(None).cast("double").alias(f"{f.name}__mean"),
                F.lit(None).cast("array<double>").alias(f"{f.name}__q"),
            ]
    wide = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.groupBy().agg(*aggs)

    # unpivot to long form: one struct per column, then explode
    structs = [
        F.struct(
            F.lit(name).alias("column"),
            F.col("_rows").alias("count"),
            F.col(f"{name}__nnull").alias("n_null"),
            F.col(f"{name}__min").alias("min"),
            F.col(f"{name}__max").alias("max"),
            F.col(f"{name}__mean").alias("mean"),
            F.col(f"{name}__q").alias("quantiles"),
        )
        for name, _ in per_col
    ]
    out = wide.select(*group_cols, F.explode(F.array(*structs)).alias("s")).select(
        *group_cols, "s.*"
    )
    return out.withColumn("null_rate", F.col("n_null") / F.col("count"))
