"""Export sinks: CSV and fixed-width text (SURVEY.md S7).

Reference: ``api/views.py:432-572`` ``download`` — scans an index page
by page, walks dotted ``_source.a.b`` paths through dicts (F9), joins
array fields with ", " (F10), derives count columns, then emits either
CSV or a ``|``-aligned fixed-width text file, all driver-side.

Spark realization: dotted paths are just nested column references,
array joins are ``concat_ws(transform(...))``, counts are ``size`` —
one ``select`` — and the write is a distributed ``df.write.csv`` /
``format_string`` text sink. The reference's 10k-page loop disappears
(partitioned scan), and the fixed-width column sizing runs on a tiny
aggregated max-length frame, not the data."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_projection(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """Build the export frame from a ``{out_name: expr}`` spec where expr
    is a dotted column path, ``join:col`` (array joined with ", "),
    or ``count:col`` (array length)."""
    cols = []
    for out_name, expr in spec.items():
        if expr.startswith("join:"):
            path = expr[len("join:") :]
            c = F.concat_ws(", ", F.transform(F.col(path), lambda x: x.cast("string")))
        elif expr.startswith("count:"):
            path = expr[len("count:") :]
            c = F.when(F.col(path).isNull(), F.lit(0)).otherwise(F.size(F.col(path)))
        else:
            c = F.col(expr)
        cols.append(c.alias(out_name))
    return df.select(*cols)


def write_csv_export(
    df: DataFrame, spec: dict[str, str], path: str, coalesce: int | None = None
) -> None:
    out = export_projection(df, spec)
    if coalesce:
        out = out.coalesce(coalesce)
    out.write.mode("overwrite").option("header", True).csv(path)


def write_fixed_width(
    df: DataFrame, spec: dict[str, str], path: str, coalesce: int | None = None
) -> None:
    """``|``-aligned text like the reference's non-CSV branch
    (``api/views.py:556-570``). Column widths come from ONE tiny agg of
    per-column max lengths (collected: it is #columns numbers, not data)."""
    out = export_projection(df, spec)
    names = list(spec.keys())
    widths_row = out.agg(
        *[
            F.greatest(
                F.max(F.length(F.col(n).cast("string"))), F.lit(len(n))
            ).alias(n)
            for n in names
        ]
    ).first()
    widths = {n: int(widths_row[n] or len(n)) for n in names}
    fmt = " | ".join(f"%-{widths[n]}s" for n in names)
    header = fmt % tuple(names)
    line = (
        out.select(
            F.format_string(
                fmt, *[F.coalesce(F.col(n).cast("string"), F.lit("")) for n in names]
            ).alias("value")
        )
    )
    if coalesce:
        line = line.coalesce(coalesce)
    # header rows sort before data via an explicit ord key — file-order
    # of union partitions alone is not a contract readers can rely on
    header_df = line.sparkSession.createDataFrame(
        [(0, header), (1, "-" * len(header))], "ord int, value string"
    )
    (
        header_df.unionByName(line.select(F.lit(2).alias("ord"), "value"))
        .orderBy("ord")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )
