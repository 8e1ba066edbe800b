"""Sheet ingestion: header→field resolution + nested-record projection.

The reference's conversion core (SURVEY.md S1/S3/S4) turns an Excel sheet
into nested records in three steps:

* S1 workbook scan (``conversion/ReadExcelFile.py:24-105``) — here, any
  tabular DataFrame (CSV/parquet read) IS the sheet; Spark owns the scan.
* S3 header→field index mapping (``ReadExcelFile.py:140-330``): resolve
  each header against the template schema, flag duplicate headers
  ("multiple entries for attribute") and missing mandatory columns
  ("field is mandatory in sheet"); unknown headers become ``custom``.
* S4 row→nested-record projection (``ReadExcelFile.py:332-470``): build
  ``{core: {...}, field: {value, units, term}, custom: {...}}`` per row.

Spark realization: S3 is pure plan-time schema resolution (driver-side,
no data pass); S4 is ONE ``select`` of nested ``struct`` columns — the
per-row Python loops of the reference become whole-stage-codegen
expressions. Value cells follow the reference's field-cell shape
(``{value, units, term_source_id}`` — constants.py:159
``SPECIAL_PROPERTIES``): a field named ``X`` may be accompanied by
sibling columns ``X__units`` / ``X__term`` which fold into its struct.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNITS_SUFFIX = "__units"
TERM_SUFFIX = "__term"


@dataclass
class SheetSpec:
    """Template for one sheet: which fields belong to the core section,
    which to the type section, and which are mandatory columns."""

    name: str
    core_fields: tuple[str, ...] = ()
    type_fields: tuple[str, ...] = ()
    mandatory: tuple[str, ...] = ()


@dataclass
class HeaderResolution:
    """S3 output: plan-time mapping plus header-level issues."""

    core: dict[str, str] = dc_field(default_factory=dict)    # field -> column
    type_: dict[str, str] = dc_field(default_factory=dict)
    custom: tuple[str, ...] = ()
    issues: tuple[tuple[str, str], ...] = ()  # (field, message)


def resolve_headers(df: DataFrame, spec: SheetSpec) -> HeaderResolution:
    """Resolve the DataFrame's columns against the template (S3).
    Duplicate-header detection matters for CSV-born frames where pandas
    style dedup renames ``x, x.1`` — both map to field ``x``."""
    known = set(spec.core_fields) | set(spec.type_fields)
    seen: dict[str, list[str]] = {}
    custom: list[str] = []
    import re

    for col in df.columns:
        if col.endswith((UNITS_SUFFIX, TERM_SUFFIX)):
            continue
        # strip ONLY the pandas dedup suffix ("x.1" -> "x"); a legitimate
        # header containing a dot ("conc. corrected") is its own field
        base = re.sub(r"\.\d+$", "", col)
        if base in known:
            seen.setdefault(base, []).append(col)
        else:
            custom.append(col)

    issues: list[tuple[str, str]] = []
    core: dict[str, str] = {}
    type_: dict[str, str] = {}
    for fld, cols in seen.items():
        if len(cols) > 1:
            issues.append(
                (fld, f"There are multiple entries for attribute '{fld}' in sheet '{spec.name}'")
            )
        (core if fld in spec.core_fields else type_)[fld] = cols[0]
    for fld in spec.mandatory:
        if fld not in seen:
            issues.append(
                (fld, f"Field '{fld}' is mandatory in sheet '{spec.name}' but no column was provided")
            )
    return HeaderResolution(
        core=core, type_=type_, custom=tuple(custom), issues=tuple(issues)
    )


def _qcol(name: str) -> F.Column:
    """Column reference by EXACT name: human-authored headers may carry
    dots ("conc. corrected") or pandas-dedup suffixes ("x.1"), which a
    bare F.col() would misread as struct access. Backticks quote the
    whole identifier (embedded backticks doubled per Spark's rule)."""
    return F.col("`" + name.replace("`", "``") + "`")


def _cell(df: DataFrame, col: str) -> F.Column:
    """Field-cell struct {value, units, term}: sibling ``col__units`` /
    ``col__term`` columns fold in; absent siblings become NULL members."""
    units = (
        _qcol(col + UNITS_SUFFIX) if col + UNITS_SUFFIX in df.columns else F.lit(None)
    )
    term = (
        _qcol(col + TERM_SUFFIX) if col + TERM_SUFFIX in df.columns else F.lit(None)
    )
    return F.struct(
        _qcol(col).cast("string").alias("value"),
        units.cast("string").alias("units"),
        term.cast("string").alias("term"),
    )


def validate_sheet(
    df: DataFrame,
    spec: SheetSpec,
    ruleset,
    name_field: str = "sample_name",
    ontologies: dict | None = None,
) -> DataFrame:
    """The reference's full conversion→validation flow in one lazy plan
    (S3 header resolution → S4 projection → rule families):

    * record name per P11 (``validation/helpers.py:28-47``): the name
      field's cell value, else ``"{sheet}_{row+1}"``;
    * header-level issues (duplicate / missing mandatory columns) become
      violation rows attributed to the sheet pseudo-record;
    * cell values flatten back to ``field`` / ``field__units`` columns so
      the SAME rule compiler used for columnar tables runs unchanged;
    * with ``ontologies`` (``ontology_name`` → snapshot DataFrame), the
      ruleset's join-level ``ontology_ref`` rules also run — dangling
      term, label precision, graph restriction — via
      rules/faang_schema.ontology_violations_for.

    Returns violations ``(name, field, severity, message)``.
    """
    from ..rules.compiler import violations_for

    res = resolve_headers(df, spec)
    resolved = {**res.core, **res.type_}

    cols = [
        F.when(F.trim(_qcol(col).cast("string")) == "", None)
        .otherwise(_qcol(col).cast("string"))
        .alias(fld)
        for fld, col in sorted(resolved.items())
    ]
    for fld, col in sorted(resolved.items()):
        for suffix in (UNITS_SUFFIX, TERM_SUFFIX):
            if col + suffix in df.columns:
                cols.append(_qcol(col + suffix).cast("string").alias(fld + suffix))
    # global row numbers for the "{sheet}_{i}" fallback name: a single-task
    # window, acceptable ONLY because sheets are human-authored workbooks
    # (10^3-10^5 rows). Machine-scale tables go through the columnar
    # pipeline (plans/pipeline.py), which never needs global row order.
    row_num = F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
    flat = df.select(row_num.alias("_row"), *cols)
    name = (
        F.coalesce(
            _qcol(name_field) if name_field in resolved else F.lit(None),
            F.concat(F.lit(f"{spec.name}_"), F.col("_row").cast("string")),
        ).alias("name")
    )
    flat = flat.select(name, *[c for c in flat.columns if c != "_row"])

    viol = violations_for(flat, ruleset, keep_cols=["name"])
    if ontologies:
        from ..rules.faang_schema import ontology_violations_for

        viol = viol.unionByName(
            ontology_violations_for(flat, ruleset, ontologies, keep_cols=["name"])
        )

    if res.issues:
        spark = df.sparkSession
        header_rows = spark.createDataFrame(
            [(spec.name, fld, "error", msg) for fld, msg in res.issues],
            "name string, field string, severity string, message string",
        )
        viol = viol.unionByName(header_rows)
    return viol


def validate_workbook(
    sheets: dict[str, DataFrame],
    specs: dict[str, SheetSpec],
    rulesets: dict,
    name_field: str = "sample_name",
    ontologies: dict | None = None,
) -> tuple[DataFrame, str]:
    """Whole-workbook validation (the reference's submission unit): every
    sheet through :func:`validate_sheet`, violations unioned with a
    ``sheet`` column, plus the submission verdict — ``'Fix issues'`` if
    ANY error exists anywhere, else ``'Ready for submission'``
    (``validation/helpers.py:50-81`` ``get_submission_status`` /
    ``check_issues``, SURVEY.md A5). One Spark job for the verdict: an
    ``isEmpty`` on the error subset, no full count."""
    from functools import reduce

    from pyspark.sql import functions as FF

    parts = []
    for sheet_name, df in sheets.items():
        v = validate_sheet(
            df,
            specs[sheet_name],
            rulesets[sheet_name],
            name_field=name_field,
            ontologies=ontologies,
        )
        parts.append(v.select(FF.lit(sheet_name).alias("sheet"), "*"))
    violations = reduce(DataFrame.unionByName, parts)
    has_errors = not violations.filter(FF.col("severity") == "error").isEmpty()
    status = "Fix issues" if has_errors else "Ready for submission"
    return violations, status


def project_records(df: DataFrame, spec: SheetSpec) -> tuple[DataFrame, HeaderResolution]:
    """S4: one ``select`` building the nested record
    ``(row_id, core struct, type struct, custom struct)``. Empty-string
    cells become NULL values inside the cell struct (the reference skips
    empty cells — ReadExcelFile.py:392-412)."""
    res = resolve_headers(df, spec)

    def cell(col: str) -> F.Column:
        c = _cell(df, col)
        return F.when(F.trim(_qcol(col).cast("string")) == "", None).otherwise(c)

    sections = []
    if res.core:
        sections.append(
            F.struct(
                *[cell(col).alias(fld) for fld, col in sorted(res.core.items())]
            ).alias("core")
        )
    sections.append(
        F.struct(
            *[cell(col).alias(fld) for fld, col in sorted(res.type_.items())]
        ).alias("type")
        if res.type_
        else F.lit(None).cast("struct<_:string>").alias("type")
    )
    if res.custom:
        sections.append(
            F.struct(
                *[
                    _qcol(c).cast("string").alias(c)
                    for c in res.custom
                ]
            ).alias("custom")
        )
    out = df.select(
        F.monotonically_increasing_id().alias("_row_id"), *sections
    )
    return out, res
