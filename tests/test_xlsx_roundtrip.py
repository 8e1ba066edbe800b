"""Excel round-trip (S1 scan + S6 annotated sink): a workbook fixture
with planted header and cell issues goes .xlsx → DataFrames →
validate_workbook → colour-coded annotated .xlsx, all via the stdlib
zip+XML codec (no xlrd/openpyxl in the sandbox)."""

from __future__ import annotations

import dataclasses

import pytest

from dcc_validate_metadata_spark.queries.validationpack import _faang_fixture_rows
from dcc_validate_metadata_spark.rules.faang_schema import organism_ruleset
from dcc_validate_metadata_spark.sources.sheet_ingest import validate_workbook
from dcc_validate_metadata_spark.sources.xlsx import (
    STYLE_ERROR,
    STYLE_WARNING,
    read_cell_styles,
    read_workbook,
    workbook_to_dataframes,
    write_annotated_workbook,
    write_workbook,
)


@pytest.fixture(scope="module")
def workbook_path(tmp_path_factory):
    rows = _faang_fixture_rows()[:32]
    headers = [c for c in rows[0] if c != "sex"]  # planted: sex column missing
    headers = headers + ["material"]  # planted: duplicate attribute column
    grid = [headers] + [
        [r[c] for c in headers[:-1]] + [r["material"]] for r in rows
    ]
    path = tmp_path_factory.mktemp("xlsx") / "organism.xlsx"
    write_workbook(path, {"organism": grid})
    return path, rows


def test_read_back_equals_written(workbook_path):
    path, rows = workbook_path
    got = read_workbook(path)["organism"]
    assert got[0][0] == "sample_name"
    assert len(got) == 33
    # cell-level fidelity incl. None round-trip and special chars
    assert got[1][0] == "ORG_0000"
    assert got[0].count("material") == 2


def test_workbook_validates_with_header_issues(spark, workbook_path):
    path, rows = workbook_path
    sheets = workbook_to_dataframes(spark, path)
    assert set(sheets) == {"organism"}
    assert "material.1" in sheets["organism"].columns  # pandas-style dedup

    rs, spec = organism_ruleset()
    spec = dataclasses.replace(spec, type_fields=spec.type_fields + ("sample_name",))
    viol, status = validate_workbook(
        sheets, {"organism": spec}, {"organism": rs}, name_field="sample_name"
    )
    assert status == "Fix issues"
    msgs = {(r["name"], r["message"]) for r in viol.collect()}
    # header-level issues attribute to the sheet pseudo-record
    assert (
        "organism",
        "There are multiple entries for attribute 'material' in sheet 'organism'",
    ) in msgs
    assert (
        "organism",
        "Field 'sex' is mandatory in sheet 'organism' but no column was provided",
    ) in msgs
    # planted cell violations still fire through the xlsx path
    assert any(n == "ORG_0002" and "NOTFAANG" in m for n, m in msgs)


def test_annotated_workbook_colours_and_issue_column(spark, workbook_path, tmp_path):
    path, rows = workbook_path
    sheets_df = workbook_to_dataframes(spark, path)
    rs, spec = organism_ruleset()
    spec = dataclasses.replace(spec, type_fields=spec.type_fields + ("sample_name",))
    viol, _ = validate_workbook(
        sheets_df, {"organism": spec}, {"organism": rs}, name_field="sample_name"
    )
    grid = read_workbook(path)["organism"]
    out = tmp_path / "organism_annotated.xlsx"
    write_annotated_workbook(
        out, {"organism": grid}, viol, sheet_name_field="sample_name"
    )

    annotated = read_workbook(out)["organism"]
    assert annotated[0][-1] == "issues"
    styles = read_cell_styles(out, "organism")
    header = grid[0]
    project_col = header.index("project")
    breed_col = header.index("breed")
    # ORG_0002 (row 3, 0-based ri=3): project enum error → red cell
    assert styles[(3, project_col)] == STYLE_ERROR
    # ORG_0008 (ri=9): breed recommended-missing → warning, but the cell
    # is empty (None) so only the issues column records it
    issues_cell = annotated[9][-1]
    assert issues_cell is not None and "warning:breed:" in issues_cell
    # a warning-styled cell: ORG_0013 sample_description token (ri=14)
    sd_col = header.index("sample_description")
    assert styles[(14, sd_col)] == STYLE_WARNING
    # every annotated row's issue text round-trips the message verbatim
    assert "error:project:Provided value 'NOTFAANG' for field 'project'" in (
        annotated[3][-1]
    )


def test_annotated_workbook_whitespace_name_uses_fallback(spark, tmp_path):
    """A whitespace-only name cell is blanked by validate_sheet and its
    violations keyed '{sheet}_{row}' — the annotated writer must apply
    the same normalization or those rows' issues silently detach."""
    rows = _faang_fixture_rows()[:3]
    rows[1] = dict(rows[1], sample_name="   ", project="NOTFAANG")
    headers = list(rows[0])
    grid = [headers] + [[r[c] for c in headers] for r in rows]
    path = tmp_path / "ws.xlsx"
    write_workbook(path, {"organism": grid})

    sheets_df = workbook_to_dataframes(spark, path)
    rs, spec = organism_ruleset()
    spec = dataclasses.replace(spec, type_fields=spec.type_fields + ("sample_name",))
    viol, _ = validate_workbook(
        sheets_df, {"organism": spec}, {"organism": rs}, name_field="sample_name"
    )
    # the blanked-name row's violations carry the fallback name
    names = {r["name"] for r in viol.collect()}
    assert "organism_2" in names

    out = tmp_path / "ws_annotated.xlsx"
    write_annotated_workbook(
        out, {"organism": grid}, viol, sheet_name_field="sample_name"
    )
    annotated = read_workbook(out)["organism"]
    issues_cell = annotated[2][-1]  # the whitespace-name row
    assert issues_cell is not None and "NOTFAANG" in issues_cell
    styles = read_cell_styles(out, "organism")
    assert styles[(2, headers.index("project"))] == STYLE_ERROR
