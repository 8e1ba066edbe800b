"""Sheet ingestion (S3/S4): header resolution with duplicate/missing
detection and the nested-record projection."""

from __future__ import annotations

import pandas as pd

from dcc_validate_metadata_spark.sources.sheet_ingest import (
    SheetSpec,
    project_records,
    resolve_headers,
)

SPEC = SheetSpec(
    name="organism",
    core_fields=("sample_name", "material"),
    type_fields=("organism", "birth_date", "health_status"),
    mandatory=("sample_name", "organism"),
)


def _sheet_df(spark, pdf):
    return spark.createDataFrame(pdf.astype("string"))


def test_header_resolution_flags_duplicates_and_missing(spark):
    pdf = pd.DataFrame(
        {
            "sample_name": ["s1"],
            "organism": ["Bos taurus"],
            "organism.1": ["Sus scrofa"],  # duplicate header
            "weird_extra": ["x"],
        }
    )
    res = resolve_headers(_sheet_df(spark, pdf), SPEC)
    assert res.custom == ("weird_extra",)
    msgs = dict(res.issues)
    assert msgs["organism"] == (
        "There are multiple entries for attribute 'organism' in sheet 'organism'"
    )
    # 'material' is core but not mandatory: absent silently
    assert "material" not in msgs

    res2 = resolve_headers(_sheet_df(spark, pdf.drop(columns=["organism", "organism.1"])), SPEC)
    assert dict(res2.issues)["organism"] == (
        "Field 'organism' is mandatory in sheet 'organism' but no column was provided"
    )


def test_projection_builds_nested_cells(spark):
    pdf = pd.DataFrame(
        {
            "sample_name": ["s1", "s2"],
            "material": ["organism", "organism"],
            "organism": ["Bos taurus", ""],
            "birth_date": ["2020-01-02", "2019-05"],
            "birth_date__units": ["YYYY-MM-DD", "YYYY-MM"],
            "birth_date__term": [None, None],
            "note": ["a note", None],
        }
    )
    out, res = project_records(_sheet_df(spark, pdf), SPEC)
    assert res.custom == ("note",)
    rows = {r["core"]["sample_name"]["value"]: r for r in out.collect()}
    s1 = rows["s1"]
    assert s1["type"]["organism"]["value"] == "Bos taurus"
    assert s1["type"]["birth_date"]["value"] == "2020-01-02"
    assert s1["type"]["birth_date"]["units"] == "YYYY-MM-DD"
    assert s1["custom"]["note"] == "a note"
    s2 = rows["s2"]
    assert s2["type"]["organism"] is None  # empty cell -> NULL cell struct
    assert s2["type"]["birth_date"]["units"] == "YYYY-MM"


def test_units_columns_do_not_leak_as_custom(spark):
    pdf = pd.DataFrame(
        {
            "sample_name": ["s1"],
            "organism": ["Bos taurus"],
            "birth_date": ["2020"],
            "birth_date__units": ["YYYY"],
        }
    )
    res = resolve_headers(_sheet_df(spark, pdf), SPEC)
    assert res.custom == ()


def test_validate_sheet_end_to_end(spark):
    """S3+S4+rules in one plan: cell rules, date-unit rule reading the
    sibling units column, name derivation fallback, header issues."""
    from dcc_validate_metadata_spark.rules.model import Rule, Ruleset
    from dcc_validate_metadata_spark.sources.sheet_ingest import validate_sheet

    pdf = pd.DataFrame(
        {
            "sample_name": ["s1", "s2", ""],
            "material": ["organism", "organism", "organism"],
            "organism": ["Bos taurus", "", ""],
            "birth_date": ["2020-01-02", "2020-13-01", "2020"],
            "birth_date__units": ["YYYY-MM-DD", "YYYY-MM-DD", "YYYY"],
        }
    )
    rs = Ruleset(
        table="organism",
        rules=(
            Rule("organism", "mandatory", "mandatory"),
            Rule("birth_date", "date_unit", "recommended", {"units_col": "birth_date__units"}),
        ),
    )
    viol = validate_sheet(_sheet_df(spark, pdf), SPEC, rs)
    got = sorted((r["name"], r["field"], r["message"]) for r in viol.collect())
    assert got == [
        ("organism_3", "organism",
         "Field 'organism' is mandatory but no value was provided"),
        ("s2", "birth_date",
         "Date units: YYYY-MM-DD should be consistent with date value: 2020-13-01"),
        ("s2", "organism", "Field 'organism' is mandatory but no value was provided"),
    ]


def test_validate_sheet_header_issue_rows(spark):
    from dcc_validate_metadata_spark.rules.model import Ruleset
    from dcc_validate_metadata_spark.sources.sheet_ingest import validate_sheet

    pdf = pd.DataFrame({"material": ["organism"]})  # no sample_name/organism
    rs = Ruleset(table="organism", rules=())
    got = validate_sheet(_sheet_df(spark, pdf), SPEC, rs).collect()
    msgs = {r["message"] for r in got}
    assert "Field 'organism' is mandatory in sheet 'organism' but no column was provided" in msgs
    assert all(r["name"] == "organism" for r in got)


def test_validate_workbook_submission_verdict(spark):
    from dcc_validate_metadata_spark.rules.model import Rule, Ruleset
    from dcc_validate_metadata_spark.sources.sheet_ingest import validate_workbook

    org = pd.DataFrame(
        {"sample_name": ["o1", "o2"], "material": ["organism"] * 2,
         "organism": ["Bos taurus", ""]}
    )
    exp = pd.DataFrame({"sample_name": ["e1"], "material": ["organism"],
                        "organism": ["Sus scrofa"]})
    sheets = {"organism": _sheet_df(spark, org), "specimen": _sheet_df(spark, exp)}
    specs = {"organism": SPEC, "specimen": SPEC}
    rs = Ruleset("t", (Rule("organism", "mandatory", "mandatory"),))
    rulesets = {"organism": rs, "specimen": rs}

    viol, status = validate_workbook(sheets, specs, rulesets)
    rows = [(r["sheet"], r["name"], r["field"]) for r in viol.collect()]
    assert rows == [("organism", "o2", "organism")]
    assert status == "Fix issues"

    # clean workbook -> ready
    org_ok = org.assign(organism=["Bos taurus", "Bos taurus"])
    sheets_ok = {"organism": _sheet_df(spark, org_ok), "specimen": _sheet_df(spark, exp)}
    viol2, status2 = validate_workbook(sheets_ok, specs, rulesets)
    assert viol2.count() == 0
    assert status2 == "Ready for submission"


def test_load_image_table_missing_column_message(spark, tmp_path):
    import pytest as _pytest

    from dcc_validate_metadata_spark.sources.image_table import load_image_table

    pd.DataFrame({"image_id": ["a"], "caption": ["x"]}).to_parquet(
        tmp_path / "bad.parquet", index=False
    )
    with _pytest.raises(ValueError, match="missing required columns"):
        load_image_table(spark, tmp_path / "bad.parquet")


def test_dotted_header_is_distinct_field(spark):
    """Only the pandas '.N' dedup suffix folds into the base field; a
    human header containing a dot stays its own (custom) column
    (regression: review finding)."""
    spec = SheetSpec(
        name="assay", core_fields=(), type_fields=("conc",), mandatory=()
    )
    pdf = pd.DataFrame(
        {"conc": ["1.0"], "conc. corrected": ["1.1"], "conc.1": ["2.0"]}
    )
    res = resolve_headers(_sheet_df(spark, pdf), spec)
    assert res.custom == ("conc. corrected",)
    assert dict(res.issues).get("conc", "").startswith("There are multiple entries")
