"""Hypothesis round-trips for the workbook ingest path (VERDICT r3 #7):
the reference's quirk list — leading-zero date repair, date-cell
detection by name, sheet/material consistency
(conversion/ReadExcelFile.py:368-378, 446-470) — is golden-tested on
fixed fixtures; these tests explore the input space around S1 (xlsx
binary round-trip), S3/S4 (header resolution + projection under random
permutations/duplicates/drops), and the date_unit rule (random serials
vs a pure-Python reference model)."""

from __future__ import annotations

import datetime
import random
import re

from hypothesis import given, settings, strategies as st

from dcc_validate_metadata_spark.sources.sheet_ingest import (
    SheetSpec,
    project_records,
    resolve_headers,
)
from dcc_validate_metadata_spark.sources.xlsx import read_workbook, write_workbook

# --------------------------------------------------------------------- S1

# sheet-name whitelist shapes (the reference whitelists FAANG sheet
# names — human-authored, may carry spaces/case), plus hostile chars the
# XML attribute context must escape
_SHEET_NAMES = st.sampled_from(
    [
        "organism",
        "specimen from organism",
        "pool of specimens",
        "cell culture",
        'quo"ted & <odd>',
        "faang_field données",
    ]
)

# cell payloads: date serials, leading-zero numerics (the repair class),
# XML-hostile text, unicode — no leading/trailing whitespace (inline-str
# XML round-trips it, but the ingest's empty-cell normalization trims)
_CELLS = st.one_of(
    st.none(),
    st.sampled_from(
        ["2020-01-02", "2019-05", "45123", "007", "0.50", "a<b&c>d", "ué✓"]
    ),
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9 _.<>&\"']{0,18}[A-Za-z0-9]", fullmatch=True),
)


@st.composite
def _workbooks(draw):
    n_sheets = draw(st.integers(1, 3))
    names = draw(
        st.lists(_SHEET_NAMES, min_size=n_sheets, max_size=n_sheets, unique=True)
    )
    sheets = {}
    for name in names:
        n_cols = draw(st.integers(1, 5))
        n_rows = draw(st.integers(1, 6))
        header = [f"h{i}" for i in range(n_cols)]
        rows = [
            [draw(_CELLS) for _ in range(n_cols)] for _ in range(n_rows)
        ]
        sheets[name] = [header] + rows
    return sheets


def _pad(grid, width):
    return [list(r) + [None] * (width - len(r)) for r in grid]


@given(_workbooks())
@settings(max_examples=25, deadline=None)
def test_workbook_binary_roundtrip(tmp_path_factory, sheets):
    """write_workbook → read_workbook preserves every sheet name, cell
    value, and empty cell (modulo trailing-empty-cell padding, which
    xlsx does not represent)."""
    path = tmp_path_factory.mktemp("wbprop") / "t.xlsx"
    write_workbook(path, sheets)
    got = read_workbook(path)
    assert list(got) == list(sheets)
    for name, grid in sheets.items():
        width = max(len(r) for r in grid)
        assert _pad(got[name], width) == _pad(grid, width)


# ----------------------------------------------------------------- S3/S4

_SPEC = SheetSpec(
    name="organism",
    core_fields=("sample_name", "material"),
    type_fields=("organism", "birth_date", "health_status"),
    mandatory=("sample_name", "material", "organism"),
)
_ALL_FIELDS = list(_SPEC.core_fields + _SPEC.type_fields)


@st.composite
def _header_layouts(draw):
    present = draw(
        st.lists(st.sampled_from(_ALL_FIELDS), min_size=1, max_size=5, unique=True)
    )
    dup = draw(st.sampled_from([None] + present))
    extras = draw(
        st.lists(
            st.sampled_from(["note", "lab", "conc. corrected"]),
            max_size=2,
            unique=True,
        )
    )
    cols = list(present) + ([f"{dup}.1"] if dup else []) + extras
    seed = draw(st.integers(0, 2**31 - 1))
    random.Random(seed).shuffle(cols)
    return present, dup, extras, cols


@given(_header_layouts())
@settings(max_examples=10, deadline=None)
def test_header_resolution_random_layout(spark, layout):
    """S3 invariants under arbitrary header order, pandas-dedup
    duplicates, dropped mandatory columns, and unknown extras."""
    present, dup, extras, cols = layout
    df = spark.createDataFrame(
        [tuple(f"v{i}" for i in range(len(cols)))], ", ".join(f"`{c}` string" for c in cols)
    )
    res = resolve_headers(df, _SPEC)
    resolved = {**res.core, **res.type_}
    # every present known field resolves to a column whose base name is it
    for fld in present:
        assert re.sub(r"\.\d+$", "", resolved[fld]) == fld
    assert set(res.custom) == set(extras)
    issue_fields = [f for f, _ in res.issues]
    if dup:
        assert issue_fields.count(dup) >= 1
        assert any("multiple entries" in m for f, m in res.issues if f == dup)
    for fld in _SPEC.mandatory:
        if fld not in present:
            assert any(
                "mandatory" in m for f, m in res.issues if f == fld
            ), f"missing mandatory {fld} not flagged"
    # S4: projection carries exactly the resolved fields + extras
    out, _ = project_records(df, _SPEC)
    row = out.collect()[0]
    if res.core:
        for fld in res.core:
            assert row["core"][fld]["value"] is not None
    for c in extras:
        assert row["custom"][c] == f"v{cols.index(c)}"


# ------------------------------------------------------------- date_unit

_UNITS = ["YYYY-MM-DD", "YYYY-MM", "YYYY"]


def _py_date_ok(value: str, unit: str) -> bool:
    """Pure-Python reference model of the compiled date_unit rule: the
    strict digit-shape regex AND a real calendar parse."""
    strict = {
        "YYYY-MM-DD": r"^\d{4}-\d{2}-\d{2}$",
        "YYYY-MM": r"^\d{4}-\d{2}$",
        "YYYY": r"^\d{4}$",
    }[unit]
    if not re.match(strict, value):
        return False
    fmt = {"YYYY-MM-DD": "%Y-%m-%d", "YYYY-MM": "%Y-%m", "YYYY": "%Y"}[unit]
    try:
        datetime.datetime.strptime(value, fmt)
        return True
    except ValueError:
        return False


@st.composite
def _date_batches(draw):
    rows = []
    for _ in range(draw(st.integers(5, 25))):
        unit = draw(st.sampled_from(_UNITS))
        y = draw(st.integers(1000, 2999))
        m = draw(st.integers(0, 19))
        d = draw(st.integers(0, 39))
        value = draw(
            st.sampled_from(
                [
                    f"{y:04d}-{m:02d}-{d:02d}",
                    f"{y:04d}-{m:02d}",
                    f"{y:04d}",
                    f"{y}-{m}-{d}",  # unpadded: the leading-zero repair class
                    f"{y:04d}/{m:02d}/{d:02d}",
                ]
            )
        )
        rows.append((value, unit))
    return rows


@given(_date_batches())
@settings(max_examples=8, deadline=None)
def test_date_unit_rule_matches_python_model(spark, rows):
    """The compiled date_unit Column flags EXACTLY the rows the
    pure-Python strict-regex + calendar model rejects — across random
    units, unpadded serials, swapped separators, and impossible dates."""
    from dcc_validate_metadata_spark.rules.compiler import violations_for
    from dcc_validate_metadata_spark.rules.model import Rule, Ruleset

    df = spark.createDataFrame(
        [(i, v, u) for i, (v, u) in enumerate(rows)],
        "rid int, collection_date string, units string",
    )
    rs = Ruleset(
        table="prop",
        rules=(
            Rule("collection_date", "date_unit", "mandatory", {"units_col": "units"}),
        ),
    )
    viol = violations_for(df, rs, keep_cols=["rid"])
    flagged = {r["rid"] for r in viol.collect()}
    expect = {i for i, (v, u) in enumerate(rows) if not _py_date_ok(v, u)}
    assert flagged == expect
