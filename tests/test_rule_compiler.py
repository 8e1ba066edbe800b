"""Per-rule-kind golden tests (FIXTURES.md §6): small inline fixtures,
exact expected violation rows — including the null / empty-string /
missing-token distinctions and the date-unit format ladder
(reference semantics: validation/WarningsAndAdditionalChecks.py:322-347,
missing-value matrix constants.py:196-210)."""

from __future__ import annotations

import pandas as pd
import pytest

from dcc_validate_metadata_spark.rules.model import Rule, Ruleset
from dcc_validate_metadata_spark.rules.compiler import violations_for


def _run(spark, rows: list[dict], rules: list[Rule], schema: str) -> list[tuple]:
    df = spark.createDataFrame(
        pd.DataFrame(rows).where(pd.notnull(pd.DataFrame(rows)), None), schema
    )
    rs = Ruleset(table="t", rules=tuple(rules))
    out = violations_for(df, rs, keep_cols=["name"])
    return sorted(
        (r["name"], r["field"], r["severity"], r["message"])
        for r in out.collect()
    )


def test_mandatory_tier_ladder(spark):
    rows = [
        {"name": "a", "v": "ok"},
        {"name": "b", "v": None},
        {"name": "c", "v": "  "},  # blank string == absent for strings
    ]
    got = _run(spark, rows, [Rule("v", "mandatory", "mandatory")], "name string, v string")
    assert got == [
        ("b", "v", "error", "Field 'v' is mandatory but no value was provided"),
        ("c", "v", "error", "Field 'v' is mandatory but no value was provided"),
    ]
    got_rec = _run(spark, rows, [Rule("v", "mandatory", "recommended")], "name string, v string")
    assert [g[2] for g in got_rec] == ["warning", "warning"]
    assert got_rec[0][3] == "This item is recommended but was not provided"
    assert _run(spark, rows, [Rule("v", "mandatory", "optional")], "name string, v string") == []


def test_missing_tokens_matrix(spark):
    rows = [
        {"name": "a", "v": "not provided"},
        {"name": "b", "v": "Restricted Access"},  # case-insensitive
        {"name": "c", "v": "fine"},
    ]
    sch = "name string, v string"
    man = _run(spark, rows, [Rule("v", "missing_tokens", "mandatory")], sch)
    assert [(g[0], g[2]) for g in man] == [("a", "error"), ("b", "warning")]
    rec = _run(spark, rows, [Rule("v", "missing_tokens", "recommended")], sch)
    assert [(g[0], g[2]) for g in rec] == [("a", "warning"), ("b", "warning")]
    opt = _run(spark, rows, [Rule("v", "missing_tokens", "optional")], sch)
    assert [(g[0], g[2]) for g in opt] == [("b", "warning")]
    assert man[0][3] == (
        "Field 'v' of 't' contains missing value that is not appropriate for this field"
    )


def test_numeric_rule_json_grammar(spark):
    """Numeric rule accepts JSON-grammar decimals only; Spark-cast and
    Python-float() dialect extras ('Infinity', 'NaN', '1_000', 'inf')
    are all rejected, and the independent golden uses the same regex."""
    import re

    from dcc_validate_metadata_spark.rules.constants import NUMBER_RE

    good = ["0", "42", "-3.5", "+.5", "1e9", "2.5E-3", "007"]
    bad = ["1_000", "inf", "Infinity", "NaN", "nan", "1.2.3", "1e", "abc", "0x1f"]
    rows = [{"name": f"g{i}", "v": v} for i, v in enumerate(good)] + [
        {"name": f"b{i}", "v": v} for i, v in enumerate(bad)
    ]
    got = _run(spark, rows, [Rule("v", "numeric")], "name string, v string")
    assert {g[0] for g in got} == {f"b{i}" for i in range(len(bad))}
    # regex parity: the golden's re.match agrees with the engine verdicts
    assert all(re.match(NUMBER_RE, v) for v in good)
    assert not any(re.match(NUMBER_RE, v) for v in bad)


def test_range_boundaries(spark):
    rows = [
        {"name": "lo_ok", "v": 1},
        {"name": "hi_ok", "v": 10},
        {"name": "lo_bad", "v": 0},
        {"name": "hi_bad", "v": 11},
        {"name": "null", "v": None},
    ]
    got = _run(
        spark, rows, [Rule("v", "range", "mandatory", {"min": 1, "max": 10})],
        "name string, v int",
    )
    assert [(g[0], g[3]) for g in got] == [
        ("hi_bad", "Provided value '11' for field 'v' is out of range [1, 10]"),
        ("lo_bad", "Provided value '0' for field 'v' is out of range [1, 10]"),
    ]


def test_regex_enum_maxlen(spark):
    rows = [
        {"name": "a", "v": "good_1"},
        {"name": "b", "v": "has space"},
        {"name": "c", "v": "x" * 6},
    ]
    sch = "name string, v string"
    got = _run(spark, rows, [Rule("v", "safe_name", "mandatory")], sch)
    assert got == [
        ("b", "v", "error",
         "Provided value 'has space' for field 'v' doesn't match the pattern '^[A-Za-z0-9._-]+$'")
    ]
    got = _run(spark, rows, [Rule("v", "enum", "mandatory", {"values": ["good_1"]})], sch)
    assert [g[0] for g in got] == ["b", "c"]
    got = _run(spark, rows, [Rule("v", "maxlen", "mandatory", {"value": 8})], sch)
    assert got == [("b", "v", "error", "Field 'v' length 9 exceeds maximum 8")]


@pytest.mark.parametrize(
    ("value", "units", "bad"),
    [
        ("2021-03-04", "YYYY-MM-DD", False),
        ("2021-03", "YYYY-MM", False),
        ("2021", "YYYY", False),
        ("2021-03-04", "YYYY", True),      # unit narrower than value
        ("2021", "YYYY-MM-DD", True),      # unit wider than value
        ("2021-13-01", "YYYY-MM-DD", True),  # regex passes, parse fails
        ("2021-3-4", "YYYY-MM-DD", True),    # missing leading zeros
        (None, "YYYY-MM-DD", False),         # absent → not this rule's job
    ],
)
def test_date_unit_ladder(spark, value, units, bad):
    rows = [{"name": "r", "v": value, "u": units}]
    got = _run(
        spark, rows, [Rule("v", "date_unit", "mandatory", {"units_col": "u"})],
        "name string, v string, u string",
    )
    if bad:
        assert got == [
            ("r", "v", "error",
             f"Date units: {units} should be consistent with date value: {value}")
        ]
    else:
        assert got == []
