"""Rule-system constants mirroring the FAANG ruleset semantics.

Tier / missing-value semantics follow the reference's matrix
(``metadata_validation_conversion/constants.py:196-210`` ``MISSING_VALUES``;
tier extraction per ``validation/WarningsAndAdditionalChecks.py:171-193``):
each tier maps the four standard missing-value tokens to error vs warning.
"""

from __future__ import annotations

TIERS = ("mandatory", "recommended", "optional")

MISSING_TOKENS = (
    "not applicable",
    "not collected",
    "not provided",
    "restricted access",
)

# tier -> which tokens are errors vs warnings (FAANG-shaped matrix:
# a mandatory field may claim "restricted access" with only a warning;
# recommended fields warn on every token; optional fields accept tokens
# silently except "restricted access" which still warns).
MISSING_VALUES: dict[str, dict[str, tuple[str, ...]]] = {
    "mandatory": {
        "errors": ("not applicable", "not collected", "not provided"),
        "warnings": ("restricted access",),
    },
    "recommended": {
        "errors": (),
        "warnings": MISSING_TOKENS,
    },
    "optional": {
        "errors": (),
        "warnings": ("restricted access",),
    },
}

SEVERITY_ERROR = "error"
SEVERITY_WARNING = "warning"

# date-unit formats, per validation/WarningsAndAdditionalChecks.py:322-347
DATE_UNIT_FORMATS = {
    "YYYY-MM-DD": "yyyy-MM-dd",
    "YYYY-MM": "yyyy-MM",
    "YYYY": "yyyy",
}

# safe-name allowlist regex (metadata_validation_conversion/helpers.py:12-30)
SAFE_NAME_PATTERN = r"^[A-Za-z0-9._-]+$"

# JSON-grammar-ish decimal accepted by the numeric rule — shared by the
# compiler (Spark rlike) and the independent golden (Python re) so the
# two can never diverge at dialect edges ('1_000', 'inf', 'Infinity',
# 'NaN' are all rejected by both). [0-9], NOT \d: Python re's \d matches
# Unicode digits (e.g. Arabic-Indic '٤٢') while Java's is ASCII-only —
# the explicit class pins both engines to ASCII
NUMBER_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"
