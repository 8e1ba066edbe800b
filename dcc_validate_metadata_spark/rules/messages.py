"""Exact violation-message formats (SURVEY.md §2.7 F6).

The reference attributes issues as f-strings with fixed phrasing
(``validation/WarningsAndAdditionalChecks.py:259,317,408,446``;
``validation/RelationshipsIssues.py:93,115,157,166``). Violation-row
parity requires byte-for-byte identical strings between the compiled
Column expressions, the fixture generator's ground truth, and the golden
tests — so every message lives here and NOWHERE else. Each function has a
Python form (generator / tests) and the compiler builds the identical
string with ``F.format_string`` / ``F.concat``.
"""

from __future__ import annotations


def msg_mandatory_missing(field: str) -> str:
    return f"Field '{field}' is mandatory but no value was provided"


def msg_recommended_missing() -> str:
    # verbatim reference phrasing (WarningsAndAdditionalChecks.py:259)
    return "This item is recommended but was not provided"


def msg_missing_token(field: str, table: str) -> str:
    # verbatim reference phrasing shape (WarningsAndAdditionalChecks.py:408)
    return (
        f"Field '{field}' of '{table}' contains missing value that is not "
        f"appropriate for this field"
    )


def msg_regex(value: str, field: str, pattern: str) -> str:
    return f"Provided value '{value}' for field '{field}' doesn't match the pattern '{pattern}'"


def msg_enum(value: str, field: str, allowed: list[str]) -> str:
    allowed_s = ", ".join(allowed)
    return f"Provided value '{value}' for field '{field}' is not one of [{allowed_s}]"


def msg_numeric(value: str, field: str) -> str:
    # type-rule analogue of the Elixir validator's "should be number"
    # (SURVEY.md X1) in this repo's message shape
    return f"Provided value '{value}' for field '{field}' is not a valid number"


def msg_range(value, field: str, lo, hi) -> str:
    return f"Provided value '{value}' for field '{field}' is out of range [{lo}, {hi}]"


def msg_maxlen(field: str, length: int, maxlen: int) -> str:
    return f"Field '{field}' length {length} exceeds maximum {maxlen}"


def msg_unique(field: str, value: str, n: int) -> str:
    return f"Field '{field}' value '{value}' occurs {n} times but must be unique"


def msg_date_unit(units: str, value: str) -> str:
    # verbatim reference phrasing (WarningsAndAdditionalChecks.py:322-347)
    return f"Date units: {units} should be consistent with date value: {value}"


def msg_ontology_label(text: str, label: str, term: str) -> str:
    # verbatim reference phrasing (WarningsAndAdditionalChecks.py:317)
    return f"Provided value '{text}' doesn't precisely match '{label}' for term '{term}'"


def msg_dangling_term(term: str, field: str) -> str:
    return f"Couldn't find term '{term}' in ontology for field '{field}'"


def msg_graph_restriction(term: str, roots: list[str]) -> str:
    # Elixir-validator graph_restriction failure shape (X1/X2)
    roots_s = ", ".join(roots)
    return f"Provided term '{term}' is not child of '{roots_s}'"


def msg_decode_failed(err: str) -> str:
    return f"Field 'bytes' could not be decoded: {err}"


def msg_dims_mismatch(dw: int, dh: int, w, h) -> str:
    return f"Decoded image dimensions ({dw}x{dh}) don't match declared ({w}x{h})"


def msg_fmt_mismatch(container: str, fmt: str) -> str:
    return f"Decoded container format '{container}' doesn't match declared fmt '{fmt}'"


def msg_psnr(psnr_db: float, min_db: float) -> str:
    return f"Decoded image PSNR {psnr_db:.1f} dB is below required {min_db:.1f} dB"


def msg_caption_mismatch(image_id: str) -> str:
    return f"Caption doesn't match ground truth for '{image_id}'"


def msg_no_entity(name: str) -> str:
    # verbatim reference phrasing shape (RelationshipsIssues.py:93)
    return f"Relationships part: no entity '{name}' found"


def msg_material_pair(parent: str, allowed: list[str]) -> str:
    # reference phrasing shape (RelationshipsIssues.py:115)
    allowed_s = ", ".join(allowed)
    return (
        f"Relationships part: referenced entity '{parent}' does not match "
        f"condition 'should be {allowed_s}'"
    )


def msg_species_mismatch(child_org: str, parent_org: str) -> str:
    # reference phrasing shape (RelationshipsIssues.py:157)
    return (
        f"Relationships part: the specie of the child '{child_org}' doesn't "
        f"match the specie of the parent '{parent_org}'"
    )


def msg_parent_cycle(name: str, parent: str) -> str:
    # reference phrasing shape (RelationshipsIssues.py:166)
    return f"Relationships part: parent '{parent}' lists '{name}' as its own parent"
