"""Declarative rule model.

The reference fetches JSON-Schema rulesets from GitHub per validation run
and walks them per record in Python (``metadata_validation_conversion/
helpers.py:33-55``, ``validation/ElixirValidatorResults.py:33-62``). Here a
ruleset is a local, declarative list of ``Rule`` objects compiled ONCE to
Spark ``Column`` expressions (rules/compiler.py) — no executor I/O, no RPC
in the data path.

Rule kinds
----------
row-level (pure Column expressions):
  ``regex, enum, range, maxlen, mandatory, missing_tokens, date_unit,
  safe_name``
set-level (need a shuffle; implemented in operators/uniqueness.py):
  ``unique``
join-level (broadcast lookup; operators/referential.py):
  ``ontology_ref``
batch-UDF-level (Arrow-batched decode; images/invariants.py):
  ``decodes``
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from pathlib import Path

from .constants import TIERS

# Bump when the COMPILER's semantics for any rule kind change (not when
# rule data changes — that's the fingerprint's json body). Folded into
# Ruleset.fingerprint so manifests refuse to resume across semantic
# shifts. History: 2 = numeric rule moved from Spark-cast acceptance to
# the shared JSON-grammar NUMBER_RE (round 3).
RULE_SEMANTICS_VERSION = 2

ROW_KINDS = frozenset(
    {
        "regex", "enum", "range", "maxlen", "mandatory", "missing_tokens",
        "date_unit", "safe_name", "numeric",
    }
)
SET_KINDS = frozenset({"unique"})
JOIN_KINDS = frozenset({"ontology_ref"})
UDF_KINDS = frozenset({"decodes"})
ALL_KINDS = ROW_KINDS | SET_KINDS | JOIN_KINDS | UDF_KINDS


@dataclass(frozen=True)
class Rule:
    field: str
    kind: str
    tier: str = "mandatory"
    params: dict = dc_field(default_factory=dict)

    def __post_init__(self):
        if self.kind not in ALL_KINDS:
            raise ValueError(f"unknown rule kind {self.kind!r}")
        if self.tier not in TIERS:
            raise ValueError(f"unknown tier {self.tier!r}")


@dataclass(frozen=True)
class Ruleset:
    table: str
    rules: tuple[Rule, ...]

    def fingerprint(self) -> str:
        """Stable content hash of the RULES — recorded in the manifest
        lineage so a resumed/compared run can prove it validated under
        the same rules. Deliberately excludes ``table`` (load_ruleset
        derives it from the file basename; renaming an identical ruleset
        file must not change its fingerprint). Includes
        ``RULE_SEMANTICS_VERSION``: identical rule DATA compiled by a
        compiler whose semantics changed (e.g. the numeric rule moving
        from cast-based to regex-based acceptance) must NOT resume a
        half-finished run — the already-done partitions were judged
        under different semantics."""
        import hashlib

        canon = json.dumps(
            {
                "semantics": RULE_SEMANTICS_VERSION,
                "rules": [
                    {
                        "field": r.field,
                        "kind": r.kind,
                        "tier": r.tier,
                        "params": r.params,
                    }
                    for r in self.rules
                ],
            },
            sort_keys=True,
        )
        return hashlib.sha256(canon.encode()).hexdigest()[:16]

    def of_kinds(self, kinds) -> tuple[Rule, ...]:
        return tuple(r for r in self.rules if r.kind in kinds)

    @property
    def row_rules(self):
        return self.of_kinds(ROW_KINDS)

    @property
    def unique_rules(self):
        return self.of_kinds(SET_KINDS)

    @property
    def ref_rules(self):
        return self.of_kinds(JOIN_KINDS)

    @property
    def udf_rules(self):
        return self.of_kinds(UDF_KINDS)


def load_ruleset(path: str | Path) -> Ruleset:
    """Load the JSON shape of FIXTURES.md §2:
    ``[{"field": ..., "tier": ..., "checks": [{"kind": ..., **params}]}]``.
    A ``mandatory`` tier implicitly adds a ``mandatory`` presence rule; a
    ``recommended`` tier adds the recommended-missing warning; both get the
    ``missing_tokens`` check (tier matrix in rules/constants.py)."""
    spec = json.loads(Path(path).read_text())
    return ruleset_from_spec(spec, table=Path(path).stem)


def ruleset_from_spec(spec: list[dict], table: str) -> Ruleset:
    rules: list[Rule] = []
    for entry in spec:
        fld, tier = entry["field"], entry.get("tier", "optional")
        rules.append(Rule(fld, "mandatory", tier))
        for check in entry.get("checks", []):
            params = {k: v for k, v in check.items() if k != "kind"}
            kind = check["kind"]
            if kind == "type":
                continue  # static: enforced by the fixed StructType schema
            rules.append(Rule(fld, kind, tier, params))
    return Ruleset(table=table, rules=tuple(rules))


def default_image_ruleset() -> Ruleset:
    """The north-rule ruleset over the image+caption table (FIXTURES.md §2)."""
    return ruleset_from_spec(
        [
            {
                "field": "image_id",
                "tier": "mandatory",
                "checks": [{"kind": "safe_name"}, {"kind": "unique"}],
            },
            {
                "field": "bytes",
                "tier": "mandatory",
                "checks": [{"kind": "decodes", "psnr_db_min": 40.0}],
            },
            {
                "field": "w",
                "tier": "mandatory",
                "checks": [{"kind": "range", "min": 1, "max": 65536}],
            },
            {
                "field": "h",
                "tier": "mandatory",
                "checks": [{"kind": "range", "min": 1, "max": 65536}],
            },
            {
                "field": "fmt",
                "tier": "mandatory",
                "checks": [
                    {"kind": "enum", "values": ["png", "jpeg", "webp"]},
                    {"kind": "ontology_ref", "lookup": "ontology_terms"},
                ],
            },
            {
                "field": "caption",
                "tier": "recommended",
                "checks": [{"kind": "missing_tokens"}, {"kind": "maxlen", "value": 512}],
            },
            {
                "field": "phash",
                "tier": "mandatory",
                "checks": [{"kind": "unique"}],
            },
        ],
        table="image_caption",
    )
