"""FAANG ``metadata_rules.json`` compiler: the vendored public-format
schema documents drive the whole sheet-validation path end-to-end, and
the result matches the independent pure-Python golden that walks the
schema JSON directly (no Ruleset/compiler involved)."""

from __future__ import annotations

import dataclasses

import pytest

from dcc_validate_metadata_spark.queries.validationpack import (
    _faang_expected,
    _faang_fixture_rows,
)
from dcc_validate_metadata_spark.rules.faang_schema import (
    collect_fields,
    load_faang_ruleset,
    organism_ruleset,
    FAANG_DIR,
)
from dcc_validate_metadata_spark.sources.sheet_ingest import validate_sheet


def test_collect_fields_tiers_and_shapes():
    import json

    typ = json.loads(
        (FAANG_DIR / "faang_samples_organism.metadata_rules.json").read_text()
    )
    fields = collect_fields(typ, "type")
    # tier from properties.mandatory.const, both object and array shapes
    assert fields["organism"].tier == "mandatory"
    assert fields["birth_date"].tier == "recommended"
    assert fields["health_status"].is_array
    assert fields["health_status"].tier == "recommended"
    # ontology-typed iff text+term+ontology_name
    assert fields["sex"].ontology and fields["sex"].ontology_name == "PATO"
    assert not fields["birth_date"].ontology
    assert fields["organism"].graph_restriction["classes"] == ["NCBITaxon:1"]
    # core $ref and plain string props are skipped
    assert "samples_core" not in fields
    assert "describedBy" not in fields
    assert "schema_version" not in fields


def test_compiled_ruleset_kinds():
    rs, spec = organism_ruleset()
    kinds = {(r.field, r.kind) for r in rs.rules}
    assert ("material", "enum") in kinds           # text enum
    assert ("project", "enum") in kinds            # value enum
    assert ("birth_date", "date_unit") in kinds    # date-shaped units
    assert ("birth_date", "regex") in kinds        # value pattern
    assert ("birth_weight", "numeric") in kinds    # {"type": "number"}
    assert ("birth_weight__units", "enum") in kinds
    assert ("organism__term", "ontology_ref") in kinds  # join-level
    # core/type split lands in the sheet template
    assert "material" in spec.core_fields and "organism" in spec.type_fields
    assert set(spec.mandatory) == {"material", "project", "organism", "sex"}


def test_faang_sheet_matches_independent_golden(spark):
    rows = _faang_fixture_rows()
    schema = ", ".join(f"{c} string" for c in rows[0])
    sheet = spark.createDataFrame(rows, schema)
    rs, spec = organism_ruleset()
    spec = dataclasses.replace(spec, type_fields=spec.type_fields + ("sample_name",))
    got = sorted(
        tuple(r) for r in validate_sheet(sheet, spec, rs, name_field="sample_name")
        .select("name", "field", "severity", "message")
        .collect()
    )
    exp = sorted(
        (e["name"], e["field"], e["severity"], e["message"])
        for e in _faang_expected(rows)
    )
    assert got == exp
    assert len(exp) >= 90  # every planted slot fires


def test_missing_optional_sibling_columns_are_skipped(spark):
    """A sheet without __units/__term sibling columns compiles cleanly —
    rules naming absent columns are skipped, not AnalysisException."""
    rs, spec = load_faang_ruleset(
        FAANG_DIR / "faang_samples_organism.metadata_rules.json",
        FAANG_DIR / "faang_samples_core.metadata_rules.json",
        table="organism",
    )
    sheet = spark.createDataFrame(
        [
            {"sample_name": "S1", "material": "organism", "project": "FAANG",
             "organism": "Sus scrofa", "sex": "male"},
            {"sample_name": "S2", "material": "organism", "project": "WRONG",
             "organism": "Sus scrofa", "sex": "male"},
        ]
    )
    spec = dataclasses.replace(spec, type_fields=spec.type_fields + ("sample_name",))
    viol = validate_sheet(sheet, spec, rs, name_field="sample_name").collect()
    msgs = {(v["name"], v["field"], v["severity"]) for v in viol}
    assert ("S2", "project", "error") in msgs
    # S1 is clean apart from recommended-missing warnings
    assert not any(n == "S1" and s == "error" for n, f, s in msgs)


def test_module_schema_appends_fields(spark):
    """Module schemas (teleostei sheets = specimen type + module rules,
    constants.py ALLOWED_SHEET_NAMES) append their fields to the type
    section."""
    import json

    from dcc_validate_metadata_spark.rules.faang_schema import (
        load_vendored_schema,
        ruleset_from_faang_schema,
    )

    rs, spec = ruleset_from_faang_schema(
        load_vendored_schema("faang_samples_organism.metadata_rules.json"),
        load_vendored_schema("faang_samples_core.metadata_rules.json"),
        table="teleostei embryo",
        module_schemas=[
            load_vendored_schema(
                "faang_samples_specimen_teleost_embryo.metadata_rules.json"
            )
        ],
    )
    kinds = {(r.field, r.kind) for r in rs.rules}
    assert ("origin_cross", "mandatory") in kinds
    assert ("hatching", "enum") in kinds
    assert ("degree_days", "numeric") in kinds
    assert "origin_cross" in spec.type_fields and "origin_cross" in spec.mandatory
    # module cells validate through the standard sheet path
    sheet = spark.createDataFrame(
        [("E1", "AxB", "pre", "310"), ("E2", None, "mid", "warm")],
        "sample_name string, origin_cross string, hatching string, degree_days string",
    )
    import dataclasses

    spec = dataclasses.replace(spec, type_fields=spec.type_fields + ("sample_name",))
    from dcc_validate_metadata_spark.sources.sheet_ingest import validate_sheet

    got = {
        (r["name"], r["field"], r["severity"])
        for r in validate_sheet(sheet, spec, rs, name_field="sample_name").collect()
        if r["name"] in ("E1", "E2")
    }
    assert ("E2", "origin_cross", "error") in got      # mandatory missing
    assert ("E2", "hatching", "error") in got          # enum violation
    assert ("E2", "degree_days", "error") in got       # numeric violation
    assert not any(n == "E1" and s == "error" for n, f, s in got)


def test_ontology_ref_rules_execute_with_snapshots(spark):
    """X2 end-to-end from the compiled schema: dangling term, label
    precision, and graph_restriction (incl. include_self=false for sex)
    all run as broadcast joins when snapshots are supplied."""
    from dcc_validate_metadata_spark.sources.sheet_ingest import validate_sheet

    pato = spark.createDataFrame(
        [
            ("PATO:0000001", "quality", None),
            ("PATO:0000047", "biological sex", "PATO:0000001"),
            ("PATO:0000383", "female", "PATO:0000047"),
            ("PATO:0000384", "male", "PATO:0000047"),
            ("PATO:0000461", "normal", "PATO:0000001"),
        ],
        "term string, label string, parent_term string",
    )
    rs, spec = organism_ruleset()
    spec = dataclasses.replace(spec, type_fields=spec.type_fields + ("sample_name",))
    sheet = spark.createDataFrame(
        [
            # name, sex text, sex term
            ("OK", "female", "PATO:0000383"),
            ("DANGLING", "female", "PATO:9999999"),
            ("WRONG_TREE", "normal", "PATO:0000461"),
            ("SELF_ROOT", "biological sex", "PATO:0000047"),
            ("LABEL_OFF", "Female animal", "PATO:0000383"),
        ],
        "sample_name string, sex string, sex__term string",
    )
    viol = validate_sheet(
        sheet, spec, rs, name_field="sample_name", ontologies={"PATO": pato}
    )
    got = {
        (r["name"], r["severity"]): r["message"]
        for r in viol.collect()
        if r["field"] in ("sex", "sex__term")
    }
    assert got[("DANGLING", "error")] == (
        "Couldn't find term 'PATO:9999999' in ontology for field 'sex__term'"
    )
    assert got[("WRONG_TREE", "error")] == (
        "Provided term 'PATO:0000461' is not child of 'PATO:0000047'"
    )
    # include_self=false: the root itself is NOT a valid sex term
    assert got[("SELF_ROOT", "error")] == (
        "Provided term 'PATO:0000047' is not child of 'PATO:0000047'"
    )
    assert got[("LABEL_OFF", "warning")] == (
        "Provided value 'Female animal' doesn't precisely match 'female' "
        "for term 'PATO:0000383'"
    )
    assert ("OK", "error") not in got and ("OK", "warning") not in got


def test_experiments_realm_compiles(spark):
    """The compiler is realm-agnostic: ChIP-seq type + experiments core
    produce the same rule families (experiments_core $ref split out,
    assay_type text enum, date-unit ladders, numeric fragment sizes,
    EFO/SO ontology_ref rules)."""
    from dcc_validate_metadata_spark.rules.faang_schema import chipseq_ruleset

    rs, spec = chipseq_ruleset()
    kinds = {(r.field, r.kind) for r in rs.rules}
    assert ("project", "enum") in kinds                      # core value enum
    assert ("assay_type", "enum") in kinds                   # core text enum
    assert ("assay_type__term", "ontology_ref") in kinds     # EFO graph rule
    assert ("library_preparation_date", "date_unit") in kinds
    assert ("library_generation_max_fragment_size_range", "numeric") in kinds
    assert ("experiment_target__term", "ontology_ref") in kinds
    assert "experiments_core" not in {r.field for r in rs.rules}
    assert "project" in spec.core_fields
    assert "experiment_target" in spec.type_fields
    assert "chip_antibody_provider" in spec.mandatory

    # a ChIP-seq sheet validates end-to-end through the standard path
    import dataclasses

    from dcc_validate_metadata_spark.sources.sheet_ingest import validate_sheet

    sheet = spark.createDataFrame(
        [
            ("E1", "FAANG", "ChIP-seq", "H3K4me3", "Abcam", "ab8580",
             "L1", "600", "200", "2023-04-01", "YYYY-MM-DD"),
            ("E2", "WRONG", "Juggling", "H3K27ac", None, "ab4729",
             "L2", "wide", "100", "2023-13", "YYYY-MM"),
        ],
        "experiment_name string, project string, assay_type string, "
        "experiment_target string, chip_antibody_provider string, "
        "chip_antibody_catalog string, chip_antibody_lot string, "
        "library_generation_max_fragment_size_range string, "
        "library_generation_min_fragment_size_range string, "
        "library_preparation_date string, library_preparation_date__units string",
    )
    spec = dataclasses.replace(
        spec, type_fields=spec.type_fields + ("experiment_name",)
    )
    viol = {
        (r["name"], r["field"], r["severity"])
        for r in validate_sheet(
            sheet, spec, rs, name_field="experiment_name"
        ).collect()
        if r["name"] in ("E1", "E2")
    }
    assert ("E2", "project", "error") in viol                # enum
    assert ("E2", "assay_type", "error") in viol             # text enum
    assert ("E2", "chip_antibody_provider", "error") in viol  # mandatory
    assert (
        "E2",
        "library_generation_max_fragment_size_range",
        "error",
    ) in viol                                                 # numeric
    assert ("E2", "library_preparation_date", "error") in viol  # date_unit
    assert not any(n == "E1" and s == "error" for n, f, s in viol)
