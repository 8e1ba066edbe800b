"""End-to-end CLI flow for the experiments realm: one `validate-workbook
--realm experiments` invocation takes a planted-violation ChIP-seq .xlsx
through the vendored ruleset + ontology snapshots to violations parquet
and a colour-coded annotated workbook (VERDICT r2 item 6 — the
reference's template-upload flow for ALLOWED_EXPERIMENTS_TYPES)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]

HEADERS = [
    "sample_descriptor",
    "project",
    "assay_type",
    "assay_type__term",
    "experiment_target",
    "experiment_target__term",
    "chip_antibody_provider",
    "chip_antibody_catalog",
    "chip_antibody_lot",
    "library_generation_max_fragment_size_range",
    "library_generation_min_fragment_size_range",
]


def _workbook_rows() -> list[list]:
    clean = [
        "SAMEA001", "FAANG", "ChIP-seq", "EFO:0002692",
        "H3K4me3", "SO:0001706", "Abcam", "ab8580", "lot1", "300", "100",
    ]
    bad_enum_and_subtree = [
        # project outside the enum; assay term known to EFO but OUTSIDE
        # the EFO:0002773 subtree → graph-restriction error
        "SAMEA002", "NOTFAANG", "ChIP-seq", "EFO:0000001",
        "H3K4me3", "SO:0001706", "Abcam", "ab8580", "lot2", "300", "100",
    ]
    missing_and_label = [
        # chip_antibody_provider mandatory-missing; experiment_target text
        # disagrees with the SO label → precision warning
        "SAMEA003", "FAANG", "ChIP-seq", "EFO:0002692",
        "histone mark", "SO:0001706", None, "ab8580", "lot3", "300", "100",
    ]
    return [HEADERS, clean, bad_enum_and_subtree, missing_and_label]


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    from dcc_validate_metadata_spark.sources.xlsx import write_workbook

    tmp = tmp_path_factory.mktemp("cli_exp")
    wb = tmp / "chipseq.xlsx"
    write_workbook(wb, {"chip-seq": _workbook_rows()})
    pd.DataFrame(
        [
            ("EFO:0002773", "assay by high throughput sequencer", None),
            ("EFO:0002692", "ChIP-seq", "EFO:0002773"),
            ("EFO:0000001", "experimental factor", None),
        ],
        columns=["term", "label", "parent_term"],
    ).to_parquet(tmp / "efo.parquet", index=False)
    pd.DataFrame(
        [
            ("SO:0001700", "histone_modification", None),
            ("SO:0001706", "H3K4me3", "SO:0001700"),
            ("GO:0006306", "DNA methylation", None),
        ],
        columns=["term", "label", "parent_term"],
    ).to_parquet(tmp / "so.parquet", index=False)
    out = tmp / "run"
    proc = subprocess.run(
        [
            sys.executable, "-m", "dcc_validate_metadata_spark",
            "--master", "local[2]",
            "validate-workbook",
            "--input", str(wb),
            "--out", str(out),
            "--realm", "experiments",
            "--ontology", f"EFO={tmp / 'efo.parquet'}",
            "--ontology", f"SO={tmp / 'so.parquet'}",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    return proc, out, wb


def test_cli_exit_and_status(cli_run):
    proc, out, _ = cli_run
    assert proc.returncode == 2, proc.stderr[-3000:]
    payload = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert payload["status"] == "Fix issues"
    assert payload["n_errors"] >= 3
    assert payload["n_warnings"] >= 1


def test_cli_violation_rows(cli_run):
    _, out, _ = cli_run
    viol = pd.read_parquet(out / "violations")
    msgs = {
        (r["name"], r["field"], r["severity"]): r["message"]
        for r in viol.to_dict("records")
    }
    assert any(
        n == "SAMEA002" and f == "project" and "NOTFAANG" in m
        for (n, f, s), m in msgs.items()
    )
    assert any(
        n == "SAMEA002"
        and f == "assay_type__term"
        and "not child of" in m
        and "EFO:0002773" in m
        for (n, f, s), m in msgs.items()
    )
    assert any(
        n == "SAMEA003" and f == "chip_antibody_provider" and "mandatory" in m
        for (n, f, s), m in msgs.items()
    )
    assert any(
        n == "SAMEA003"
        and f == "experiment_target"
        and s == "warning"
        and "doesn't precisely match 'H3K4me3'" in m
        for (n, f, s), m in msgs.items()
    )
    # the clean row stays clean
    assert not any(n == "SAMEA001" for (n, f, s) in msgs)


def test_cli_annotated_workbook(cli_run):
    from dcc_validate_metadata_spark.sources.xlsx import (
        STYLE_ERROR,
        read_cell_styles,
        read_workbook,
    )

    _, out, _ = cli_run
    annotated = read_workbook(out / "annotated.xlsx")["chip-seq"]
    assert annotated[0][-1] == "issues"
    # row 2 (SAMEA002) carries its enum error in the issues column
    assert "NOTFAANG" in (annotated[2][-1] or "")
    styles = read_cell_styles(out / "annotated.xlsx", "chip-seq")
    assert styles[(2, HEADERS.index("project"))] == STYLE_ERROR
