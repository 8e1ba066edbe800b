"""Plan-regression gate (VERDICT r4 #8): the physical-plan invariants
`scripts/explain_plans.py` audits — bytes read by at most the decode
scans, Python stages only in whitelisted Arrow queries, no
CartesianProduct anywhere, exactly one bytes-reading scan in the fused
pipeline — used to live only in PLANS.md, so a regression (e.g. a second
`bytes` scan sneaking back into build_violations) surfaced at judging
time instead of failing CI. This test runs the same audit over every
driver-pack query at sf0.001 and fails on any problem line."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from conftest import SF_DIR  # noqa: E402


def test_plan_invariants_hold(spark):
    import explain_plans

    # WholeStageCodegen stars and join strategies are only stable pre-AQE;
    # AQE is a runtime conf, so flip it for the audit and restore after
    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rows, problems, note = explain_plans.audit_all(spark, SF_DIR)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)
    assert len(rows) >= 50, f"audited only {len(rows)} plans"
    assert not problems, "plan invariants broken:\n" + "\n".join(problems)
