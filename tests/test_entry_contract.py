"""Driver-contract insurance: __spark_entry__ must expose every query
deterministically from a clean interpreter (the round-1 driver snapshot
missed 15 registered queries; this pins the contract shape so a
regression fails CI, not the driver gate)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

EXPECTED_QUERY_COUNT = 50  # whole pack fits the driver window since r4
NO_ORACLE = set()  # every registered query has a DuckDB oracle since r4


def test_entry_contract_clean_subprocess():
    """Import the entry module the way the driver does — fresh process,
    repo on sys.path, no pytest fixtures — and check the contract."""
    code = """
import json, sys
sys.path.insert(0, %r)
import __spark_entry__ as e
q = e.queries()
o = e.oracle_sql()
print(json.dumps({
    "n_queries": len(q),
    "n_oracles": len(o),
    "no_oracle": sorted(set(q) - set(o)),
    "extra_oracle": sorted(set(o) - set(q)),
    "all_callable": all(callable(f) for f in q.values()),
    "all_sql_str": all(isinstance(s, str) and s.strip() for s in o.values()),
}))
""" % str(REPO)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["n_queries"] == EXPECTED_QUERY_COUNT
    assert got["no_oracle"] == sorted(NO_ORACLE)
    assert got["extra_oracle"] == []
    assert got["all_callable"] and got["all_sql_str"]


def test_registration_is_deterministic():
    from dcc_validate_metadata_spark.queries import all_queries

    names1 = list(all_queries())
    names2 = list(all_queries())
    assert names1 == names2
    assert len(names1) == EXPECTED_QUERY_COUNT


def test_driver_window_covers_must_prove():
    """The driver's CORRECTNESS file records only the first ~50 queries()
    entries; assert the flagship/must-prove queries all land inside that
    window so a future reorder can't silently drop their driver rows
    (round 2 lost ann_ivf_fullprobe's row this way)."""
    from dcc_validate_metadata_spark.queries import (
        DRIVER_WINDOW,
        MUST_PROVE,
        all_queries,
    )

    window = list(all_queries())[:DRIVER_WINDOW]
    missing = [n for n in MUST_PROVE if n not in window]
    assert not missing, f"must-prove queries outside driver window: {missing}"
    # r4 invariant: the ENTIRE pack fits the window and MUST_PROVE names
    # every query — no operator's proof can rotate out between rounds
    assert len(all_queries()) <= DRIVER_WINDOW
    assert set(MUST_PROVE) == set(all_queries())


def test_pytest_pack_disjoint_and_oracled():
    """The demoted per-op queries keep full (fn, sql) oracle pairs and
    never shadow a driver-pack name."""
    from dcc_validate_metadata_spark.queries import (
        all_queries,
        pytest_pack_queries,
    )

    pp = pytest_pack_queries()
    assert len(pp) >= 40
    assert not (set(pp) & set(all_queries()))
    assert all(callable(fn) and isinstance(sql, str) and sql.strip()
               for fn, sql in pp.values())


def test_fixture_rebuilds_after_tmp_wipe(tmp_path, monkeypatch):
    """ensure_fixture survives a wiped /tmp (the driver may run on a
    fresh machine) and is atomic: the final dir carries the marker."""
    import dcc_validate_metadata_spark.queries.validationpack as vp

    target = tmp_path / "fixdir"
    monkeypatch.setattr(vp, "FIX_DIR", target)
    out = vp.ensure_fixture()
    assert (out / ".done_all").exists()
    assert (out / "samples_organism.parquet").exists()
    assert (out / "gql_dataset.parquet").exists()
    assert (out / "taxon_snapshot.parquet").exists()
    # second call is a no-op (marker short-circuit)
    assert vp.ensure_fixture() == target
