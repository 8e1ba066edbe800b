"""Oracle gate for the demoted per-op queries (PYTEST_QUERIES): the r4
driver window carries their fused composites; the originals stay
hash-checked here at sf0.001 with the exact comparison semantics of
scripts/check_oracle.py (rowcount + sorted column names + order-
insensitive value hash vs DuckDB)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from check_oracle import TABLES, value_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield c
    c.close()


def _pack():
    from dcc_validate_metadata_spark.queries import pytest_pack_queries

    return sorted(pytest_pack_queries().items())


@pytest.mark.parametrize("name,entry", _pack(), ids=[n for n, _ in _pack()])
def test_pytest_pack_query_matches_oracle(spark, con, name, entry):
    fn, sql = entry
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} != {len(d_rows)}"
    assert sorted(s_cols) == sorted(d_cols), f"{name}: cols {s_cols} vs {d_cols}"
    assert value_hash(s_rows, s_cols) == value_hash(d_rows, d_cols), (
        f"{name}: value hash mismatch over {len(s_rows)} rows"
    )


def test_composites_reuse_member_queries():
    """The composite functions must call the SAME per-op functions the
    pytest pack certifies — not re-implementations that could drift."""
    import inspect

    from dcc_validate_metadata_spark.queries import relational as R

    members = {
        "rel_filters": ["p1_structure_projection", "p3_terms_filter",
                        "p4_negated_filter", "p5_array_predicate",
                        "p6_wildcard_like", "p7_multimatch", "p9_id_lookup",
                        "p10_safe_name", "p11_record_name"],
        "rel_joins": ["j1_join_agg", "j2_semi_join", "j3_multiway_join",
                      "j5_anti_join", "j6_broadcast_lookup", "j9_self_join",
                      "j11_derived_backlink", "g1_joined_fetch"],
        "rel_aggs": ["a1_terms_top", "a2_json_agg", "a3_null_counts",
                     "a4_hit_count", "a5_verdict_rollup", "a6_distinct_sets",
                     "a7_column_stats", "q1_pricing_summary"],
        "rel_sorts": ["o1_sort_topk", "o2_sort_by_len", "o3_window_topn",
                      "w1_running_sum", "u1_union_fanout", "u2_distinct_pairs",
                      "s1_search_api", "s2_terms_aggs"],
        "rel_scalars": ["f1_snake_case", "f2_case_transforms", "f3_date_agg",
                        "f4_leading_zero", "f5_lower_label_match",
                        "f8_nested_flatten", "f10_array_join", "f11_checksum",
                        "f12_json_struct"],
    }
    for comp, ops in members.items():
        src = inspect.getsource(getattr(R, comp))
        for op in ops:
            assert f"{op}(" in src, f"{comp} no longer calls {op}"
