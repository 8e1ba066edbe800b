"""REST-search builder and GraphQL join-tree compiler (SURVEY §3.2/3.3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dcc_validate_metadata_spark.queries.join_api import fetch_with_join
from dcc_validate_metadata_spark.queries.search_api import (
    es_like_search,
    terms_aggregations,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    names = ["customer", "orders", "lineitem", "events"]
    return {n: spark.read.parquet(f"{SF}/{n}.parquet") for n in names}


def test_search_filters_sort_paginate(tables):
    ev = tables["events"]
    out = es_like_search(
        ev,
        filters={"event_type": ["click", "view"]},
        sort="event_id:asc",
        from_=5,
        size=10,
        source=["event_id", "event_type"],
    ).collect()
    assert len(out) == 10
    assert all(r["event_type"] in ("click", "view") for r in out)
    ids = [r["event_id"] for r in out]
    assert ids == sorted(ids)
    # pagination: skipping 5 means the first five filtered ids are absent
    first_five = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .orderBy("event_id").limit(5).collect()
    )
    assert not {r["event_id"] for r in first_five} & set(ids)


def test_search_wildcard_and_text(tables):
    cust = tables["customer"]
    out = es_like_search(
        cust, wildcards={"c_name": "*0001*"}, size=50
    ).collect()
    assert len(out) > 0 and all("0001" in r["c_name"] for r in out)
    out2 = es_like_search(
        cust, search="BUILDING", search_fields=["c_mktsegment"], size=5
    ).collect()
    assert all(r["c_mktsegment"] == "BUILDING" for r in out2)


def test_search_rejects_unknown_field(tables):
    with pytest.raises(ValueError, match="unknown field"):
        es_like_search(tables["events"], filters={"nope": ["x"]})
    with pytest.raises(ValueError, match="bad sort direction"):
        es_like_search(tables["events"], sort="event_id:sideways")


def test_terms_aggregations_cap(tables):
    aggs = terms_aggregations(tables["events"], ["event_type"])
    rows = aggs["event_type"].collect()
    assert 0 < len(rows) <= 25
    assert rows[0]["cnt"] >= rows[-1]["cnt"]


CATALOG = {
    ("customer", "orders"): ("c_custkey", "o_custkey"),
    ("orders", "lineitem"): ("o_orderkey", "l_orderkey"),
}


def test_join_tree_two_levels(tables):
    spec = {
        "basic": {"c_mktsegment": ["BUILDING"]},
        "join": {"orders": {"join": {"lineitem": {}}}},
    }
    out = fetch_with_join(tables, "customer", spec, CATALOG)
    rows = out.limit(200).collect()
    assert all(r["c_mktsegment"] == "BUILDING" for r in rows)
    some_with_orders = [r for r in rows if r["orders"]]
    assert some_with_orders
    o = some_with_orders[0]["orders"][0]
    assert o["o_custkey"] == some_with_orders[0]["c_custkey"]
    # second level nests under each order struct
    assert "lineitem" in o.asDict()
    if o["lineitem"]:
        assert o["lineitem"][0]["l_orderkey"] == o["o_orderkey"]


def test_join_tree_depth_guard(tables):
    spec = {"join": {"orders": {"join": {"lineitem": {"join": {"lineitem": {}}}}}}}
    cat = dict(CATALOG)
    cat[("lineitem", "lineitem")] = ("l_orderkey", "l_orderkey")
    with pytest.raises(ValueError, match="MAX_FILTER_QUERY_DEPTH"):
        fetch_with_join(tables, "customer", spec, cat)


def test_join_tree_unknown_mapping(tables):
    with pytest.raises(ValueError, match="no join mapping"):
        fetch_with_join(tables, "customer", {"join": {"events": {}}}, CATALOG)


def test_join_tree_empty_child_counts_zero(spark):
    """size(NULL array) is -1 under legacy mode — the flattening must
    count customers with no orders as 0 (regression: review finding)."""
    from pyspark.sql import functions as F

    tables = {
        "customer": spark.createDataFrame(
            [(1, "BUILDING"), (2, "BUILDING")], "c_custkey long, c_mktsegment string"
        ),
        "orders": spark.createDataFrame(
            [(10, 1, 5.0)], "o_orderkey long, o_custkey long, o_totalprice double"
        ),
    }
    spec = {"basic": {"c_mktsegment": ["BUILDING"]}, "join": {"orders": {}}}
    catalog = {("customer", "orders"): ("c_custkey", "o_custkey")}
    out = fetch_with_join(tables, "customer", spec, catalog)
    flat = out.select(
        "c_custkey",
        F.when(F.col("orders").isNull(), F.lit(0))
        .otherwise(F.size("orders"))
        .alias("n_orders"),
    )
    got = {r["c_custkey"]: r["n_orders"] for r in flat.collect()}
    assert got == {1: 1, 2: 0}


def test_search_sort_field_named_desc(spark):
    """A column literally named '*_desc' must not flip pagination order
    (regression: review finding)."""
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "flag_desc int, v string"
    )
    out = es_like_search(df, sort="flag_desc", from_=5, size=5).collect()
    assert [r["flag_desc"] for r in out] == [5, 6, 7, 8, 9]  # ascending page
