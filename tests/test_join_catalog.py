"""J4 join-key catalog: the shipped 35-pair index_mapping plus dotted /
multi-valued FK resolution (grapheneObjects/constants.py:14-181,
helpers.py:126-137 retrieve_mapping_keys semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dcc_validate_metadata_spark.queries.join_api import (
    INDEX_MAPPING,
    fetch_with_join,
    resolve_key,
)


def test_catalog_is_complete():
    # all 10 indices, 38 directed pairs, verbatim key specs
    assert len(INDEX_MAPPING) == 38
    assert INDEX_MAPPING[("dataset", "file")] == ("file.name", "name")
    assert INDEX_MAPPING[("article", "dataset")] == (
        "relatedDatasets.accession",
        "accession",
    )
    assert INDEX_MAPPING[("organism", "protocol_samples")] == (
        "biosampleId",
        "specimens.derivedFrom",
    )
    names = {n for pair in INDEX_MAPPING for n in pair}
    assert names == {
        "analysis", "experiment", "specimen", "organism", "article",
        "dataset", "file", "protocol_analysis", "protocol_files",
        "protocol_samples",
    }


@pytest.fixture(scope="module")
def gql_tables(spark):
    from dcc_validate_metadata_spark.queries.validationpack import (
        _GQL_ART,
        _GQL_DS,
        _GQL_FILE,
        ensure_fixture,
    )

    ensure_fixture()
    return {
        "dataset": spark.read.parquet(_GQL_DS),
        "file": spark.read.parquet(_GQL_FILE),
        "article": spark.read.parquet(_GQL_ART),
    }


def test_resolve_key_shapes(gql_tables):
    _, multi = resolve_key(gql_tables["dataset"], "file.name")
    assert multi  # dotted path through array<struct>
    _, multi = resolve_key(gql_tables["file"], "experiment.accession")
    assert not multi  # dotted path through plain struct
    _, multi = resolve_key(gql_tables["dataset"], "accession")
    assert not multi
    with pytest.raises(ValueError, match="unknown join key"):
        resolve_key(gql_tables["dataset"], "file.nope")


def test_dotted_multivalued_left_key(gql_tables):
    """(dataset, file): every name inside dataset.file[] matches a file
    row; datasets with empty lists keep a NULL nest."""
    out = fetch_with_join(gql_tables, "dataset", {"join": {"file": {}}})
    rows = {r["accession"]: r["file_joined"] for r in out.collect()}
    assert rows["DS000"] is None  # 0 files (i % 4 == 0, no shared)
    assert {f["name"] for f in rows["DS003"]} == {
        "f_3_0.bam", "f_3_1.bam", "f_3_2.bam",
    }
    # DS005: one regular file (5 % 4 == 1) + shared_2.bam
    assert {f["name"] for f in rows["DS005"]} == {"f_5_0.bam", "shared_2.bam"}


def test_dotted_multivalued_right_key(gql_tables):
    """(article, dataset) reversed as (dataset, article): an article's
    relatedDatasets[] fan the article onto every referenced dataset."""
    out = fetch_with_join(gql_tables, "dataset", {"join": {"article": {}}})
    rows = {r["accession"]: r["article"] for r in out.collect()}
    # article A01 relates DS003, DS004 (a=1: rel = DS[(3+d)%40], d in 0..1)
    assert "A01" in {a["_id"] for a in rows["DS003"] or []}
    assert "A01" in {a["_id"] for a in rows["DS004"] or []}


def test_article_side_uses_its_own_multivalued_left_key(gql_tables):
    out = fetch_with_join(
        gql_tables,
        "article",
        {"basic": {"_id": ["A02"]}, "join": {"dataset": {}}},
    )
    row = out.collect()[0]
    # A02 relates DS006, DS007, DS008 (a=2: d in 0..2)
    assert {d["accession"] for d in row["dataset"]} == {"DS006", "DS007", "DS008"}


def test_unknown_pair_raises(gql_tables):
    with pytest.raises(ValueError, match="no join mapping"):
        fetch_with_join(gql_tables, "dataset", {"join": {"protocol_files": {}}})


def test_array_of_array_key_flattens(spark):
    """protocol_samples-shaped key: 'specimens.derivedFrom' where
    specimens is array<struct> and derivedFrom is itself array<string>
    resolves to array<array<string>> — must flatten to scalar keys."""
    ps = spark.createDataFrame(
        [
            ("P1", [{"id": "s1", "derivedFrom": ["o1", "o2"]},
                    {"id": "s2", "derivedFrom": ["o3"]}]),
            ("P2", [{"id": "s3", "derivedFrom": []}]),
        ],
        "key string, specimens array<struct<id string, derivedFrom array<string>>>",
    )
    org = spark.createDataFrame(
        [("o1", "pig"), ("o2", "cow"), ("o9", "hen")],
        "biosampleId string, species string",
    )
    out = fetch_with_join(
        {"protocol_samples": ps, "organism": org},
        "protocol_samples",
        {"join": {"organism": {}}},
    )
    rows = {r["key"]: r["organism"] for r in out.collect()}
    assert {o["biosampleId"] for o in rows["P1"]} == {"o1", "o2"}
    assert rows["P2"] is None
