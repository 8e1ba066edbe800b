"""CSV / fixed-width export sinks (S7): dotted paths, array joins,
derived counts, aligned text output."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from dcc_validate_metadata_spark.sources.export import (
    export_projection,
    write_csv_export,
    write_fixed_width,
)


def _nested_df(spark):
    df = spark.createDataFrame(
        [
            (1, ("Bos taurus", ["a.fq", "b.fq"])),
            (2, ("Sus scrofa", [])),
            (3, ("Equus", None)),
        ],
        "id int, src struct<organism:string, files:array<string>>",
    )
    return df


SPEC = {
    "ID": "id",
    "Organism": "src.organism",
    "Files": "join:src.files",
    "File count": "count:src.files",
}


def test_export_projection_paths(spark):
    rows = {r["ID"]: r for r in export_projection(_nested_df(spark), SPEC).collect()}
    assert rows[1]["Organism"] == "Bos taurus"
    assert rows[1]["Files"] == "a.fq, b.fq"
    assert rows[1]["File count"] == 2
    assert rows[2]["Files"] == "" and rows[2]["File count"] == 0
    assert rows[3]["File count"] == 0


def test_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "csvout")
    write_csv_export(_nested_df(spark), SPEC, out, coalesce=1)
    back = spark.read.option("header", True).csv(out)
    assert sorted(back.columns) == sorted(SPEC.keys())
    assert back.count() == 3
    r = back.filter(F.col("ID") == "1").first()
    assert r["Files"] == "a.fq, b.fq"


def test_fixed_width_alignment(spark, tmp_path):
    out = tmp_path / "fwout"
    write_fixed_width(_nested_df(spark), SPEC, str(out), coalesce=1)
    files = sorted(out.glob("part-*"))
    text = "".join(p.read_text() for p in files).splitlines()
    header, rule = text[0], text[1]
    assert header.split(" | ")[0].strip() == "ID"
    assert set(rule) == {"-"}
    body = [ln for ln in text[2:] if ln.strip()]
    assert len(body) == 3
    # every line shares the header's separator positions
    sep_positions = [i for i, ch in enumerate(header) if header[i : i + 3] == " | "]
    for ln in body:
        for p in sep_positions:
            assert ln[p : p + 3] == " | "
