"""Submission-document sinks: BioSamples JSON (S8) and ENA sample XML
(S9) payload generation as whole-column expressions.

Reference analogues: ``submission/BiosamplesFileConverter.py:14-255``
walks validated records row-by-row building BioSamples submission
payloads (name / release / taxId from the taxon lookup / characteristics
/ relationships) which ``BiosamplesSubmission.py`` then POSTs;
``submission/FileConverter.py`` and friends emit ENA submission XML via
lxml. The HTTP submission step stays out of the engine (X3: no executor
RPC); the DOCUMENT GENERATION is in scope and is a natural Spark
projection — one JVM-side ``concat`` per record, no UDF, no driver loop,
so payloads materialize at scan speed and any sink (file, queue,
foreachPartition POST) can consume the result.

Both builders emit the document text deterministically (fixed key order,
explicit escaping) so goldens and the DuckDB oracle can reproduce the
exact bytes with plain string concatenation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OBO_PURL = "http://purl.obolibrary.org/obo/NCBITaxon_"


def json_escape(c: Column) -> Column:
    """Minimal JSON string escaping (backslash first, then quote) —
    matches the oracle's replace() chain byte-for-byte."""
    # replacement strings are Java-regex replacements: a literal backslash
    # in the OUTPUT needs \\ at the Java level
    return F.regexp_replace(
        F.regexp_replace(c.cast("string"), r"\\", r"\\\\"), '"', r'\\"'
    )


def xml_escape(c: Column) -> Column:
    """XML text escaping: & first, then angle brackets."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c.cast("string"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )


def xml_escape_attr(c: Column) -> Column:
    """Attribute-context escaping: text escaping PLUS the double quote,
    since the value is emitted inside ``name="..."`` delimiters."""
    return F.regexp_replace(xml_escape(c), '"', "&quot;")


def biosamples_payloads(
    df: DataFrame,
    taxon: DataFrame,
    release: str,
    name_col: str = "name",
    organism_col: str = "organism",
    relationships: DataFrame | None = None,
) -> DataFrame:
    """(name, payload) — one BioSamples submission JSON document per
    record whose organism resolves in the taxon snapshot (unresolved
    records are the :func:`~..operators.referential.taxon_violations`
    path, mirroring the converter's skip-and-report behavior).

    ``relationships`` (optional) is an edge frame ``(name, parent)``;
    edges become ``derived from`` relationship entries like
    BiosamplesFileConverter's relationship section."""
    from ..operators.referential import enrich_taxon

    enriched = enrich_taxon(df, taxon, organism_col=organism_col).filter(
        F.col("taxon_id").isNotNull()
    )
    rel_part = F.lit("")
    if relationships is not None:
        rel = relationships.filter(F.col("parent").isNotNull()).groupBy(
            F.col("name").alias("_rel_name")
        ).agg(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.concat(
                            F.lit('{"source":"'),
                            json_escape(F.col("name")),
                            F.lit('","target":"'),
                            json_escape(F.col("parent")),
                            F.lit('","type":"derived from"}'),
                        )
                    )
                ),
            ).alias("_rels")
        )
        enriched = enriched.join(
            F.broadcast(rel),
            on=F.col(name_col) == F.col("_rel_name"),
            how="left",
        ).drop("_rel_name")
        rel_part = F.concat(
            F.lit(',"relationships":['), F.coalesce(F.col("_rels"), F.lit("")), F.lit("]")
        )
    payload = F.concat(
        F.lit('{"name":"'),
        json_escape(F.col(name_col)),
        F.lit('","release":"'),
        F.lit(release),
        F.lit('","taxId":'),
        F.col("taxon_id").cast("string"),
        F.lit(',"characteristics":{"organism":[{"text":"'),
        json_escape(F.col("scientific_name")),
        F.lit('","ontologyTerms":["' + OBO_PURL),
        F.col("taxon_id").cast("string"),
        F.lit('"]}]}'),
        rel_part,
        F.lit("}"),
    )
    return enriched.select(F.col(name_col).alias("name"), payload.alias("payload"))


def ena_sample_xml(
    df: DataFrame,
    taxon: DataFrame,
    center_name: str = "FAANG",
    name_col: str = "name",
    organism_col: str = "organism",
    attribute_cols: list[str] | None = None,
) -> DataFrame:
    """(name, xml) — one ENA ``<SAMPLE>`` element per taxon-resolved
    record (FileConverter's sample document shape: alias/TITLE,
    SAMPLE_NAME with TAXON_ID + SCIENTIFIC_NAME, then one
    SAMPLE_ATTRIBUTE per exported column)."""
    from ..operators.referential import enrich_taxon

    enriched = enrich_taxon(df, taxon, organism_col=organism_col).filter(
        F.col("taxon_id").isNotNull()
    )
    attrs = []
    for col in attribute_cols or [organism_col]:
        attrs.append(
            F.when(
                F.col(col).isNotNull(),
                F.concat(
                    F.lit(f"<SAMPLE_ATTRIBUTE><TAG>{col}</TAG><VALUE>"),
                    xml_escape(F.col(col)),
                    F.lit("</VALUE></SAMPLE_ATTRIBUTE>"),
                ),
            ).otherwise(F.lit(""))
        )
    xml = F.concat(
        F.lit('<SAMPLE alias="'),
        xml_escape_attr(F.col(name_col)),
        F.lit(f'" center_name="{center_name}"><TITLE>'),
        xml_escape(F.col(name_col)),
        F.lit("</TITLE><SAMPLE_NAME><TAXON_ID>"),
        F.col("taxon_id").cast("string"),
        F.lit("</TAXON_ID><SCIENTIFIC_NAME>"),
        xml_escape(F.col("scientific_name")),
        F.lit("</SCIENTIFIC_NAME></SAMPLE_NAME><SAMPLE_ATTRIBUTES>"),
        *attrs,
        F.lit("</SAMPLE_ATTRIBUTES></SAMPLE>"),
    )
    return enriched.select(F.col(name_col).alias("name"), xml.alias("xml"))
