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

Input contract: these are POST-VALIDATION sinks — mandatory scalar
columns (aliases, titles, refs, platform, analysis arrays) are expected
non-null because the rule layer rejects such rows first; a null there
null-propagates that one document through ``concat`` (it does NOT crash
the job). Data-dependent optionality is handled explicitly: optional
elements/attributes are guarded with ``F.when(isNotNull…)``, an
unparseable run_date omits the attribute, and PAIRED layouts without a
nominal length emit ``<PAIRED/>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OBO_PURL = "http://purl.obolibrary.org/obo/NCBITaxon_"


def json_escape(c: Column) -> Column:
    """JSON string escaping (backslash first, then quote and the common
    C0 controls) — matches the oracle's replace() chain byte-for-byte.
    Remaining sub-0x20 controls are not expected in record names (the
    reference's json.dumps would encode them; sheet ingest strips them),
    but the frequent ones — newline/CR/tab/backspace/formfeed — must not
    produce invalid payloads."""
    out = c.cast("string")
    for search, repl in (
        ("\\", "\\\\"),
        ('"', '\\"'),
        ("\n", "\\n"),
        ("\r", "\\r"),
        ("\t", "\\t"),
        ("\b", "\\b"),
        ("\f", "\\f"),
    ):
        out = F.replace(out, F.lit(search), F.lit(repl))
    return out


def json_escape_sql(expr: str) -> str:
    """DuckDB expression mirroring :func:`json_escape` exactly (same
    replace chain, same order) so oracles reproduce payload bytes."""
    out = expr
    for search, repl in (
        ("chr(92)", "chr(92) || chr(92)"),
        ("chr(34)", "chr(92) || chr(34)"),
        ("chr(10)", "chr(92) || 'n'"),
        ("chr(13)", "chr(92) || 'r'"),
        ("chr(9)", "chr(92) || 't'"),
        ("chr(8)", "chr(92) || 'b'"),
        ("chr(12)", "chr(92) || 'f'"),
    ):
        out = f"replace({out}, {search}, {repl})"
    return out


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


def xml_escape_sql(expr: str, attr: bool = False) -> str:
    """DuckDB expression mirroring :func:`xml_escape` /
    :func:`xml_escape_attr` byte-for-byte."""
    out = f"replace(replace(replace({expr}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    if attr:
        out = f"replace({out}, chr(34), '&quot;')"
    return out


def _opt_elt(col: str, open_tag: str, close_tag: str) -> Column:
    """Element emitted only when the column is non-null (reference's
    check_field_existence + conditional SubElement pattern)."""
    return F.when(
        F.col(col).isNotNull(),
        F.concat(F.lit(open_tag), xml_escape(F.col(col)), F.lit(close_tag)),
    ).otherwise(F.lit(""))


def ena_experiment_xml(
    df: DataFrame, attribute_cols: list[str] | None = None
) -> DataFrame:
    """(alias, xml) — one ENA ``<EXPERIMENT>`` document per record.

    Element sequence mirrors the reference's experiment converter
    (``submission/ExperimentsFileConverter.py`` ``generate_experiment_xml``
    — bytecode-inspected tag order): EXPERIMENT[alias] → TITLE →
    STUDY_REF[refname] → DESIGN(DESIGN_DESCRIPTION, SAMPLE_DESCRIPTOR
    [refname], LIBRARY_DESCRIPTOR(LIBRARY_NAME, LIBRARY_STRATEGY,
    LIBRARY_SOURCE, LIBRARY_SELECTION, LIBRARY_LAYOUT(SINGLE |
    PAIRED[NOMINAL_LENGTH]), LIBRARY_CONSTRUCTION_PROTOCOL)) →
    PLATFORM({platform}(INSTRUMENT_MODEL)) → EXPERIMENT_ATTRIBUTES
    (EXPERIMENT_ATTRIBUTE(TAG, VALUE) per non-null ``attribute_cols``
    entry — the converter's FAANG-experiment-record attribute section).
    Whole-column concat; no UDF.
    """
    layout = (
        F.when(
            (F.col("library_layout") == "PAIRED")
            & F.col("nominal_length").isNotNull(),
            F.concat(
                F.lit('<LIBRARY_LAYOUT><PAIRED NOMINAL_LENGTH="'),
                F.col("nominal_length").cast("bigint").cast("string"),
                F.lit('"/></LIBRARY_LAYOUT>'),
            ),
        )
        # PAIRED with no nominal length: attribute omitted (the
        # reference's check_field_existence guard), never a NULL that
        # would null-propagate through the whole document concat
        .when(
            F.col("library_layout") == "PAIRED",
            F.lit("<LIBRARY_LAYOUT><PAIRED/></LIBRARY_LAYOUT>"),
        )
        .otherwise(F.lit("<LIBRARY_LAYOUT><SINGLE/></LIBRARY_LAYOUT>"))
    )
    xml = F.concat(
        F.lit('<EXPERIMENT alias="'),
        xml_escape_attr(F.col("experiment_alias")),
        F.lit('"><TITLE>'),
        xml_escape(F.col("title")),
        F.lit('</TITLE><STUDY_REF refname="'),
        xml_escape_attr(F.col("study_ref")),
        F.lit('"/><DESIGN><DESIGN_DESCRIPTION>'),
        xml_escape(F.col("design_description")),
        F.lit('</DESIGN_DESCRIPTION><SAMPLE_DESCRIPTOR refname="'),
        xml_escape_attr(F.col("sample_descriptor")),
        F.lit('"/><LIBRARY_DESCRIPTOR>'),
        _opt_elt("library_name", "<LIBRARY_NAME>", "</LIBRARY_NAME>"),
        F.lit("<LIBRARY_STRATEGY>"),
        xml_escape(F.col("library_strategy")),
        F.lit("</LIBRARY_STRATEGY><LIBRARY_SOURCE>"),
        xml_escape(F.col("library_source")),
        F.lit("</LIBRARY_SOURCE><LIBRARY_SELECTION>"),
        xml_escape(F.col("library_selection")),
        F.lit("</LIBRARY_SELECTION>"),
        layout,
        _opt_elt(
            "library_construction_protocol",
            "<LIBRARY_CONSTRUCTION_PROTOCOL>",
            "</LIBRARY_CONSTRUCTION_PROTOCOL>",
        ),
        F.lit("</LIBRARY_DESCRIPTOR></DESIGN><PLATFORM><"),
        F.col("platform"),
        F.lit("><INSTRUMENT_MODEL>"),
        xml_escape(F.col("instrument_model")),
        F.lit("</INSTRUMENT_MODEL></"),
        F.col("platform"),
        F.lit("></PLATFORM>"),
        *(
            [
                F.lit("<EXPERIMENT_ATTRIBUTES>"),
                *[
                    F.when(
                        F.col(c).isNotNull(),
                        F.concat(
                            F.lit(f"<EXPERIMENT_ATTRIBUTE><TAG>{c}</TAG><VALUE>"),
                            xml_escape(F.col(c)),
                            F.lit("</VALUE></EXPERIMENT_ATTRIBUTE>"),
                        ),
                    ).otherwise(F.lit(""))
                    for c in attribute_cols
                ],
                F.lit("</EXPERIMENT_ATTRIBUTES>"),
            ]
            if attribute_cols
            else []
        ),
        F.lit("</EXPERIMENT>"),
    )
    return df.select(F.col("experiment_alias").alias("alias"), xml.alias("xml"))


def _iso_run_date(c: Column) -> Column:
    """Reference parses run_date as %Y-%m-%d, falling back to %Y-%m, then
    emits ``datetime.isoformat()`` (``ExperimentsFileConverter.py``
    ``generate_run_xml``) — i.e. midnight-stamped ISO."""
    ts = F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("yyyy-MM")),
    )
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")


def _file_elt(fn: str, ft: str, cm: str, ck: str) -> Column:
    return F.concat(
        F.lit('<FILE filename="'),
        xml_escape_attr(F.col(fn)),
        F.lit('" filetype="'),
        xml_escape_attr(F.col(ft)),
        F.lit('" checksum_method="'),
        xml_escape_attr(F.col(cm)),
        F.lit('" checksum="'),
        xml_escape_attr(F.col(ck)),
        F.lit('"/>'),
    )


def ena_run_xml(df: DataFrame) -> DataFrame:
    """(alias, xml) — one ENA ``<RUN>`` document per record: RUN[alias,
    run_center?, run_date→isoformat] → EXPERIMENT_REF[refname] →
    DATA_BLOCK(FILES(FILE[filename, filetype, checksum_method, checksum]
    ×1-2)) — the ``*_pair`` columns emit the second FILE for paired
    layouts, mirroring the reference's paired branch."""
    center = F.when(
        F.col("run_center").isNotNull(),
        F.concat(
            F.lit(' run_center="'), xml_escape_attr(F.col("run_center")), F.lit('"')
        ),
    ).otherwise(F.lit(""))
    # the attribute is emitted only when the strptime ladder PARSES the
    # value — an unparseable run_date (e.g. '2024/01/01') omits the
    # attribute instead of null-propagating the entire <RUN> document
    # through concat (upstream date rules flag the bad value; the sink
    # must stay total)
    parsed_date = _iso_run_date(F.col("run_date"))
    date = F.when(
        F.col("run_date").isNotNull() & parsed_date.isNotNull(),
        F.concat(F.lit(' run_date="'), parsed_date, F.lit('"')),
    ).otherwise(F.lit(""))
    pair = F.when(
        F.col("filename_pair").isNotNull(),
        _file_elt("filename_pair", "filetype_pair", "checksum_method_pair", "checksum_pair"),
    ).otherwise(F.lit(""))
    xml = F.concat(
        F.lit('<RUN alias="'),
        xml_escape_attr(F.col("run_alias")),
        F.lit('"'),
        center,
        date,
        F.lit('><EXPERIMENT_REF refname="'),
        xml_escape_attr(F.col("experiment_ref")),
        F.lit('"/><DATA_BLOCK><FILES>'),
        _file_elt("filename", "filetype", "checksum_method", "checksum"),
        pair,
        F.lit("</FILES></DATA_BLOCK></RUN>"),
    )
    return df.select(F.col("run_alias").alias("alias"), xml.alias("xml"))


def ena_study_xml(df: DataFrame) -> DataFrame:
    """(alias, xml) — one ENA ``<STUDY>`` document per record: STUDY
    [alias] → DESCRIPTOR(STUDY_TITLE, STUDY_TYPE[existing_study_type],
    STUDY_ABSTRACT?) per the reference's ``generate_study_xml``."""
    xml = F.concat(
        F.lit('<STUDY alias="'),
        xml_escape_attr(F.col("study_alias")),
        F.lit('"><DESCRIPTOR><STUDY_TITLE>'),
        xml_escape(F.col("study_title")),
        F.lit('</STUDY_TITLE><STUDY_TYPE existing_study_type="'),
        xml_escape_attr(F.col("study_type")),
        F.lit('"/>'),
        _opt_elt("study_abstract", "<STUDY_ABSTRACT>", "</STUDY_ABSTRACT>"),
        F.lit("</DESCRIPTOR></STUDY>"),
    )
    return df.select(F.col("study_alias").alias("alias"), xml.alias("xml"))


def ena_submission_xml(df: DataFrame, hold_until_col: str | None = None) -> DataFrame:
    """(alias, xml) — ENA ``<SUBMISSION>`` wrapper: ACTIONS(ACTION(ADD),
    ACTION(HOLD[HoldUntilDate] | RELEASE)). The reference stamps
    HoldUntilDate = today+2y for private submissions
    (``FileConverter.generate_submission_xml``); here the date is an
    explicit column so documents stay deterministic."""
    if hold_until_col is not None:
        second = F.when(
            F.col(hold_until_col).isNotNull(),
            F.concat(
                F.lit('<ACTION><HOLD HoldUntilDate="'),
                xml_escape_attr(F.col(hold_until_col)),
                F.lit('"/></ACTION>'),
            ),
        ).otherwise(F.lit("<ACTION><RELEASE/></ACTION>"))
    else:
        second = F.lit("<ACTION><RELEASE/></ACTION>")
    xml = F.concat(
        F.lit('<SUBMISSION alias="'),
        xml_escape_attr(F.col("alias")),
        F.lit('"><ACTIONS><ACTION><ADD/></ACTION>'),
        second,
        F.lit("</ACTIONS></SUBMISSION>"),
    )
    return df.select(F.col("alias").alias("alias"), xml.alias("xml"))


_ANALYSIS_ATTR_TAGS = [
    ("project", "Project"),
    ("secondary_project", "Secondary Project"),
    ("assay_type", "Assay Type"),
    ("analysis_protocol", "Analysis Protocol"),
    ("analysis_code", "Analysis code"),
    ("reference_genome", "Reference genome"),
    ("analysis_center", "Analysis center"),
    ("analysis_date", "Analysis date"),
]


def _ref_list(col: str, tag: str) -> Column:
    """One ``<TAG accession="..."/>`` per array element, order-preserving
    (the reference loops the accession lists emitting one SubElement
    each); empty/null arrays emit nothing."""
    return F.when(
        F.col(col).isNotNull(),
        F.concat_ws(
            "",
            F.transform(
                F.col(col),
                lambda x: F.concat(
                    F.lit(f'<{tag} accession="'),
                    xml_escape_attr(x),
                    F.lit('"/>'),
                ),
            ),
        ),
    ).otherwise(F.lit(""))


def ena_analysis_xml(df: DataFrame) -> DataFrame:
    """(alias, xml) — one ENA ``<ANALYSIS>`` document per record
    mirroring ``submission/AnalysesFileConverter.generate_analysis_xml``
    (bytecode-inspected): ANALYSIS[alias] → TITLE → DESCRIPTION →
    STUDY_REF[accession] → SAMPLE_REF* → EXPERIMENT_REF* → RUN_REF* →
    ANALYSIS_REF* → ANALYSIS_TYPE({analysis_type}/) →
    FILES(FILE[filename, filetype, checksum_method, checksum] per zipped
    file arrays) → ANALYSIS_ATTRIBUTES(ANALYSIS_ATTRIBUTE(TAG, VALUE) for
    Project / Secondary Project / Assay Type / Analysis Protocol /
    Analysis code / Reference genome / Analysis center / Analysis date,
    nulls skipped). Arrays are flattened with ``transform``/``zip_with``
    — one projection, no explode, no UDF."""
    files = F.concat_ws(
        "",
        F.zip_with(
            F.col("file_names"),
            F.arrays_zip(
                F.col("file_types"), F.col("checksum_methods"), F.col("checksums")
            ),
            lambda fn, rest: F.concat(
                F.lit('<FILE filename="'),
                xml_escape_attr(fn),
                F.lit('" filetype="'),
                xml_escape_attr(rest["file_types"]),
                F.lit('" checksum_method="'),
                xml_escape_attr(rest["checksum_methods"]),
                F.lit('" checksum="'),
                xml_escape_attr(rest["checksums"]),
                F.lit('"/>'),
            ),
        ),
    )
    attrs = [
        F.when(
            F.col(col).isNotNull(),
            F.concat(
                F.lit(f"<ANALYSIS_ATTRIBUTE><TAG>{tag}</TAG><VALUE>"),
                xml_escape(F.col(col)),
                F.lit("</VALUE></ANALYSIS_ATTRIBUTE>"),
            ),
        ).otherwise(F.lit(""))
        for col, tag in _ANALYSIS_ATTR_TAGS
    ]
    xml = F.concat(
        F.lit('<ANALYSIS alias="'),
        xml_escape_attr(F.col("alias")),
        F.lit('"><TITLE>'),
        xml_escape(F.col("title")),
        F.lit("</TITLE><DESCRIPTION>"),
        xml_escape(F.col("description")),
        F.lit('</DESCRIPTION><STUDY_REF accession="'),
        xml_escape_attr(F.col("study")),
        F.lit('"/>'),
        _ref_list("samples", "SAMPLE_REF"),
        _ref_list("experiments", "EXPERIMENT_REF"),
        _ref_list("runs", "RUN_REF"),
        _ref_list("related_analyses", "ANALYSIS_REF"),
        F.lit("<ANALYSIS_TYPE><"),
        F.col("analysis_type"),
        F.lit("/></ANALYSIS_TYPE><FILES>"),
        files,
        F.lit("</FILES><ANALYSIS_ATTRIBUTES>"),
        *attrs,
        F.lit("</ANALYSIS_ATTRIBUTES></ANALYSIS>"),
    )
    return df.select(F.col("alias").alias("alias"), xml.alias("xml"))
