"""GraphQL joined-query entry point: recursive filter tree → join tree.

Mirrors ``graphql_api/grapheneObjects/helpers.py:176-236``
``fetch_with_join`` (SURVEY.md §3.3 / J1-J4): the reference walks a
nested spec ``{basic: {field: [values]}, join: {right: {...}}}``, scans
each index page-by-page, pushes semi-join key batches (chunked at 50k
under ES's terms cap), and stitches an in-process hash join whose result
nests under ``left['join'][right]``.

Spark realization: the same spec compiles to a single lazy plan —
``filter`` for ``basic``, recursive descent for ``join``, the 1-N nest
reproduced with ``collect_list(struct(right.*))`` re-aggregated on the
right key, then a left join. Catalyst owns what the reference
hand-rolled: the semi-join pushdown (J2's key batching) falls out of
join planning, build-side choice and broadcast conversion come from
AQE/CBO, and there is no pagination because scans are partitioned.

Join keys (J4) follow the reference's ``retrieve_mapping_keys``
semantics (``helpers.py:126-137``): a key spec may be a **dotted path**
into a nested document (``relatedDatasets.accession``, ``file.name``)
and may resolve to **multiple values** per record (an array column, or a
dotted path through an ``array<struct>``). Multi-valued sides are
exploded to scalar keys before the equi-join and the left side is
re-aggregated on a row id afterwards, so a record joins when ANY of its
keys matches ANY of the other side's keys — the reference's
``generate_index_map`` fan-out, as a shuffle join instead of a
driver-side dict.

The full 38-pair catalog (``grapheneObjects/constants.py:14-181``
``index_mapping``) ships as :data:`INDEX_MAPPING`, keyed by logical
index name (the reference's date-stamped ES index names dropped). The
depth guard is kept for API parity (``MAX_FILTER_QUERY_DEPTH = 3`` —
the reference needs it against fan-out HTTP scans; Catalyst would
handle any depth)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_FILTER_QUERY_DEPTH = 3  # grapheneObjects/constants.py:1

# The reference's index_mapping (grapheneObjects/constants.py:14-181),
# verbatim key pairs under logical index names: (left, right) ->
# (left_index_key, right_index_key). Dotted = nested path; several keys
# are multi-valued (arrays / paths through arrays).
INDEX_MAPPING: dict[tuple[str, str], tuple[str, str]] = {
    ("analysis", "experiment"): ("experimentAccessions", "accession"),
    ("analysis", "article"): ("datasetAccession", "relatedDatasets.accession"),
    ("analysis", "dataset"): ("datasetAccession", "accession"),
    ("analysis", "specimen"): ("sampleAccessions", "biosampleId"),
    ("analysis", "protocol_analysis"): ("analysisProtocol.filename", "key"),
    ("article", "analysis"): ("relatedDatasets.accession", "datasetAccession"),
    ("article", "dataset"): ("relatedDatasets.accession", "accession"),
    ("article", "file"): ("_id", "publishedArticles.articleId"),
    ("article", "specimen"): ("_id", "publishedArticles.articleId"),
    ("dataset", "experiment"): ("experiment.accession", "accession"),
    ("dataset", "analysis"): ("accession", "datasetAccession"),
    ("dataset", "article"): ("accession", "relatedDatasets.accession"),
    ("dataset", "file"): ("file.name", "name"),
    ("dataset", "specimen"): ("specimen.biosampleId", "biosampleId"),
    ("experiment", "analysis"): ("accession", "experimentAccessions"),
    ("experiment", "dataset"): ("accession", "experiment.accession"),
    ("experiment", "file"): ("accession", "experiment.accession"),
    ("file", "article"): ("publishedArticles.articleId", "_id"),
    ("file", "dataset"): ("name", "file.name"),
    ("file", "experiment"): ("experiment.accession", "accession"),
    ("file", "organism"): ("organism", "biosampleId"),
    ("file", "protocol_files"): ("experiment.accession", "experiments.accession"),
    ("file", "protocol_samples"): ("specimen", "specimens.id"),
    ("file", "specimen"): ("specimen", "biosampleId"),
    ("specimen", "analysis"): ("biosampleId", "sampleAccessions"),
    ("specimen", "organism"): ("derivedFrom", "biosampleId"),
    ("specimen", "article"): ("publishedArticles.articleId", "_id"),
    ("specimen", "dataset"): ("biosampleId", "specimen.biosampleId"),
    ("specimen", "protocol_samples"): ("biosampleId", "specimens.id"),
    ("specimen", "file"): ("biosampleId", "specimen"),
    ("organism", "specimen"): ("biosampleId", "derivedFrom"),
    ("organism", "file"): ("biosampleId", "organism"),
    ("organism", "protocol_samples"): ("biosampleId", "specimens.derivedFrom"),
    ("protocol_analysis", "analysis"): ("key", "analysisProtocol.filename"),
    ("protocol_files", "file"): ("experiments.accession", "experiment.accession"),
    ("protocol_samples", "file"): ("specimens.id", "specimen"),
    ("protocol_samples", "specimen"): ("specimens.id", "biosampleId"),
    ("protocol_samples", "organism"): ("specimens.derivedFrom", "biosampleId"),
}


def resolve_key(df: DataFrame, key: str) -> tuple[Column, bool]:
    """Resolve a (possibly dotted) key spec against the frame's schema.
    Returns ``(column, is_multi)`` where ``is_multi`` marks keys that
    yield several values per record — a plain array column, or a dotted
    path whose prefix traverses an ``array<struct>`` (Spark's field
    extraction over arrays returns the collected array, matching the
    reference's flatten_json fan-out)."""
    _, nesting = _key_nesting(df, key)
    return F.col(key), nesting > 0


def _key_nesting(df: DataFrame, key: str) -> tuple[T.DataType, int]:
    """Walk the dotted path; return (leaf type, array nesting depth of
    the RESOLVED column). Each array traversed along the path adds one
    level (Spark's field extraction over an array collects an array),
    and an array-typed leaf adds one more — e.g. ``specimens.derivedFrom``
    with specimens: array<struct<derivedFrom: array<string>>> resolves to
    array<array<string>> → depth 2."""
    cur: T.DataType = T.StructType(df.schema.fields)
    depth = 0
    for seg in key.split("."):
        if isinstance(cur, T.ArrayType):
            cur = cur.elementType
        if not isinstance(cur, T.StructType) or seg not in cur.fieldNames():
            raise ValueError(f"unknown join key {key!r} (at segment {seg!r})")
        cur = cur[seg].dataType
        if isinstance(cur, T.ArrayType):
            depth += 1
    return cur, depth


def _scalar_key(df: DataFrame, key: str, alias: str) -> tuple[DataFrame, bool]:
    """Project the key to one scalar column ``alias``, exploding
    multi-valued keys (each row repeated per key value). Nested arrays
    (array leaf under an array prefix) are flattened down to one level
    before the explode so the join key is always scalar."""
    _, depth = _key_nesting(df, key)
    if depth > 0:
        arr = F.col(key)
        for _ in range(depth - 1):
            arr = F.flatten(arr)
        return df.withColumn(alias, F.explode_outer(arr)), True
    return df.withColumn(alias, F.col(key)), False


def fetch_with_join(
    tables: dict[str, DataFrame],
    name: str,
    spec: dict,
    catalog: dict[tuple[str, str], tuple[str, str]] | None = None,
    _depth: int = 0,
) -> DataFrame:
    """Compile the nested spec over ``tables[name]``. Each joined child
    appears as an ``array<struct>`` column named after the child table."""
    if _depth >= MAX_FILTER_QUERY_DEPTH:
        raise ValueError(
            f"join depth exceeds MAX_FILTER_QUERY_DEPTH={MAX_FILTER_QUERY_DEPTH}"
        )
    catalog = INDEX_MAPPING if catalog is None else catalog
    df = tables[name]
    for field, values in (spec.get("basic") or {}).items():
        if field not in df.columns:
            raise ValueError(f"unknown filter field {field!r} on {name!r}")
        df = df.filter(F.col(field).isin(*values))
    for right_name, right_spec in (spec.get("join") or {}).items():
        key = (name, right_name)
        if key not in catalog:
            raise ValueError(f"no join mapping for {key}")
        left_key, right_key = catalog[key]
        right = fetch_with_join(
            tables, right_name, right_spec or {}, catalog, _depth + 1
        )
        out_cols = right.columns
        # the reference nests under left['join'][right]; flat column
        # namespaces need a suffix when the left table already has a
        # column named like the child index (e.g. dataset.file)
        nest_name = (
            right_name if right_name not in df.columns else right_name + "_joined"
        )
        # right side: one scalar key per nested record (multi-valued right
        # keys fan the record out to every key, like generate_index_map)
        rk, _ = _scalar_key(right, right_key, "_jk")
        nested = (
            rk.filter(F.col("_jk").isNotNull())
            .groupBy("_jk")
            .agg(F.collect_list(F.struct(*out_cols)).alias(nest_name))
        )
        lcol, l_multi = resolve_key(df, left_key)
        if not l_multi:
            df = df.join(nested, on=lcol == nested["_jk"], how="left").drop("_jk")
        else:
            # multi-valued left FK: explode to scalar keys, join, then
            # re-aggregate the matched nests back onto the original row.
            # monotonically_increasing_id is nondeterministic across plan
            # re-evaluations, and _row_id feeds BOTH branches of a
            # self-join — localCheckpoint freezes the ids (lineage
            # truncated, blocks reclaimed by the ContextCleaner when the
            # frame is garbage-collected). NOT the shared release
            # registry: releasing this frame early would let the two
            # branches re-evaluate the ids independently and silently
            # misattach nests, unlike the dup tables whose recompute is
            # value-stable.
            left_cols = df.columns
            with_id = df.withColumn(
                "_row_id", F.monotonically_increasing_id()
            ).localCheckpoint(eager=True)
            exploded, _ = _scalar_key(with_id, left_key, "_lk")
            matched = (
                exploded.select("_row_id", "_lk")
                .join(nested, on=F.col("_lk") == nested["_jk"], how="inner")
                .groupBy("_row_id")
                .agg(F.flatten(F.collect_list(nest_name)).alias(nest_name))
            )
            df = (
                with_id.join(matched, on="_row_id", how="left")
                .select(*left_cols, nest_name)
            )
    return df
