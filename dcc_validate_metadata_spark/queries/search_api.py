"""REST-search entry point: the reference's ES query-DSL parameters
compiled to one DataFrame expression chain.

Mirrors ``api/views.py:178-345`` (SURVEY.md §3.2) — the only "logical
plan" the reference has is the ES body dict built from request params.
Here the same parameter shapes compile to Catalyst expressions, so
pushdown/pruning happen for free:

  filters      {field: [v, ...]}        → ``col.isin`` (P3); the value
               ``["false"]``            → negated match (P4)
  wildcards    {field: "*pat*"}         → ``col.like`` with * → % (P6)
  search       free text                → lowercase substring match over
                                          the given columns (P7 analogue)
  _source      [col, ...]               → ``select`` / column pruning (P2)
  sort         "field:asc|desc"         → ``orderBy`` (O1)
  from_/size   ints                     → distributed top-(from_+size)
                                          (TakeOrderedAndProject) then a
                                          row_number offset over that
                                          BOUNDED set (O3) — see
                                          pagination note below
  after        last sort-key value      → keyset continuation:
                                          ``sort_key > after`` + limit,
                                          the deep-pagination scale path

Pagination note: offset pagination is kept for API parity but computed as
a distributed top-k (k = from_+size) followed by a single-task window
over only those k rows — the single task is bounded by the page depth,
never by the table size. Deep scans should pass ``after`` (keyset) and
leave ``from_`` at 0, like ES ``search_after``. When ``from_ > 0`` with
no sort, a deterministic all-column ordering is used as the order key
(``monotonically_increasing_id`` is not stable across queries, so
successive unsorted pages could overlap or skip).
  aggs         [field, ...]             → per-field top-25 value counts
                                          (A1), returned as a dict of
                                          DataFrames

Injection guards (P10): field names are validated against the frame's
schema, sort direction against a whitelist — the reference's regex
guards (``api/views.py:311-321``) made structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

AGG_BUCKET_CAP = 25  # reference: api/views.py:300


def _check_field(df: DataFrame, field: str) -> str:
    if field not in df.columns:
        raise ValueError(f"unknown field {field!r}")
    return field


def es_like_search(
    df: DataFrame,
    filters: dict[str, list] | None = None,
    wildcards: dict[str, str] | None = None,
    search: str | None = None,
    search_fields: list[str] | None = None,
    source: list[str] | None = None,
    sort: str | None = None,
    from_: int = 0,
    size: int = 10,
    after=None,
) -> DataFrame:
    """Compile the search parameters to a single lazy DataFrame.

    ``after`` is the keyset-continuation token (the last page's final
    sort-key value): rows with sort key strictly beyond it are returned,
    ``limit(size)``-ed — no global ordering materialized anywhere.
    Requires ``sort``; the sort field should be unique (pass the record
    id as the sort field, or expect boundary ties to be skipped)."""
    out = df
    for field, values in (filters or {}).items():
        _check_field(df, field)
        if values == ["false"]:  # reference's negated-filter convention (P4)
            out = out.filter(
                F.col(field).isNull() | (F.col(field) != F.lit("true"))
            )
        else:
            out = out.filter(F.col(field).isin(*values))
    for field, pat in (wildcards or {}).items():
        _check_field(df, field)
        out = out.filter(F.col(field).like(pat.replace("*", "%")))
    if search:
        cols = search_fields or [
            f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
        ]
        needle = F.lit(search.lower())
        blob = F.lower(F.concat_ws(" ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]))
        out = out.filter(blob.contains(needle))
    sort_field = sort_dir = None
    if sort:
        sort_field, _, sort_dir = sort.partition(":")
        _check_field(df, sort_field)
        if sort_dir not in ("", "asc", "desc"):  # whitelist (api/views.py:321)
            raise ValueError(f"bad sort direction {sort_dir!r}")
    if after is not None:
        # keyset continuation (ES search_after): a pushdown-able range
        # predicate + top-k — constant cost per page at any depth
        if not sort_field:
            raise ValueError("keyset pagination (after=) requires a sort")
        if from_ > 0:
            raise ValueError("pass either after= (keyset) or from_ (offset)")
        out = out.filter(
            F.col(sort_field) < F.lit(after)
            if sort_dir == "desc"
            else F.col(sort_field) > F.lit(after)
        )
    if sort_field:
        out = out.orderBy(
            F.desc(sort_field) if sort_dir == "desc" else F.asc(sort_field)
        )
    if from_ > 0:
        # Offset parity path. The order key reuses the PARSED direction
        # (matching the raw string would misread a field named '*desc');
        # with no sort, a deterministic all-column tuple keeps successive
        # pages disjoint across separate queries.
        if sort_field:
            order = [F.desc(sort_field) if sort_dir == "desc" else F.asc(sort_field)]
        else:
            # deterministic all-column tuple, restricted to ORDERABLE
            # types (map columns can't be sort keys); if nothing is
            # orderable the caller must supply a sort
            from pyspark.sql import types as T

            orderable = [
                f.name
                for f in out.schema.fields
                if not isinstance(f.dataType, T.MapType)
            ]
            if not orderable:
                raise ValueError(
                    "offset pagination without a sort needs at least one "
                    "orderable (non-map) column"
                )
            order = [F.asc(c) for c in orderable]
        # top-(from_+size) first: Spark plans orderBy+limit as a
        # distributed TakeOrderedAndProject, so the row_number window
        # below sees at most from_+size rows — its single task is bounded
        # by page depth, never table size. Deep scans use after= instead.
        bounded = out.orderBy(*order).limit(from_ + size)
        w = Window.orderBy(*order)
        out = (
            bounded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > from_)
            .drop("_rn")
        )
    out = out.limit(size)
    if source:
        out = out.select(*[_check_field(df, c) for c in source])
    return out


def terms_aggregations(
    df: DataFrame, agg_fields: list[str], cap: int = AGG_BUCKET_CAP
) -> dict[str, DataFrame]:
    """A1 terms aggregations: per field, the top-``cap`` value counts
    (ties broken on the value for determinism)."""
    out = {}
    for field in agg_fields:
        _check_field(df, field)
        out[field] = (
            df.groupBy(F.col(field).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("value"))
            .limit(cap)
        )
    return out


def terms_aggregations_fused(
    df: DataFrame, agg_fields: list[str], cap: int = AGG_BUCKET_CAP
) -> DataFrame:
    """All requested facets in ONE job: unpivot the fields to
    (field, value) pairs inside the scan, aggregate once, rank per field
    with a window over the (small) aggregated counts. The ES-parity
    :func:`terms_aggregations` launches one groupBy job per facet — N
    scans + N shuffles; this is the Spark-first shape: one scan, one
    shuffle keyed on (field, value), top-``cap`` buckets per field
    (count desc, value asc with NULLs LAST — matching ANSI default so
    the DuckDB oracle ranks identically on nullable facets), rows
    ``(field, value, cnt, rank)``. Values are cast to string so facets
    of different types share one column — numeric facets therefore
    tie-break lexicographically, unlike the per-facet
    :func:`terms_aggregations` which keeps native types."""
    for field in agg_fields:
        _check_field(df, field)
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(field).alias("field"),
                        F.col(field).cast("string").alias("value"),
                    )
                    for field in agg_fields
                ]
            )
        ).alias("fv")
    ).select("fv.field", "fv.value")
    counts = pairs.groupBy("field", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("field").orderBy(
        F.desc("cnt"), F.asc_nulls_last("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
        .orderBy("field", "rank")
    )
