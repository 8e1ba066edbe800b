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

The join-key catalog (J4 — ``grapheneObjects/constants.py:14-181``
``index_mapping``) is a plain dict ``(left, right) → (left_key,
right_key)``. The depth guard is kept for API parity
(``MAX_FILTER_QUERY_DEPTH = 3`` — the reference needs it against fan-out
HTTP scans; Catalyst would handle any depth)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FILTER_QUERY_DEPTH = 3  # grapheneObjects/constants.py:1


def fetch_with_join(
    tables: dict[str, DataFrame],
    name: str,
    spec: dict,
    catalog: dict[tuple[str, str], tuple[str, str]],
    _depth: int = 0,
) -> DataFrame:
    """Compile the nested spec over ``tables[name]``. Each joined child
    appears as an ``array<struct>`` column named after the child table."""
    if _depth >= MAX_FILTER_QUERY_DEPTH:
        raise ValueError(
            f"join depth exceeds MAX_FILTER_QUERY_DEPTH={MAX_FILTER_QUERY_DEPTH}"
        )
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
        nested = right.groupBy(F.col(right_key).alias("_jk")).agg(
            F.collect_list(F.struct(*right.columns)).alias(right_name)
        )
        df = df.join(
            nested, on=df[left_key] == nested["_jk"], how="left"
        ).drop("_jk")
    return df
