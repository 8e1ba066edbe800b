"""Query packs for the driver oracle contract (__spark_entry__.py).

Each submodule exports ``QUERIES: dict[name, (fn, oracle_sql | None)]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is equivalent
ANSI SQL for DuckDB over the same parquet tables. Column names/aliases are
identical on both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations


def all_queries() -> dict:
    from . import relational, trainingdata, validationpack

    out = {}
    for mod in (relational, trainingdata, validationpack):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
