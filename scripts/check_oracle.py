"""Local replica of the driver's correctness gate: run each queries()
entry in Spark and its oracle_sql() twin in DuckDB at a given sf dir,
compare row count, sorted column names, and an order-insensitive value
hash. Usage:

    python scripts/check_oracle.py [--all] [sf_dir] [query_name ...]

``--all`` additionally runs the PYTEST_QUERIES pack (per-op originals
demoted from the driver window in r4).
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            return _norm_cell(f)
    except ImportError:
        pass
    return str(v)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    include_pytest_pack = "--all" in sys.argv[1:]
    # usage: check_oracle.py [SF_DIR] [QUERY...] [--all] — a first arg
    # that isn't an existing directory is a query name, not a data dir
    # (running `check_oracle.py img_validate` used to silently point
    # every sf-dir query at ./img_validate/ and report phantom FAILs)
    sf_dir = "/root/testdata/sf0.01"
    if args and (Path(args[0]).is_dir() or "/" in args[0]):
        sf_dir = args[0]
        only = set(args[1:])
    else:
        only = set(args)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if include_pytest_pack:
        from dcc_validate_metadata_spark.queries import pytest_pack_queries

        for name, (fn, sql) in pytest_pack_queries().items():
            qs[name] = fn
            if sql is not None:
                oracles[name] = sql

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            status = "ok" if len(s_rows) >= 0 else "??"
            print(f"WEAK {name}: rows={len(s_rows)} cols={s_cols} (no oracle)")
            n_weak += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        else:
            hs = value_hash(s_rows, s_cols)
            hd = value_hash(d_rows, d_cols)
            if hs != hd:
                problems.append(f"value hash spark={hs} duckdb={hd}")
                # show first differing line
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("|".join(_norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(s_rows)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
