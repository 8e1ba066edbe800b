"""North-rule validation queries over the deterministic image+caption
fixture, oracled against the generator's golden outputs (an independent
pure-Python reimplementation of the rule semantics — see
sources/image_table.py).

The fixture (1010 rows, planted violations every 101-row cycle) is
materialized once per machine under /tmp at import time — pandas/numpy
only, ~1s — so the DuckDB oracle can ``read_parquet`` the golden files
regardless of whether the driver runs the oracle before or after the
Spark query.
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

from pyspark.sql import functions as F

FIXTURE_ROWS = 1010
FIXTURE_BUCKETS = 4
FIXTURE_SEED = 42
FIX_DIR = Path(f"/tmp/dcc_vm_fixture_n{FIXTURE_ROWS}_s{FIXTURE_SEED}_b{FIXTURE_BUCKETS}")
_MARKER = ".done_all"
_LOCK_STALE_S = 180.0


def ensure_fixture() -> Path:
    """Materialize the fixture exactly once per machine, safely under
    concurrent callers (the driver may import this module from several
    processes at once — e.g. the Spark runner and the DuckDB oracle).

    The build happens in a pid-scoped temp dir that is atomically renamed
    into place; an O_EXCL lock file serializes builders and a stale-lock
    timeout recovers from a crashed builder. Never partially visible:
    ``FIX_DIR`` either doesn't exist or carries the ``.done_all`` marker.
    """
    marker = FIX_DIR / _MARKER
    if marker.exists():
        return FIX_DIR
    lock = FIX_DIR.parent / (FIX_DIR.name + ".lock")
    fd: int | None = None
    try:
        while fd is None:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                # Another process is building: wait for its marker, or
                # break a stale lock left by a crashed builder.
                deadline = time.monotonic() + _LOCK_STALE_S
                while time.monotonic() < deadline:
                    if marker.exists():
                        return FIX_DIR
                    try:
                        if time.time() - lock.stat().st_mtime > _LOCK_STALE_S:
                            lock.unlink()
                            break
                    except FileNotFoundError:
                        break
                    time.sleep(0.2)
        if marker.exists():  # built while we waited for the lock
            return FIX_DIR
        tmp = FIX_DIR.parent / f"{FIX_DIR.name}.tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        from ..sources.image_table import generate_image_fixture

        generate_image_fixture(
            tmp, n_rows=FIXTURE_ROWS, seed=FIXTURE_SEED, n_buckets=FIXTURE_BUCKETS
        )
        _write_samples_fixture(tmp)
        _write_breeds_fixture(tmp)
        (tmp / _MARKER).touch()
        shutil.rmtree(FIX_DIR, ignore_errors=True)  # stale pre-marker partial
        os.rename(tmp, FIX_DIR)
    finally:
        if fd is not None:
            os.close(fd)
            lock.unlink(missing_ok=True)
    return FIX_DIR


def _write_samples_fixture(out_dir: Path) -> None:
    """FAANG-shaped samples sheet with (collection_date, units) pairs —
    deterministic, planted date-unit mismatches in every ladder position
    (reference semantics: WarningsAndAdditionalChecks.py:322-347)."""
    import pandas as pd

    units_cycle = ["YYYY-MM-DD", "YYYY-MM", "YYYY"]
    rows = []
    for i in range(120):
        units = units_cycle[i % 3]
        day = i % 28 + 1
        good = {
            "YYYY-MM-DD": f"20{i % 25:02d}-{i % 12 + 1:02d}-{day:02d}",
            "YYYY-MM": f"20{i % 25:02d}-{i % 12 + 1:02d}",
            "YYYY": f"20{i % 25:02d}",
        }[units]
        value: str | None = good
        if i % 11 == 3:
            value = f"20{i % 25:02d}"  # narrower than declared units
            if units == "YYYY":
                value = f"20{i % 25:02d}-05-05"  # wider than declared
        elif i % 11 == 7:
            value = f"20{i % 25:02d}-13-40"  # regex-valid, parse-invalid
            if units == "YYYY-MM":
                value = f"20{i % 25:02d}-13"
            elif units == "YYYY":
                value = "999"  # too short
        elif i % 11 == 9:
            value = None
        rows.append(
            {"name": f"s_{i:03d}", "collection_date": value, "units": units}
        )
    pd.DataFrame(rows).to_parquet(out_dir / "samples_dates.parquet", index=False)


def _write_breeds_fixture(out_dir: Path) -> None:
    """Breed ontology with a parent hierarchy + a samples sheet with
    planted graph-restriction and label-mismatch violations (reference
    semantics: check_breeds / check_ols,
    WarningsAndAdditionalChecks.py:292-320, 418-446)."""
    import pandas as pd

    onto = pd.DataFrame(
        [
            ("LBO:0000000", "breeds root", None),
            ("LBO:0001000", "bos taurus breeds", "LBO:0000000"),
            ("LBO:0002000", "sus scrofa breeds", "LBO:0000000"),
            ("LBO:0001001", "Holstein", "LBO:0001000"),
            ("LBO:0001002", "Angus", "LBO:0001000"),
            ("LBO:0001003", "Holstein x Angus crossbreed", "LBO:0001001"),
            ("LBO:0002001", "Duroc", "LBO:0002000"),
        ],
        columns=["term", "label", "parent_term"],
    )
    roots = {"Bos taurus": "LBO:0001000", "Sus scrofa": "LBO:0002000"}
    rows = []
    plants = [
        # (species, term, text) — valid unless noted
        ("Bos taurus", "LBO:0001001", "holstein"),          # ok (case-insens)
        ("Bos taurus", "LBO:0001003", "Holstein x Angus crossbreed"),  # ok, 2-level
        ("Sus scrofa", "LBO:0002001", "Duroc"),             # ok
        ("Bos taurus", "LBO:0002001", "Duroc"),             # wrong subtree
        ("Sus scrofa", "LBO:0001002", "Angus"),             # wrong subtree
        ("Bos taurus", "LBO:0001002", "angus beef cattle"), # label mismatch
    ]
    for i in range(60):
        species, term, text = plants[i % len(plants)]
        rows.append(
            {
                "name": f"b_{i:03d}",
                "species": species,
                "breed_root": roots[species],
                "breed_term": term,
                "breed_text": text,
            }
        )
    onto.to_parquet(out_dir / "ontology_breeds.parquet", index=False)
    pd.DataFrame(rows).to_parquet(out_dir / "samples_breeds.parquet", index=False)


# Import-time materialization keeps the DuckDB oracle independent of the
# order the driver runs (oracle-before-Spark is fine). Must never make the
# module unimportable — every query fn re-invokes ensure_fixture() lazily.
try:
    ensure_fixture()
except Exception:  # pragma: no cover — driver-env safety net
    pass

_IMG = str(FIX_DIR / "image_caption")
_GT = str(FIX_DIR / "image_caption_gt.parquet")
_ONTO = str(FIX_DIR / "ontology_terms.parquet")
_EDGES = str(FIX_DIR / "sample_edges.parquet")
_EXP_VIOL = str(FIX_DIR / "expected_violations.parquet")
_EXP_VERD = str(FIX_DIR / "expected_verdicts.parquet")


def _load(spark):
    from ..sources.image_table import load_image_table

    ensure_fixture()
    return load_image_table(spark, _IMG)


def img_validate(spark, sf_dir):
    """The flagship: full validation pass (row rules ∥ salted uniqueness ∥
    broadcast referential ∥ Arrow decode ∥ ground-truth invariants) fused
    over one scan; oracle = the generator's independently-derived golden
    violation rows."""
    from ..plans.pipeline import build_violations

    df = _load(spark)
    onto = spark.read.parquet(_ONTO)
    gt = spark.read.parquet(_GT)
    return build_violations(df, ontology=onto, gt=gt)


IMG_VALIDATE_SQL = f"""
SELECT fmt, bucket, image_id, field, severity, message
FROM read_parquet('{_EXP_VIOL}')
"""


def img_verdicts(spark, sf_dir):
    """Per-partition pass/fail verdicts (A5 mapping) vs golden."""
    from ..plans.pipeline import build_verdicts, build_violations

    df = _load(spark)
    onto = spark.read.parquet(_ONTO)
    gt = spark.read.parquet(_GT)
    return build_verdicts(df, build_violations(df, ontology=onto, gt=gt))


IMG_VERDICTS_SQL = f"""
SELECT fmt, bucket, "pass", n_errors::BIGINT AS n_errors, n_warnings::BIGINT AS n_warnings
FROM read_parquet('{_EXP_VERD}')
"""


def img_column_stats(spark, sf_dir):
    """Per-partition column profile (A3/A7 mapping) for the numeric dims."""
    from ..operators.stats import column_stats

    df = _load(spark).select("fmt", "w", "h")
    s = column_stats(df, group_cols=["fmt"])
    return s.select(
        "fmt",
        "column",
        F.col("count").cast("long").alias("count"),
        F.col("n_null").cast("long").alias("n_null"),
        "min",
        "max",
        F.round("mean", 4).alias("mean"),
    ).orderBy("fmt", "column")


IMG_STATS_SQL = f"""
WITH img AS (SELECT fmt, w, h FROM read_parquet('{_IMG}'))
SELECT fmt, col AS "column", count, n_null, mn AS "min", mx AS "max", mean
FROM (
  SELECT fmt, 'w' AS col, count(*) AS count,
         sum(CASE WHEN w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
         min(w)::DOUBLE AS mn, max(w)::DOUBLE AS mx, round(avg(w), 4) AS mean
  FROM img GROUP BY fmt
  UNION ALL
  SELECT fmt, 'h', count(*),
         sum(CASE WHEN h IS NULL THEN 1 ELSE 0 END)::BIGINT,
         min(h)::DOUBLE, max(h)::DOUBLE, round(avg(h), 4)
  FROM img GROUP BY fmt
) ORDER BY fmt, col
"""


def img_dup_phash(spark, sf_dir):
    """Salted two-phase duplicate detection on phash."""
    from ..operators.uniqueness import duplicate_keys

    return duplicate_keys(_load(spark), "phash").orderBy("phash")


IMG_DUP_SQL = f"""
SELECT phash, count(*) AS n FROM read_parquet('{_IMG}')
WHERE phash IS NOT NULL GROUP BY phash HAVING count(*) > 1 ORDER BY phash
"""


def img_drift_hist(spark, sf_dir):
    """Fixed-width histogram sketch per partition — the shuffle-side half
    of the drift check (KS/chi² runs driver-side on the sketch)."""
    from ..operators.drift import histogram_by_partition

    return histogram_by_partition(
        _load(spark), "w", ["fmt"], n_bins=8, lo=0.0, hi=64.0
    ).orderBy("fmt", "bin")


IMG_DRIFT_SQL = f"""
SELECT fmt,
       least(7, greatest(0, floor((w::DOUBLE - 0.0) / 8.0)))::INT AS bin,
       count(*) AS n
FROM read_parquet('{_IMG}')
WHERE w IS NOT NULL GROUP BY 1, 2 ORDER BY fmt, bin
"""


_SAMPLES = str(FIX_DIR / "samples_dates.parquet")


def samples_date_unit(spark, sf_dir):
    """F3/date_unit rule over a FAANG-shaped samples sheet: each
    collection_date must parse under the format its units column names
    (strict regex + calendar validity); oracle reimplements the ladder
    with DuckDB try_strptime."""
    from ..rules.compiler import violations_for
    from ..rules.model import Rule, Ruleset

    ensure_fixture()
    df = spark.read.parquet(_SAMPLES)
    rs = Ruleset(
        table="samples",
        rules=(
            Rule("collection_date", "date_unit", "mandatory", {"units_col": "units"}),
        ),
    )
    return violations_for(df, rs, keep_cols=["name"]).orderBy("name")


SAMPLES_DATE_SQL = f"""
SELECT name, 'collection_date' AS field, 'error' AS severity,
       'Date units: ' || units || ' should be consistent with date value: '
         || collection_date AS message
FROM read_parquet('{_SAMPLES}')
WHERE collection_date IS NOT NULL AND trim(collection_date) <> ''
  AND (
    (units = 'YYYY-MM-DD' AND (
       NOT regexp_matches(collection_date, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')
       OR try_strptime(collection_date, '%Y-%m-%d') IS NULL))
    OR (units = 'YYYY-MM' AND (
       NOT regexp_matches(collection_date, '^\\d{{4}}-\\d{{2}}$')
       OR try_strptime(collection_date, '%Y-%m') IS NULL))
    OR (units = 'YYYY' AND (
       NOT regexp_matches(collection_date, '^\\d{{4}}$')
       OR try_strptime(collection_date, '%Y') IS NULL))
  )
ORDER BY name
"""


_BREEDS = str(FIX_DIR / "samples_breeds.parquet")
_ONTO_BREEDS = str(FIX_DIR / "ontology_breeds.parquet")


def samples_breed_check(spark, sf_dir):
    """X2 graph restriction: each breed term must descend from its
    species' breed-root node — closure computed once driver-side and
    broadcast; oracle walks the hierarchy with a recursive CTE."""
    from ..operators.referential import ancestor_closure, subclass_violations

    ensure_fixture()
    df = spark.read.parquet(_BREEDS)
    onto = spark.read.parquet(_ONTO_BREEDS)
    return subclass_violations(
        df,
        term_col="breed_term",
        required_root_col="breed_root",
        closure=ancestor_closure(onto),
        keep_cols=["name"],
        text_col="breed_text",
        species_col="species",
    ).orderBy("name")


BREED_CHECK_SQL = f"""
WITH RECURSIVE onto AS (
  SELECT term, label, parent_term FROM read_parquet('{_ONTO_BREEDS}')
),
closure(term, ancestor) AS (
  SELECT term, term FROM onto
  UNION ALL
  SELECT c.term, o.parent_term
  FROM closure c JOIN onto o ON o.term = c.ancestor
  WHERE o.parent_term IS NOT NULL
)
SELECT s.name, 'breed_term' AS field, 'error' AS severity,
       'Breed ''' || s.breed_text || ''' doesn''t match the animal specie: '''
         || s.species || '''' AS message
FROM read_parquet('{_BREEDS}') s
WHERE NOT EXISTS (
  SELECT 1 FROM closure c
  WHERE c.term = s.breed_term AND c.ancestor = s.breed_root
)
ORDER BY name
"""


def samples_label_match(spark, sf_dir):
    """J7/F5 label consistency: breed display text must equal the
    ontology label case-insensitively (check_ols semantics, F6 message)."""
    from ..operators.referential import label_match_violations

    ensure_fixture()
    df = spark.read.parquet(_BREEDS)
    onto = spark.read.parquet(_ONTO_BREEDS)
    return label_match_violations(
        df,
        term_col="breed_term",
        text_col="breed_text",
        lookup=onto,
        keep_cols=["name"],
    ).orderBy("name")


LABEL_MATCH_SQL = f"""
SELECT s.name, 'breed_text' AS field, 'warning' AS severity,
       'Provided value ''' || s.breed_text || ''' doesn''t precisely match '''
         || o.label || ''' for term ''' || s.breed_term || '''' AS message
FROM read_parquet('{_BREEDS}') s
JOIN read_parquet('{_ONTO_BREEDS}') o ON o.term = s.breed_term
WHERE lower(s.breed_text) <> lower(o.label)
ORDER BY name
"""


def img_annotated_overlay(spark, sf_dir):
    """S6 annotated-template sink as a wide overlay: per row key, one
    ``<field>_issues`` column with the sorted severity:message list;
    oracle rebuilds the same overlay from the golden violation rows."""
    from ..plans.pipeline import build_annotated, build_violations

    df = _load(spark)
    onto = spark.read.parquet(_ONTO)
    gt = spark.read.parquet(_GT)
    viol = build_violations(df, ontology=onto, gt=gt)
    return build_annotated(df, viol)


_ANNOT_AGGS = ",\n       ".join(
    f"coalesce(string_agg(CASE WHEN field = '{fld}' THEN m END, '|' ORDER BY m), '')"
    f" AS {fld}_issues"
    for fld in ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
)

IMG_ANNOTATED_SQL = f"""
WITH keys AS (
  SELECT DISTINCT fmt, bucket, image_id FROM read_parquet('{_IMG}')
),
v AS (
  SELECT fmt, bucket, image_id, field,
         severity || ':' || message AS m
  FROM read_parquet('{_EXP_VIOL}')
),
agg AS (
  SELECT fmt, bucket, image_id,
       {_ANNOT_AGGS}
  FROM v GROUP BY 1, 2, 3
)
SELECT k.fmt, k.bucket, k.image_id,
       coalesce(a.image_id_issues, '') AS image_id_issues,
       coalesce(a.bytes_issues, '') AS bytes_issues,
       coalesce(a.w_issues, '') AS w_issues,
       coalesce(a.h_issues, '') AS h_issues,
       coalesce(a.fmt_issues, '') AS fmt_issues,
       coalesce(a.caption_issues, '') AS caption_issues,
       coalesce(a.phash_issues, '') AS phash_issues
FROM keys k LEFT JOIN agg a
  ON a.fmt = k.fmt AND a.bucket = k.bucket AND a.image_id = k.image_id
"""


def rel_violations(spark, sf_dir):
    """Relationship checks (J5/J8/J9): dangling parent, material-pair
    whitelist, species equality, mutual-parent cycle — all as 1-hop
    self-joins; oracle reimplements them in SQL."""
    from ..operators.relationships import relationship_violations

    ensure_fixture()
    edges = spark.read.parquet(_EDGES)
    return relationship_violations(edges).orderBy("name", "field", "message")


_ALLOWED = {
    "organism": ["organism"],
    "specimen from organism": ["organism"],
    "pool of specimens": ["specimen from organism"],
    "cell specimen": ["specimen from organism"],
    "cell culture": ["specimen from organism", "cell specimen"],
    "cell line": ["organism"],
}
_ALLOWED_PAIRS = ",\n  ".join(
    f"('{m}', '{p}')" for m, ps in _ALLOWED.items() for p in ps
)
_ALLOWED_STR = ",\n  ".join(f"('{m}', '{', '.join(ps)}')" for m, ps in _ALLOWED.items())

REL_SQL = f"""
WITH e AS (SELECT * FROM read_parquet('{_EDGES}')),
linked AS (SELECT * FROM e WHERE parent IS NOT NULL),
allowed_pairs(material, parent_material) AS (VALUES
  {_ALLOWED_PAIRS}
),
allowed_str(material, s) AS (VALUES
  {_ALLOWED_STR}
),
joined AS (
  SELECT l.name, l.material, l.organism, l.parent,
         p.name AS p_name, p.material AS p_material,
         p.organism AS p_organism, p.parent AS p_parent
  FROM linked l JOIN e p ON p.name = l.parent
)
SELECT name, field, severity, message FROM (
  SELECT l.name, 'parent' AS field, 'error' AS severity,
         'Relationships part: no entity ''' || l.parent || ''' found' AS message
  FROM linked l WHERE NOT EXISTS (SELECT 1 FROM e p WHERE p.name = l.parent)
  UNION ALL
  SELECT j.name, 'parent', 'error',
         'Relationships part: referenced entity ''' || j.p_name ||
         ''' does not match condition ''should be ' || a.s || ''''
  FROM joined j JOIN allowed_str a ON a.material = j.material
  WHERE NOT EXISTS (SELECT 1 FROM allowed_pairs ap
                    WHERE ap.material = j.material AND ap.parent_material = j.p_material)
  UNION ALL
  SELECT j.name, 'organism', 'error',
         'Relationships part: the specie of the child ''' || j.organism ||
         ''' doesn''t match the specie of the parent ''' || j.p_organism || ''''
  FROM joined j
  WHERE j.material = 'organism' AND j.p_material = 'organism'
        AND j.organism <> j.p_organism
  UNION ALL
  SELECT j.name, 'parent', 'error',
         'Relationships part: parent ''' || j.p_name || ''' lists ''' ||
         j.name || ''' as its own parent'
  FROM joined j WHERE j.p_parent = j.name
) ORDER BY name, field, message
"""


QUERIES = {
    "img_validate": (img_validate, IMG_VALIDATE_SQL),
    "img_verdicts": (img_verdicts, IMG_VERDICTS_SQL),
    "img_column_stats": (img_column_stats, IMG_STATS_SQL),
    "img_dup_phash": (img_dup_phash, IMG_DUP_SQL),
    "img_drift_hist": (img_drift_hist, IMG_DRIFT_SQL),
    "img_annotated_overlay": (img_annotated_overlay, IMG_ANNOTATED_SQL),
    "samples_date_unit": (samples_date_unit, SAMPLES_DATE_SQL),
    "samples_breed_check": (samples_breed_check, BREED_CHECK_SQL),
    "samples_label_match": (samples_label_match, LABEL_MATCH_SQL),
    "rel_violations": (rel_violations, REL_SQL),
}
