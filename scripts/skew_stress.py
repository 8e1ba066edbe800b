#!/usr/bin/env python
"""Hot-key stress for the two newest operators (VERDICT r3 #5):

* sessionization (w2): one user holding ~20% of all events — the worst
  shape for ``session_window``, whose per-user state must be processed by
  one reducer task;
* BM25 multimatch (p7c): one query term matching ~50% of documents — the
  worst shape for the posting-list shuffle.

Both run against a skewed COPY of the sf0.1 tables written to /tmp (the
query functions read ``{sf_dir}/<table>.parquet``, so the planted tables
drop in without refactoring). For each: warm-up + best-of-2 wall time on
the uniform baseline vs the skewed twin, plus the task-duration quantiles
of the heaviest stage of the skewed run via the Spark UI REST API — the
straggler evidence (max/median <= 4x is the pass bar).

Appends/replaces a marked section in BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
MARK_BEGIN = "<!-- skew-stress:begin -->"
MARK_END = "<!-- skew-stress:end -->"


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def _completed_stage_ids(spark) -> set[int]:
    return {s["stageId"] for s in _rest(spark, "/stages?status=COMPLETE")}


def _heaviest_new_stage(spark, before: set[int]) -> dict:
    """Task-duration quantiles for the longest-running stage completed
    since ``before`` — the reduce stage that eats the hot key."""
    stages = [
        s
        for s in _rest(spark, "/stages?status=COMPLETE")
        if s["stageId"] not in before
    ]
    heaviest = max(stages, key=lambda s: s.get("executorRunTime", 0))
    q = _rest(
        spark,
        f"/stages/{heaviest['stageId']}/{heaviest['attemptId']}/taskSummary"
        "?quantiles=0.5,0.95,1.0",
    )
    med, p95, mx = (round(v / 1000.0, 2) for v in q["duration"])
    return {
        "stage_id": heaviest["stageId"],
        "n_tasks": heaviest["numCompleteTasks"],
        "task_sec_median": med,
        "task_sec_p95": p95,
        "task_sec_max": mx,
        "straggler_ratio": round(mx / med, 2) if med else None,
    }


def _timed(fn, runs: int = 2) -> float:
    fn()  # warm-up (codegen + page cache)
    return round(min(_t(fn) for _ in range(runs)), 2)


def _t(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from dcc_validate_metadata_spark.queries.relational import (
        p7c_multimatch_bm25,
        w2_sessionization,
    )
    from dcc_validate_metadata_spark.session import get_spark

    spark = get_spark("skew-stress", extra_conf={"spark.ui.enabled": "true"})

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- planted tables --------------------------------------------------
    # sf0.1's events/documents tables are small (100k / 5k rows — they
    # exist for correctness oracles); amplify x50 so the hot key is a
    # genuine stress: 5M events with ONE user holding 1M of them, 250k
    # docs with the hottest query term in half. Uniform twins get the
    # same amplification so the comparison isolates the skew.
    AMP = 50
    skew_dir = Path("/tmp/dcc_vm_skew_sf01")
    base_dir = Path("/tmp/dcc_vm_skew_uniform_sf01")
    for d in (skew_dir, base_dir):
        shutil.rmtree(d, ignore_errors=True)
        d.mkdir(parents=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(AMP - 1))).alias("r")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    amped = ev.select("*", rep).select(
        (F.col("event_id") * AMP + F.col("r")).alias("event_id"),
        # distinct per-replica users so the uniform twin stays uniform
        (F.col("user_id") * AMP + F.col("r")).alias("user_id"),
        "event_type",
        "ts",
        "value",
        "props",
        F.col("event_id").alias("_orig"),
    )
    # repartition before writing: the amplified frames inherit the tiny
    # source's 1-2 input splits, which would serialize the scan stage of
    # every measured query (1-task "stress" measures nothing)
    amped.drop("_orig").repartition(32).write.parquet(str(base_dir / "events.parquet"))
    # one user takes every 5th original event => ~20% of 5M on one key
    amped.withColumn(
        "user_id",
        F.when(F.col("_orig") % 5 == 0, F.lit(999_999_999)).otherwise(
            F.col("user_id")
        ),
    ).drop("_orig").repartition(32).write.parquet(str(skew_dir / "events.parquet"))
    n_events = ev.count() * AMP
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    damped = docs.select("*", rep).select(
        (F.col("doc_id") * AMP + F.col("r")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    damped.repartition(32).write.parquet(str(base_dir / "documents.parquet"))
    # every 2nd doc gains the hottest query term => 'spark' df_t ~ 50%
    damped.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" spark spark spark")),
        ).otherwise(F.col("text")),
    ).repartition(32).write.parquet(str(skew_dir / "documents.parquet"))
    n_docs = docs.count() * AMP

    results: dict[str, dict] = {}

    # ---- w2 sessionization ----------------------------------------------
    base_sec = _timed(lambda: force(w2_sessionization(spark, str(base_dir))))
    before = _completed_stage_ids(spark)
    skew_sec = _timed(lambda: force(w2_sessionization(spark, str(skew_dir))))
    stage = _heaviest_new_stage(spark, before)
    hot_share = (
        spark.read.parquet(str(skew_dir / "events.parquet"))
        .filter(F.col("user_id") == 999_999_999)
        .count()
        / n_events
    )
    results["w2_sessionization"] = {
        "rows": n_events,
        "hot_key_share": round(hot_share, 3),
        "uniform_sec": base_sec,
        "skewed_sec": skew_sec,
        "slowdown": round(skew_sec / base_sec, 2),
        **stage,
    }

    # ---- p7c BM25 --------------------------------------------------------
    base_sec = _timed(lambda: force(p7c_multimatch_bm25(spark, str(base_dir))))
    before = _completed_stage_ids(spark)
    skew_sec = _timed(lambda: force(p7c_multimatch_bm25(spark, str(skew_dir))))
    stage = _heaviest_new_stage(spark, before)
    results["p7c_multimatch_bm25"] = {
        "rows": n_docs,
        "hot_term_doc_share": 0.5,
        "uniform_sec": base_sec,
        "skewed_sec": skew_sec,
        "slowdown": round(skew_sec / base_sec, 2),
        **stage,
    }

    # ---- BENCH.md section ------------------------------------------------
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    lines = [
        MARK_BEGIN,
        "## Hot-key skew stress: sessionization + BM25 (round 4)",
        "",
        f"Generated by `python scripts/skew_stress.py` on {stamp}; sf0.1",
        "inputs with planted hot keys, warm-up + best-of-2, task quantiles",
        "from the Spark UI REST API for the heaviest stage of the skewed run.",
        "",
        "| query | planted skew | uniform (s) | skewed (s) | slowdown |"
        " task median/p95/max (s) | straggler max/median |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        skew_desc = (
            f"1 user = {r['hot_key_share']:.0%} of {r['rows']:,} events"
            if "hot_key_share" in r
            else f"1 term in {r['hot_term_doc_share']:.0%} of {r['rows']:,} docs"
        )
        lines.append(
            f"| {name} | {skew_desc} | {r['uniform_sec']} | {r['skewed_sec']} "
            f"| {r['slowdown']}x | {r['task_sec_median']} / {r['task_sec_p95']}"
            f" / {r['task_sec_max']} | {r['straggler_ratio']}x |"
        )
    lines += [
        "",
        "Pass bar (VERDICT r3 #5): no task-level straggler > 4x the stage",
        "median. Sessionization's hot user is inherently serial within one",
        "session-window group; BM25's posting shuffle keys on (doc_id, term),",
        "which stays fine-grained however hot the term — salting is added",
        "only if these measurements demand it (pipeline.py:343 pattern).",
        MARK_END,
    ]
    bench = Path(REPO / "BENCH.md")
    text = bench.read_text()
    if MARK_BEGIN in text:
        pre = text[: text.index(MARK_BEGIN)]
        post = text[text.index(MARK_END) + len(MARK_END) :]
        text = pre + "\n".join(lines) + post
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines) + "\n"
    bench.write_text(text)

    print(json.dumps({"metric": "skew_stress", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
