"""Query packs for the driver oracle contract (__spark_entry__.py).

Each submodule exports ``QUERIES: dict[name, (fn, oracle_sql | None)]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is equivalent
ANSI SQL for DuckDB over the same parquet tables. Column names/aliases are
identical on both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

# Queries the driver's CORRECTNESS gate MUST cover. The gate records only
# the first ~50 entries of ``queries()``, so ordering is part of the
# contract: validationpack (north-rule flagship) and trainingdata (LLM
# pipeline ops) come first, relational basics fill the remainder.
# tests/test_entry_contract.py asserts the window covers this list so a
# reorder can't silently drop a must-prove query again.
DRIVER_WINDOW = 50
MUST_PROVE = [
    "img_validate",
    "img_verdicts",
    "samples_faang_schema",
    "samples_faang_onto",
    "g2_catalog_joins",
    "j12_taxon_enrichment",
    "s8_biosamples_json",
    "s9_ena_sample_xml",
    "s9b_ena_run_xml",
    "s9c_ena_experiment_xml",
    "s9d_ena_study_xml",
    "s9e_ena_analysis_xml",
    "s9f_ena_submission_xml",
    "p7b_multimatch_analyzed",
    "p7c_multimatch_bm25",
    "w2_sessionization",
    "txt_filter_pipeline",
    "av_audio_features",
    "av_video_frames",
    "img_phash_neardup",
    "txt_token_counts",
    "txt_quality",
    "txt_perplexity",
    "txt_repetition",
    "dd_exact_groups",
    "dd_minhash_lsh",
    "dd_duplicate_clusters",
    "ann_topk_bruteforce",
    "ann_ivf_fullprobe",
]


def all_queries() -> dict:
    from . import relational, trainingdata, validationpack

    out = {}
    for mod in (validationpack, trainingdata, relational):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
