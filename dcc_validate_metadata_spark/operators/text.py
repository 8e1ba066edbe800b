"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token counting
and document fingerprinting over a ``documents(doc_id, text, …)`` table.
Everything is built from JVM-side ``pyspark.sql.functions`` (no Python in
the hot path); each operator has an exact ANSI-SQL twin in
``queries/trainingdata.py`` so the DuckDB oracle can replay it
byte-for-byte. The reference has no text analytics — the nearest
analogue is its cosmetic string pipeline (SURVEY.md §2.7 F1/F5), which
``normalize_text`` generalizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import round4

# deterministic English function-word list used by the quality + lang-id
# heuristics; any change must be mirrored in queries/trainingdata.py oracles
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

_PUNCT_RE = "[^a-zA-Z0-9 \\t\\n]"
_WS_RE = "\\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization; identical to DuckDB's
    ``regexp_split_to_array(trim(text), '\\s+')``."""
    return F.split(F.trim(text), _WS_RE)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace, trim."""
    stripped = F.regexp_replace(F.lower(text), _PUNCT_RE, "")
    return F.trim(F.regexp_replace(stripped, _WS_RE, " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    Cross-engine reproducible (same md5 in DuckDB)."""
    return F.md5(normalize_text(text))


def _stopword_count(tok: Column) -> Column:
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tok, lambda t: F.array_contains(arr, F.lower(t))))


def token_count_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars_actual) — token counting + length audit."""
    tok = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(tok).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
    )


# BPE-ish pre-tokenizer: contraction suffixes, letter runs, digit runs,
# non-space-non-alnum runs — the GPT-2 pre-tokenization shape without the
# merge table (counting these units approximates BPE token counts far
# better than whitespace splitting; the regex is engine-portable)
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_token_count_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_units, chars_per_unit) — subword-style unit counts via
    ``regexp_count`` (JVM regex, one projection, no shuffle). A real BPE
    count = these units split further by the merge vocabulary; this is
    the standard cheap proxy for budgeting token counts at corpus scale."""
    n = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    from .dedup import round4

    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_units"),
        round4(
            F.length(F.col(text_col)).cast("double")
            / F.when(n > 0, n.cast("double")).otherwise(F.lit(None))
        ).alias("chars_per_unit"),
    )


def quality_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score, all rounded so the
    DuckDB oracle reproduces the exact doubles:

      stop_ratio  = stopword tokens / tokens
      punct_ratio = non-alnum chars / chars
      mean_tok_len, n_tokens
      quality = 0.4*least(1, n_tokens/50) + 0.3*stop_ratio*5 bounded
                + 0.3*(1 - punct_ratio)    (heuristic, documented)
    """
    t = F.col(text_col)
    tok = tokens(t)
    n_tok = F.size(tok).cast("double")
    stop_ratio = _stopword_count(tok).cast("double") / n_tok
    n_chars = F.length(t).cast("double")
    punct = n_chars - F.length(F.regexp_replace(t, _PUNCT_RE, "")).cast("double")
    punct_ratio = punct / n_chars
    mean_tok_len = (
        F.aggregate(tok, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")) / n_tok
    )
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(50.0))
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * F.lit(5.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
    )
    return df.select(
        F.col(id_col),
        F.size(tok).cast("long").alias("n_tokens"),
        round4(stop_ratio).alias("stop_ratio"),
        round4(punct_ratio).alias("punct_ratio"),
        round4(mean_tok_len).alias("mean_tok_len"),
        round4(quality).alias("quality"),
    )


def lang_id_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """N-gram-free stopword-density language heuristic: docs whose
    stopword ratio >= 0.03 are predicted ``en``, else ``und``. Real
    pipelines swap in a fastText model via mapInPandas; the Spark plumbing
    (one projection, no shuffle) is the part that matters at 100 TB.
    ``keep_cols`` carries source columns through the same projection so
    callers never need a self-join back onto the input."""
    tok = tokens(F.col(text_col))
    ratio = _stopword_count(tok).cast("double") / F.size(tok).cast("double")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
        round4(ratio).alias("en_score"),
    )


def fingerprint_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))


# per-worker-process model cache for model_text_stage: Python workers are
# reused across tasks, so a model loaded under a cache_key survives for
# the worker's lifetime — the fastText/tokenizers load cost is paid once
# per executor core, not once per task/batch
_WORKER_MODELS: dict = {}


def model_text_stage(
    df: DataFrame,
    model_factory,
    apply_fn,
    output_schema: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """The model slot: run an arbitrary Python model (fastText lang-id,
    a `tokenizers` BPE, a quality classifier) over the text column as ONE
    Arrow-batched ``mapInPandas`` projection — no shuffle, no driver
    round-trip, executors stream record batches through the model.

    * ``model_factory()`` builds/loads the model. It runs lazily on the
      WORKER (never the driver, so a 1 GB model file never rides the
      closure — load from executor-local storage inside the factory) and,
      with ``cache_key`` set, at most once per worker process.
    * ``apply_fn(model, pdf) -> pandas.DataFrame`` maps one input batch
      (columns: id_col, text_col, *keep_cols) to output rows matching
      ``output_schema``; batch sizes follow
      ``spark.sql.execution.arrow.maxRecordsPerBatch``.

    The heuristic stages (:func:`lang_id_df`,
    :func:`bpe_ish_token_count_df`) stay the JVM-side default; this is
    the documented swap-in point when a real model is required."""
    cols = [id_col, text_col, *(keep_cols or [])]

    def gen(batches):
        model = None
        for pdf in batches:
            if model is None:
                if cache_key is not None:
                    model = _WORKER_MODELS.get(cache_key)
                if model is None:
                    model = model_factory()
                    if cache_key is not None:
                        _WORKER_MODELS[cache_key] = model
            yield apply_fn(model, pdf)

    return df.select(*cols).mapInPandas(gen, schema=output_schema)


def model_lang_id_df(
    df: DataFrame,
    model_factory,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_key: str | None = None,
) -> DataFrame:
    """fastText-shaped lang-id through the model slot: the model object
    must expose ``predict(list[str]) -> (labels, scores)`` (fastText's
    batch API). Output matches :func:`lang_id_df`'s (doc_id, pred_lang,
    en_score) so the heuristic and model paths are drop-in swappable.

    ``cache_key`` defaults to None (no cross-job caching): a shared
    default key would make two DIFFERENT lang-id models in one Spark
    application silently reuse whichever model a warm worker cached
    first. Pass a key that identifies the model (e.g. its path) to get
    once-per-worker loading."""
    import pandas as pd

    def apply_fn(model, pdf):
        labels, scores = model.predict(pdf[text_col].fillna("").tolist())
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "pred_lang": [
                    l[0].replace("__label__", "") if isinstance(l, (list, tuple)) else str(l).replace("__label__", "")
                    for l in labels
                ],
                "en_score": [
                    float(s[0]) if isinstance(s, (list, tuple)) else float(s)
                    for s in scores
                ],
            }
        )

    # derive the id column's type from the input so a string doc_id (or
    # any non-long id) round-trips through the Arrow stage unchanged —
    # hardcoding 'long' here broke drop-in parity with lang_id_df
    id_ddl = df.schema[id_col].dataType.simpleString()
    return model_text_stage(
        df,
        model_factory,
        apply_fn,
        output_schema=f"{id_col} {id_ddl}, pred_lang string, en_score double",
        id_col=id_col,
        text_col=text_col,
        cache_key=cache_key,
    )


def bigram_perplexity_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, perplexity): per-document perplexity under a
    word-bigram language model trained on the WHOLE corpus with add-k
    smoothing — the classic KenLM-style quality filter (high perplexity =
    out-of-distribution / low-quality text), expressed entirely in
    relational algebra:

    * one pass builds the corpus bigram table (lowercased whitespace
      tokens, a <s> start sentinel per doc);
    * two groupBys produce global C(prev, w) and C(prev) count tables —
      both map-side combinable and token-keyed (the bigram-construction
      window is per-doc, bounded by document length; the global count
      shuffles never key on doc ids);
    * each doc's bigrams join the count tables (token-keyed shuffle
      joins; count tables are vocabulary-sized, not corpus-sized) and
      fold into avg log2 P(w|prev) per doc;
    * perplexity = 2^(-avg log2 p), rounded to 2 dp (summation-order
      float noise stays far below the rounding grid).

    The smoothing denominator uses V = distinct vocabulary size as a
    one-row lazy aggregate broadcast-cross-joined in (same shape as the
    SQL twin's CTE) — constructing this DataFrame runs NO Spark job.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "w"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    bigrams = toks.select(
        "id",
        F.coalesce(F.lag("w").over(w), F.lit("<s>")).alias("prev"),
        "w",
    )
    big_counts = bigrams.groupBy("prev", "w").agg(
        F.count(F.lit(1)).alias("c_bi")
    )
    prev_counts = bigrams.groupBy("prev").agg(F.count(F.lit(1)).alias("c_prev"))
    vocab_df = bigrams.agg(F.countDistinct("w").alias("_vocab"))

    p = (F.col("c_bi") + F.lit(k)) / (
        F.col("c_prev") + F.lit(k) * F.col("_vocab").cast("double")
    )
    scored = (
        bigrams.join(big_counts, on=["prev", "w"])
        .join(prev_counts, on="prev")
        .crossJoin(F.broadcast(vocab_df))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(F.log2(p)).alias("_avg_lp"),
        )
    )
    ppl = F.pow(F.lit(2.0), -F.col("_avg_lp"))
    return scored.select(
        "id",
        "n_bigrams",
        (F.floor(ppl * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)).alias(
            "perplexity"
        ),
    )


def repetition_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
) -> DataFrame:
    """(id, dup_line_ratio, dup_line_char_ratio, top_ngram_char_ratio) —
    the Gopher-style within-document repetition signals used to drop
    boilerplate/spam from training corpora:

    * ``dup_line_ratio``       — duplicated lines / lines;
    * ``dup_line_char_ratio``  — characters inside duplicated lines /
      all line characters;
    * ``top_ngram_char_ratio`` — characters claimed by the single most
      frequent word n-gram (count × gram length) / all characters, capped
      at 1.0 (ties: largest char mass; overlapping occurrences — e.g.
      'a a a a a' — would otherwise double-count shared characters).

    Scale shape: explode → two-level hash aggregation, LINEAR in
    document size (a per-doc array-lambda formulation would be quadratic
    in distinct lines/grams — unusable on 100 KB web documents). The
    shuffles key on (doc, line) / (doc, gram) and are map-side
    combinable; every doc's final stats are two tiny rows."""
    t = F.col(text_col)
    base = df.select(F.col(id_col).alias("id"), t.alias("_t"))

    lines = base.select(
        "id", F.explode(F.split(F.col("_t"), "\\n")).alias("line")
    ).select("id", F.trim("line").alias("line")).filter(F.col("line") != "")
    line_stats = (
        lines.groupBy("id", "line")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_lines"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_lines"),
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("line")).otherwise(0)
            ).alias("dup_chars"),
            F.sum(F.col("c") * F.length("line")).alias("all_chars"),
        )
    )

    tok = tokens(F.lower(F.col("_t")))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short docs
    grams_arr = F.when(
        F.size(tok) >= ngram_n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - F.lit(ngram_n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, ngram_n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select("id", F.explode(grams_arr).alias("g"))
    # lexicographic max of (count, count*len): among the most frequent
    # grams, the one covering the most characters
    gram_stats = (
        grams.groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.max(
                F.struct(
                    F.col("c").alias("c"),
                    (F.col("c") * F.length("g")).alias("chars"),
                )
            ).alias("top")
        )
        .select("id", F.col("top.chars").alias("top_gram_chars"))
    )

    return (
        base.select("id", F.length("_t").alias("text_chars"))
        .join(line_stats, on="id", how="left")
        .join(gram_stats, on="id", how="left")
        .select(
            F.col("id"),
            round4(
                F.when(
                    F.col("n_lines") > 0,
                    F.col("dup_lines").cast("double")
                    / F.col("n_lines").cast("double"),
                ).otherwise(F.lit(0.0))
            ).alias("dup_line_ratio"),
            round4(
                F.when(
                    F.col("all_chars") > 0,
                    F.col("dup_chars").cast("double")
                    / F.col("all_chars").cast("double"),
                ).otherwise(F.lit(0.0))
            ).alias("dup_line_char_ratio"),
            round4(
                F.when(
                    (F.col("text_chars") > 0)
                    & F.col("top_gram_chars").isNotNull(),
                    F.least(
                        F.lit(1.0),
                        F.col("top_gram_chars").cast("double")
                        / F.col("text_chars").cast("double"),
                    ),
                ).otherwise(F.lit(0.0))
            ).alias("top_ngram_char_ratio"),
        )
    )
