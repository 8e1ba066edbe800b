"""Relational query pack exercising the SURVEY.md §2 operator inventory
over the driver's TPC-H-ish tables, each with a DuckDB oracle.

Coverage map (operator id → query):
  P3 terms filter → p3_terms_filter      P4 negation → p4_negated_filter
  P5 array predicate → p5_array_predicate P6 wildcard → p6_wildcard_like
  P7 multi-field match → p7_multimatch    P9 id lookup → p9_id_lookup
  P10 safe-name regex → p10_safe_name     P11 name derivation → p11_record_name
  J1 hash join+agg → j1_join_agg          J2 semi join → j2_semi_join
  J3 multi-way join → j3_multiway_join    J5 anti join → j5_anti_join
  J6 broadcast lookup → j6_broadcast_lookup J9 self join → j9_self_join
  A1 terms agg top-k → a1_terms_top       A2 json-extract agg → a2_json_agg
  A3 missing agg → a3_null_counts         A5 verdict rollup → a5_verdict_rollup
  A7 column summary → a7_column_stats
  O1 sort → o1_sort_topk  O2 sort-by-length → o2_sort_by_len
  O3 pagination window → o3_window_topn   (+ w1_running_sum windowed agg)
  U1 union fan-out → u1_union_fanout      U2 dedup → u2_distinct_pairs
  F1 snake case → f1_snake_case           F3 date handling → f3_date_agg
  F10 array join → f10_array_join         F11 checksum → f11_checksum
  P1 structure projection+NULL fill → p1_structure_projection
  J11 derived back-link → j11_derived_backlink
  A4 hit count → a4_hit_count             A6 distinct sets → a6_distinct_sets
  F2 case transforms → f2_case_transforms F4 leading zero → f4_leading_zero
  F5 lower-label match → f5_lower_label_match
  F8 nested flatten → f8_nested_flatten   F12 JSON→struct → f12_json_struct
  TPC-H-style pricing rollup → q1_pricing_summary

Plan-shape notes are in each docstring; see scripts/explain_plans.py for
the `.explain("formatted")` audit (pushed filters, broadcast choices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- aggs

def a1_terms_top(spark, sf_dir):
    """A1: group-by count, top 25 buckets (ties broken on the key)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(25)
    )


A1_SQL = """
SELECT event_type, count(*) AS cnt FROM events
GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 25
"""


def a2_json_agg(spark, sf_dir):
    """A2: predicate/agg over a JSON-encoded props column (the nested-doc
    analogue); JSON parsing stays JVM-side via get_json_object."""
    return (
        _t(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("k").alias("k_min"), F.max("k").alias("k_max"))
        .orderBy("k_mod")
    )


A2_SQL = """
SELECT try_cast(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       count(*) AS cnt,
       min(try_cast(json_extract_string(props, '$.k') AS INT)) AS k_min,
       max(try_cast(json_extract_string(props, '$.k') AS INT)) AS k_max
FROM events GROUP BY 1 ORDER BY 1
"""


def a3_null_counts(spark, sf_dir):
    """A3: missing-value aggregation (null-rate stat) in one pass."""
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).cast("long").alias("n_null_value"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).cast("long").alias("n_null_props"),
    )


A3_SQL = """
SELECT count(*) AS n_rows,
       sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_value,
       sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_props
FROM events
"""


def a5_verdict_rollup(spark, sf_dir):
    """A5: boolean any-over-group verdict (pass/fail per unit)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.max("o_totalprice") > 450000.0).alias("fail"),
        )
        .orderBy("o_orderpriority")
    )


A5_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       max(o_totalprice) > 450000.0 AS fail
FROM orders GROUP BY 1 ORDER BY 1
"""


def a7_column_stats(spark, sf_dir):
    """A7: per-column profile (count / nulls / min / max / mean)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        F.round(F.avg("l_quantity"), 4).alias("qty_mean"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).cast("long").alias("qty_nulls"),
        F.min("l_discount").alias("disc_min"),
        F.max("l_discount").alias("disc_max"),
    )


A7_SQL = """
SELECT count(*) AS n_rows,
       min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
       round(avg(l_quantity), 4) AS qty_mean,
       sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS qty_nulls,
       min(l_discount) AS disc_min, max(l_discount) AS disc_max
FROM lineitem
"""


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped rollup: map-side partial agg → tiny shuffle on two
    low-cardinality keys; every expression in whole-stage codegen."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ filters

def p3_terms_filter(spark, sf_dir):
    """P3: isin terms filter, pushed to the parquet scan."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R") & (F.col("l_quantity") < 3))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


P3_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
WHERE l_returnflag IN ('A','R') AND l_quantity < 3
ORDER BY l_orderkey, l_linenumber LIMIT 100
"""


def p4_negated_filter(spark, sf_dir):
    """P4: negated filter (must_not)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(~F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


P4_SQL = """
SELECT event_type, count(*) AS cnt FROM events
WHERE event_type NOT IN ('click','view') GROUP BY 1 ORDER BY 1
"""


def p5_array_predicate(spark, sf_dir):
    """P5: predicate over an array (higher-order, stays JVM-side)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), "\\s+")
    return (
        d.filter(F.array_contains(toks, "vector"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
        .limit(200)
    )


P5_SQL = """
SELECT doc_id, lang FROM documents
WHERE list_contains(regexp_split_to_array(trim(text), '\\s+'), 'vector')
ORDER BY doc_id LIMIT 200
"""


def p6_wildcard_like(spark, sf_dir):
    """P6: wildcard predicate → LIKE."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_name").like("%12%"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(100)
    )


P6_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_name LIKE '%12%' ORDER BY c_custkey LIMIT 100
"""


def p7_multimatch(spark, sf_dir):
    """P7: full-text-ish multi-term contains over a text column."""
    d = _t(spark, sf_dir, "documents")
    lt = F.lower(F.col("text"))
    return (
        d.filter(lt.contains("spark") & lt.contains("window"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
        .limit(200)
    )


P7_SQL = """
SELECT doc_id, n_chars FROM documents
WHERE contains(lower(text), 'spark') AND contains(lower(text), 'window')
ORDER BY doc_id LIMIT 200
"""


_MM_TERMS = ("spark", "window", "shuffle")


def p7b_multimatch_analyzed(spark, sf_dir):
    """P7b: ES ``multi_match`` with standard-analyzer semantics — the
    documented P7 gap closed to analyzer level: both fields are tokenized
    (lowercase, split on non-alphanumeric — the standard analyzer's
    letter/digit segmentation), the query is OR-of-terms, and docs rank
    by a deterministic coord score (matched-term count, best_fields max
    over text/source). BM25's corpus-frequency weighting is the remaining
    declared delta (needs corpus stats; nondeterministic across shard
    layouts in ES itself)."""
    d = _t(spark, sf_dir, "documents")

    def coord(col):
        tok = F.split(F.lower(col), "[^a-z0-9]+")
        s = F.lit(0)
        for t in _MM_TERMS:
            s = s + F.array_contains(tok, t).cast("int")
        return s

    score = F.greatest(coord(F.col("text")), coord(F.col("source")))
    return (
        d.select("doc_id", score.alias("score"))
        .filter(F.col("score") >= 1)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(100)
    )


_MM_COORD = lambda fld: " + ".join(  # noqa: E731
    f"list_contains(regexp_split_to_array(lower({fld}), '[^a-z0-9]+'), '{t}')::INT"
    for t in ("spark", "window", "shuffle")
)

P7B_SQL = f"""
SELECT doc_id, score FROM (
  SELECT doc_id,
         greatest(({_MM_COORD('text')}), ({_MM_COORD('source')})) AS score
  FROM documents
) WHERE score >= 1
ORDER BY score DESC, doc_id LIMIT 100
"""


BM25_K1 = 1.2
BM25_B = 0.75


def p7c_multimatch_bm25(spark, sf_dir):
    """P7c: the FULL ES `match` scoring — Lucene BM25 (k1=1.2, b=0.75,
    idf = ln(1 + (N-df+0.5)/(df+0.5))) computed from corpus statistics in
    pure relational algebra, eliminating P7's last declared delta for
    batch scoring. One tokenize-explode pass feeds (a) per-doc length,
    (b) per-(doc, query-term) tf — the explode is FILTERED to the query
    terms before the tf aggregation, so the shuffle carries only matching
    postings (O(matching tokens), not O(corpus tokens)); N/avgdl and the
    3-row df table broadcast. Scores rounded to 4 dp on both engines so
    ln/division ulp differences cannot flip the ordering."""
    from ..operators.dedup import round4

    d = _t(spark, sf_dir, "documents")
    terms = list(_MM_TERMS)
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("t"),
    ).filter(F.col("t") != "")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = tok.filter(F.col("t").isin(terms))
    tf = hits.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df_t = hits.groupBy("t").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = (
        tf.join(F.broadcast(df_t), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "t",
            (
                idf
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    # pivot to one column per query term, then add in FIXED term order:
    # a bare sum() would add the ≤3 doubles in partial-aggregation order,
    # and a 1-ulp difference vs the oracle's order could flip round4 at a
    # .00005 boundary — fixed-order addition is bit-identical on both
    # engines
    pivoted = per_term.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("t") == t, F.col("s"))).alias(f"_s{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    scored = pivoted.select("doc_id", round4(total).alias("score"))
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(100)


_BM25_TERMS_SQL = ", ".join(f"('{t}')" for t in ("spark", "window", "shuffle"))

P7C_SQL = f"""
WITH tok AS (
  SELECT doc_id, t
  FROM documents, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE t <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
terms(t) AS (VALUES {_BM25_TERMS_SQL}),
hits AS (SELECT doc_id, tok.t FROM tok JOIN terms ON terms.t = tok.t),
tf AS (SELECT doc_id, t, count(*) AS tf FROM hits GROUP BY doc_id, t),
df_t AS (SELECT t, count(DISTINCT doc_id) AS df FROM hits GROUP BY t)
SELECT doc_id,
       floor((
         0.0
         + coalesce(max(CASE WHEN t = 'spark' THEN s END), 0.0)
         + coalesce(max(CASE WHEN t = 'window' THEN s END), 0.0)
         + coalesce(max(CASE WHEN t = 'shuffle' THEN s END), 0.0)
       ) * 10000.0 + 0.5) / 10000.0 AS score
FROM (
  SELECT doc_id, t,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * ({BM25_K1} + 1))
         / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)) AS s
  FROM tf JOIN df_t USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus
)
GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 100
"""


def p9_id_lookup(spark, sf_dir):
    """P9: point lookup by id."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    )


P9_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer WHERE c_custkey = 42
"""


def p10_safe_name(spark, sf_dir):
    """P10: allowlist-regex guard as a predicate."""
    return (
        _t(spark, sf_dir, "part")
        .select(F.col("p_name").rlike("^[A-Za-z0-9._-]+$").alias("is_safe"))
        .groupBy("is_safe")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("is_safe")
    )


P10_SQL = """
SELECT regexp_matches(p_name, '^[A-Za-z0-9._-]+$') AS is_safe, count(*) AS cnt
FROM part GROUP BY 1 ORDER BY 1
"""


def p11_record_name(spark, sf_dir):
    """P11: record-name derivation via coalesce fallback chain."""
    o = _t(spark, sf_dir, "orders")
    name = F.coalesce(
        F.nullif(F.trim(F.col("o_orderpriority")), F.lit("")),
        F.concat(F.lit("orders_"), F.col("o_orderkey").cast("string")),
    )
    return (
        o.select("o_orderkey", F.concat(name, F.lit("-"), F.col("o_orderkey").cast("string")).alias("rec_name"))
        .orderBy("o_orderkey")
        .limit(100)
    )


P11_SQL = """
SELECT o_orderkey,
       coalesce(nullif(trim(o_orderpriority), ''), 'orders_' || o_orderkey)
         || '-' || o_orderkey AS rec_name
FROM orders ORDER BY o_orderkey LIMIT 100
"""


# -------------------------------------------------------------------- joins

def j1_join_agg(spark, sf_dir):
    """J1: hash join + nested re-agg (orders per customer segment)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


J1_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def j2_semi_join(spark, sf_dir):
    """J2: semi-join pushdown — the reference chunks FK terms at 50k
    (graphql helpers.py:195-213); Spark broadcasts the distinct-key side."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


J2_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
ORDER BY c_custkey
"""


def j3_multiway_join(spark, sf_dir):
    """J3: recursive/multi-way join tree — Catalyst reorders freely; the
    small dims (nation, region) broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name")
    )


J3_SQL = """
SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1 ORDER BY 1
"""


def j5_anti_join(spark, sf_dir):
    """J5: referential-absence check as a left-anti join."""
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_urgent"))
        .orderBy("c_mktsegment")
    )


J5_SQL = """
SELECT c_mktsegment, count(*) AS n_without_urgent FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY 1 ORDER BY 1
"""


def j6_broadcast_lookup(spark, sf_dir):
    """J6/J7: external-lookup join — snapshot dim broadcast to the fact."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"), F.round(F.avg("s_acctbal"), 4).alias("avg_bal"))
        .orderBy("n_name")
    )


J6_SQL = """
SELECT n_name, count(*) AS n_suppliers, round(avg(s_acctbal), 4) AS avg_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
"""


def j9_self_join(spark, sf_dir):
    """J9: 1-hop self-join (same-region nation pairs)."""
    n = _t(spark, sf_dir, "nation")
    a = n.select(F.col("n_regionkey").alias("rk"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_regionkey").alias("rk"), F.col("n_name").alias("name_b"))
    return (
        a.join(b, on="rk")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(F.col("rk").alias("n_regionkey"), "name_a", "name_b")
        .orderBy("n_regionkey", "name_a", "name_b")
    )


J9_SQL = """
SELECT a.n_regionkey, a.n_name AS name_a, b.n_name AS name_b
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
ORDER BY 1, 2, 3
"""


# ------------------------------------------------------------ sorts / limits

def o1_sort_topk(spark, sf_dir):
    """O1/O4: global sort + limit → TakeOrderedAndProject (no full sort)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(50)
    )


O1_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
"""


def o2_sort_by_len(spark, sf_dir):
    """O2: script-sort by length analogue."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("text_len"))
        .orderBy(F.desc("text_len"), F.asc("doc_id"))
        .limit(20)
    )


O2_SQL = """
SELECT doc_id, length(text) AS text_len FROM documents
ORDER BY text_len DESC, doc_id LIMIT 20
"""


def o3_window_topn(spark, sf_dir):
    """O3: pagination/top-N per group via row_number window."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "rank")
    )


O3_SQL = """
SELECT c_mktsegment, rank, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rank
  FROM customer
) WHERE rank <= 3 ORDER BY c_mktsegment, rank
"""


def w1_running_sum(spark, sf_dir):
    """Windowed running aggregate (ordered frame — deterministic float sum)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select("user_id", "event_id", F.round(F.sum("value").over(w), 2).alias("running_value"))
        .orderBy("user_id", "event_id")
    )


W1_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_value
FROM events WHERE user_id < 5 ORDER BY user_id, event_id
"""


def w2_sessionization(spark, sf_dir):
    """W2: event-time sessionization with Spark's native
    ``session_window`` (30-min inactivity gap) — the batch form of the
    streaming stateful-session operator, so the same groupBy works under
    readStream with a watermark. The value sum goes through an exact
    DECIMAL (order-independent) and converts to double at the end, so
    per-session float totals cannot drift with aggregation order vs the
    oracle's gaps-and-islands reconstruction."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


W2_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                -- strictly greater: Spark's session_window MERGES events
                -- exactly gap apart (verified live: 30:00.000000 apart
                -- = one session), so >= here would split them
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       min(ts) AS session_start,
       count(*) AS n_events,
       sum(value::DECIMAL(18,2))::DOUBLE AS total_value
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------- set ops

def u1_union_fanout(spark, sf_dir):
    """U1: fan-out union of per-source queries, merged + deduped."""
    o = _t(spark, sf_dir, "orders")
    q1 = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_orderstatus")
    q2 = o.filter(F.col("o_totalprice") > 450000.0).select("o_orderkey", "o_orderstatus")
    return (
        q1.unionByName(q2)
        .distinct()
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderstatus")
    )


U1_SQL = """
SELECT o_orderstatus, count(*) AS cnt FROM (
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 450000.0
) GROUP BY 1 ORDER BY 1
"""


def u2_distinct_pairs(spark, sf_dir):
    """U2: dedup-on-merge → DISTINCT."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


U2_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2
"""


# ----------------------------------------------------------------- scalars

def f1_snake_case(spark, sf_dir):
    """F1: convert_to_snake_case (lower, spaces/dashes → underscore)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.regexp_replace(F.lower(F.col("o_orderpriority")), "[ -]", "_").alias("snake")
        )
        .distinct()
        .orderBy("snake")
    )


F1_SQL = """
SELECT DISTINCT regexp_replace(lower(o_orderpriority), '[ -]', '_', 'g') AS snake
FROM orders ORDER BY 1
"""


def f3_date_agg(spark, sf_dir):
    """F3/F4: date parsing/formatting + time-bucket aggregation."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .orderBy("ym")
    )


F3_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY 1 ORDER BY 1
"""


def f10_array_join(spark, sf_dir):
    """F10: per-group ordered array join for export."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("l_linenumber")), lambda x: x.cast("string")),
                ",",
            ).alias("lines")
        )
        .orderBy("l_orderkey")
        .limit(200)
    )


F10_SQL = """
SELECT l_orderkey, string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS lines
FROM lineitem GROUP BY 1 ORDER BY 1 LIMIT 200
"""


def f11_checksum(spark, sf_dir):
    """F11: checksum/byte accounting (md5 + length)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", F.md5("c_name").alias("name_md5"), F.length("c_name").alias("name_len"))
        .orderBy("c_custkey")
    )


F11_SQL = """
SELECT c_custkey, md5(c_name) AS name_md5, length(c_name) AS name_len
FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
"""


# ----------------------------------------------- remaining §2 inventory rows

def p1_structure_projection(spark, sf_dir):
    """P1: structure-aligned projection with NULL fill — re-project onto a
    template schema, absent template columns become typed NULLs
    (validation/helpers.py:84-146 get_record_structure/convert_to_none)."""
    template = [("c_custkey", "long"), ("c_name", "string"),
                ("c_mktsegment", "string"), ("c_phone", "string"),
                ("c_comment", "string")]
    df = _t(spark, sf_dir, "customer")
    cols = [
        (F.col(name) if name in df.columns else F.lit(None)).cast(t).alias(name)
        for name, t in template
    ]
    return df.select(*cols).filter(F.col("c_custkey") <= 50).orderBy("c_custkey")


P1_SQL = """
SELECT c_custkey, c_name, c_mktsegment,
       NULL AS c_phone, NULL AS c_comment
FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey
"""


def j11_derived_backlink(spark, sf_dir):
    """J11: derived back-link — keys present in the child table whose
    parent didn't match the primary filter, surfaced as implied parents
    (api/views.py:102-108: files matched but no dataset did)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    matched = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.select("l_orderkey")
        .distinct()
        .join(matched.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti")
        .orderBy("l_orderkey")
    )


J11_SQL = """
SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
ORDER BY l_orderkey
"""


def a4_hit_count(spark, sf_dir):
    """A4: hit-count rollup (track_total_hits) — filtered count."""
    e = _t(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "purchase").agg(
        F.count(F.lit(1)).alias("total_hits")
    )


A4_SQL = "SELECT count(*) AS total_hits FROM events WHERE event_type = 'purchase'"


def a6_distinct_sets(spark, sf_dir):
    """A6: distinct-set accumulation before a batch lookup — the
    driver-side set() of ids becomes a distributed DISTINCT
    (validation/RelationshipsIssues.py:13-24)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    ).orderBy("event_type")


A6_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


def f2_case_transforms(spark, sf_dir):
    """F2: remove_underscores / case cosmetic transforms for export
    (submission/helpers.py:20-36)."""
    return (
        _t(spark, sf_dir, "region")
        .select(
            F.lower(F.regexp_replace("r_name", " ", "_")).alias("snake"),
            F.upper(F.col("r_name")).alias("upper_name"),
            F.regexp_replace(F.lower(F.col("r_name")), "_", " ").alias("display"),
        )
        .orderBy("snake")
    )


F2_SQL = """
SELECT lower(replace(r_name, ' ', '_')) AS snake,
       upper(r_name) AS upper_name,
       replace(lower(r_name), '_', ' ') AS display
FROM region ORDER BY 1
"""


def f4_leading_zero(spark, sf_dir):
    """F4: add_leading_zero — lpad numeric fragments to fixed width
    (conversion/ReadExcelFile.py:446-456 date-serial repair)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        )
        .orderBy("p_partkey")
    )


F4_SQL = """
SELECT p_partkey, lpad(p_size::VARCHAR, 4, '0') AS size_padded,
       lpad(p_partkey::VARCHAR, 10, '0') AS key_padded
FROM part WHERE p_partkey <= 100 ORDER BY p_partkey
"""


def f5_lower_label_match(spark, sf_dir):
    """F5: case-insensitive label matching — join on lower() equality
    (WarningsAndAdditionalChecks.py:292-320 check_ols)."""
    e = _t(spark, sf_dir, "events")
    labels = (
        e.select(F.upper("event_type").alias("label")).distinct()
    )
    return (
        e.join(labels, F.lower(e["event_type"]) == F.lower(labels["label"]))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label")
    )


F5_SQL = """
WITH labels AS (SELECT DISTINCT upper(event_type) AS label FROM events)
SELECT l.label, count(*) AS n
FROM events e JOIN labels l ON lower(e.event_type) = lower(l.label)
GROUP BY 1 ORDER BY 1
"""


def f8_nested_flatten(spark, sf_dir):
    """F8: nested-struct flattening to dotted paths — build the nested doc
    shape, then flatten via struct field access
    (graphql_api/grapheneObjects/helpers.py:15-43 flatten_json)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    nested = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.struct(F.col("c_mktsegment").alias("segment")).alias("meta"),
        ).alias("doc"),
    )
    return nested.select(
        "c_custkey",
        F.col("doc.name").alias("doc_name"),
        F.col("doc.meta.segment").alias("doc_meta_segment"),
    ).orderBy("c_custkey")


F8_SQL = """
SELECT c_custkey, c_name AS doc_name, c_mktsegment AS doc_meta_segment
FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey
"""


def f12_json_struct(spark, sf_dir):
    """F12: annotation JSON → typed struct projection (from_json with an
    explicit schema; ontology_improver/utils.py:1-18 Zooma parse)."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        F.from_json(F.col("props"), "k INT").alias("p"),
    )
    return (
        parsed.select("event_id", F.col("p.k").alias("k"))
        .filter(F.col("k").isNotNull() & (F.col("k") < 5))
        .orderBy("event_id")
    )


F12_SQL = """
SELECT event_id, try_cast(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE try_cast(json_extract_string(props, '$.k') AS INT) < 5
ORDER BY event_id
"""


def s1_search_api(spark, sf_dir):
    """§3.2 REST-search surface end-to-end: filters + sort + offset/limit
    pagination + source pruning through the ES-DSL-shaped builder."""
    from .search_api import es_like_search

    ev = _t(spark, sf_dir, "events")
    return es_like_search(
        ev,
        filters={"event_type": ["click", "purchase"]},
        sort="event_id:asc",
        from_=10,
        size=100,
        source=["event_id", "event_type", "user_id"],
    )


S1_SEARCH_SQL = """
SELECT event_id, event_type, user_id FROM events
WHERE event_type IN ('click', 'purchase')
ORDER BY event_id OFFSET 10 LIMIT 100
"""


def s2_terms_aggs(spark, sf_dir):
    """A1/O4 fused facets: every requested aggregation field in ONE job
    (unpivot → single (field, value) groupBy → per-field window rank)
    instead of the ES-parity one-job-per-facet shape."""
    from .search_api import terms_aggregations_fused

    return terms_aggregations_fused(
        _t(spark, sf_dir, "orders"), ["o_orderpriority", "o_orderstatus"]
    )


S2_TERMS_SQL = """
WITH counts AS (
  SELECT 'o_orderpriority' AS field, o_orderpriority::VARCHAR AS value,
         count(*) AS cnt
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus::VARCHAR, count(*)
  FROM orders GROUP BY 2
),
ranked AS (
  SELECT field, value, cnt,
         row_number() OVER (PARTITION BY field
                            ORDER BY cnt DESC, value ASC)::INT AS rank
  FROM counts
)
SELECT field, value, cnt, rank FROM ranked
WHERE rank <= 25 ORDER BY field, rank
"""


def g1_joined_fetch(spark, sf_dir):
    """§3.3 GraphQL join-tree surface: filter tree compiled to a join
    tree with collect_list nesting; flattened here to (custkey, n_orders,
    total) so the oracle can hash it."""
    from .join_api import fetch_with_join

    tables = {
        "customer": _t(spark, sf_dir, "customer"),
        "orders": _t(spark, sf_dir, "orders"),
    }
    spec = {"basic": {"c_mktsegment": ["BUILDING"]}, "join": {"orders": {}}}
    catalog = {("customer", "orders"): ("c_custkey", "o_custkey")}
    out = fetch_with_join(tables, "customer", spec, catalog)
    # size(NULL) is -1 under legacy (non-ANSI) mode — guard the null case
    # explicitly, never via coalesce(size(...), 0)
    return out.select(
        "c_custkey",
        F.when(F.col("orders").isNull(), F.lit(0))
        .otherwise(F.size("orders"))
        .alias("n_orders"),
        F.round(
            F.coalesce(
                F.aggregate(
                    "orders", F.lit(0.0), lambda acc, o: acc + o["o_totalprice"]
                ),
                F.lit(0.0),
            ),
            2,
        ).alias("total"),
    ).orderBy("c_custkey")


G1_JOINED_SQL = """
SELECT c.c_custkey,
       count(o.o_orderkey)::INT AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Fused driver-window composites (VERDICT r3 #1)
#
# The driver's CORRECTNESS gate records only the first 50 queries() rows,
# which cannot certify 45 single-op relational queries alongside the
# flagship + training packs each round. Each composite below UNIONs the
# UNCHANGED per-op queries — the same functions, the same plans — onto a
# normalized (op, k1, k2, n, x) row shape with one fused DuckDB oracle
# built from the same per-op SQL, so one green driver row per composite
# certifies every member op every round. The per-op originals stay in
# PYTEST_QUERIES and are hash-checked by tests/test_pytest_pack.py.
# ---------------------------------------------------------------------------

from functools import reduce as _reduce


def _tag(df, op, k1, k2=None, n=None, x=None):
    """Project a per-op result onto the shared composite row shape."""
    return df.select(
        F.lit(op).alias("op"),
        k1.cast("string").alias("k1"),
        (k2 if k2 is not None else F.lit(None)).cast("string").alias("k2"),
        (n if n is not None else F.lit(None)).cast("long").alias("n"),
        (x if x is not None else F.lit(None)).cast("double").alias("x"),
    )


def _wrap_sql(op, inner, k1, k2="NULL", n="NULL", x="NULL"):
    """Wrap a per-op oracle as one normalized UNION ALL member."""
    return (
        f"SELECT '{op}' AS op, ({k1})::VARCHAR AS k1, ({k2})::VARCHAR AS k2,\n"
        f"       ({n})::BIGINT AS n, ({x})::DOUBLE AS x\n"
        f"FROM ({inner.strip()}) t"
    )


def _fuse_sql(*parts: str) -> str:
    return "SELECT op, k1, k2, n, x FROM (\n" + "\nUNION ALL\n".join(parts) + "\n)\nORDER BY op, k1, k2"


def _cat(*cols) -> F.Column:
    """Null-propagating concat with every operand cast to string —
    matches DuckDB's ``||`` semantics (concat_ws would skip nulls)."""
    return F.concat(*[c.cast("string") for c in cols])


def rel_filters(spark, sf_dir):
    """P1 + P3-P7 + P9-P11 fused: structure projection with NULL fill,
    terms/negated/array/wildcard/multimatch predicates, id lookup,
    safe-name guard, record-name derivation — each member is the
    unchanged single-op query, tagged and unioned."""
    parts = [
        _tag(
            p1_structure_projection(spark, sf_dir), "p1",
            k1=F.col("c_custkey"),
            k2=_cat(F.col("c_name"), F.lit("|"),
                    F.coalesce(F.col("c_phone"), F.lit("?")), F.lit("|"),
                    F.coalesce(F.col("c_comment"), F.lit("?"))),
        ),
        _tag(
            p3_terms_filter(spark, sf_dir), "p3",
            k1=_cat(F.col("l_orderkey"), F.lit(":"), F.col("l_linenumber")),
            k2=F.col("l_returnflag"), x=F.col("l_quantity"),
        ),
        _tag(p4_negated_filter(spark, sf_dir), "p4",
             k1=F.col("event_type"), n=F.col("cnt")),
        _tag(p5_array_predicate(spark, sf_dir), "p5",
             k1=F.col("doc_id"), k2=F.col("lang")),
        _tag(p6_wildcard_like(spark, sf_dir), "p6",
             k1=F.col("c_custkey"), k2=F.col("c_name")),
        _tag(p7_multimatch(spark, sf_dir), "p7",
             k1=F.col("doc_id"), n=F.col("n_chars")),
        _tag(
            p9_id_lookup(spark, sf_dir), "p9",
            k1=F.col("c_custkey"),
            k2=_cat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")),
            n=F.col("c_nationkey"),
        ),
        _tag(p10_safe_name(spark, sf_dir), "p10",
             k1=F.col("is_safe"), n=F.col("cnt")),
        _tag(p11_record_name(spark, sf_dir), "p11",
             k1=F.col("o_orderkey"), k2=F.col("rec_name")),
    ]
    return _reduce(DataFrame.unionByName, parts).orderBy("op", "k1", "k2")


REL_FILTERS_SQL = _fuse_sql(
    _wrap_sql("p1", P1_SQL, "c_custkey",
              "c_name || '|' || coalesce(c_phone, '?') || '|' || coalesce(c_comment, '?')"),
    _wrap_sql("p3", P3_SQL, "l_orderkey || ':' || l_linenumber",
              "l_returnflag", x="l_quantity"),
    _wrap_sql("p4", P4_SQL, "event_type", n="cnt"),
    _wrap_sql("p5", P5_SQL, "doc_id", "lang"),
    _wrap_sql("p6", P6_SQL, "c_custkey", "c_name"),
    _wrap_sql("p7", P7_SQL, "doc_id", n="n_chars"),
    _wrap_sql("p9", P9_SQL, "c_custkey", "c_name || '|' || c_mktsegment",
              n="c_nationkey"),
    _wrap_sql("p10", P10_SQL, "is_safe", n="cnt"),
    _wrap_sql("p11", P11_SQL, "o_orderkey", "rec_name"),
)


def rel_joins(spark, sf_dir):
    """J1-J3 + J5 + J6 + J9 + J11 + the GraphQL join surface (G1) fused:
    hash join + re-agg, semi/anti joins, multi-way broadcast tree,
    self-join, derived back-link, left-join nesting."""
    parts = [
        _tag(j1_join_agg(spark, sf_dir), "j1",
             k1=F.col("c_mktsegment"), n=F.col("n_orders"), x=F.col("sum_price")),
        _tag(j2_semi_join(spark, sf_dir), "j2",
             k1=F.col("c_custkey"), k2=F.col("c_name")),
        _tag(j3_multiway_join(spark, sf_dir), "j3",
             k1=F.col("r_name"), n=F.col("n_items"), x=F.col("revenue")),
        _tag(j5_anti_join(spark, sf_dir), "j5",
             k1=F.col("c_mktsegment"), n=F.col("n_without_urgent")),
        _tag(j6_broadcast_lookup(spark, sf_dir), "j6",
             k1=F.col("n_name"), n=F.col("n_suppliers"), x=F.col("avg_bal")),
        _tag(j9_self_join(spark, sf_dir), "j9",
             k1=_cat(F.col("n_regionkey"), F.lit(":"), F.col("name_a")),
             k2=F.col("name_b")),
        _tag(j11_derived_backlink(spark, sf_dir), "j11", k1=F.col("l_orderkey")),
        _tag(g1_joined_fetch(spark, sf_dir), "g1",
             k1=F.col("c_custkey"), n=F.col("n_orders"), x=F.col("total")),
    ]
    return _reduce(DataFrame.unionByName, parts).orderBy("op", "k1", "k2")


REL_JOINS_SQL = _fuse_sql(
    _wrap_sql("j1", J1_SQL, "c_mktsegment", n="n_orders", x="sum_price"),
    _wrap_sql("j2", J2_SQL, "c_custkey", "c_name"),
    _wrap_sql("j3", J3_SQL, "r_name", n="n_items", x="revenue"),
    _wrap_sql("j5", J5_SQL, "c_mktsegment", n="n_without_urgent"),
    _wrap_sql("j6", J6_SQL, "n_name", n="n_suppliers", x="avg_bal"),
    _wrap_sql("j9", J9_SQL, "n_regionkey || ':' || name_a", "name_b"),
    _wrap_sql("j11", J11_SQL, "l_orderkey"),
    _wrap_sql("g1", G1_JOINED_SQL, "c_custkey", n="n_orders", x="total"),
)


_A7_METRICS = ["n_rows", "qty_min", "qty_max", "qty_mean", "qty_nulls",
               "disc_min", "disc_max"]
_Q1_METRICS = ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty",
               "count_order"]


def _explode_metrics(df, key_col, metrics):
    """One (key, metric, value) row per metric column — lets a
    single-row/wide agg ride the shared composite shape."""
    m = F.explode(
        F.array(*[
            F.struct(F.lit(name).alias("k2"), F.col(name).cast("double").alias("x"))
            for name in metrics
        ])
    ).alias("m")
    return df.select(key_col.alias("k1"), m).select(
        "k1", F.col("m.k2").alias("k2"), F.col("m.x").alias("x")
    )


def _unnest_metrics_sql(op, inner, key_sql, metrics):
    structs = ", ".join(
        f"{{'k2': '{name}', 'x': {name}::DOUBLE}}" for name in metrics
    )
    return (
        f"SELECT '{op}' AS op, ({key_sql})::VARCHAR AS k1, (u['k2'])::VARCHAR AS k2,\n"
        f"       NULL::BIGINT AS n, (u['x'])::DOUBLE AS x\n"
        f"FROM ({inner.strip()}) t, UNNEST([{structs}]) AS mm(u)"
    )


def rel_aggs(spark, sf_dir):
    """A1-A7 + the TPC-H Q1 rollup fused: terms/nested/missing/hit-count
    aggs, verdict rollup, distinct sets, column profile (unpivoted to one
    row per metric), pricing summary (one row per group x metric)."""
    parts = [
        _tag(a1_terms_top(spark, sf_dir), "a1",
             k1=F.col("event_type"), n=F.col("cnt")),
        _tag(a2_json_agg(spark, sf_dir), "a2",
             k1=F.col("k_mod"),
             k2=_cat(F.col("k_min"), F.lit(":"), F.col("k_max")),
             n=F.col("cnt")),
        _tag(a3_null_counts(spark, sf_dir), "a3",
             k1=F.lit("events"),
             k2=_cat(F.col("n_null_value"), F.lit(":"), F.col("n_null_props")),
             n=F.col("n_rows")),
        _tag(a4_hit_count(spark, sf_dir), "a4",
             k1=F.lit("total_hits"), n=F.col("total_hits")),
        _tag(a5_verdict_rollup(spark, sf_dir), "a5",
             k1=F.col("o_orderpriority"), k2=F.col("fail"), n=F.col("n_orders")),
        _tag(a6_distinct_sets(spark, sf_dir), "a6",
             k1=F.col("event_type"), n=F.col("n_users")),
        _tag(
            _explode_metrics(a7_column_stats(spark, sf_dir),
                             F.lit("lineitem"), _A7_METRICS),
            "a7", k1=F.col("k1"), k2=F.col("k2"), x=F.col("x"),
        ),
        _tag(
            _explode_metrics(
                q1_pricing_summary(spark, sf_dir),
                _cat(F.col("l_returnflag"), F.lit(":"), F.col("l_linestatus")),
                _Q1_METRICS,
            ),
            "q1", k1=F.col("k1"), k2=F.col("k2"), x=F.col("x"),
        ),
    ]
    return _reduce(DataFrame.unionByName, parts).orderBy("op", "k1", "k2")


REL_AGGS_SQL = _fuse_sql(
    _wrap_sql("a1", A1_SQL, "event_type", n="cnt"),
    _wrap_sql("a2", A2_SQL, "k_mod", "k_min || ':' || k_max", n="cnt"),
    _wrap_sql("a3", A3_SQL, "'events'", "n_null_value || ':' || n_null_props",
              n="n_rows"),
    _wrap_sql("a4", A4_SQL, "'total_hits'", n="total_hits"),
    _wrap_sql("a5", A5_SQL, "o_orderpriority", "fail", n="n_orders"),
    _wrap_sql("a6", A6_SQL, "event_type", n="n_users"),
    _unnest_metrics_sql("a7", A7_SQL, "'lineitem'", _A7_METRICS),
    _unnest_metrics_sql("q1", Q1_SQL, "l_returnflag || ':' || l_linestatus",
                        _Q1_METRICS),
)


def rel_sorts(spark, sf_dir):
    """O1-O3 + W1 + U1/U2 + the REST-search/facet surfaces (S1/S2) fused:
    top-k sorts, per-group pagination windows, running sums, fan-out
    union + dedup, ES-DSL filters/sort/offset/source pruning, fused
    multi-field facets."""
    parts = [
        _tag(o1_sort_topk(spark, sf_dir), "o1",
             k1=F.col("o_orderkey"), x=F.col("o_totalprice")),
        _tag(o2_sort_by_len(spark, sf_dir), "o2",
             k1=F.col("doc_id"), n=F.col("text_len")),
        _tag(o3_window_topn(spark, sf_dir), "o3",
             k1=_cat(F.col("c_mktsegment"), F.lit(":"), F.col("rank")),
             k2=F.col("c_custkey"), x=F.col("c_acctbal")),
        _tag(w1_running_sum(spark, sf_dir), "w1",
             k1=_cat(F.col("user_id"), F.lit(":"), F.col("event_id")),
             x=F.col("running_value")),
        _tag(u1_union_fanout(spark, sf_dir), "u1",
             k1=F.col("o_orderstatus"), n=F.col("cnt")),
        _tag(u2_distinct_pairs(spark, sf_dir), "u2",
             k1=_cat(F.col("l_returnflag"), F.lit(":"), F.col("l_linestatus"))),
        _tag(s1_search_api(spark, sf_dir), "s1",
             k1=F.col("event_id"), k2=F.col("event_type"), n=F.col("user_id")),
        _tag(s2_terms_aggs(spark, sf_dir), "s2",
             k1=_cat(F.col("field"), F.lit(":"), F.col("rank")),
             k2=F.col("value"), n=F.col("cnt")),
    ]
    return _reduce(DataFrame.unionByName, parts).orderBy("op", "k1", "k2")


REL_SORTS_SQL = _fuse_sql(
    _wrap_sql("o1", O1_SQL, "o_orderkey", x="o_totalprice"),
    _wrap_sql("o2", O2_SQL, "doc_id", n="text_len"),
    _wrap_sql("o3", O3_SQL, "c_mktsegment || ':' || rank", "c_custkey",
              x="c_acctbal"),
    _wrap_sql("w1", W1_SQL, "user_id || ':' || event_id", x="running_value"),
    _wrap_sql("u1", U1_SQL, "o_orderstatus", n="cnt"),
    _wrap_sql("u2", U2_SQL, "l_returnflag || ':' || l_linestatus"),
    _wrap_sql("s1", S1_SEARCH_SQL, "event_id", "event_type", n="user_id"),
    _wrap_sql("s2", S2_TERMS_SQL, "field || ':' || rank", "value", n="cnt"),
)


def rel_scalars(spark, sf_dir):
    """F1-F5 + F8 + F10-F12 fused: snake/case transforms, date bucketing,
    zero padding, lowercase label match, nested flatten, array join,
    checksum accounting, JSON→struct parse."""
    parts = [
        _tag(f1_snake_case(spark, sf_dir), "f1", k1=F.col("snake")),
        _tag(f2_case_transforms(spark, sf_dir), "f2",
             k1=F.col("snake"),
             k2=_cat(F.col("upper_name"), F.lit("|"), F.col("display"))),
        _tag(f3_date_agg(spark, sf_dir), "f3",
             k1=F.col("ym"), n=F.col("n_orders"), x=F.col("sum_price")),
        _tag(f4_leading_zero(spark, sf_dir), "f4",
             k1=F.col("p_partkey"),
             k2=_cat(F.col("size_padded"), F.lit("|"), F.col("key_padded"))),
        _tag(f5_lower_label_match(spark, sf_dir), "f5",
             k1=F.col("label"), n=F.col("n")),
        _tag(f8_nested_flatten(spark, sf_dir), "f8",
             k1=F.col("c_custkey"),
             k2=_cat(F.col("doc_name"), F.lit("|"), F.col("doc_meta_segment"))),
        _tag(f10_array_join(spark, sf_dir), "f10",
             k1=F.col("l_orderkey"), k2=F.col("lines")),
        _tag(f11_checksum(spark, sf_dir), "f11",
             k1=F.col("c_custkey"),
             k2=_cat(F.col("name_md5"), F.lit(":"), F.col("name_len"))),
        _tag(f12_json_struct(spark, sf_dir), "f12",
             k1=F.col("event_id"), n=F.col("k")),
    ]
    return _reduce(DataFrame.unionByName, parts).orderBy("op", "k1", "k2")


REL_SCALARS_SQL = _fuse_sql(
    _wrap_sql("f1", F1_SQL, "snake"),
    _wrap_sql("f2", F2_SQL, "snake", "upper_name || '|' || display"),
    _wrap_sql("f3", F3_SQL, "ym", n="n_orders", x="sum_price"),
    _wrap_sql("f4", F4_SQL, "p_partkey", "size_padded || '|' || key_padded"),
    _wrap_sql("f5", F5_SQL, "label", n="n"),
    _wrap_sql("f8", F8_SQL, "c_custkey", "doc_name || '|' || doc_meta_segment"),
    _wrap_sql("f10", F10_SQL, "l_orderkey", "lines"),
    _wrap_sql("f11", F11_SQL, "c_custkey", "name_md5 || ':' || name_len"),
    _wrap_sql("f12", F12_SQL, "event_id", n="k"),
)


# Driver-window pack: 8 relational rows (3 standalone + 5 composites)
# certify every SURVEY §2 P/J/A/O/U/F/W row each round.
QUERIES = {
    "p7b_multimatch_analyzed": (p7b_multimatch_analyzed, P7B_SQL),
    "p7c_multimatch_bm25": (p7c_multimatch_bm25, P7C_SQL),
    "w2_sessionization": (w2_sessionization, W2_SQL),
    "rel_filters": (rel_filters, REL_FILTERS_SQL),
    "rel_joins": (rel_joins, REL_JOINS_SQL),
    "rel_aggs": (rel_aggs, REL_AGGS_SQL),
    "rel_sorts": (rel_sorts, REL_SORTS_SQL),
    "rel_scalars": (rel_scalars, REL_SCALARS_SQL),
}

# Per-op originals: hash-checked by tests/test_pytest_pack.py at sf0.001
# (and scripts/check_oracle.py --all at any sf); out of the driver window
# because their composites above already certify them there.
PYTEST_QUERIES = {
    "a1_terms_top": (a1_terms_top, A1_SQL),
    "a2_json_agg": (a2_json_agg, A2_SQL),
    "a3_null_counts": (a3_null_counts, A3_SQL),
    "a5_verdict_rollup": (a5_verdict_rollup, A5_SQL),
    "a7_column_stats": (a7_column_stats, A7_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "p3_terms_filter": (p3_terms_filter, P3_SQL),
    "p4_negated_filter": (p4_negated_filter, P4_SQL),
    "p5_array_predicate": (p5_array_predicate, P5_SQL),
    "p6_wildcard_like": (p6_wildcard_like, P6_SQL),
    "p7_multimatch": (p7_multimatch, P7_SQL),
    "p9_id_lookup": (p9_id_lookup, P9_SQL),
    "p10_safe_name": (p10_safe_name, P10_SQL),
    "p11_record_name": (p11_record_name, P11_SQL),
    "j1_join_agg": (j1_join_agg, J1_SQL),
    "j2_semi_join": (j2_semi_join, J2_SQL),
    "j3_multiway_join": (j3_multiway_join, J3_SQL),
    "j5_anti_join": (j5_anti_join, J5_SQL),
    "j6_broadcast_lookup": (j6_broadcast_lookup, J6_SQL),
    "j9_self_join": (j9_self_join, J9_SQL),
    "o1_sort_topk": (o1_sort_topk, O1_SQL),
    "o2_sort_by_len": (o2_sort_by_len, O2_SQL),
    "o3_window_topn": (o3_window_topn, O3_SQL),
    "w1_running_sum": (w1_running_sum, W1_SQL),
    "u1_union_fanout": (u1_union_fanout, U1_SQL),
    "u2_distinct_pairs": (u2_distinct_pairs, U2_SQL),
    "f1_snake_case": (f1_snake_case, F1_SQL),
    "f3_date_agg": (f3_date_agg, F3_SQL),
    "f10_array_join": (f10_array_join, F10_SQL),
    "f11_checksum": (f11_checksum, F11_SQL),
    "p1_structure_projection": (p1_structure_projection, P1_SQL),
    "j11_derived_backlink": (j11_derived_backlink, J11_SQL),
    "a4_hit_count": (a4_hit_count, A4_SQL),
    "a6_distinct_sets": (a6_distinct_sets, A6_SQL),
    "f2_case_transforms": (f2_case_transforms, F2_SQL),
    "f4_leading_zero": (f4_leading_zero, F4_SQL),
    "f5_lower_label_match": (f5_lower_label_match, F5_SQL),
    "f8_nested_flatten": (f8_nested_flatten, F8_SQL),
    "f12_json_struct": (f12_json_struct, F12_SQL),
    "s1_search_api": (s1_search_api, S1_SEARCH_SQL),
    "s2_terms_aggs": (s2_terms_aggs, S2_TERMS_SQL),
    "g1_joined_fetch": (g1_joined_fetch, G1_JOINED_SQL),
}
