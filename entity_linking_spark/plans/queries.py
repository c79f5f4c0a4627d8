"""Operator-level queries + DuckDB oracle SQL (driver correctness gate).

One entry per implemented operator family from SURVEY.md §2, expressed
twice: as a Spark DataFrame plan (queries) and as ANSI SQL DuckDB runs on
the same parquet (oracles). Column names and value rounding are aligned
on both sides because the driver hash-compares values after sorting
columns by name.

Conventions:
  - every computed column is aliased identically in both forms;
  - doubles rounded to 4 decimals on both sides;
  - timestamps emitted as formatted strings (engine-neutral);
  - arrays emitted as joined strings (hash-stable).

Each function cites the reference operator it re-expresses (SURVEY §2 ids).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------- filters

@query(
    "p3_min_tokens_filter",
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       FROM documents WHERE len(string_split(text, ' ')) >= 60
       ORDER BY doc_id""",
)
def p3_min_tokens_filter(spark, sf_dir):
    """P3: drop docs with too few tokens (data_ingestion.py:118-127)."""
    d = _t(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    return (
        d.select("doc_id", n.alias("n_tokens"))
        .where(n >= 60)
        .orderBy("doc_id")
    )


@query(
    "p4_substring_filter",
    """SELECT doc_id, lang FROM documents
       WHERE NOT (lower(text) LIKE '%vector%' OR lower(text) LIKE '%stream%')
       ORDER BY doc_id""",
)
def p4_substring_filter(spark, sf_dir):
    """P4: disambiguation-page style contains-filter (data_ingestion.py:130-155)."""
    d = _t(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))
    return (
        d.where(~(t.contains("vector") | t.contains("stream")))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "p7_stopword_filter",
    """SELECT event_id, event_type FROM events
       WHERE event_type NOT IN ('error', 'signup')
       ORDER BY event_id""",
)
def p7_stopword_filter(spark, sf_dir):
    """P7: stop-word anti-filter (el_main.py:534-537)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.where(~F.col("event_type").isin("error", "signup"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "p6_array_remove_nil",
    """SELECT doc_id,
              array_to_string(list_filter(string_split(text, ' '), x -> x <> 'the'), ' ') AS cleaned
       FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
)
def p6_array_remove_nil(spark, sf_dir):
    """P6/SO2: array_remove of a sentinel ('NIL') from a list
    (el_preprocess.py:96-115)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.array_remove(F.split(F.col("text"), " "), "the")
            ).alias("cleaned"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------ joins

@query(
    "j1_alias_equijoin",
    """SELECT n.n_name AS nation, count(*) AS n_customers
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name ORDER BY nation""",
)
def j1_alias_equijoin(spark, sf_dir):
    """J1: the blocking-key equi hash join shape (service_main.py:117-127)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
        .orderBy("nation")
    )


@query(
    "j2_coalesce_fallback_join",
    """SELECT o.o_orderkey, coalesce(c.c_name, 'UNKNOWN') AS buyer
       FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY o.o_orderkey LIMIT 500""",
)
def j2_coalesce_fallback_join(spark, sf_dir):
    """J2: left join + coalesce fallback (link_wikipedia_and_wikidata.py:76-102)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .select("o_orderkey", F.coalesce("c_name", F.lit("UNKNOWN")).alias("buyer"))
        .orderBy("o_orderkey")
        .limit(500)
    )


@query(
    "j4_semi_join",
    """SELECT c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey""",
)
def j4_semi_join(spark, sf_dir):
    """J4: KB-subset semi join (main_dense.py:182-197)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "j_anti_join",
    """SELECT c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey""",
)
def j_anti_join(spark, sf_dir):
    """P6/P7 as anti-join: rows with no match (SURVEY §2.3 note)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "j8_link_count_join",
    """SELECT o.o_orderpriority AS priority, count(*) AS n_items
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY o.o_orderpriority ORDER BY priority""",
)
def j8_link_count_join(spark, sf_dir):
    """J8+A1: join then count per group (enrich_data.py:79-134)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_items"))
        .orderBy("priority")
    )


# ------------------------------------------------------------ aggregations

@query(
    "a1_group_count",
    """SELECT event_type, count(*) AS n FROM events
       GROUP BY event_type ORDER BY event_type""",
)
def a1_group_count(spark, sf_dir):
    """A1: hash-aggregate count (enrich_data.py:88-109)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count("*").alias("n")).orderBy("event_type")


@query(
    "a2_distinct_sorted_by_length",
    """SELECT DISTINCT event_type FROM events
       ORDER BY length(event_type) DESC, event_type""",
)
def a2_distinct_sorted_by_length(spark, sf_dir):
    """A2: distinct aliases sorted longest-first (el_process.py:63-66)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select("event_type")
        .distinct()
        .orderBy(F.length("event_type").desc(), F.col("event_type"))
    )


@query(
    "a4_collect_ids_per_key",
    """SELECT user_id, string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
       FROM events GROUP BY user_id ORDER BY user_id""",
)
def a4_collect_ids_per_key(spark, sf_dir):
    """A4: alias -> collect_set of ids (el_process.py:40-43), emitted as a
    sorted joined string so the hash is order-stable."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types")
        )
        .orderBy("user_id")
    )


@query(
    "a5_rollup_recall",
    """SELECT coalesce(lang, 'ALL') AS lang_group,
              round(avg(n_chars), 4) AS avg_chars, count(*) AS n
       FROM documents GROUP BY ROLLUP(lang)
       ORDER BY lang_group""",
)
def a5_rollup_recall(spark, sf_dir):
    """A5: per-dataset + overall rollup (candidate_retrieval/evaluator.py:16-90)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.rollup("lang")
        .agg(F.round(F.avg("n_chars"), 4).alias("avg_chars"), F.count("*").alias("n"))
        .select(F.coalesce("lang", F.lit("ALL")).alias("lang_group"), "avg_chars", "n")
        .orderBy("lang_group")
    )


@query(
    "a6_cumulative_rank_curve",
    """WITH counts AS (
         SELECT label, count(*) AS n FROM embeddings GROUP BY label)
       SELECT label, n,
              CAST(sum(n) OVER (ORDER BY label ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       FROM counts ORDER BY label""",
)
def a6_cumulative_rank_curve(spark, sf_dir):
    """A6: recall@rank cumulative curve (evaluator.py:92-124)."""
    e = _t(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count("*").alias("n"))
    w = Window.orderBy("label").rowsBetween(Window.unboundedPreceding, 0)
    return counts.select("label", "n", F.sum("n").over(w).alias("cum")).orderBy("label")


@query(
    "a7_hits_at_k",
    """SELECT CAST(sum(CASE WHEN label <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_1,
              CAST(sum(CASE WHEN label <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS hits_4,
              CAST(sum(CASE WHEN label <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS hits_8,
              count(*) AS total
       FROM embeddings""",
)
def a7_hits_at_k(spark, sf_dir):
    """A7: hits@{1,4,8} counters in one pass (zeshel_utils.py:70-99)."""
    e = _t(spark, sf_dir, "embeddings")
    return e.agg(
        F.sum((F.col("label") <= 1).cast("long")).alias("hits_1"),
        F.sum((F.col("label") <= 4).cast("long")).alias("hits_4"),
        F.sum((F.col("label") <= 8).cast("long")).alias("hits_8"),
        F.count("*").alias("total"),
    )


@query(
    "a8_pairwise_f1_counters",
    """WITH pairs AS (
         SELECT e1.label = e2.label AS is_match,
                (e1.vec_id + e2.vec_id) % 3 = 0 AS pred
         FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
         WHERE e1.vec_id < 60 AND e2.vec_id < 60)
       SELECT CAST(sum(CASE WHEN pred AND is_match THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              CAST(sum(CASE WHEN pred AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              CAST(sum(CASE WHEN NOT pred AND is_match THEN 1 ELSE 0 END) AS BIGINT) AS fn
       FROM pairs""",
)
def a8_pairwise_f1_counters(spark, sf_dir):
    """A8: TP/FP/FN counters — the acceptance-metric formula
    (el_main.py:303-306,665-670) on a deterministic synthetic predictor."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 60)
    e1 = e.select(F.col("vec_id").alias("id1"), F.col("label").alias("l1"))
    e2 = e.select(F.col("vec_id").alias("id2"), F.col("label").alias("l2"))
    pairs = (
        e1.join(e2, F.col("id1") < F.col("id2"))
        .withColumn("is_match", F.col("l1") == F.col("l2"))
        .withColumn("pred", (F.col("id1") + F.col("id2")) % 3 == 0)
    )
    return pairs.agg(
        F.sum((F.col("pred") & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("is_match")).cast("long")).alias("fn"),
    )


@query(
    "a11_num_tokens",
    """SELECT doc_id, len(string_split(text, ' ')) AS num_tokens
       FROM documents ORDER BY doc_id""",
)
def a11_num_tokens(spark, sf_dir):
    """A11: whitespace token count (process_wiki_extractor_output_full.py:71-72)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("num_tokens")
    ).orderBy("doc_id")


@query(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 4) AS avg_qty,
              count(*) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: multi-agg hash aggregate (A10 analog)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------- windows

@query(
    "w1_topk_per_group",
    """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3
       ORDER BY o_custkey, rn""",
)
def w1_topk_per_group(spark, sf_dir):
    """W1: per-mention top-k via row_number window (main_dense.py:253)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    )


@query(
    "w3_rank_per_group",
    """SELECT event_type, event_id, rnk FROM (
         SELECT event_type, event_id,
                rank() OVER (PARTITION BY event_type
                             ORDER BY value DESC, event_id) AS rnk
         FROM events) WHERE rnk <= 5
       ORDER BY event_type, rnk""",
)
def w3_rank_per_group(spark, sf_dir):
    """W3: argsort-desc rank (main_dense.py:282-284)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 5)
        .select("event_type", "event_id", "rnk")
        .orderBy("event_type", "rnk")
    )


@query(
    "w4_gold_position",
    """SELECT doc_id, list_position(string_split(text, ' '), 'join') AS gold_pos
       FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
)
def w4_gold_position(spark, sf_dir):
    """W4: first index of gold candidate (evaluator.py:32-43)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.array_position(F.split(F.col("text"), " "), "join")
            .cast("int")
            .alias("gold_pos"),
        )
        .orderBy("doc_id")
    )


@query(
    "w5_global_sort_limit",
    """SELECT doc_id, n_chars FROM documents
       ORDER BY n_chars DESC, doc_id LIMIT 20""",
)
def w5_global_sort_limit(spark, sf_dir):
    """W5+W6: global order + limit pushdown (candidate_retrieval/utils.py:294-301)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .limit(20)
    )


# ----------------------------------------------------------------- set ops

@query(
    "so1_union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer
       UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""",
)
def so1_union_distinct(spark, sf_dir):
    """SO1: union + dedup (el_process.py:37-61)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@query(
    "so2_except",
    """SELECT DISTINCT c_nationkey AS nationkey FROM customer
       EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""",
)
def so2_except(spark, sf_dir):
    """SO2: set difference (el_preprocess.py:102-115)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.distinct().exceptAll(s.distinct()).orderBy("nationkey")


@query(
    "so3_intersect",
    """SELECT DISTINCT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""",
)
def so3_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


# ------------------------------------------------- scalar string/math fns

@query(
    "f7_substring_truncate",
    """SELECT doc_id, substr(text, 1, 100) AS snippet
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def f7_substring_truncate(spark, sf_dir):
    """F7: description[:100] truncation (data_process_.py:196)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.substring("text", 1, 100).alias("snippet"))
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "f10_curid_parse",
    """SELECT doc_id,
              CAST(string_split('https://en.wikipedia.org/wiki?curid=' || CAST(doc_id AS VARCHAR), 'curid=')[-1] AS BIGINT) AS curid
       FROM documents ORDER BY doc_id LIMIT 100""",
)
def f10_curid_parse(spark, sf_dir):
    """F10: idx.split('curid=')[-1] -> int (main_dense.py:130-135)."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://en.wikipedia.org/wiki?curid="), F.col("doc_id"))
    return (
        d.select(
            "doc_id",
            F.element_at(F.split(url, "curid="), -1).cast("long").alias("curid"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


@query(
    "f12_line_join_nonempty",
    """SELECT doc_id,
              array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ') AS joined
       FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
)
def f12_line_join_nonempty(spark, sf_dir):
    """F12: join non-empty lines (data_ingestion.py:113-116)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.filter(F.split(F.col("text"), " "), lambda x: x != "")
            ).alias("joined"),
        )
        .orderBy("doc_id")
    )


@query(
    "f16_log_boost",
    """SELECT doc_id, round(ln(1 + n_chars), 4) AS boost
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def f16_log_boost(spark, sf_dir):
    """F16: log(sum(num_incoming_links,1)) boost (candidate_generators.py:127)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.round(F.log1p(F.col("n_chars")), 4).alias("boost"))
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "f18_softmax_per_group",
    """SELECT event_id,
              round(exp(value / 100) / sum(exp(value / 100)) OVER (PARTITION BY event_type), 4) AS prob
       FROM events ORDER BY event_id LIMIT 300""",
)
def f18_softmax_per_group(spark, sf_dir):
    """F18: softmax over a candidate group (el_main.py:645-646)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    x = F.exp(F.col("value") / 100)
    return (
        e.select("event_id", F.round(x / F.sum(x).over(w), 4).alias("prob"))
        .orderBy("event_id")
        .limit(300)
    )


@query(
    "f19_argmax_per_group",
    """SELECT user_id, arg_max(event_type, value || '-' || CAST(event_id AS VARCHAR)) AS best_type
       FROM events GROUP BY user_id ORDER BY user_id""",
)
def f19_argmax_per_group(spark, sf_dir):
    """F19: argmax of score (el_main.py:361-362) — deterministic tiebreak
    via value||'-'||event_id composite."""
    e = _t(spark, sf_dir, "events")
    key = F.concat_ws("-", F.col("value").cast("string"), F.col("event_id"))
    return (
        e.groupBy("user_id")
        .agg(F.max_by("event_type", key).alias("best_type"))
        .orderBy("user_id")
    )


# ----------------------------------------------- seeded sampling analogs

@query(
    "r1_deterministic_sample",
    """SELECT doc_id FROM documents
       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 25""",
)
def r1_deterministic_sample(spark, sf_dir):
    """R1: seeded negative sampling re-expressed as engine-neutral
    hash-ordered sampling (el_preprocess.py:104-121; seed rules
    FIXTURES.md) — md5 ordering is identical in Spark and DuckDB."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .limit(25)
    )


@query(
    "r2_hash_split",
    """SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '8' THEN 'train' ELSE 'test' END AS split,
              count(*) AS n
       FROM documents GROUP BY 1 ORDER BY split""",
)
def r2_hash_split(spark, sf_dir):
    """R2: deterministic 70/30-style split via hash threshold
    (el_preprocess.py:302-314, seed=123)."""
    d = _t(spark, sf_dir, "documents")
    split = F.when(
        F.md5(F.col("doc_id").cast("string")) < "8", F.lit("train")
    ).otherwise(F.lit("test"))
    return (
        d.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .orderBy("split")
    )


# ----------------------------------- training-data ops (dedup / text / ann)

@query(
    "dedup_exact_keep_first",
    """SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS n_copies
       FROM documents GROUP BY md5(text) ORDER BY text_hash""",
)
def dedup_exact_keep_first(spark, sf_dir):
    """Exact dedup: hash-groupBy, keep first (training-data op)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .orderBy("text_hash")
    )


@query(
    "text_quality_score",
    """SELECT doc_id,
              round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 4) AS avg_word_len,
              round(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','and','on','of'))) AS DOUBLE)
                    / len(string_split(text, ' ')), 4) AS stopword_ratio
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def text_quality_score(spark, sf_dir):
    """Text-quality heuristics: avg word length + stopword ratio."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop = F.filter(words, lambda x: x.isin("the", "a", "and", "on", "of"))
    return (
        d.select(
            "doc_id",
            F.round(F.col("n_chars").cast("double") / F.size(words), 4).alias(
                "avg_word_len"
            ),
            F.round(F.size(stop).cast("double") / F.size(words), 4).alias(
                "stopword_ratio"
            ),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "token_count_regex",
    """SELECT doc_id, len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def token_count_regex(spark, sf_dir):
    """Token counting via regex (BPE-ish pre-tokenizer shape)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)).alias(
                "n_word_tokens"
            ),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "doc_fingerprint",
    """SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprint: hash of the sorted distinct token set
    (order-insensitive content signature for dedup)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ",
                    F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))),
                )
            ).alias("fingerprint"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "lang_id_heuristic",
    """SELECT doc_id,
              CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) * 2 > len(regexp_extract_all(text, '[a-zA-Z]'))
                   THEN 'cjk' ELSE 'latin' END AS script_guess
       FROM documents ORDER BY doc_id LIMIT 200""",
)
def lang_id_heuristic(spark, sf_dir):
    """Language-ID heuristic: CJK-vs-Latin char-class ratio."""
    d = _t(spark, sf_dir, "documents")
    cjk = F.size(F.regexp_extract_all(F.col("text"), F.lit("[一-鿿]"), 0))
    latin = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z]"), 0))
    return (
        d.select(
            "doc_id",
            F.when(cjk * 2 > latin, F.lit("cjk")).otherwise(F.lit("latin")).alias(
                "script_guess"
            ),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "ngram_jaccard_similarity",
    """WITH grams AS (
         SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
         FROM documents WHERE doc_id < 40)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
       FROM grams a JOIN grams b ON a.doc_id < b.doc_id
       ORDER BY id_a, id_b""",
)
def ngram_jaccard_similarity(spark, sf_dir):
    """n-gram Jaccard near-dup scoring over a bounded window of docs."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    g = d.select("doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_distinct(F.concat("toks_a", "toks_b")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(inter / union, 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


@query(
    "ann_cosine_topk",
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       sims AS (
         SELECT e.vec_id,
                round(list_cosine_similarity(e.embedding, q.qv), 4) AS cos_sim
         FROM embeddings e, q WHERE e.vec_id <> 0)
       SELECT vec_id, cos_sim FROM sims
       ORDER BY cos_sim DESC, vec_id LIMIT 10""",
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k over the embedding column (J6 analog,
    biencoder_.py:166-167): JVM-side zip_with/aggregate dot product —
    no Python in the loop."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = e.where(F.col("vec_id") != 0)
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("qv"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / (norm(F.col("embedding")) * norm(F.col("qv"))), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "stream_windowed_counts",
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:00') AS window_start,
              event_type, count(*) AS n
       FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
)
def stream_windowed_counts(spark, sf_dir):
    """Windowed aggregation — the batch-equivalent of the Structured
    Streaming job in streaming/jobs.py (same window semantics)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("window_start"),
            "event_type",
            "n",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "f9_word_window_slice",
    """SELECT doc_id,
              array_to_string(string_split(text, ' ')[1:10], ' ') AS first_10
       FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
)
def f9_word_window_slice(spark, sf_dir):
    """F9: first/last N space-tokens of a context window
    (candidate_retrieval/utils.py:198-208)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 10)).alias(
                "first_10"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "f13_first_occurrence",
    """SELECT doc_id, strpos(text, 'join') AS pos
       FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
)
def f13_first_occurrence(spark, sf_dir):
    """F13: first occurrence offset (text.index / locate,
    service_main.py:128)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 100)
        .select("doc_id", F.locate("join", F.col("text")).alias("pos"))
        .orderBy("doc_id")
    )


@query(
    "a9_recall_at_k",
    """SELECT round(avg(CASE WHEN label <= 1 THEN 1.0 ELSE 0.0 END), 4) AS recall_1,
              round(avg(CASE WHEN label <= 4 THEN 1.0 ELSE 0.0 END), 4) AS recall_4,
              round(avg(CASE WHEN label <= 8 THEN 1.0 ELSE 0.0 END), 4) AS recall_8
       FROM embeddings""",
)
def a9_recall_at_k(spark, sf_dir):
    """A9: biencoder recall@k fractions (main_dense.py:455-475)."""
    e = _t(spark, sf_dir, "embeddings")
    return e.agg(
        *[
            F.round(F.avg((F.col("label") <= k).cast("double")), 4).alias(f"recall_{k}")
            for k in (1, 4, 8)
        ]
    )


@query(
    "w2_topk_collect_sorted",
    """WITH ranked AS (
         SELECT event_type, event_id,
                rank() OVER (PARTITION BY event_type
                             ORDER BY value DESC, event_id) AS rnk
         FROM events)
       SELECT event_type,
              string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS top_ids
       FROM ranked WHERE rnk <= 3 GROUP BY event_type ORDER BY event_type""",
)
def w2_topk_collect_sorted(spark, sf_dir):
    """W2: candidate list sorted + collected per group
    (service_main.py:170, el_main.py:166-175 top-k cut)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .groupBy("event_type")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("event_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("top_ids")
        )
        .orderBy("event_type")
    )
