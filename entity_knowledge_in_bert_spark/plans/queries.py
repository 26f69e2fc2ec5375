"""Driver-facing query registry (SURVEY.md §2 operator inventory).

Every implemented operator gets:
  * a Spark callable (spark, sf_dir) -> DataFrame, and
  * (when SQL-expressible) a DuckDB oracle SQL string over the
    pre-registered views region nation customer supplier part orders
    lineitem events documents embeddings.

Column names are aliased identically on both sides (the driver's compare
sorts columns by name then hashes values). Float aggregates are rounded
on both sides so IEEE summation-order differences can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_sql, jaro_winkler
from ..session import tune

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The flagship's inline alias dictionary: surface -> entity over the
# testdata vocabulary (mirrors the reference's mention-entity dictionary,
# collect_mention_entity_counts.py [R], at toy scale).
FLAGSHIP_ALIASES = [
    ("spark", "ENGINE"),
    ("join", "REL_OP"),
    ("filter", "REL_OP"),
    ("window", "REL_OP"),
    ("scan", "REL_OP"),
    ("stream", "STREAMING"),
    ("batch", "STREAMING"),
    ("hash", "ALGO"),
    ("sort", "ALGO"),
    ("merge", "ALGO"),
]

_ALIAS_VALUES_SQL = ", ".join(f"('{a}', '{e}')" for a, e in FLAGSHIP_ALIASES)
ALIAS_CTE = f"WITH alias_dict(alias, entity) AS (VALUES {_ALIAS_VALUES_SQL})"


def _alias_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(FLAGSHIP_ALIASES, "alias string, entity string")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )


# --------------------------------------------------------------------------
# the registry: name -> (callable, oracle_sql | None)
# --------------------------------------------------------------------------
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)  # session tz=UTC + AQE etc. even on a foreign session
            return fn(spark, sf_dir)

        _REGISTRY[name] = (wrapped, sql)
        return wrapped

    return deco


def queries():
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql():
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


# ==========================================================================
# Flagship (entry): mention detection + entity counts over documents
# (scan -> project -> explode -> broadcast join -> agg -> sort/limit)
# ==========================================================================
@q(
    "flagship_mention_counts",
    ALIAS_CTE
    + """
SELECT entity, alias,
       COUNT(*) AS n_mentions,
       COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE lang = 'en') t
JOIN alias_dict ON token = alias
GROUP BY entity, alias
""",
)
def flagship_mention_counts(spark, sf_dir):
    docs = T(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    al = _alias_dict_df(spark)
    return (
        toks.join(F.broadcast(al), toks["token"] == al["alias"])
        .groupBy("entity", "alias")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# ==========================================================================
# P — projections / filters / normalization (SURVEY §2.2)
# ==========================================================================
@q(
    "p1_filter_project",
    "SELECT doc_id, source, n_chars FROM documents "
    "WHERE lang = 'en' AND n_chars >= 200",
)
def p1_filter_project(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .select("doc_id", "source", "n_chars")
    )


@q(
    "p3_normalize_text",
    "SELECT doc_id, lower(trim(regexp_replace(substr(text, 1, 60), '\\s+', ' ', 'g')))"
    " AS norm_prefix FROM documents",
)
def p3_normalize_text(spark, sf_dir):
    from ..functions.text import normalize_text

    return T(spark, sf_dir, "documents").select(
        "doc_id",
        normalize_text(F.substring("text", 1, 60)).alias("norm_prefix"),
    )


@q(
    "p4_min_count_predicate",
    "SELECT token, cnt FROM (SELECT token, COUNT(*) AS cnt FROM "
    "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) t "
    "GROUP BY token) c WHERE cnt >= 5 AND length(token) > 1",
)
def p4_min_count_predicate(spark, sf_dir):
    return (
        _tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter((F.col("cnt") >= 5) & (F.length("token") > 1))
    )


# ==========================================================================
# J — joins (SURVEY §2.3)
# ==========================================================================
@q(
    "j1_broadcast_dim_join",
    "SELECT n_nationkey, n_name, r_name FROM nation "
    "JOIN region ON n_regionkey = r_regionkey",
)
def j1_broadcast_dim_join(spark, sf_dir):
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name", "r_name"
    )


@q(
    "j2_equi_join",
    "SELECT o_orderkey, c_name, o_totalprice FROM orders "
    "JOIN customer ON o_custkey = c_custkey",
)
def j2_equi_join(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@q(
    "j6_interval_join",
    "SELECT o_orderkey, COUNT(*) AS n_shipped_30d FROM orders JOIN lineitem "
    "ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate "
    "AND l_shipdate <= o_orderdate + INTERVAL 30 DAY GROUP BY o_orderkey",
)
def j6_interval_join(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li["l_orderkey"] == o["o_orderkey"])
            & (li["l_shipdate"] >= o["o_orderdate"])
            & (li["l_shipdate"] <= o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_shipped_30d"))
    )


@q(
    "j7_asof_latest",
    "SELECT user_id, event_id, event_type, ts FROM ("
    "SELECT *, row_number() OVER (PARTITION BY user_id "
    "ORDER BY ts DESC, event_id DESC) AS rn FROM events) t WHERE rn = 1",
)
def j7_asof_latest(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        T(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


@q(
    "j8_semi_join",
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def j8_semi_join(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@q(
    "j9_anti_join",
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def j9_anti_join(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "j10_block_pairs",
    "SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b, a.p_brand AS brand "
    "FROM part a JOIN part b ON a.p_brand = b.p_brand "
    "AND a.p_partkey < b.p_partkey",
)
def j10_block_pairs(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("partkey_a"), F.col("p_brand").alias("brand")
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"), F.col("p_brand").alias("brand")
    )
    return a.join(b, "brand").filter(F.col("partkey_a") < F.col("partkey_b")).select(
        "partkey_a", "partkey_b", "brand"
    )


# ==========================================================================
# A — aggregations (SURVEY §2.4)
# ==========================================================================
@q(
    "q1_pricing_summary",
    "SELECT l_returnflag, l_linestatus, "
    "round(SUM(l_quantity), 2) AS sum_qty, "
    "round(SUM(l_extendedprice), 2) AS sum_base_price, "
    "round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
    "round(AVG(l_quantity), 4) AS avg_qty, "
    "round(AVG(l_discount), 4) AS avg_disc, "
    "COUNT(*) AS count_order "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def q1_pricing_summary(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@q(
    "a3_topk_tokens",
    "SELECT token, cnt FROM (SELECT token, COUNT(*) AS cnt FROM "
    "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) t "
    "GROUP BY token) c ORDER BY cnt DESC, token ASC LIMIT 20",
)
def a3_topk_tokens(spark, sf_dir):
    return (
        _tokens(spark, sf_dir)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )


@q(
    "a4_prior_normalization",
    "SELECT event_id, round(value / SUM(value) OVER (PARTITION BY event_type), 6) "
    "AS share FROM events",
)
def a4_prior_normalization(spark, sf_dir):
    w = Window.partitionBy("event_type")
    return T(spark, sf_dir, "events").select(
        "event_id", F.round(F.col("value") / F.sum("value").over(w), 6).alias("share")
    )


@q(
    "a5_distinct_counts",
    "SELECT COUNT(DISTINCT event_type) AS n_types, "
    "COUNT(DISTINCT user_id) AS n_users FROM events",
)
def a5_distinct_counts(spark, sf_dir):
    return T(spark, sf_dir, "events").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("user_id").alias("n_users"),
    )


@q(
    "a6_cube_profile",
    "SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY CUBE(lang, source)",
)
def a6_cube_profile(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .cube("lang", "source")
        .agg(F.count("*").alias("n"))
    )


@q(
    "a7_group_size_histogram",
    "SELECT orders_per_customer, COUNT(*) AS n_customers FROM "
    "(SELECT o_custkey, COUNT(*) AS orders_per_customer FROM orders "
    "GROUP BY o_custkey) t GROUP BY orders_per_customer",
)
def a7_group_size_histogram(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("orders_per_customer"))
        .groupBy("orders_per_customer")
        .agg(F.count("*").alias("n_customers"))
    )


# ==========================================================================
# W — windows (SURVEY §2.5)
# ==========================================================================
@q(
    "w1_rank_per_group",
    "SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, "
    "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, "
    "o_orderkey ASC) AS rn FROM orders) t WHERE rn <= 3",
)
def w1_rank_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        T(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@q(
    "w4_run_length_decode",
    """
SELECT user_id, run_id, COUNT(*) AS run_len, MIN(event_id) AS first_event,
       MIN(event_type) AS run_type
FROM (
  SELECT user_id, event_id, event_type,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (
    SELECT *, CASE WHEN lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)
           IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
    FROM events) x) y
GROUP BY user_id, run_id
""",
)
def w4_run_length_decode(spark, sf_dir):
    """Gaps-and-islands span decoding — the reference's contiguous-token
    run decoding (metrics.py [R]) over the events fixture."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = T(spark, sf_dir, "events")
    runs = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    ).withColumn("run_id", F.sum("chg").over(wrun))
    return runs.groupBy("user_id", "run_id").agg(
        F.count("*").alias("run_len"),
        F.min("event_id").alias("first_event"),
        F.min("event_type").alias("run_type"),
    )


# ==========================================================================
# O — set ops (SURVEY §2.6)
# ==========================================================================
@q(
    "o3_union_distinct",
    "SELECT user_id FROM events WHERE event_type = 'click' "
    "UNION SELECT user_id FROM events WHERE event_type = 'view'",
)
def o3_union_distinct(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "view").select("user_id")
    return a.unionByName(b).distinct()


@q(
    "o4_except",
    "SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
    "EXCEPT SELECT user_id FROM events WHERE event_type = 'error'",
)
def o4_except(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.exceptAll(b.distinct()).distinct()


# ==========================================================================
# F — scalar functions (SURVEY §2.7)
# ==========================================================================
@q(
    "f2_substring_locate",
    "SELECT doc_id, strpos(text, 'spark') AS spark_pos, "
    "substr(text, 1, 40) AS head40 FROM documents "
    "WHERE strpos(text, 'spark') > 0",
)
def f2_substring_locate(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.filter(F.instr("text", "spark") > 0).select(
        "doc_id",
        F.instr("text", "spark").alias("spark_pos"),
        F.substring("text", 1, 40).alias("head40"),
    )


@q(
    "f4_levenshtein_pairs",
    "SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b, "
    "levenshtein(a.p_name, b.p_name) AS lev FROM part a JOIN part b "
    "ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey",
)
def f4_levenshtein_pairs(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"),
    )
    return (
        a.join(b, "brand")
        .filter(F.col("partkey_a") < F.col("partkey_b"))
        .select(
            "partkey_a",
            "partkey_b",
            F.levenshtein("name_a", "name_b").alias("lev"),
        )
    )


@q(
    "f4_jaro_winkler_pairs",
    "SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b, "
    "round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw "
    "FROM part a JOIN part b ON a.p_brand = b.p_brand "
    "AND a.p_partkey < b.p_partkey",
)
def f4_jaro_winkler_pairs(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"),
    )
    return (
        a.join(b, "brand")
        .filter(F.col("partkey_a") < F.col("partkey_b"))
        .select(
            "partkey_a",
            "partkey_b",
            F.round(jaro_winkler(F.col("name_a"), F.col("name_b")), 4).alias("jw"),
        )
    )


@q(
    "f5_sha256",
    "SELECT doc_id, sha256(text) AS text_sha FROM documents",
)
def f5_sha256(spark, sf_dir):
    return T(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
    )


@q(
    "f6_hourly_buckets",
    "SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, "
    "event_type, COUNT(*) AS n FROM events GROUP BY 1, 2",
)
def f6_hourly_buckets(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )


@q(
    "f7_math_kernels",
    "SELECT event_id, round(1.0 / (1.0 + exp(-value)), 6) AS sigmoid, "
    "round(ln(abs(value) + 1.0), 6) AS log1p_abs FROM events",
)
def f7_math_kernels(spark, sf_dir):
    v = F.col("value")
    return T(spark, sf_dir, "events").select(
        "event_id",
        F.round(1.0 / (1.0 + F.exp(-v)), 6).alias("sigmoid"),
        F.round(F.log(F.abs(v) + 1.0), 6).alias("log1p_abs"),
    )


@q(
    "f8_cosine_pairs",
    "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
    "round(list_dot_product(a.embedding, b.embedding) / "
    "(sqrt(list_dot_product(a.embedding, a.embedding)) * "
    "sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cos "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE a.vec_id < 15 AND b.vec_id < 15",
)
def f8_cosine_pairs(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 15)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_sql("emb_a", "emb_b"), 4).alias("cos"),
        )
    )


@q(
    "f10_json_extract",
    "SELECT event_type, SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) "
    "AS k_sum FROM events GROUP BY event_type",
)
def f10_json_extract(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.get_json_object("props", "$.k").cast("bigint")
            ).alias("k_sum")
        )
    )
