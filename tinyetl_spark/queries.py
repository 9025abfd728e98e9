"""Query registry: every implemented operator exposed as a named query
over the driver testdata, each with a DuckDB oracle-SQL twin.

Conventions that make cross-engine value-hashing stable:
  * every computed column is aliased identically on both sides;
  * aggregates over doubles are computed as ``SUM(CAST(x AS
    DECIMAL(38,6)))`` — exact and order-independent — or rounded;
  * emitted timestamps are formatted to strings;
  * count-like ints are BIGINT on both sides.

Scale notes are attached per query where the plan shape matters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tinyetl_spark.functions.dates import FORMATS, parse_date_multi, parse_date_multi_sql
from tinyetl_spark.functions.hashing import hash64_col, hash64_sql
from tinyetl_spark.operators import dedup, relational, similarity, text

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table, normalizing nanosecond parquet timestamps
    (Spark rejects TIMESTAMP(NANOS) — read as long via the session-level
    nanosAsLong conf set in session.py, convert to µs)."""
    path = f"{sf_dir}/{table}.parquet"
    if table == "events":
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def dec(c) -> F.Column:
    """Exact, order-independent aggregation input."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(38,6)")


def dsum(c) -> F.Column:
    """SUM over an exact decimal, emitted as DOUBLE: order-independent
    (decimal accumulation) and dtype-stable across engines/pandas."""
    return F.sum(dec(c)).cast("double")


# =====================================================================
# Relational core (absent in the reference — SURVEY.md §2.4-2.8 — all
# native Spark; included to prove the engine side of the extension)
# =====================================================================

@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flavor. Plan: parquet scan with shipdate pushed down →
    partial hash agg (map-side) → single shuffle on 6 groups → final agg.
    Decimal sums are exact → order-independent at any parallelism."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "scan_project",
    """
    SELECT l_orderkey, l_partkey, l_extendedprice
    FROM lineitem WHERE l_discount > 0.05
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection+filter — verifies pushdown reaches the parquet scan
    (ReadSchema = 4 cols, PushedFilters on l_discount)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.05)
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    )


@_q(
    "top10_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heap,
    no global sort, no full shuffle."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@_q(
    "revenue_by_nation",
    """
    SELECT n.n_name, r.r_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact (lineitem) joins dims. nation/region/customer are
    broadcast (under the 64 MB threshold even at large SF for n/r;
    customer broadcast holds to ~SF100, after which AQE falls back to
    shuffled hash on the key). Only shuffle: the final 25-group agg."""
    li, o, c = (load(spark, sf_dir, t) for t in ("lineitem", "orders", "customer"))
    n, r = load(spark, sf_dir, "nation"), load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@_q(
    "mktsegment_stats",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def mktsegment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("total_value"),
        )
    )


@_q(
    "anti_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_q(
    "semi_join_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load(spark, sf_dir, "customer"), load(spark, sf_dir, "orders")
    return (
        c.join(o.filter(F.col("o_orderstatus") == "F"), c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@_q(
    "window_top_order_per_cust",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def window_top_order_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@_q(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@_q(
    "rollup_status_priority",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_value"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_value",
        )
    )


@_q(
    "set_except_custkeys",
    """
    SELECT DISTINCT o_custkey FROM orders
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    all_c = o.select("o_custkey").distinct()
    big_c = o.filter(F.col("o_totalprice") > 200000).select("o_custkey").distinct()
    return all_c.subtract(big_c)


@_q(
    "part_brand_stats",
    """
    SELECT p_brand,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT p_type) AS n_types,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_retail,
           CAST(SUM(p_size) AS BIGINT) AS sum_size
    FROM part GROUP BY p_brand
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_type").alias("n_types"),
        dsum("p_retailprice").alias("sum_retail"),
        F.sum("p_size").cast("bigint").alias("sum_size"),
    )


# =====================================================================
# Event-table operators (as-of / range join, sessionization, tumbling
# windows — batch twins of the streaming module)
# =====================================================================

@_q(
    "events_tumbling",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling aggregation — identical logic runs as a
    Structured Streaming query in tinyetl_spark.streaming.events."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("_h"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@_q(
    "sessionize_events",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
    sid AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sid GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-and-islands sessionization (gap 30 min) — batch twin of the
    streaming session_window path."""
    e = load(spark, sf_dir, "events")
    return relational.sessionize(e, key="user_id", ts="ts", gap_seconds=1800)


@_q(
    "asof_purchase_view",
    """
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           v.event_id AS view_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    prior view. Union+window formulation — one shuffle on user_id, no
    inequality join (which would be a nested-loop at scale)."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    joined = relational.asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts", right_cols=["event_id"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("event_id_matched").alias("view_event_id"),
    )


@_q(
    "range_pairs_events",
    """
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(a.ts)) AS BIGINT)) <= 60
    """,
)
def range_pairs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join (same user within 60 s) via banded equi-join —
    shuffle on (user, time-bucket) instead of an O(n^2) theta join."""
    e = load(spark, sf_dir, "events")
    return relational.range_self_join(e, key="user_id", ts="ts", window_seconds=60, id_col="event_id")


# =====================================================================
# Reference-parity surface: transforms / validation / date parsing /
# JSON (SURVEY.md §2.3, §2.9)
# =====================================================================

@_q(
    "transform_inline",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CASE WHEN l_quantity >= 40 THEN 'heavy'
                WHEN l_quantity >= 20 THEN 'mid'
                ELSE 'light' END AS qty_class,
           l_returnflag || '-' || l_linestatus AS flag_status
    FROM lineitem
    """,
)
def transform_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline-transform parity (reference src/transformer.rs:171-221):
    ``--transform "disc_price=...; charge=...; qty_class=...;
    flag_status=..."`` compiled to withColumn chains — input columns
    preserved, new columns appended. Pure codegen, no UDF."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.withColumn("disc_price", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .withColumn("charge", F.col("disc_price") * (1 + F.col("l_tax")))
        .withColumn(
            "qty_class",
            F.when(F.col("l_quantity") >= 40, "heavy")
            .when(F.col("l_quantity") >= 20, "mid")
            .otherwise("light"),
        )
        .withColumn("flag_status", F.concat_ws("-", "l_returnflag", "l_linestatus"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "disc_price",
            "charge",
            "qty_class",
            "flag_status",
        )
    )


@_q(
    "transform_script",
    """
    SELECT o_orderkey,
           o_totalprice * 0.9 AS net,
           (o_totalprice * 0.9) * 1.19 AS gross,
           CASE WHEN (o_totalprice * 0.9) * 1.19 > 150000 THEN 'big' ELSE 'small' END AS size_label
    FROM orders
    """,
)
def transform_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-transform parity (reference src/transformer.rs:224-279):
    later lines reference earlier ones — sequential withColumns."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("net", F.col("o_totalprice") * 0.9)
        .withColumn("gross", F.col("net") * 1.19)
        .withColumn("size_label", F.when(F.col("gross") > 150000, "big").otherwise("small"))
        .select("o_orderkey", "net", "gross", "size_label")
    )


@_q(
    "transform_filter",
    """
    SELECT l_orderkey AS order_ref, l_partkey AS part_ref,
           l_quantity * l_extendedprice AS line_value
    FROM lineitem WHERE l_quantity > 30
    """,
)
def transform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lua-file-transform parity (reference src/transformer.rs:341-353):
    returning nil drops the row; returning a table with selected keys
    projects. = filter + select."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select(
        F.col("l_orderkey").alias("order_ref"),
        F.col("l_partkey").alias("part_ref"),
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("line_value"),
    )


@_q(
    "validate_events",
    """
    SELECT event_id, user_id, event_type,
           coalesce(value, 0.0) AS value,
           coalesce(props, '{}') AS props
    FROM events
    WHERE regexp_matches(event_type, '^[a-z_]+$') AND user_id IS NOT NULL
    """,
)
def validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-file validation parity (reference src/schema.rs:148-244):
    pattern check (regex), non-null enforcement, defaults — as
    cast/rlike/coalesce expressions."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").rlike("^[a-z_]+$") & F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.coalesce("value", F.lit(0.0)).alias("value"),
            F.coalesce("props", F.lit("{}")).alias("props"),
        )
    )


_DATE_FMT_CASES_SPARK = ["yyyy-MM-dd", "MM/dd/yyyy", "dd.MM.yyyy", "MMM d, yyyy"]
_DATE_FMT_CASES_DUCK = ["%Y-%m-%d", "%m/%d/%Y", "%d.%m.%Y", "%b %-d, %Y"]


@_q(
    "date_multiformat",
    f"""
    WITH s AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN strftime(o_orderdate, '{_DATE_FMT_CASES_DUCK[0]}')
               WHEN 1 THEN strftime(o_orderdate, '{_DATE_FMT_CASES_DUCK[1]}')
               WHEN 2 THEN strftime(o_orderdate, '{_DATE_FMT_CASES_DUCK[2]}')
               ELSE strftime(o_orderdate, '{_DATE_FMT_CASES_DUCK[3]}')
             END AS raw
      FROM orders)
    SELECT o_orderkey, raw,
           strftime({parse_date_multi_sql('raw')}, '%Y-%m-%d %H:%M:%S') AS parsed
    FROM s
    """,
)
def date_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-parser parity (reference src/date_parser.rs:44-116): strings
    in 4 different formats all parse back to the same timestamp via the
    first-match-wins multi-format chain."""
    o = load(spark, sf_dir, "orders")
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", _DATE_FMT_CASES_SPARK[0]))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", _DATE_FMT_CASES_SPARK[1]))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", _DATE_FMT_CASES_SPARK[2]))
        .otherwise(F.date_format("o_orderdate", _DATE_FMT_CASES_SPARK[3]))
    )
    s = o.select("o_orderkey", raw.alias("raw"))
    return s.select(
        "o_orderkey",
        "raw",
        F.date_format(parse_date_multi("raw"), "yyyy-MM-dd HH:mm:ss").alias("parsed"),
    )


@_q(
    "json_extract_events",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-type parity (reference stores JSON as strings with typed
    accessors — src/schema.rs:168-189): get_json_object on the raw
    string column."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


# =====================================================================
# Training-data pipeline: dedup / similarity / text (north star)
# =====================================================================

@_q("dedup_exact", dedup.exact_dedup_sql())
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(load(spark, sf_dir, "documents"))


@_q("doc_fingerprint", text.fingerprint_sql())
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(load(spark, sf_dir, "documents"))


@_q("token_stats", text.token_stats_sql())
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(load(spark, sf_dir, "documents"))


@_q("text_quality", text.quality_score_sql())
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(load(spark, sf_dir, "documents"))


@_q("lang_id", text.language_id_sql())
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(load(spark, sf_dir, "documents"))


@_q("minhash_signatures", dedup.minhash_signatures_sql())
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(load(spark, sf_dir, "documents"))


@_q("minhash_candidates", dedup.minhash_candidates_sql())
def minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_candidates(load(spark, sf_dir, "documents"))


@_q("near_dup_jaccard", dedup.minhash_jaccard_sql(threshold=0.3))
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cands = dedup.minhash_candidates(docs)
    return dedup.jaccard_verify(docs, cands, threshold=0.3)


@_q("simhash_docs", dedup.simhash_sql())
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load(spark, sf_dir, "documents"))


@_q("simhash_near_dups", dedup.simhash_near_dups_sql(max_hamming=8))
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=8)


@_q("embedding_norms", similarity.embedding_norms_sql())
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_norms(load(spark, sf_dir, "embeddings"))


@_q("ann_brute_topk", similarity.brute_topk_sql(query_id=0, k=10))
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_topk(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


@_q("ann_lsh_topk", similarity.ann_topk_sql(query_id=0, k=10))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


@_q("embedding_near_dups", similarity.cosine_near_dups_sql(threshold=0.3))
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH-bucket blocked cosine pairs (threshold chosen so the
    testdata actually produces pairs — a 0-row pass is vacuous)."""
    return similarity.cosine_near_dups(load(spark, sf_dir, "embeddings"), threshold=0.3)


@_q(
    "multimodal_meta",
    """
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: treat a payload as an opaque binary column
    with typed metadata (byte length, content digest). The decode stage
    for real image/audio lives in operators.multimodal (stubbed UDFs —
    codec libs are not in this container); the schema/partitioning
    plumbing is what this query checks."""
    d = load(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )
