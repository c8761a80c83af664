"""Relational query battery over the synthetic star schema (TESTDATA.md).

The reference pipeline has no relational operators (SURVEY.md §2.4 documents
the absences explicitly) — these queries exist to prove the rebuilt engine's
coverage of the standard operator classes on Spark, each with a DuckDB oracle:

scan/filter/project, hash aggregation, broadcast + shuffle joins, semi/anti
joins, window functions, sort/limit (top-k), set operations, rollup/grouping
sets, JSON extraction (`events.props` — the JSON-parse analog of the
reference's json_parser.rs), and event-time windowing (`events.ts`).

Scale notes (100 TB design intent, verified via .explain on local runs):
- Filters and projections are written column-first so Catalyst pushes them
  into the parquet scan (PushedFilters / ReadSchema).
- Dimension tables (region, nation) are explicitly broadcast; fact-fact
  joins shuffle on their join key and rely on AQE for skew handling.
- Aggregations are all expressible as partial (map-side) + final hash
  aggregates — no query collects to the driver.
- Float aggregates are rounded identically on both sides (Spark and the
  DuckDB oracle) because summation order is non-deterministic in any
  distributed engine.

Every output column is aliased identically in the DataFrame code and the
oracle SQL — the driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import load_table, register_tables


# --------------------------------------------------------------------------
# Aggregation (TPC-H Q1 shape): the flagship query (entry()).
# --------------------------------------------------------------------------
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: 2-key hash agg with 6 aggregates over lineitem.

    Plan shape at scale: parquet scan with shipdate pushdown -> partial hash
    agg (map-side) -> shuffle on (l_returnflag, l_linestatus) [tiny key
    cardinality ~6] -> final hash agg. No join, one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


AGG_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                            AS sum_qty,
       round(sum(l_extendedprice), 2)                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
       round(avg(l_quantity), 4)                            AS avg_qty,
       round(avg(l_extendedprice), 4)                       AS avg_price,
       count(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Scan / filter / projection — pushdown demonstration.
# --------------------------------------------------------------------------
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective scan: both predicates and the 3-column projection reach the
    parquet reader (PushedFilters + pruned ReadSchema). Pass-through values
    (no float arithmetic) so the oracle compares raw parquet doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


SCAN_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
  AND l_shipdate <  TIMESTAMP '2000-04-01'
  AND l_quantity > 45
"""


# --------------------------------------------------------------------------
# Joins: fact-fact shuffle join + group agg.
# --------------------------------------------------------------------------
def join_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem revenue rollup by market segment.

    At scale: orders⋈lineitem is a shuffle join on orderkey (both sides
    pre-filtered before the join); customer is small relative to facts and
    joins broadcast under the threshold/AQE. countDistinct is a two-phase
    distinct aggregate — no driver collection.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_REVENUE_BY_SEGMENT_SQL = """
SELECT c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(DISTINCT o_orderkey)                        AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def join_multi_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way snowflake join region→nation→customer→orders with broadcast dims.

    region (5 rows) and nation (25 rows) are broadcast explicitly — at 100 TB
    these stay broadcast while customer⋈orders shuffles on custkey.
    """
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("r_name", "n_name")
    )


JOIN_MULTI_REGION_SQL = """
SELECT r_name, n_name,
       count(*)                       AS n_orders,
       round(sum(o_totalprice), 2)    AS total_price
FROM orders
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with zero orders since 2001, counted per nation (left-anti
    join ≡ NOT EXISTS). The order-side filter is pushed to the scan before
    the join; at scale a shuffled left-anti on custkey."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("c_nationkey")
    )


ANTI_JOIN_INACTIVE_CUSTOMERS_SQL = """
SELECT c_nationkey, count(*) AS n_inactive
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_nationkey
"""


def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 order per market segment (left-semi join ≡ EXISTS)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("c_mktsegment")
    )


SEMI_JOIN_ACTIVE_CUSTOMERS_SQL = """
SELECT c_mktsegment, count(*) AS n_active
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Window functions: top-k per group.
# --------------------------------------------------------------------------
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number window, deterministic
    tie-break on orderkey). Single shuffle on the partition key; the rank
    filter cuts each partition before anything leaves the executor."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


WINDOW_TOPK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) revenue per supplier over ship date — frame-based
    window aggregate. Rows restricted to one quarter so output stays small."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-02-01").cast("timestamp"))
        & (F.col("l_suppkey") <= 5)
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(F.col("l_shipdate").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).over(w), 2).alias(
            "running_revenue"
        ),
    )


WINDOW_RUNNING_REVENUE_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_extendedprice * (1 - l_discount))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS running_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
  AND l_shipdate <  TIMESTAMP '2000-02-01'
  AND l_suppkey <= 5
"""


# --------------------------------------------------------------------------
# Sort / limit (global top-k).
# --------------------------------------------------------------------------
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price. Spark executes orderBy+limit as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver; no full sort at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .limit(10)
    )


SORT_LIMIT_TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------
def setop_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present in BOTH customer and supplier (INTERSECT — a
    distinct + hash semi-join under the hood)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp).orderBy("nationkey")


SETOP_CUSTOMER_SUPPLIER_NATIONS_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


# --------------------------------------------------------------------------
# Rollup / grouping sets.
# --------------------------------------------------------------------------
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(status, priority): multi-level aggregate (grouping sets) in one
    pass — Spark expands to a single Expand + hash aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


ROLLUP_ORDER_PRIORITY_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# JSON extraction — the relational analog of the reference's JSON parser
# (src/infrastructure/parsers/json_parser.rs): semi-structured payloads in a
# string column projected to typed fields.
# --------------------------------------------------------------------------
def variant_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType extraction over events.props — the modern
    semi-structured tier of the reference's JSON passthrough
    (src/infrastructure/parsers/json_parser.rs:4-27): parse_json keeps the
    payload as a binary variant (no schema declaration, like the
    reference's serde_json::Value documents) and variant_get projects
    typed paths on demand. Narrow JVM expressions, fused into the scan."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return (
        ev.select(
            "event_id",
            F.variant_get(v, "$.k", "long").alias("k"),
            F.variant_get(v, "$.missing", "long").alias("missing_path"),
        )
        .filter(F.col("k") >= 90)
        .orderBy("event_id")
    )


VARIANT_PROPS_EVENTS_SQL = """
SELECT event_id,
       (props::JSON ->> 'k')::BIGINT AS k,
       (props::JSON ->> 'missing')::BIGINT AS missing_path
FROM events
WHERE (props::JSON ->> 'k')::BIGINT >= 90
"""


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over events.props ({"k": int}) then aggregate by event type.

    JVM-side from_json (no Python UDF); at scale this is a narrow transform
    fused into the scan stage by whole-stage codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    # avg is emitted as exact-bigint sum / exact-bigint count in ONE IEEE-754
    # double division: both engines divide the same exactly-representable
    # operands, so the result is bit-identical (round(avg(...), 4) on doubles
    # is NOT engine-stable — round-1 hash-fail).
    return (
        ev.withColumn("k", F.from_json(F.col("props"), schema).getField("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
        )
        .withColumn(
            "avg_k", F.col("sum_k").cast("double") / F.col("n_events")
        )
        .orderBy("event_type")
    )


JSON_EXTRACT_EVENTS_SQL = """
SELECT event_type,
       count(*)                                               AS n_events,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::DOUBLE
         / count(*)                                           AS avg_k
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Event-time windowing (batch analog of the streaming tumbling window).
# --------------------------------------------------------------------------
def time_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day aggregate over events.ts. Window start is emitted as a
    formatted string so the oracle comparison is engine-neutral. The same
    groupBy(window(...)) shape runs under Structured Streaming with a
    watermark (see data_ingestion_spark/streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


TIME_WINDOW_EVENTS_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all 4 grouping sets in one Expand pass."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


CUBE_ORDER_STATUS_PRIORITY_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                    AS n_orders,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority, one column per status. Explicit
    pivot values keep the output schema static (required both for the
    oracle compare and for a sane plan — value discovery would add a
    driver-side distinct scan)."""
    orders = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s.lower()}") for s in statuses],
        )
        .orderBy("o_orderpriority")
    )


PIVOT_PRIORITY_BY_STATUS_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
FROM orders
GROUP BY o_orderpriority
"""


def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL API surface + correlated scalar subquery: customers whose
    max order exceeds 1.9x their own average. Catalyst decorrelates the
    subqueries into aggregates + joins — no per-row re-execution."""
    register_tables(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               round((SELECT max(o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 2) AS max_order
        FROM customer c
        WHERE (SELECT max(o_totalprice) FROM orders o
               WHERE o.o_custkey = c.c_custkey)
              > 1.9 * (SELECT avg(o_totalprice) FROM orders o
                       WHERE o.o_custkey = c.c_custkey)
        ORDER BY c.c_custkey
        """
    )


SQL_CORRELATED_SUBQUERY_SQL = """
SELECT c.c_custkey, c.c_name,
       round((SELECT max(o_totalprice) FROM orders o
              WHERE o.o_custkey = c.c_custkey), 2) AS max_order
FROM customer c
WHERE (SELECT max(o_totalprice) FROM orders o
       WHERE o.o_custkey = c.c_custkey)
      > 1.9 * (SELECT avg(o_totalprice) FROM orders o
               WHERE o.o_custkey = c.c_custkey)
ORDER BY c.c_custkey
"""


# --------------------------------------------------------------------------
# Session windows: Spark's native merging event-time windows (batch plan of
# streaming/event_time.session_window_agg), oracle'd by the classic
# gaps-and-islands formulation.
# --------------------------------------------------------------------------
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessions over events. session_end is the last
    EVENT time (max ts), not window.end (= last+gap), so the oracle needs no
    interval arithmetic."""
    from ..streaming.event_time import session_window_agg

    ev = load_table(spark, sf_dir, "events")
    return session_window_agg(ev, gap="30 minutes", key="user_id").orderBy(
        "user_id", "session_start"
    )


# Spark merges an event into a session iff ts - last < gap (strictly); the
# oracle's new-session flag is therefore diff >= gap.
SESSION_WINDOW_EVENTS_SQL = """
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
    SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM flagged
)
SELECT user_id,
       min(ts)              AS session_start,
       max(ts)              AS session_end,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, sess_id
"""


# --------------------------------------------------------------------------
# Scalar string/date functions (reference's only scalar surface: lowercase,
# split, formatting — ingestion_service.rs:150,81 — generalized).
# --------------------------------------------------------------------------
def scalar_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar pipeline over part: codegen'd JVM expressions,
    zero UDFs."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.lower(F.col("p_type")).alias("type_lower"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.element_at(F.split(F.col("p_type"), " "), -1).alias("type_last_word"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
    )


SCALAR_FUNCTIONS_PART_SQL = """
SELECT p_partkey,
       upper(p_brand)                        AS brand_upper,
       lower(p_type)                         AS type_lower,
       length(p_name)                        AS name_len,
       list_extract(string_split(p_type, ' '), len(string_split(p_type, ' ')))
                                             AS type_last_word,
       round(p_retailprice * 1.1, 2)         AS price_with_tax
FROM part
"""


# --------------------------------------------------------------------------
# Ingest-metrics query: the relational restatement of the reference's audit
# counts (documents.len() logging, ingestion_service.rs:77) over a real table.
# --------------------------------------------------------------------------
def ingest_metrics_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document counts + size totals — what the reference logs
    per-file, expressed as a grouped aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    # Exact-int sum / count in one double division — bit-stable across
    # engines (see json_extract_events).
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .withColumn(
            "avg_chars", F.col("total_chars").cast("double") / F.col("n_docs")
        )
        .orderBy("source")
    )


INGEST_METRICS_BY_SOURCE_SQL = """
SELECT source,
       count(*)                            AS n_docs,
       sum(n_chars)::BIGINT                AS total_chars,
       sum(n_chars)::DOUBLE / count(*)     AS avg_chars
FROM documents
GROUP BY source
"""


# --------------------------------------------------------------------------
# Full outer join: per-nation wealthy customers vs wealthy suppliers —
# asymmetric sides so both null-extension directions are exercised.
# --------------------------------------------------------------------------
def full_outer_join_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides on nationkey. Aggregating
    BEFORE the join keeps the join input at key-cardinality size (25 rows
    here; at 100 TB still one row per nation), so the full-outer itself is
    trivial regardless of fact size."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


FULL_OUTER_JOIN_NATION_BALANCE_SQL = """
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_supp
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


# --------------------------------------------------------------------------
# Explicit GROUPING SETS (the general form behind rollup/cube).
# --------------------------------------------------------------------------
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS ((status), (priority), ()) — three grouping
    shapes in one Expand + hash-agg pass (vs three scans if written as a
    UNION ALL)."""
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*)                    AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


GROUPING_SETS_ORDERS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# Exact percentiles (interpolated) — the sort-based aggregate class.
# --------------------------------------------------------------------------
def percentile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per return flag (Spark
    `percentile` ≡ DuckDB `quantile_cont` — both use rank = p·(n−1)).
    For the 100 TB path use approx_percentile (see ndv_hll_events for the
    sketch-tier pattern); this exact form is the correctness anchor."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
            # One aggregation buffer (value-counts map) serves all three
            # price quantiles via the array-of-percentages form; separate
            # percentile() calls would each build their own map over the
            # same ~600k near-distinct values.
            F.percentile(
                "l_extendedprice",
                F.array(F.lit(0.25), F.lit(0.75), F.lit(0.99)),
            ).alias("p_price"),
        )
        .select(
            "l_returnflag",
            "p50_qty",
            F.round(F.element_at("p_price", 1), 4).alias("p25_price"),
            F.round(F.element_at("p_price", 2), 4).alias("p75_price"),
            F.round(F.element_at("p_price", 3), 4).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILE_LINEITEM_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4)       AS p50_qty,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
FROM lineitem
GROUP BY l_returnflag
"""


def percentile_approx_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-tier percentiles: ``approx_percentile`` (Greenwald-Khanna
    summaries — mergeable, bounded memory per group), the 100 TB twin of
    ``percentile_lineitem``'s exact sort-based aggregate.

    Scale-stable contract: a sketch's RAW estimates drift with data size
    (at sf0.01 the rank error happened to be <1 row and the values matched
    quantile_disc; at sf0.1 they legitimately differ — an sf0.1 audit
    caught exactly that). So, like dedup_embedding_recall, this query
    verifies the sketch's GUARANTEES as driver-checked values instead of
    its unstable point estimates: for each group and each quantile p,
    (a) the estimate is an actually-observed column value, and (b) its
    rank sits within ±4n/accuracy of p·n. (The single-summary GK bound is
    n/accuracy; Spark merges per-partition summaries, which degrades it —
    measured 1.5× nominal at sf0.1 — so the contract pins the documented
    merged behavior at 4× nominal, still a 4e-5 relative-rank guarantee.)
    Both hold at ANY scale, so the oracle is literal TRUEs plus the group
    row count — violated only if Spark's sketch breaks its contract.

    Plan: sketch agg [shuffle 1, tiny mergeable state] → broadcast the
    3-row estimate table back onto lineitem → one counting agg
    [shuffle 2]. Exact values remain covered by percentile_lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    acc = 100000
    sk = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(acc)).alias("aq50"),
        # ONE sketch serves both price quantiles (array-of-percentages
        # form) — a per-quantile call would build an independent GK
        # summary per quantile per group.
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)), F.lit(acc)
        ).alias("ap"),
    ).select(
        "l_returnflag",
        "aq50",
        F.element_at("ap", 1).alias("ap50"),
        F.element_at("ap", 2).alias("ap90"),
    )
    j = li.join(F.broadcast(sk), "l_returnflag")
    eps = 4.0 / acc

    def rank_ok(col, est, p):
        n = F.count(F.lit(1))
        r_lt = F.sum(F.when(F.col(col) < F.col(est), 1).otherwise(0))
        r_le = F.sum(F.when(F.col(col) <= F.col(est), 1).otherwise(0))
        lo = (F.lit(p) - F.lit(eps)) * n
        hi = (F.lit(p) + F.lit(eps)) * n
        return (r_lt <= hi) & (r_le >= lo)

    def observed(col, est):
        return F.max(F.when(F.col(col) == F.col(est), 1).otherwise(0)) == 1

    return (
        j.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            rank_ok("l_quantity", "aq50", 0.5).alias("p50_qty_in_bound"),
            rank_ok("l_extendedprice", "ap50", 0.5).alias("p50_price_in_bound"),
            rank_ok("l_extendedprice", "ap90", 0.9).alias("p90_price_in_bound"),
            (
                observed("l_quantity", "aq50")
                & observed("l_extendedprice", "ap50")
                & observed("l_extendedprice", "ap90")
            ).alias("estimates_are_observed_values"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILE_APPROX_LINEITEM_SQL = """
SELECT l_returnflag, count(*)::BIGINT AS n_rows,
       TRUE AS p50_qty_in_bound,
       TRUE AS p50_price_in_bound,
       TRUE AS p90_price_in_bound,
       TRUE AS estimates_are_observed_values
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Multiple DISTINCT aggregates in one pass (Expand-based rewrite).
# --------------------------------------------------------------------------
def multi_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT user) + count(DISTINCT type) + count(*) per day —
    Catalyst rewrites N distincts into one Expand + two-level aggregate,
    not N scans."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day")
    )


MULTI_DISTINCT_EVENTS_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(DISTINCT user_id)    AS n_users,
       count(DISTINCT event_type) AS n_types,
       count(*)                   AS n_events
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Sketch tier: HyperLogLog distinct-count estimate (rows-only check — HLL
# implementations differ across engines by design; multi_distinct_events is
# the exact anchor for the same grouping).
# --------------------------------------------------------------------------
def ndv_hll_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd 1%) per event type — the sketch
    that replaces exact distinct at 100 TB: constant memory per group, no
    distinct Expand blowup, mergeable across partitions.

    Gated contract: the sketch estimate itself is engine-specific, so the
    output emits the EXACT distinct count plus a ``sketch_within_5pct``
    boolean asserting |approx − exact| ≤ 5·rsd·exact. The oracle recomputes
    the exact count and expects the flag TRUE — a checkable accuracy bound
    instead of round 1's ``no_oracle`` row. (The production 100 TB query
    drops the exact column and keeps only the sketch.)"""
    ev = load_table(spark, sf_dir, "events")
    # One-pass shape (round 7): pre-aggregate to the distinct
    # (event_type, user_id) grain — countDistinct alongside plain aggs
    # otherwise compiles to an Expand that doubles the shuffle; and HLL
    # registers are DUPLICATE-INSENSITIVE, so the sketch over the
    # distinct grain is bit-identical to the sketch over raw events.
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    exact = F.count(F.lit(1))
    return (
        per.groupBy("event_type")
        .agg(
            exact.alias("exact_users"),
            F.sum("n").alias("n_events"),
            (
                F.abs(approx.cast("double") - exact)
                <= 0.05 * exact.cast("double")
            ).alias("sketch_within_5pct"),
        )
        .orderBy("event_type")
    )


NDV_HLL_EVENTS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*)                AS n_events,
       true                    AS sketch_within_5pct
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Regression aggregates: corr / covar / regr_slope-intercept-r2 — the
# bivariate-statistics family (both engines implement the same co-moment
# aggregates; outputs are emitted as integer micro-units because co-moment
# accumulation order differs between engines at the last ulp).
# --------------------------------------------------------------------------
def regression_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return-flag bivariate stats of (quantity, extendedprice):
    correlation, population covariance, OLS slope/intercept/r2."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")

    def micro(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            micro(F.corr(x, y)).alias("corr_micro"),
            micro(F.covar_pop(x, y)).alias("covar_micro"),
            micro(F.regr_slope(y, x)).alias("slope_micro"),
            micro(F.regr_intercept(y, x)).alias("intercept_micro"),
            micro(F.regr_r2(y, x)).alias("r2_micro"),
        )
        .orderBy("l_returnflag")
    )


REGRESSION_STATS_LINEITEM_SQL = """
SELECT l_returnflag,
       count(*) AS n,
       floor(corr(l_extendedprice, l_quantity) * 1e6 + 0.5)::BIGINT
         AS corr_micro,
       floor(covar_pop(l_extendedprice, l_quantity) * 1e6 + 0.5)::BIGINT
         AS covar_micro,
       floor(regr_slope(l_extendedprice, l_quantity) * 1e6 + 0.5)::BIGINT
         AS slope_micro,
       floor(regr_intercept(l_extendedprice, l_quantity) * 1e6 + 0.5)::BIGINT
         AS intercept_micro,
       floor(regr_r2(l_extendedprice, l_quantity) * 1e6 + 0.5)::BIGINT
         AS r2_micro
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# EXCEPT set operation (INTERSECT's twin, see setop_customer_supplier_nations).
# --------------------------------------------------------------------------
def except_wealthy_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with a >9500-balance customer but no >9500-balance supplier
    (EXCEPT ≡ distinct + left-anti hash join)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return cust.subtract(supp).orderBy("nationkey")


EXCEPT_WEALTHY_NATIONS_SQL = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
"""


def setop_multiset_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops (bag semantics): INTERSECT ALL and EXCEPT ALL over
    the order-priority multisets of open vs finished orders, tagged and
    unioned into one result. Duplicates are PRESERVED up to the matching
    multiplicity — the semantics dropDuplicates-based EXCEPT/INTERSECT
    can't express (Spark: intersectAll/exceptAll ≡ grouped-count hash
    join, same shuffle shape as the distinct forms)."""
    o = load_table(spark, sf_dir, "orders")
    open_p = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done_p = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    both = open_p.intersectAll(done_p).withColumn("op", F.lit("intersect_all"))
    only_open = open_p.exceptAll(done_p).withColumn("op", F.lit("except_all"))
    return (
        both.union(only_open)
        .groupBy("op", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("op", "o_orderpriority")
    )


SETOP_MULTISET_PRIORITIES_SQL = """
WITH open_p AS (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
), done_p AS (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
), in_both AS (
  SELECT 'intersect_all' AS op, o_orderpriority
  FROM (SELECT o_orderpriority FROM open_p INTERSECT ALL
        SELECT o_orderpriority FROM done_p)
), only_open AS (
  SELECT 'except_all' AS op, o_orderpriority
  FROM (SELECT o_orderpriority FROM open_p EXCEPT ALL
        SELECT o_orderpriority FROM done_p)
)
SELECT op, o_orderpriority, count(*)::BIGINT AS n
FROM (SELECT * FROM in_both UNION ALL SELECT * FROM only_open)
GROUP BY op, o_orderpriority
"""


def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column pipeline: per-user map(event_type -> count) built
    with map_from_entries over a collected struct array, consumed via
    map_keys/element_at, then exploded back to rows. Exercises the map
    column type end to end (build, access, explode) with a DuckDB twin
    that replays the same shape relationally."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return (
        m.select(
            "user_id",
            F.size(F.col("type_counts")).cast("long").alias("n_types"),
            F.coalesce(
                F.element_at(F.col("type_counts"), "purchase"), F.lit(0)
            ).cast("long").alias("n_purchases"),
            F.explode(F.col("type_counts")).alias("event_type", "n"),
        )
        .orderBy("user_id", "event_type")
    )


MAP_FUNCTIONS_EVENTS_SQL = """
WITH counts AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events WHERE user_id <= 30
  GROUP BY 1, 2
), per_user AS (
  SELECT user_id, count(*)::BIGINT AS n_types,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN n END), 0)::BIGINT
           AS n_purchases
  FROM counts GROUP BY user_id
)
SELECT c.user_id, p.n_types, p.n_purchases, c.event_type, c.n
FROM counts c JOIN per_user p ON p.user_id = c.user_id
"""




# --------------------------------------------------------------------------
# Date/time scalar battery (timestamps are the one typed value in the
# reference — its audit log, models.rs:20-21 — generalized to the full
# calendar-function surface).
# --------------------------------------------------------------------------
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction + date arithmetic over order dates, all
    codegen'd JVM expressions."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
    ).orderBy("o_orderkey")


DATE_FUNCTIONS_ORDERS_SQL = """
SELECT o_orderkey,
       year(o_orderdate)                                      AS yr,
       quarter(o_orderdate)                                   AS qtr,
       month(o_orderdate)                                     AS mon,
       day(o_orderdate)                                       AS dom,
       dayofweek(o_orderdate) + 1                             AS dow,
       date_diff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_to_2002,
       strftime(o_orderdate, '%Y-%m')                         AS ym,
       last_day(o_orderdate::DATE)::VARCHAR                   AS month_end
FROM orders
WHERE o_orderkey <= 1000
"""


QUERIES: dict = {
    "except_wealthy_nations": (except_wealthy_nations, EXCEPT_WEALTHY_NATIONS_SQL),
    "setop_multiset_priorities": (
        setop_multiset_priorities,
        SETOP_MULTISET_PRIORITIES_SQL,
    ),
    "map_functions_events": (map_functions_events, MAP_FUNCTIONS_EVENTS_SQL),
    "regression_stats_lineitem": (
        regression_stats_lineitem,
        REGRESSION_STATS_LINEITEM_SQL,
    ),
    "date_functions_orders": (date_functions_orders, DATE_FUNCTIONS_ORDERS_SQL),
    "full_outer_join_nation_balance": (
        full_outer_join_nation_balance,
        FULL_OUTER_JOIN_NATION_BALANCE_SQL,
    ),
    "grouping_sets_orders": (grouping_sets_orders, GROUPING_SETS_ORDERS_SQL),
    "percentile_lineitem": (percentile_lineitem, PERCENTILE_LINEITEM_SQL),
    "percentile_approx_lineitem": (
        percentile_approx_lineitem,
        PERCENTILE_APPROX_LINEITEM_SQL,
    ),
    "multi_distinct_events": (multi_distinct_events, MULTI_DISTINCT_EVENTS_SQL),
    "ndv_hll_events": (ndv_hll_events, NDV_HLL_EVENTS_SQL),
    "agg_pricing_summary": (agg_pricing_summary, AGG_PRICING_SUMMARY_SQL),
    "scan_filter_project": (scan_filter_project, SCAN_FILTER_PROJECT_SQL),
    "join_revenue_by_segment": (join_revenue_by_segment, JOIN_REVENUE_BY_SEGMENT_SQL),
    "join_multi_region": (join_multi_region, JOIN_MULTI_REGION_SQL),
    "anti_join_inactive_customers": (
        anti_join_inactive_customers,
        ANTI_JOIN_INACTIVE_CUSTOMERS_SQL,
    ),
    "semi_join_active_customers": (
        semi_join_active_customers,
        SEMI_JOIN_ACTIVE_CUSTOMERS_SQL,
    ),
    "window_topk_orders": (window_topk_orders, WINDOW_TOPK_ORDERS_SQL),
    "window_running_revenue": (window_running_revenue, WINDOW_RUNNING_REVENUE_SQL),
    "sort_limit_top_orders": (sort_limit_top_orders, SORT_LIMIT_TOP_ORDERS_SQL),
    "setop_customer_supplier_nations": (
        setop_customer_supplier_nations,
        SETOP_CUSTOMER_SUPPLIER_NATIONS_SQL,
    ),
    "rollup_order_priority": (rollup_order_priority, ROLLUP_ORDER_PRIORITY_SQL),
    "cube_order_status_priority": (
        cube_order_status_priority,
        CUBE_ORDER_STATUS_PRIORITY_SQL,
    ),
    "pivot_priority_by_status": (
        pivot_priority_by_status,
        PIVOT_PRIORITY_BY_STATUS_SQL,
    ),
    "sql_correlated_subquery": (
        sql_correlated_subquery,
        SQL_CORRELATED_SUBQUERY_SQL,
    ),
    "json_extract_events": (json_extract_events, JSON_EXTRACT_EVENTS_SQL),
    "variant_props_events": (variant_props_events, VARIANT_PROPS_EVENTS_SQL),
    "time_window_events": (time_window_events, TIME_WINDOW_EVENTS_SQL),
    "session_window_events": (session_window_events, SESSION_WINDOW_EVENTS_SQL),
    "scalar_functions_part": (scalar_functions_part, SCALAR_FUNCTIONS_PART_SQL),
    "ingest_metrics_by_source": (ingest_metrics_by_source, INGEST_METRICS_BY_SOURCE_SQL),
}
