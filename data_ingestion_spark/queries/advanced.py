"""Advanced relational shapes: outer-join distributions, HAVING-subqueries,
anti-join + scalar subquery, explode/lateral, higher-order array functions,
time-range window frames, rank distributions, regexp extraction.

The reference has no relational operators (SURVEY.md §2.4); this module keeps
widening engine coverage over the synthetic star schema (TESTDATA.md).

Scale notes (verified with .explain on local runs):
- Q13's two-level aggregation reuses the first shuffle's partitioning where
  possible; the second groupBy is over the tiny per-customer count domain.
- Q18's HAVING subquery is an aggregate + shuffle-join on l_orderkey (both
  sides are the fact table — no broadcast), exactly the plan you want at
  100 TB because the qualifying-order set is filtered BEFORE the 3-way join.
- Q22's scalar avg is computed once and broadcast as a literal-free
  cross-join of a 1-row DataFrame — no per-row subquery.
- Higher-order array functions (aggregate/filter/transform) run inside
  whole-stage codegen — no Python, no UDF, no shuffle (narrow per-row).
- The time-range window frame uses RANGE on epoch-seconds so frame bounds
  are integer comparisons, not per-row interval arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import load_table


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (left outer join with
# a right-side predicate inside the join, then agg-of-agg).
# --------------------------------------------------------------------------
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed 0, 1, 2, ... non-urgent orders. The
    predicate on orders lives INSIDE the left join (not a WHERE, which
    would drop the 0-order customers)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


TPCH_Q13_CUSTDIST_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (IN-subquery with HAVING).
# --------------------------------------------------------------------------
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 300, with customer context.
    The HAVING subquery materializes the small qualifying-orderkey set
    first; the 3-way join then only touches those orders. l_quantity sums
    are exact (integers stored as double — cast to decimal)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.expr(
                "cast(sum(cast(l_quantity as decimal(18,4))) as double)"
            ).alias("total_qty")
        )
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


TPCH_Q18_LARGE_VOLUME_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       cast(cast(o_orderdate AS DATE) AS VARCHAR) AS o_date,
       o_totalprice,
       cast(sum(cast(l_quantity AS decimal(18,4))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(cast(l_quantity AS decimal(18,4))) > 300
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape: wealthy customers with no orders (scalar-subquery
# threshold + anti join), grouped by nation.
# --------------------------------------------------------------------------
def tpch_q22_idle_wealthy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count/total balance of customers whose balance beats the
    global positive-balance average and who placed no 1998 order. The
    scalar avg is one tiny aggregate cross-joined (broadcast, 1 row) onto
    the scan; NOT EXISTS is a left-anti hash join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01")
    )

    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        rich.groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.expr(
                "round(cast(sum(cast(c_acctbal as decimal(18,4))) as double), 2)"
            ).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


TPCH_Q22_IDLE_WEALTHY_SQL = """
SELECT c_nationkey AS cntry, count(*) AS numcust,
       round(cast(sum(cast(c_acctbal AS decimal(18,4))) AS DOUBLE), 2)
           AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# Explode / lateral view: corpus word count.
# --------------------------------------------------------------------------
def word_count_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus words: split + explode + groupBy. The explode is a
    narrow Generate (no shuffle); only the final count aggregates. The
    word domain is tiny so the agg is broadcast-small after partial
    (map-side) combine — at 100 TB the shuffle carries only
    distinct-words × partitions rows."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(50)
    )


WORD_COUNT_DOCS_SQL = r"""
SELECT word, count(*) AS cnt
FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
  FROM documents
)
WHERE length(word) > 0
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 50
"""


# --------------------------------------------------------------------------
# Higher-order array functions over embeddings (no UDF, pure codegen).
# --------------------------------------------------------------------------
def array_hof_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector stats via higher-order functions: L2 norm (aggregate /
    left fold — sequential element order, so bit-identical to DuckDB's
    list_sum over the same doubles), positive-component count (filter),
    max |x| (transform + array_max). All JVM-side lambda expressions."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 500)
    return emb.select(
        "vec_id",
        F.expr(
            "round(sqrt(aggregate(embedding, cast(0 as double), "
            "(a, x) -> a + cast(x as double) * cast(x as double))), 4)"
        ).alias("l2_norm"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("long").alias("n_pos"),
        F.expr(
            "round(array_max(transform(embedding, x -> abs(cast(x as double)))), 4)"
        ).alias("max_abs"),
    ).orderBy("vec_id")


ARRAY_HOF_EMBEDDINGS_SQL = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
                                          x -> x::DOUBLE * x::DOUBLE))), 4)
           AS l2_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 4)
           AS max_abs
FROM embeddings
WHERE vec_id <= 500
"""


# --------------------------------------------------------------------------
# Time-range window frame: trailing 1-hour moving average per user.
# --------------------------------------------------------------------------
def window_range_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-1h average event value: a RANGE frame keyed on
    epoch seconds (integer), so tie rows (same second) are peers in both
    engines and the frame bound is a subtraction, not interval math."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 40)
    sec = F.col("ts").cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.avg("value").over(w), 4).alias("trailing_avg"),
        )
        .orderBy("event_id")
    )


WINDOW_RANGE_FRAME_EVENTS_SQL = """
SELECT event_id, user_id, round(trailing_avg, 4) AS trailing_avg
FROM (
  SELECT event_id, user_id,
         avg(value) OVER (
           PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
         ) AS trailing_avg
  FROM events
  WHERE user_id <= 40
)
"""


# --------------------------------------------------------------------------
# Rank-distribution windows: percent_rank / cume_dist / dense_rank.
# --------------------------------------------------------------------------
def rank_dist_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price percentile position of each order within its status group.
    percent_rank/cume_dist are tie-stable (peers share values), so no
    extra tie-break key is needed for reproducibility."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.dense_rank().over(w).cast("long").alias("drank"),
        )
        .orderBy("o_orderkey")
    )


RANK_DIST_ORDERS_SQL = """
SELECT o_orderkey, o_orderstatus,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist,
       dense_rank()         OVER w     AS drank
FROM orders
WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
"""


# --------------------------------------------------------------------------
# Regexp extraction battery over the corpus.
# --------------------------------------------------------------------------
def regexp_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document long-word profile via regexp_extract_all: count of
    6+-letter words and the first one (empty string when none). Pure
    JVM regex — no Python in the row path."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 1000)
    longs = F.expr("regexp_extract_all(lower(text), '[a-z]{6,}', 0)")
    return docs.select(
        "doc_id",
        F.size(longs).alias("n_long"),
        F.coalesce(F.try_element_at(longs, F.lit(1)), F.lit("")).alias("first_long"),
    ).orderBy("doc_id")


REGEXP_EXTRACT_DOCS_SQL = """
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z]{6,}'))::INTEGER AS n_long,
       coalesce(regexp_extract_all(lower(text), '[a-z]{6,}')[1], '')
           AS first_long
FROM documents
WHERE doc_id <= 1000
"""


# --------------------------------------------------------------------------
# Funnel conversion: ordered event-sequence matching per user (the product-
# analytics staple). Stage k's timestamp is the first qualifying event
# strictly after stage k-1's — stacked conditional-min windows over ONE
# user partitioning (Catalyst chains them in a single Window subtree, no
# re-shuffle between stages).
# --------------------------------------------------------------------------
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: users reaching each stage in order.

    Epoch-second integers everywhere; the output is four BIGINT counts —
    engine-hash-stable by construction.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("long").alias("sec")
    )
    w = W.partitionBy("user_id")
    v = F.min(F.when(F.col("event_type") == "view", F.col("sec"))).over(w)
    staged = ev.withColumn("v", v)
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("sec") > F.col("v")), F.col("sec"))
    ).over(w)
    staged = staged.withColumn("c", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("sec") > F.col("c")),
            F.col("sec"),
        )
    ).over(w)
    staged = staged.withColumn("p", p)
    users = staged.groupBy("user_id").agg(
        F.max("v").alias("v"), F.max("c").alias("c"), F.max("p").alias("p")
    )
    return users.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("v").alias("n_view"),
        F.count("c").alias("n_view_click"),
        F.count("p").alias("n_full_funnel"),
    )


# The oracle replays the same three ordered stages as chained min-aggregate
# CTEs (stage k joins stage k-1 and takes the first strictly-later event) —
# identical semantics to the stacked conditional-min windows.
FUNNEL_CONVERSION_EVENTS_SQL = """
WITH ev AS (
  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS sec FROM events
), v AS (
  SELECT user_id, min(sec) AS v FROM ev WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT ev.user_id, min(ev.sec) AS c
  FROM ev JOIN v ON v.user_id = ev.user_id
  WHERE ev.event_type = 'click' AND ev.sec > v.v
  GROUP BY ev.user_id
), p AS (
  SELECT ev.user_id, min(ev.sec) AS p
  FROM ev JOIN c ON c.user_id = ev.user_id
  WHERE ev.event_type = 'purchase' AND ev.sec > c.c
  GROUP BY ev.user_id
), users AS (SELECT DISTINCT user_id FROM ev)
SELECT count(*)::BIGINT AS n_users,
       (SELECT count(*) FROM v)::BIGINT AS n_view,
       (SELECT count(*) FROM c)::BIGINT AS n_view_click,
       (SELECT count(*) FROM p)::BIGINT AS n_full_funnel
FROM users
"""


# --------------------------------------------------------------------------
# Cohort retention: week-of-first-activity cohorts × weekly activity offsets
# --------------------------------------------------------------------------
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity epoch
    week; for each later week offset, how many were active again. Epoch-week
    integers (floor(sec/604800)) keep every value engine-exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("long") / 604800).cast("long").alias("week"),
    )
    weeks = ev.distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_COHORTS_EVENTS_SQL = """
WITH weeks AS (
  SELECT DISTINCT user_id, floor(floor(epoch(ts)) / 604800)::BIGINT AS week FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT c.cohort_week, (w.week - c.cohort_week)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM weeks w JOIN cohort c ON c.user_id = w.user_id
GROUP BY 1, 2
"""


QUERIES: dict = {
    "funnel_conversion_events": (
        funnel_conversion_events,
        FUNNEL_CONVERSION_EVENTS_SQL,
    ),
    "retention_cohorts_events": (
        retention_cohorts_events,
        RETENTION_COHORTS_EVENTS_SQL,
    ),
    "tpch_q13_custdist": (tpch_q13_custdist, TPCH_Q13_CUSTDIST_SQL),
    "tpch_q18_large_volume": (tpch_q18_large_volume, TPCH_Q18_LARGE_VOLUME_SQL),
    "tpch_q22_idle_wealthy": (tpch_q22_idle_wealthy, TPCH_Q22_IDLE_WEALTHY_SQL),
    "word_count_docs": (word_count_docs, WORD_COUNT_DOCS_SQL),
    "array_hof_embeddings": (array_hof_embeddings, ARRAY_HOF_EMBEDDINGS_SQL),
    "window_range_frame_events": (
        window_range_frame_events,
        WINDOW_RANGE_FRAME_EVENTS_SQL,
    ),
    "rank_dist_orders": (rank_dist_orders, RANK_DIST_ORDERS_SQL),
    "regexp_extract_docs": (regexp_extract_docs, REGEXP_EXTRACT_DOCS_SQL),
}
