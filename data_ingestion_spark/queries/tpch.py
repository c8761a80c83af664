"""TPC-H-adapted query battery + advanced window/stats coverage.

The reference has no relational operators at all (SURVEY.md §2.4), so this
module exists purely to prove engine coverage of the classic decision-support
shapes on the synthetic star schema (TESTDATA.md). Queries are adapted from
the public TPC-H spec to the columns that exist here (lineitem has no
commitdate/receiptdate/shipmode; there is no partsupp table).

Numeric-determinism policy (100 TB-relevant): every *revenue sum* casts its
addend to DECIMAL(18,6) before aggregating. Decimal addition is exact and
associative, so Spark's partial/final shuffle aggregation and DuckDB's
single-node sum produce the SAME value bit-for-bit — no rounding tolerance
games. A double sum over 10^9 rows can drift ~1e-4 relative to a serial sum
purely from addition order; decimals make the answer plan-shape-independent.
Moment statistics (stddev/corr/skewness) stay double — they are normalized
ratios where the drift is ~1e-12 — and are rounded to 4 decimals on both
sides.

Scale notes (verified with .explain on local runs):
- part/supplier/nation sides of every join are broadcast (small dims).
- Q17's per-part average is an aggregate-then-broadcast-join, not a
  correlated per-row subquery: one shuffle on l_partkey, then a broadcast
  of the tiny filtered aggregate.
- The EXISTS (Q4) is a left-semi hash join with the non-equi conjunct
  evaluated as the join's extra condition — no per-row subquery execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..session import load_table

# Exact, order-independent revenue addend (see module docstring).
_REV_DEC = "cast(l_extendedprice * (1 - l_discount) as decimal(18,6))"


# --------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS correlated subquery == left-semi join with a
# non-equi conjunct.
# --------------------------------------------------------------------------
def tpch_q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority (one quarter) that have at least one lineitem
    shipped >60 days after the order date. EXISTS == leftsemi join; the
    date predicate rides along as the join's secondary condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_EXISTS_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between two nations.
# --------------------------------------------------------------------------
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume NATION_1 <-> NATION_2 by ship year: lineitem
    joins supplier-nation on one side and orders-customer-nation on the
    other. All three dims broadcast; the only shuffles are the two
    fact-fact equi-joins on orderkey/suppkey and the final aggregate."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        df.groupBy(
            "supp_nation",
            "cust_nation",
            # bigint parity with DuckDB's year() (driver hashes exact dtypes)
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.expr(f"cast(sum({_REV_DEC}) as double)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       cast(sum({_REV_DEC}) as double) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue ratio (conditional aggregation).
# --------------------------------------------------------------------------
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """% of one quarter's revenue from PROMO-type parts. Conditional
    decimal sums; the ratio is computed once at the end in double."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-04-01"))
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.expr(
                "round(100.0 * cast(sum(case when p_type = 'PROMO' "
                f"then {_REV_DEC} else cast(0 as decimal(18,6)) end) as double)"
                f" / cast(sum({_REV_DEC}) as double), 6)"
            ).alias("promo_revenue")
        )
    )


TPCH_Q14_PROMO_REVENUE_SQL = f"""
SELECT round(100.0 * cast(sum(CASE WHEN p_type = 'PROMO'
                 THEN {_REV_DEC} ELSE cast(0 as decimal(18,6)) END) as double)
            / cast(sum({_REV_DEC}) as double), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1998-04-01'
"""


# --------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity revenue vs per-part average.
# --------------------------------------------------------------------------
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue lost to sub-half-average-quantity Brand#1 orders.
    The correlated scalar subquery (per-part avg) is decorrelated into an
    aggregate + broadcast equi-join: one shuffle to build ~100 per-part
    averages, broadcast back onto the fact scan."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    part_avg = brand_li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        brand_li.join(
            F.broadcast(part_avg.withColumnRenamed("l_partkey", "ap_partkey")),
            F.col("l_partkey") == F.col("ap_partkey"),
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.expr(
                "round(cast(sum(cast(l_extendedprice as decimal(18,6))) as double)"
                " / 7.0, 4)"
            ).alias("avg_yearly")
        )
    )


TPCH_Q17_SMALL_QUANTITY_SQL = """
SELECT round(cast(sum(cast(l_extendedprice as decimal(18,6))) as double)
             / 7.0, 4) AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < 0.5 * (
    SELECT avg(l2.l_quantity) FROM lineitem l2
    JOIN part p2 ON l2.l_partkey = p2.p_partkey
    WHERE l2.l_partkey = l.l_partkey AND p2.p_brand = 'Brand#1'
  )
"""


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-attribute predicates over a join.
# --------------------------------------------------------------------------
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under OR-of-ANDs brand/size/quantity conditions. Catalyst
    extracts the common l_partkey=p_partkey equi-conjunct so this stays a
    broadcast hash join (not a nested-loop theta join) with the
    disjunction as a post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 30)
    )
    return joined.filter(cond).agg(
        F.expr(f"cast(sum({_REV_DEC}) as double)").alias("revenue")
    )


TPCH_Q19_DISJUNCTIVE_SQL = f"""
SELECT cast(sum({_REV_DEC}) as double) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
       AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 30)
"""


# --------------------------------------------------------------------------
# Statistical moments battery (population semantics on both engines).
# --------------------------------------------------------------------------
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/corr/covar + skewness/kurtosis per return flag.
    Spark's skewness/kurtosis are POPULATION moments (m3/m2^1.5,
    m4/m2^2 - 3); DuckDB's builtins are sample-corrected, so the oracle
    recomputes the same population formulas from explicit central moments
    rather than calling duckdb's skewness()/kurtosis()."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_pop("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_pop("l_extendedprice"), 2).alias("var_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
            F.round(F.covar_pop("l_quantity", "l_discount"), 4).alias("cov_qd"),
            F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
        )
        .orderBy("l_returnflag")
    )


STATS_MOMENTS_LINEITEM_SQL = """
WITH m AS (
  SELECT l_returnflag,
         avg(l_quantity) AS mu,
         avg(l_quantity * l_quantity) AS m2r
  FROM lineitem GROUP BY l_returnflag
), c AS (
  SELECT l.l_returnflag,
         avg(pow(l.l_quantity - m.mu, 2)) AS m2,
         avg(pow(l.l_quantity - m.mu, 3)) AS m3,
         avg(pow(l.l_quantity - m.mu, 4)) AS m4
  FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
  GROUP BY l.l_returnflag
)
SELECT l.l_returnflag,
       round(stddev_pop(l.l_quantity), 4)                 AS sd_qty,
       round(var_pop(l.l_extendedprice), 2)               AS var_price,
       round(corr(l.l_quantity, l.l_extendedprice), 4)    AS corr_qp,
       round(covar_pop(l.l_quantity, l.l_discount), 4)    AS cov_qd,
       round(any_value(c.m3) / pow(any_value(c.m2), 1.5), 4) AS skew_qty,
       round(any_value(c.m4) / pow(any_value(c.m2), 2) - 3, 4) AS kurt_qty
FROM lineitem l JOIN c ON l.l_returnflag = c.l_returnflag
GROUP BY l.l_returnflag
"""


# --------------------------------------------------------------------------
# Ordered string aggregation (listagg / string_agg).
# --------------------------------------------------------------------------
def string_agg_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted '|'-joined customer names per market segment.
    collect_list has no deterministic order in a distributed engine —
    array_sort BEFORE array_join is what makes this reproducible (and is
    the required pattern at any scale)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


STRING_AGG_SEGMENT_SQL = """
SELECT c_mktsegment,
       string_agg(c_name, '|' ORDER BY c_name) AS names,
       count(*) AS n
FROM customer
WHERE c_custkey <= 200
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# lag/lead window functions (offset frames).
# --------------------------------------------------------------------------
def lag_lead_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas: value change vs previous event and the next
    event's type. Tie-broken on (ts, event_id) so the frame order is total
    — mandatory for reproducibility under any partitioning."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


LAG_LEAD_USER_EVENTS_SQL = """
SELECT event_id, user_id,
       round(value - lag(value)  OVER w, 4) AS delta,
       lead(event_type) OVER w AS next_type
FROM events
WHERE user_id <= 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# ntile + first_value window functions (ranking frames).
# --------------------------------------------------------------------------
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance quartile per market segment plus the segment's richest
    customer name (first_value over the same total order)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.first_value("c_name").over(w).alias("segment_top"),
        )
        .orderBy("c_custkey")
    )


NTILE_CUSTOMER_QUARTILES_SQL = """
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       first_value(c_name) OVER w AS segment_top
FROM customer
WHERE c_custkey <= 500
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


# --------------------------------------------------------------------------
# UNPIVOT / melt (wide -> long reshaping).
# --------------------------------------------------------------------------
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part's numeric measures melted to (partkey, measure, val) rows via
    DataFrame.unpivot — a narrow Expand, no shuffle."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return (
        part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            F.col("p_retailprice").alias("p_retailprice"),
        )
        .unpivot(
            ids=["p_partkey"],
            values=["p_size", "p_retailprice"],
            variableColumnName="measure",
            valueColumnName="val",
        )
        .orderBy("p_partkey", "measure")
    )


UNPIVOT_PART_MEASURES_SQL = """
SELECT p_partkey, 'p_size' AS measure, p_size::DOUBLE AS val
FROM part WHERE p_partkey <= 100
UNION ALL
SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS val
FROM part WHERE p_partkey <= 100
"""


QUERIES: dict = {
    "tpch_q4_exists_priority": (tpch_q4_exists_priority, TPCH_Q4_EXISTS_PRIORITY_SQL),
    "tpch_q7_volume_shipping": (tpch_q7_volume_shipping, TPCH_Q7_VOLUME_SHIPPING_SQL),
    "tpch_q14_promo_revenue": (tpch_q14_promo_revenue, TPCH_Q14_PROMO_REVENUE_SQL),
    "tpch_q17_small_quantity": (tpch_q17_small_quantity, TPCH_Q17_SMALL_QUANTITY_SQL),
    "tpch_q19_disjunctive": (tpch_q19_disjunctive, TPCH_Q19_DISJUNCTIVE_SQL),
    "stats_moments_lineitem": (stats_moments_lineitem, STATS_MOMENTS_LINEITEM_SQL),
    "string_agg_segment": (string_agg_segment, STRING_AGG_SEGMENT_SQL),
    "lag_lead_user_events": (lag_lead_user_events, LAG_LEAD_USER_EVENTS_SQL),
    "ntile_customer_quartiles": (
        ntile_customer_quartiles,
        NTILE_CUSTOMER_QUARTILES_SQL,
    ),
    "unpivot_part_measures": (unpivot_part_measures, UNPIVOT_PART_MEASURES_SQL),
}
