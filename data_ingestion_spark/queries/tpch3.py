"""Third TPC-H battery: Q2 / Q6 / Q11 / Q12 / Q16 / Q21 shapes — completes
all 22 TPC-H query shapes across tpch.py / tpch2.py / advanced.py /
relational.py (Q1 = agg_pricing_summary).

Adaptation notes (the synthetic schema has no partsupp table and lineitem
carries no commitdate/receiptdate/shipmode — same constraints tpch.py's
Q4/Q19 and tpch2.py's Q20 already worked under):
- Q2/Q11/Q16: the part↔supplier relation is derived from lineitem
  (distinct (l_partkey, l_suppkey)), supply cost from l_extendedprice.
- Q12: the shipmode split becomes a ship-latency bucket
  (datediff(shipdate, orderdate) > 60 → 'SLOW').
- Q21: "late" is l_shipdate > o_orderdate + 90 days.

Float discipline follows tpch.py: money sums on DECIMAL(18,6) (exact,
addition-order-independent), cast to double only for the final emitted
value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

_REV_DEC = "cast(l_extendedprice * (1 - l_discount) as decimal(18,6))"
_PRICE_DEC = "cast(l_extendedprice as decimal(18,6))"


# --------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier — aggregate-min + join-back (the
# decorrelated form of Q2's correlated MIN subquery).
# --------------------------------------------------------------------------
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each SMALL-type part of size ≤ 10, the EUROPE supplier(s) offering
    the minimum observed price. Plan shape: lineitem shuffles once on
    (partkey, suppkey) for the pair-cost agg; the per-part MIN is a
    re-aggregation of that (tiny) result; dims (part, supplier, nation,
    region) all broadcast. The correlated subquery never re-executes —
    Catalyst sees two aggregates and one equi-join back."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem")
    pair_cost = (
        li.join(F.broadcast(part.select("p_partkey", "p_name")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.expr(f"min({_PRICE_DEC})").alias("pair_cost"))
    )
    best = pair_cost.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.min("pair_cost").alias("best_cost")
    )
    return (
        pair_cost.join(
            best,
            (pair_cost.p_partkey == best.bk)
            & (pair_cost.pair_cost == best.best_cost),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.expr("cast(best_cost as double)").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


TPCH_Q2_MIN_COST_SUPPLIER_SQL = f"""
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pair_cost AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min({_PRICE_DEC}) AS pair_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN eu_supp ON l_suppkey = s_suppkey
  WHERE p_type = 'SMALL' AND p_size <= 10
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       cast(pair_cost as double) AS supply_cost
FROM pair_cost pc
WHERE pair_cost = (SELECT min(pair_cost) FROM pair_cost x
                   WHERE x.p_partkey = pc.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q6 shape: forecast revenue — pure scan-filter-aggregate, zero joins.
# --------------------------------------------------------------------------
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from discounted small-quantity lineitems in one year. The
    canonical pushdown probe: every predicate reaches the parquet scan
    (shipdate min/max prune row groups) and the aggregate is a single
    partial+final sum — the fastest possible full-table shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                "cast(sum(cast(l_extendedprice * l_discount as decimal(18,6)))"
                " as double)"
            ).alias("revenue")
        )
    )


TPCH_Q6_FORECAST_REVENUE_SQL = """
SELECT cast(sum(cast(l_extendedprice * l_discount as decimal(18,6)))
            as double) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q11 shape: important stock — grouped value vs a global-fraction threshold
# (scalar subquery → broadcast of one row).
# --------------------------------------------------------------------------
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose NATION_7-supplied value exceeds 0.1% of that nation's
    total supplied value. The global total is a one-row aggregate broadcast
    into the HAVING filter — no recomputation, no correlated re-execution.
    Value sums stay DECIMAL end-to-end so the threshold compare is exact."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    li = load_table(spark, sf_dir, "lineitem")
    nat_li = li.join(
        F.broadcast(
            supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .select("s_suppkey")
        ),
        li.l_suppkey == F.col("s_suppkey"),
    )
    per_part = nat_li.groupBy("l_partkey").agg(
        F.expr(f"sum({_PRICE_DEC})").alias("part_value")
    )
    total = per_part.agg(
        F.expr("sum(part_value) * cast(0.001 as decimal(10,6))").alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.expr("cast(part_value as double)").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


TPCH_Q11_IMPORTANT_STOCK_SQL = f"""
WITH nat_li AS (
  SELECT l_partkey, {_PRICE_DEC} AS price
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
), per_part AS (
  SELECT l_partkey, sum(price) AS part_value FROM nat_li GROUP BY 1
)
SELECT l_partkey AS p_partkey, cast(part_value as double) AS part_value
FROM per_part
WHERE part_value > (SELECT sum(part_value) * cast(0.001 as decimal(10,6))
                    FROM per_part)
ORDER BY part_value DESC, p_partkey
"""


# --------------------------------------------------------------------------
# Q12 shape: conditional counts by a derived category (shipmode → latency
# bucket), lineitem ⋈ orders on the fact key.
# --------------------------------------------------------------------------
def tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1997 lineitems bucketed by ship latency (> 60 days = SLOW), counting
    high- vs low-priority orders per bucket — Q12's CASE-sum aggregation.
    orders⋈lineitem is the one shuffle (both sides shuffle on orderkey;
    at 100 TB co-locate by bucketing both tables on the order key)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60,
                F.lit("SLOW"),
            ).otherwise(F.lit("FAST")),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


TPCH_Q12_SHIPMODE_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
            THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------------------------------------
# Q16 shape: supplier-count per part attribute group with an excluded
# supplier set (anti join) and a multi-column distinct count.
# --------------------------------------------------------------------------
def tpch_q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) for non-MEDIUM, non-Brand#1
    parts of selected sizes, excluding negative-balance suppliers (the
    complaints-comment stand-in). The part↔supplier relation is the distinct
    (l_partkey, l_suppkey) projection of lineitem — deduped BEFORE the dim
    join so the countDistinct shuffles pre-shrunk pairs."""
    rel = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        rel.join(F.broadcast(bad_supp), rel.l_suppkey == F.col("s_suppkey"),
                 "left_anti")
        .join(F.broadcast(part), rel.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


TPCH_Q16_PARTS_SUPPLIER_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting — EXISTS (semi) + NOT EXISTS
# (anti) self-joins on the fact table.
# --------------------------------------------------------------------------
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that were the SOLE late supplier (ship > order + 90 days)
    on a finished multi-supplier order. The EXISTS/NOT EXISTS pair is
    decided per ORDER, so both correlated self-joins fold into one
    order-keyed aggregation: a supplier row survives iff its order has
    >= 2 distinct suppliers (EXISTS another supplier) and exactly 1
    distinct LATE supplier (NOT EXISTS another late one) — and that sole
    late supplier is recoverable as max(late supplier) within the order.
    Two keyed aggregations ((orderkey, suppkey) then orderkey) replace the
    semi- and anti-joins that each reshuffled lineitem-scale rows with a
    supplier-inequality post-filter."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    with_late = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    sup_order = with_late.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = sup_order.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("l_suppkey"),
    )
    waiting = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


TPCH_Q21_WAITING_SUPPLIER_SQL = """
WITH l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l1 l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES: dict = {
    "tpch_q2_min_cost_supplier": (
        tpch_q2_min_cost_supplier,
        TPCH_Q2_MIN_COST_SUPPLIER_SQL,
    ),
    "tpch_q6_forecast_revenue": (
        tpch_q6_forecast_revenue,
        TPCH_Q6_FORECAST_REVENUE_SQL,
    ),
    "tpch_q11_important_stock": (
        tpch_q11_important_stock,
        TPCH_Q11_IMPORTANT_STOCK_SQL,
    ),
    "tpch_q12_shipmode": (tpch_q12_shipmode, TPCH_Q12_SHIPMODE_SQL),
    "tpch_q16_parts_supplier": (
        tpch_q16_parts_supplier,
        TPCH_Q16_PARTS_SUPPLIER_SQL,
    ),
    "tpch_q21_waiting_supplier": (
        tpch_q21_waiting_supplier,
        TPCH_Q21_WAITING_SUPPLIER_SQL,
    ),
}
