"""Second TPC-H-adapted battery: Q3/Q5/Q8/Q9/Q10/Q15/Q20 shapes.

Same ground rules as ``tpch.py`` (which see for the numeric-determinism
policy): the reference app has no relational surface at all (SURVEY.md
§2.4), so these queries exist to prove engine coverage of the remaining
classic decision-support shapes on the synthetic star schema. Queries are
adapted to the columns that exist here — there is no partsupp table, so
Q9's profit term and Q20's availqty threshold are re-expressed over
lineitem quantities.

Determinism rules applied throughout:
- revenue sums go through DECIMAL(18,6) (exact, order-independent) and are
  cast to double only at the end;
- every LIMIT is tie-broken down to a unique key so top-k is total-ordered;
- date columns cross the Spark/DuckDB hash boundary as 'yyyy-MM-dd' strings.

Scale notes (verified with .explain on local[32]):
- nation/region/part/supplier dims broadcast in every query; the only
  shuffles are fact-fact equi-joins (orderkey/suppkey/custkey) and final
  aggregates.
- Q15's "revenue = max(revenue)" filter reuses the exact decimal total on
  both sides, so the equality is safe under any plan; the max aggregate is
  a 1-row broadcast, not a second scan of lineitem.
- Q20's HAVING-subquery becomes aggregate → filter → broadcast semi-join:
  linear, no correlated re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

# Exact, order-independent revenue addend (see tpch.py module docstring).
_REV_DEC = "cast(l_extendedprice * (1 - l_discount) as decimal(18,6))"


# --------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority top-10 (3-way join + group + top-k).
# --------------------------------------------------------------------------
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped BUILDING orders by revenue as of a cutoff date.
    customer (filtered, broadcast) -> orders -> lineitem; the top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    global sort."""
    cutoff = "1997-06-15"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey")), orders.o_custkey == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.expr(f"cast(sum({_REV_DEC}) as double)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


TPCH_Q3_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       cast(sum({_REV_DEC}) as double) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15'
  AND l_shipdate  > TIMESTAMP '1997-06-15'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# TPC-H Q5 shape: local-supplier volume (6-way join, co-nation constraint).
# --------------------------------------------------------------------------
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation (one year, one region) where the supplier and the
    ordering customer share a nation. The c_nationkey = s_nationkey
    conjunct rides on the lineitem-supplier join; nation+region collapse
    to one broadcast dim."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    ndim = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(ndim), supp.s_nationkey == ndim.n_nationkey)
        .groupBy("n_name")
        .agg(F.expr(f"cast(sum({_REV_DEC}) as double)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


TPCH_Q5_LOCAL_SUPPLIER_SQL = f"""
SELECT n_name, cast(sum({_REV_DEC}) as double) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# TPC-H Q8 shape: market share (two nation roles, conditional ratio).
# --------------------------------------------------------------------------
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of EUROPE's PROMO-part purchase volume per order
    year. The supplier nation feeds the numerator condition; the customer
    nation->region feeds the market filter. Both ratio terms are exact
    decimal sums; the division happens once per year-row in double."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    market_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("mkt_nkey"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_nkey"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")

    vol = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(market_nations), cust.c_nationkey == F.col("mkt_nkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), supp.s_nationkey == F.col("sn_nkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.expr(_REV_DEC).alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.expr(
                "round(cast(sum(case when supp_nation = 'NATION_3' then volume "
                "else cast(0 as decimal(18,6)) end) as double)"
                " / cast(sum(volume) as double), 6)"
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


TPCH_Q8_MARKET_SHARE_SQL = f"""
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         {_REV_DEC} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       round(cast(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                      ELSE cast(0 as decimal(18,6)) END) as double)
             / cast(sum(volume) as double), 6) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit by nation and year.
# --------------------------------------------------------------------------
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from '%widget%' parts grouped by supplier nation and order
    year (no partsupp table, so profit = discounted revenue — the join
    topology is the point). part filter is pushed to the scan and the
    filtered keys broadcast onto lineitem before any wide join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.expr(f"cast(sum({_REV_DEC}) as double)").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


TPCH_Q9_PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       cast(sum({_REV_DEC}) as double) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item top customers.
# --------------------------------------------------------------------------
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue of items returned in one quarter.
    Orders is date-filtered before the fact-fact join; nation broadcasts;
    the LIMIT rides a TakeOrderedAndProject with a c_custkey tie-break."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name"))
        .agg(F.expr(f"cast(sum({_REV_DEC}) as double)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TPCH_Q10_RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       cast(sum({_REV_DEC}) as double) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier (aggregate == scalar-max filter).
# --------------------------------------------------------------------------
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue. The per-supplier
    revenue aggregate is computed ONCE and reused for both the max and the
    equality filter (decimal-exact, so '= max' is safe); the 1-row max
    broadcasts back onto the aggregate, then supplier broadcasts in."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.expr(f"sum({_REV_DEC})").alias("total_rev_dec")
    )
    max_rev = rev.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev_dec == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


TPCH_Q15_TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, sum({_REV_DEC}) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, cast(total_rev_dec as double) AS total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev_dec = (SELECT max(total_rev_dec) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# TPC-H Q20 shape: semi-join against a HAVING-filtered aggregate.
# --------------------------------------------------------------------------
def tpch_q20_excess_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped > 300 units of 'large %' parts in 1997 (no
    partsupp, so the availqty threshold becomes a shipped-quantity
    threshold). IN-subquery-with-HAVING == aggregate -> filter ->
    broadcast left-semi join; nothing correlated ever re-executes."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("large"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    heavy = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.expr("sum(cast(l_quantity as decimal(18,6)))").alias("shipped"))
        .filter(F.col("shipped") > 300)
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "leftsemi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


TPCH_Q20_EXCESS_VOLUME_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'large %'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING sum(cast(l_quantity as decimal(18,6))) > 300
)
ORDER BY s_suppkey
"""


QUERIES: dict = {
    "tpch_q3_shipping_priority": (tpch_q3_shipping_priority, TPCH_Q3_SHIPPING_PRIORITY_SQL),
    "tpch_q5_local_supplier": (tpch_q5_local_supplier, TPCH_Q5_LOCAL_SUPPLIER_SQL),
    "tpch_q8_market_share": (tpch_q8_market_share, TPCH_Q8_MARKET_SHARE_SQL),
    "tpch_q9_product_profit": (tpch_q9_product_profit, TPCH_Q9_PRODUCT_PROFIT_SQL),
    "tpch_q10_returned_items": (tpch_q10_returned_items, TPCH_Q10_RETURNED_ITEMS_SQL),
    "tpch_q15_top_supplier": (tpch_q15_top_supplier, TPCH_Q15_TOP_SUPPLIER_SQL),
    "tpch_q20_excess_volume": (tpch_q20_excess_volume, TPCH_Q20_EXCESS_VOLUME_SQL),
}
