"""Extended analytical query suite: the TPC-H query families that fit
the TESTDATA schema (no partsupp table; lineitem carries no
commit/receipt dates), adapted where a column is absent, plus
grouping-set and ordered-window coverage over ``events``.

Each entry is a (spark_fn, oracle_sql) pair following the suite-wide
numeric portability rules (see pipeline_suite.py): money math in exact
DECIMAL, cast to DOUBLE last; ratios divide two exact-decimal-derived
doubles; timestamps emitted as formatted strings.

These widen the engine surface beyond the reference's ETL operators
(the reference has no GROUP BY analytics at all —
/root/reference/sql/02-bde_control_functions.sql.in confines itself to
COUNT(*) and string_agg): semi/anti joins, outer-join distributions,
scalar subqueries, disjunctive predicate pushdown, distinct
aggregation, per-group averages via self-join, ROLLUP grouping sets,
and lag/lead ordered windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from linz_bde_uploader_spark.functions.timeutil import epoch_micros
from linz_bde_uploader_spark.plans.tables import load_table

_TS = "TIMESTAMP_NTZ'{} 00:00:00'"


def _ts(day: str):
    return F.expr(_TS.format(day))


def _rev():
    """Exact-decimal extended revenue: l_extendedprice * (1-l_discount)."""
    return (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)"))


# ------------------------------------------------------------------ Q4


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking — EXISTS rewritten as a
    left-semi join (the delivered-late predicate adapted to
    l_shipdate > o_orderdate since TESTDATA lacks commit/receipt
    dates). The semi join keeps only order columns flowing, so the
    shuffle carries no lineitem payload."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(li, (orders["o_orderkey"] == li["l_orderkey"])
                    & (li["l_shipdate"] > orders["o_orderdate"]), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# ------------------------------------------------------------------ Q7


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair shipping volume by year.
    Both nation lookups broadcast; the pair filter lands before the
    aggregate so only matching rows shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == n1["s_nkey"])
        .join(F.broadcast(n2), cust["c_nationkey"] == n2["c_nkey"])
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1 - l_discount AS DECIMAL(12,2)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) GROUP BY supp_nation, cust_nation, l_year
"""


# ------------------------------------------------------------------ Q8


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's market share of ECONOMY-type parts sold
    into the ASIA region, by order year. Ratio of two exact decimal
    sums, divided as doubles last."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY") \
        .select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01")))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"),
                       F.col("n_regionkey").alias("c_rkey"))
    zero = F.lit(0).cast("decimal(12,2)")
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", _rev()).otherwise(zero)
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == n1["s_nkey"])
        .join(F.broadcast(n2), cust["c_nationkey"] == n2["c_nkey"])
        .join(F.broadcast(region), F.col("c_rkey") == region["r_regionkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(nat_rev).cast("double")
              / F.sum(_rev()).cast("double")).alias("mkt_share"))
    )


SQL_Q8 = """
SELECT o_year,
       CAST(SUM(nat_rev) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1 - l_discount AS DECIMAL(12,2)) AS rev,
         CASE WHEN n1.n_name = 'NATION_5'
              THEN CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1 - l_discount AS DECIMAL(12,2))
              ELSE CAST(0 AS DECIMAL(12,2)) END AS nat_rev
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
) GROUP BY o_year
"""


# ----------------------------------------------------------------- Q10


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned items
    in a quarter. Deterministic tie-break on c_custkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01")))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ----------------------------------------------------------------- Q13


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, keeping
    zero-order customers via a conditional LEFT OUTER join, then a
    second aggregation over the counts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                                        "o_orderpriority")
    per_cust = (
        cust.join(orders, (cust["c_custkey"] == orders["o_custkey"])
                  & (orders["o_orderpriority"] != "1-URGENT"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
"""


# ----------------------------------------------------------------- Q14


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo-type revenue share for one month; single
    scalar row — 100.0 * promo / total, both exact sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01")))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg((F.lit(100.0) * F.sum(promo).cast("double")
              / F.sum(_rev()).cast("double")).alias("promo_revenue"))
    )


SQL_Q14 = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(12,2))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


# ----------------------------------------------------------------- Q15


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue. The
    scalar max is computed as a 1-row aggregate and broadcast back
    (no driver collect, no single-partition window)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01")))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["max_revenue"])
        .join(supp, rev["supplier_no"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# ----------------------------------------------------------------- Q16


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted to lineitem as the part-supplier bridge (no
    partsupp in TESTDATA): distinct suppliers per (brand, type, size),
    excluding one brand and suppliers in deficit (anti join)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    bad = load_table(spark, sf_dir, "supplier") \
        .filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ----------------------------------------------------------------- Q17


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders of less than 20% of a part's
    average quantity. The correlated subquery becomes a per-part
    aggregate re-joined on partkey; the per-part average is an exact
    decimal sum over an exact count so both engines compare the same
    doubles.

    The per-part average is computed AFTER semi-joining lineitem to
    the Brand#3 part keys (statistics-driven broadcast — no hint, so
    a corpus where the brand's key set outgrows the threshold falls
    back to a shuffle join instead of OOMing the driver), not over
    the whole table: the
    inner join only ever consumes avg_qty for that brand's parts, so
    the result is identical, but the aggregate's shuffle input and
    the re-join's broadcast build shrink by the brand selectivity
    (~1/50). The unfiltered form broadcast a per-part average for
    EVERY part — unbounded at corpus scale, and its per-rep broadcast
    rebuild was the one persistent warm-rep instability in the r16
    bench artifact (CV 0.30 on a quiet host; every other sub-second
    query sat under 0.2)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part") \
        .filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li_brand = li.join(part, li["l_partkey"] == part["p_partkey"])
    part_avg = (
        li_brand.groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg((F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
              / F.count("*")).alias("avg_qty"))
    )
    return (
        li_brand
        .join(part_avg, li_brand["l_partkey"] == part_avg["pa_partkey"])
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
              .cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


SQL_Q17 = """
WITH part_avg AS (
  SELECT l_partkey AS pa_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN part_avg ON l_partkey = pa_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
"""


# ----------------------------------------------------------------- Q19


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of three (brand, size, quantity) branch
    predicates — exercises OR pushdown through a join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


SQL_Q19 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ----------------------------------------------------------------- Q22


def q22_no_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted to c_nationkey (TESTDATA has no phone
    country codes): wealthy customers with no urgent 1996 orders —
    scalar subquery broadcast in, NOT EXISTS as a left-anti join.
    (TESTDATA gives every customer at least one order, so the
    anti-join predicate is narrowed to keep the result non-empty.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))).select("o_custkey")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
              / F.count("*")).alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
             .cast("double").alias("totacctbal"))
    )


SQL_Q22 = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT'
                    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
GROUP BY c_nationkey
"""


# -------------------------------------------------------- events ROLLUP


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (event_type, day) — per-type-per-day
    counts plus per-type and grand totals in one pass (partial
    aggregation handles all grouping sets map-side)."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    return (
        events.select("event_type", day, "value")
        .rollup("event_type", "day")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("sum_value"))
    )


SQL_EVENTS_ROLLUP = """
SELECT event_type, day, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT event_type,
         strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
         value
  FROM events
) GROUP BY ROLLUP (event_type, day)
"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, lang-less weekday): all four grouping
    sets — (type, dow), (type), (dow), () — in one pass with
    ``grouping_id`` distinguishing them (partial aggregation handles
    every set map-side, same as ROLLUP; the cube is one shuffle, not
    four queries). The integer grouping id disambiguates real NULL
    group values from subtotal rows — the reason GROUPING() exists
    in the standard.

    Portability (r8): the weekday derives from the integer ISO
    day-of-week (Spark ``dayofweek`` is 1=Sun..7=Sat, remapped
    arithmetically; DuckDB ``isodow``) mapped to FIXED 3-letter
    names through an explicit CASE on both sides — the r7 shape used
    ``date_format(ts, 'E')`` weekday NAMES, which are JVM-locale
    dependent where DuckDB's ``%a`` is English-fixed. Publishing the
    ISO number directly is also out: CUBE makes the column nullable
    (subtotal rows), and a NULLABLE integer column degrades to
    float64 (``1`` -> ``'1.0'``) on the driver's pandas fetch path,
    while VARCHAR survives with None. And the sum is published as
    integer cents BIGINT: the r7 red's proven cause was the
    DECIMAL(38,2) column degrading to float64 on that same fetch
    (its ROLLUP twin publishing the same sum CAST to DOUBLE stayed
    green — the minimal pair that pinned the root cause; see
    ORACLE.md)."""
    events = load_table(spark, sf_dir, "events")
    dow = F.expr(
        "CASE (dayofweek(CAST(ts AS TIMESTAMP)) + 5) % 7 + 1"
        " WHEN 1 THEN 'Mon' WHEN 2 THEN 'Tue' WHEN 3 THEN 'Wed'"
        " WHEN 4 THEN 'Thu' WHEN 5 THEN 'Fri' WHEN 6 THEN 'Sat'"
        " WHEN 7 THEN 'Sun' END").alias("dow")
    return (
        events.select("event_type", dow, "value")
        .cube("event_type", "dow")
        .agg(F.count("*").alias("n_events"),
             F.grouping_id().cast("bigint").alias("gid"),
             F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100"
                    " AS BIGINT)").alias("sum_value_cents"))
    )


SQL_EVENTS_CUBE = """
SELECT event_type, dow, COUNT(*) AS n_events,
       CAST(GROUPING(event_type) * 2 + GROUPING(dow) AS BIGINT) AS gid,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS sum_value_cents
FROM (
  SELECT event_type,
         CASE isodow(CAST(ts AS TIMESTAMP))
           WHEN 1 THEN 'Mon' WHEN 2 THEN 'Tue' WHEN 3 THEN 'Wed'
           WHEN 4 THEN 'Thu' WHEN 5 THEN 'Fri' WHEN 6 THEN 'Sat'
           WHEN 7 THEN 'Sun' END AS dow,
         value
  FROM events
) GROUP BY CUBE (event_type, dow)
"""


def q_events_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations the reference's U2/NOT-IN pruning family maps
    to in relational form: users who viewed but never purchased
    (EXCEPT) and users who did both (INTERSECT), labeled and unioned
    into one relation. Both set ops are one aggregate-shaped shuffle
    each on the user key — Catalyst plans EXCEPT/INTERSECT as
    left-anti / left-semi joins, the same shape as the CDC delete
    and insert detectors (J1/J2)."""
    events = load_table(spark, sf_dir, "events")
    viewers = events.filter(F.col("event_type") == "view") \
        .select("user_id").distinct()
    buyers = events.filter(F.col("event_type") == "purchase") \
        .select("user_id").distinct()
    looked_only = viewers.exceptAll(buyers).withColumn(
        "segment", F.lit("viewed_never_bought"))
    both = viewers.intersect(buyers).withColumn(
        "segment", F.lit("viewed_and_bought"))
    return looked_only.unionByName(both)


SQL_EVENTS_EXCEPT_INTERSECT = """
WITH viewers AS (SELECT DISTINCT user_id FROM events
                 WHERE event_type = 'view'),
buyers AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase')
SELECT user_id, 'viewed_never_bought' AS segment
FROM (SELECT user_id FROM viewers EXCEPT SELECT user_id FROM buyers)
UNION ALL
SELECT user_id, 'viewed_and_bought' AS segment
FROM (SELECT user_id FROM viewers INTERSECT SELECT user_id FROM buyers)
"""


# ------------------------------------------------------ events lag/lead


def q_events_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered window over a keyed partition: per-user value delta via
    LAG. Partitioned by user_id so the window shuffles once on the
    natural key; ordering ties broken by event_id. The oracle orders
    by CAST(ts AS TIMESTAMP) to match Spark's microsecond-truncated
    reads of the TIMESTAMP_NS column."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_id", "user_id",
            (F.col("value") - F.lag("value").over(w)).alias("delta"))
    )


SQL_EVENTS_LAG = """
SELECT event_id, user_id,
       value - LAG(value) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
         AS delta
FROM events
"""


# ------------------------------------------------------------------ Q2


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp in TESTDATA): per large-size part,
    the supplier offering the minimum observed unit price in lineitem —
    the argmin-per-group pattern. The per-part minimum is a window
    aggregate; the equality filter joins the winner back without a
    self-join. Unit price is an exact decimal ratio rounded at the
    boundary so the argmin compares identical doubles in both engines;
    ties break on s_suppkey via min()."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40) \
        .select("p_partkey", "p_brand", "p_size")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    unit = F.round(
        (F.col("l_extendedprice").cast("decimal(12,2)")
         / F.col("l_quantity").cast("decimal(12,2)")).cast("double"), 6)
    offers = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_partkey", "p_brand", "p_size", "l_suppkey")
        .agg(F.min(unit).alias("min_unit_price"))
    )
    w = Window.partitionBy("p_partkey")
    best = (
        offers.withColumn("best_price", F.min("min_unit_price").over(w))
        .filter(F.col("min_unit_price") == F.col("best_price"))
        .groupBy("p_partkey", "p_brand", "p_size", "best_price")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
    )
    return (
        best.join(supp, "s_suppkey")
        .select("p_partkey", "p_brand", "p_size", "s_suppkey", "s_name",
                F.col("best_price").alias("min_unit_price"))
    )


SQL_Q2 = """
WITH offers AS (
  SELECT p_partkey, p_brand, p_size, l_suppkey,
         MIN(round(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                        / CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE), 6))
           AS min_unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size >= 40
  GROUP BY p_partkey, p_brand, p_size, l_suppkey),
best AS (
  SELECT p_partkey, p_brand, p_size, min_unit_price AS best_price,
         MIN(l_suppkey) AS s_suppkey
  FROM (SELECT *, MIN(min_unit_price) OVER (PARTITION BY p_partkey)
                    AS best_price_w
        FROM offers)
  WHERE min_unit_price = best_price_w
  GROUP BY p_partkey, p_brand, p_size, min_unit_price)
SELECT p_partkey, p_brand, p_size, s_suppkey, s_name,
       best_price AS min_unit_price
FROM best JOIN supplier USING (s_suppkey)
"""


# ------------------------------------------------------- as-of join


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): each purchase event
    picks up the value of the user's most recent at-or-before view
    event. One key shuffle + ordered window — no range cross-join."""
    from linz_bde_uploader_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", "event_id",
                F.col("value").alias("last_view_value"))
    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    out = asof_join(purchases, views, key="user_id", ts="ts",
                    payload_cols=["last_view_value"], seq_col="event_id")
    return out.select("event_id", "user_id", "last_view_value")


SQL_EVENTS_ASOF = """
WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN event_type = 'view'
              THEN struct_pack(v := value) END AS v_pay,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('view', 'purchase'))
SELECT event_id, user_id, s.v AS last_view_value
FROM (
  SELECT event_id, user_id, is_p,
         last_value(v_pay IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_p, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM u)
WHERE is_p = 1
"""


# -------------------------------------------------- interval join


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join (operators/rangejoin.py): views in the
    30 minutes before each purchase, per user — an equi-join on
    (user, time-bucket) + exact range filter, never a nested-loop
    cross join. Zero-view purchases kept via the left_outer mode."""
    from linz_bde_uploader_spark.operators.rangejoin import interval_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    views = events.filter(F.col("event_type") == "view") \
        .select("user_id", F.col("ts").alias("view_ts"),
                F.col("value").alias("view_value"))
    j = interval_join(purchases, views, left_ts="ts", right_ts="view_ts",
                      lower_s=-1800.0, upper_s=0.0, key="user_id",
                      how="left_outer", left_id="event_id")
    return (
        j.groupBy("event_id", "user_id")
        .agg(F.count("view_ts").alias("n_views"),
             F.sum(F.col("view_value").cast("decimal(18,2)"))
             .cast("double").alias("sum_view_value"))
    )


SQL_EVENTS_INTERVAL = """
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts, value AS view_value
  FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       COUNT(view_ts) AS n_views,
       CAST(SUM(CAST(view_value AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_view_value
FROM p LEFT OUTER JOIN v
  ON p.user_id = v.user_id
 AND epoch_us(view_ts) >= epoch_us(p.ts) - 1800000000
 AND epoch_us(view_ts) <= epoch_us(p.ts)
GROUP BY p.event_id, p.user_id
"""


# ------------------------------------------------------------------ Q9


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (TESTDATA has no partsupp, so profit omits
    supplycost): revenue on red parts by supplier nation and order
    year. part/supplier/nation broadcast into the lineitem scan, so
    the only shuffles are the orders join (both sides pre-filtered)
    and the final small aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part") \
        .filter(F.col("p_name").contains("red")).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
    )


SQL_Q9 = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


# -------------------------------------------------------------- funnel


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase: users
    whose first click strictly follows their first signup, then whose
    first purchase follows that click. Each stage is one keyed
    aggregate over a type-filtered scan; stage joins are on user_id
    (150 distinct here, millions at scale — still a single hash key).
    The three stage counts cross-join as 1-row DataFrames."""
    e = load_table(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_type")
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    c = (e.filter(F.col("event_type") == "click")
         .join(s, "user_id")
         .filter(F.col("ts") > F.col("signup_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("click_ts")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("click_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("purchase_ts")))
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    )


SQL_EVENTS_FUNNEL = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
           FROM events),
s AS (SELECT user_id, MIN(ts) AS signup_ts FROM e
      WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_click_after,
       (SELECT COUNT(*) FROM p) AS n_purchase_after
"""


# ----------------------------------------------------------- retention


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by the week of their first
    event; distinct active users per (cohort week, week offset).
    Two aggregates on the same user_id key — AQE reuses the exchange
    — and week arithmetic stays on DATE so both engines land on the
    same Monday."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk"))
    cohort = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        e.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_wk") / 7).cast("int").alias("week_no"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_EVENTS_RETENTION = """
WITH e AS (SELECT user_id,
                  CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                    AS wk
           FROM events),
cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id)
SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort_wk, wk) / 7 AS INT) AS week_no,
       COUNT(DISTINCT user_id) AS n_users
FROM e JOIN cohort USING (user_id)
GROUP BY cohort_wk, week_no
"""


# ----------------------------------------------------- JSON extraction


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract an integer field from
    the JSON props payload and aggregate it per event type. The
    average is published as integer micro-units
    (``avg_k_micro = (sum_k * 1000000) DIV n_k``) rather than a
    rounded double: two rounds of driver snapshots proved that
    ``round(DOUBLE, 6)`` is not bit-identical across engine builds,
    while truncating integer division is. A THIRD red snapshot then
    arrived on an all-integer projection, proving the extractors
    themselves diverge: Spark's Jackson-based ``get_json_object`` and
    DuckDB's yyjson-based ``->>`` disagree on at least one payload in
    the driver fixture (duplicate-key precedence, number-token
    canonicalization, and escape handling are the known divergence
    classes). Fix: extraction is now ENGINE-NEUTRAL — both sides run
    the identical regex ``"k"\\s*:\\s*(-?[0-9]+)`` over the raw
    string (Java regex and RE2 agree on this subset: literal chars,
    \\s, a capture group, first-match wins) and CAST the capture to
    BIGINT (both engines null an empty capture). This removes both
    JSON libraries from the equation; the original extractor pair
    stays observable via the driver-gated ``events_json_k_hist``
    bisection query below, which names any diverging k multiset.

    Round 8 (the actual root cause, found by type audit): the FOURTH
    red arrived on the regex shape while k_hist — the same multiset
    through the ORIGINAL extractors — came back green, exonerating
    extraction entirely. The audit then showed this oracle published
    ``SUM(k)`` uncast, which in DuckDB is HUGEINT — a type the
    driver's pandas fetch degrades to float64, rendering ``248.0``
    against Spark's ``248``; k_hist publishes only BIGINT and VARCHAR
    columns, which survive the conversion, exactly matching the
    green/red split. Fix: ``sum_k`` is CAST to BIGINT, and the
    average's integer division is engine-pinned as a FLOOR division
    via %-subtraction (``(a - ((a%b)+b)%b)`` is exactly divisible by
    ``b``, and both engines agree on C-style sign-follows-dividend
    ``%``), so neither HUGEINT rendering nor any trunc-vs-floor
    ``DIV``/``//`` drift across engine builds can reach the hash."""
    from linz_bde_uploader_spark.functions.portable import floor_div_spark

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.regexp_extract("props", r'"k"\s*:\s*(-?[0-9]+)', 1)
        .cast("bigint").alias("k"))
    return (
        e.groupBy("event_type")
        .agg(F.count("k").alias("n_k"),
             F.sum("k").cast("bigint").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
        .withColumn(
            "avg_k_micro",
            F.expr(f"CAST({floor_div_spark('sum_k * 1000000', 'n_k')}"
                   " AS BIGINT)"))
    )


def _sql_events_json() -> str:
    from linz_bde_uploader_spark.functions.portable import floor_div_duck

    q = floor_div_duck("CAST(SUM(k) AS BIGINT) * 1000000", "COUNT(k)")
    return rf"""
SELECT event_type,
       COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k,
       CAST({q} AS BIGINT) AS avg_k_micro
FROM (SELECT event_type,
             TRY_CAST(NULLIF(regexp_extract(props,
                 '"k"\s*:\s*(-?[0-9]+)', 1), '') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


SQL_EVENTS_JSON = _sql_events_json()


def q_events_json_k_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bisection diagnostic for the extractor divergence documented in
    :func:`q_events_json_props`: keeps the ORIGINAL extractor pair
    (Spark ``get_json_object`` vs DuckDB ``->>``) but publishes the
    full ``(event_type, k, count)`` multiset — all integers — so a
    red driver snapshot names exactly WHICH k values the two JSON
    libraries disagree on, instead of collapsing the difference into
    one opaque aggregate hash. NULL k (absent/non-integer payload) is
    its own bucket on both sides."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"))
    return e.groupBy("event_type", "k").agg(F.count("*").alias("n"))


SQL_EVENTS_JSON_K_HIST = """
SELECT event_type, k, COUNT(*) AS n
FROM (SELECT event_type, TRY_CAST(props->>'$.k' AS BIGINT) AS k FROM events)
GROUP BY event_type, k
"""


# ---------------------------------------------------------------- pivot


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types to per-user count columns. The value list is
    given explicitly so Spark skips the distinct-values pre-pass and
    the whole pivot is one groupBy shuffle."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    types = ["signup", "view", "click", "purchase", "error"]
    p = e.groupBy("user_id").pivot("event_type", types).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types])


SQL_EVENTS_PIVOT = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events
GROUP BY user_id
"""


# ------------------------------------------------------ anomaly scan


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier scan: flag events > 3 sigma from their type's
    mean. Moments come from exact decimal sums (order-independent, so
    both engines derive bit-identical mean/std doubles); the tiny
    per-type stats broadcast back into the scan — the standard
    monitoring pass over an event firehose."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    dv = F.col("value").cast("decimal(18,6)")
    stats = (
        e.groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum(dv).alias("s1"),
             F.sum(dv * dv).alias("s2"))
        .select(
            "event_type", "n",
            (F.col("s1").cast("double") / F.col("n")).alias("mean"),
            F.sqrt((F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1").cast("double")
                    / F.col("n")) / F.col("n")).alias("std"))
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(F.count(F.when(
            F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"), 1))
            .alias("n_outliers"),
            F.first("n").alias("n"),
            F.round(F.first("mean"), 6).alias("mean"),
            F.round(F.first("std"), 6).alias("std"))
    )


SQL_EVENTS_ANOMALY = """
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS mean,
         sqrt((CAST(SUM(CAST(value AS DECIMAL(18,6))
                        * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               - CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 * CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*)) / COUNT(*)) AS std
  FROM events GROUP BY event_type)
SELECT e.event_type,
       COUNT(*) FILTER (WHERE abs(e.value - s.mean) > 3 * s.std)
         AS n_outliers,
       MIN(s.n) AS n,
       round(MIN(s.mean), 6) AS mean,
       round(MIN(s.std), 6) AS std
FROM events e JOIN stats s ON e.event_type = s.event_type
GROUP BY e.event_type
"""


# --------------------------------------------------- running totals


def q_events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative value over event time — the classic
    ordered-window running total. Partitioned on the natural user key
    (one shuffle); the accumulation is an exact decimal sum cast to
    double per row, so the prefix sums match the oracle exactly."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return e.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double").alias("running_value"))


SQL_RUNNING_TOTAL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
              PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_value
FROM events
"""


# ----------------------------------------------------------------- Q12


def q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (TESTDATA lacks shipmode/commit/receipt
    dates): shipping-speed classes from the shipdate-vs-orderdate lag,
    counting high- vs low-priority orders per class. One fact-fact
    join on orderkey, then a two-row aggregate; the priority split is
    a map-side CASE."""
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    speed = F.when(
        F.col("l_shipdate") <= F.expr("o_orderdate + INTERVAL 30 DAYS"),
        F.lit("fast")).otherwise(F.lit("slow"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(speed.alias("speed_class"))
        .agg(F.count(F.when(high, 1)).alias("high_line_count"),
             F.count(F.when(~high, 1)).alias("low_line_count"))
    )


SQL_Q12 = """
SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
            THEN 'fast' ELSE 'slow' END AS speed_class,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ----------------------------------------------------------------- Q21


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (late = shipped > 60 days after order date,
    since TESTDATA has no commit/receipt dates): suppliers who were
    the ONLY late supplier on a finalized multi-supplier order. The
    EXISTS becomes a left-semi join and the NOT EXISTS a left-anti
    join, both carrying just (orderkey, suppkey) — no payload in
    either probe; supplier names broadcast at the end."""
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    fo = load_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderstatus") == "F") \
        .select("o_orderkey", "o_orderdate")
    l1 = li.join(fo, li["l_orderkey"] == fo["o_orderkey"]) \
        .withColumn("late", F.col("l_shipdate")
                    > F.expr("o_orderdate + INTERVAL 60 DAYS")) \
        .select("l_orderkey", "l_suppkey", "late")
    base = l1.filter("late").select("l_orderkey", "l_suppkey").distinct()
    others = l1.select(F.col("l_orderkey").alias("o_key"),
                       F.col("l_suppkey").alias("o_supp"), "late")
    has_other = base.join(
        others,
        (base["l_orderkey"] == others["o_key"])
        & (base["l_suppkey"] != others["o_supp"]), "left_semi")
    lone_late = has_other.join(
        others.filter("late"),
        (has_other["l_orderkey"] == others["o_key"])
        & (has_other["l_suppkey"] != others["o_supp"]), "left_anti")
    supp = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_name")
    return (
        lone_late.join(F.broadcast(supp),
                       lone_late["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name").agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name")).limit(10)
    )


SQL_Q21 = """
WITH l1 AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
base AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM l1 WHERE late),
lone AS (
  SELECT b.l_orderkey, b.l_suppkey FROM base b
  WHERE EXISTS (SELECT 1 FROM l1 o
                WHERE o.l_orderkey = b.l_orderkey
                  AND o.l_suppkey <> b.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM l1 o
                    WHERE o.l_orderkey = b.l_orderkey
                      AND o.l_suppkey <> b.l_suppkey AND o.late))
SELECT s_name, COUNT(*) AS numwait
FROM lone JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


# ----------------------------------------------------------------- Q20


def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp availability in TESTDATA):
    suppliers shipping more than 20% of a red part's total shipped
    quantity (volume is near-uniform across this synthetic corpus's
    many suppliers per part, so 20% is an outsized share). Two nested
    aggregates on (part, supplier) then (part); the threshold
    compares 5*supp_qty > total_qty in exact decimals (no float
    fraction). The
    second aggregate's input is already partitioned by l_partkey, so
    AQE plans it shuffle-free."""
    red = load_table(spark, sf_dir, "part") \
        .filter(F.col("p_name").contains("red")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_partkey", "l_suppkey",
                F.col("l_quantity").cast("decimal(12,2)").alias("qty"))
    lq = (li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"])
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("qty").alias("supp_qty")))
    tot = lq.groupBy("l_partkey").agg(F.sum("supp_qty").alias("tot_qty"))
    dom = lq.join(tot, "l_partkey") \
        .filter(F.lit(5) * F.col("supp_qty") > F.col("tot_qty"))
    supp = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_name")
    return (
        dom.join(F.broadcast(supp), dom["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name").agg(F.count("*").alias("n_dominated_parts"))
    )


SQL_Q20 = """
WITH lq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
  GROUP BY l_partkey, l_suppkey),
tot AS (
  SELECT l_partkey, SUM(supp_qty) AS tot_qty FROM lq GROUP BY l_partkey)
SELECT s_name, COUNT(*) AS n_dominated_parts
FROM lq JOIN tot USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE 5 * supp_qty > tot_qty
GROUP BY s_name
"""


def q_orders_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join parity: revenue per market segment through
    operators/skew.salted_join instead of a plain join. The rewrite
    must hold row-for-row (each fact row meets its key's dim rows in
    exactly one salted partition), so the aggregate equals the plain
    SQL join — that equality is exactly what this entry oracles. At
    scale this is the manual fix for a hot customer key when the dim
    side is too big to broadcast and AQE's split still leaves a
    straggler. DECIMAL accumulation for cross-engine bit stability;
    the revenue is PUBLISHED as integer cents — a DECIMAL(38,2)
    result column degrades to float64 on the driver's pandas fetch
    path, and this query's historical greens were few-rows luck
    (5 segments; red only when a total lands on a trailing-zero
    cent digit — see ORACLE.md)."""
    from linz_bde_uploader_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders") \
        .select(F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    cust = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_mktsegment")
    j = salted_join(orders, cust, key="c_custkey", n_salts=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100"
                    " AS BIGINT)").alias("revenue_cents"))
    )


SQL_SALTED_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp in TESTDATA): per part supplied
    by NATION_7 suppliers, total lineitem value; keep parts above
    1.5x the average share — the HAVING-against-global-aggregate
    pattern. The global (total, n_parts) aggregate is one row,
    broadcast back; the threshold compares DECIMAL x integer
    cross-multiplications (value*np*2 > total*3), so no float ratio
    exists to diverge between engines. Supplier dim broadcasts into
    the fact scan. The value is PUBLISHED as integer cents
    (``value_cents`` BIGINT): the r7 driver snapshot proved a
    DECIMAL(38,2) result column degrades to float64 on the driver's
    pandas fetch path (``123.40`` renders ``'123.4'`` against
    Spark's scale-preserving Decimal), so DECIMAL stays internal to
    the exact arithmetic and only portable types cross the gate
    (ORACLE.md doctrine)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier") \
        .filter(F.col("s_nationkey") == 7).select("s_suppkey")
    v = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
             .alias("value")))
    tot = v.agg(F.sum("value").alias("total"),
                F.count("*").alias("np"))
    return (
        v.join(F.broadcast(tot))
        .filter(F.col("value") * F.col("np") * 2 > F.col("total") * 3)
        .select("l_partkey",
                F.expr("CAST(value * 100 AS BIGINT)").alias("value_cents"))
    )


SQL_Q11 = """
WITH v AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 7 GROUP BY l_partkey),
t AS (SELECT SUM(value) AS total, COUNT(*) AS np FROM v)
SELECT l_partkey, CAST(value * 100 AS BIGINT) AS value_cents
FROM v, t WHERE value * np * 2 > total * 3
"""


ANALYTICS_QUERIES: dict[str, tuple] = {
    "q11_important_parts": (q11_important_parts, SQL_Q11),
    "orders_salted_join": (q_orders_salted_join, SQL_SALTED_JOIN),
    "q20_dominant_supplier": (q20_dominant_supplier, SQL_Q20),
    "q12_ship_latency": (q12_ship_latency, SQL_Q12),
    "q21_waiting_supplier": (q21_waiting_supplier, SQL_Q21),
    "events_anomaly": (q_events_anomaly, SQL_EVENTS_ANOMALY),
    "events_running_total": (q_events_running_total, SQL_RUNNING_TOTAL),
    "q9_profit_nation_year": (q9_profit_by_nation_year, SQL_Q9),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
    "events_retention": (q_events_retention, SQL_EVENTS_RETENTION),
    "events_json_props": (q_events_json_props, SQL_EVENTS_JSON),
    "events_json_k_hist": (q_events_json_k_hist, SQL_EVENTS_JSON_K_HIST),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "q2_min_cost_supplier": (q2_min_cost_supplier, SQL_Q2),
    "events_asof": (q_events_asof, SQL_EVENTS_ASOF),
    "events_interval_join": (q_events_interval_join, SQL_EVENTS_INTERVAL),
    "q4_order_priority": (q4_order_priority, SQL_Q4),
    "q7_volume_shipping": (q7_volume_shipping, SQL_Q7),
    "q8_market_share": (q8_market_share, SQL_Q8),
    "q10_returned_items": (q10_returned_items, SQL_Q10),
    "q13_customer_distribution": (q13_customer_distribution, SQL_Q13),
    "q14_promo_revenue": (q14_promo_revenue, SQL_Q14),
    "q15_top_supplier": (q15_top_supplier, SQL_Q15),
    "q16_supplier_cnt": (q16_supplier_cnt, SQL_Q16),
    "q17_small_quantity": (q17_small_quantity, SQL_Q17),
    "q19_disjunctive": (q19_disjunctive, SQL_Q19),
    "q22_no_order_customers": (q22_no_order_customers, SQL_Q22),
    "events_rollup": (q_events_rollup, SQL_EVENTS_ROLLUP),
    "events_cube": (q_events_cube, SQL_EVENTS_CUBE),
    "events_except_intersect": (q_events_except_intersect,
                                SQL_EVENTS_EXCEPT_INTERSECT),
    "events_lag_delta": (q_events_lag_delta, SQL_EVENTS_LAG),
}


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-to-next-event transition matrix — the
    user-journey / Markov-chain summary funnel products compute over
    clickstreams (which step follows which, how often, with what
    median gap). LEAD over the (user_id)-partitioned, (ts, event_id)-
    ordered window pairs each event with its successor; one aggregate
    collapses the stream to |event_type|^2 rows. The window shuffles
    once on the natural user key (bounded per-user partitions, no
    global sort); the gap statistic stays on exact int64 microseconds
    (sum + count published, never an average — ORACLE.md portable
    types). Terminal events (no successor) drop out, so the row count
    is at most the type-pair cardinality at any scale."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt_type = F.lead("event_type").over(w)
    gap_us = F.lead(epoch_micros("ts")).over(w) - epoch_micros("ts")
    return (
        events.select(F.col("event_type").alias("from_type"),
                      nxt_type.alias("to_type"), gap_us.alias("_gap"))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"),
             F.sum("_gap").cast("bigint").alias("gap_total_us"))
    )


SQL_EVENTS_TRANSITIONS = """
WITH s AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS to_type,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id)
           - epoch_us(CAST(ts AS TIMESTAMP)) AS gap
  FROM events)
SELECT from_type, to_type, COUNT(*) AS n,
       CAST(SUM(gap) AS BIGINT) AS gap_total_us
FROM s WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


ANALYTICS_QUERIES.update({
    "events_transition_matrix": (q_events_transition_matrix,
                                 SQL_EVENTS_TRANSITIONS),
})


# ---------------------------------------------------------------- r13
# Deterministic distinct-count sketches (operators/sketches.py): the
# approximate-distinct family the reference lacks entirely, built so
# a DuckDB oracle computes the BIT-IDENTICAL estimate (portable md5
# hashing + integer-exact register math) — unlike Spark's native
# approx_count_distinct, whose estimate no other engine reproduces
# (docs_sketch_stats, the rows-only entry, wraps that one). The
# exact_ndv column is the demonstration/verification side-car; the
# sketch is the scale path (the exact distinct over the same keys is
# precisely what a 100 TB run would omit).

def _keyed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, key_kind, key) over two cardinality regimes:
    'user' (~150 distinct — exercises HLL linear counting / KMV
    estimate) and 'userday' (~1.6k per type — raw harmonic HLL)."""
    ev = load_table(spark, sf_dir, "events").filter(
        "user_id IS NOT NULL AND ts IS NOT NULL")
    day = F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
    user = ev.select(
        "event_type", F.lit("user").alias("key_kind"),
        F.col("user_id").cast("string").alias("key"))
    userday = ev.select(
        "event_type", F.lit("userday").alias("key_kind"),
        F.concat(F.col("user_id").cast("string"), F.lit(":"),
                 day).alias("key"))
    return user.unionByName(userday)


_SQL_KEYED_EVENTS = """
keyed AS (
  SELECT event_type, 'user' AS key_kind,
         CAST(user_id AS VARCHAR) AS key
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  UNION ALL
  SELECT event_type, 'userday' AS key_kind,
         CAST(user_id AS VARCHAR) || ':' ||
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS key
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
ex AS (
  SELECT event_type, key_kind, COUNT(DISTINCT key) AS exact_ndv
  FROM keyed GROUP BY event_type, key_kind)
"""


def q_events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users / user-days per event type, with
    the exact counts alongside. Plan shape (the 100 TB argument): the
    sketch side shuffles at most |groups| x 256 register rows no
    matter the input size — both aggregations combine map-side, all
    built-ins, no UDF/window/collect. Estimate formula text is shared
    verbatim with the DuckDB oracle (hll_est_micro_sql), so this
    hash-matches like an exact query."""
    from linz_bde_uploader_spark.operators.sketches import hll_distinct
    keyed = _keyed_events(spark, sf_dir)
    est = hll_distinct(keyed, ["event_type", "key_kind"], F.col("key"))
    exact = (keyed.groupBy("event_type", "key_kind")
             .agg(F.countDistinct("key").alias("exact_ndv")))
    return exact.join(est, ["event_type", "key_kind"]).select(
        "event_type", "key_kind", "exact_ndv", "hll_est_micro")


def _sql_events_hll() -> str:
    from linz_bde_uploader_spark.operators.sketches import (
        _P52, _P53, hll_est_micro_sql)
    from linz_bde_uploader_spark.functions.hashing import sql_hash60
    return f"""
WITH {_SQL_KEYED_EVENTS},
hashed AS (
  SELECT event_type, key_kind, {sql_hash60('key')} AS h FROM keyed),
regs AS (
  SELECT event_type, key_kind, h // {_P52} AS idx,
         CASE WHEN h % {_P52} = 0 THEN 53
              ELSE 53 - length(bin(h % {_P52})) END AS rho
  FROM hashed),
mx AS (SELECT event_type, key_kind, idx, MAX(rho) AS m
       FROM regs GROUP BY event_type, key_kind, idx),
agg AS (
  SELECT event_type, key_kind,
         CAST(SUM(1::BIGINT << (53 - m)) AS BIGINT)
           + (256 - COUNT(*)) * {int(_P53)} AS s,
         256 - COUNT(*) AS v
  FROM mx GROUP BY event_type, key_kind)
SELECT event_type, key_kind, exact_ndv,
       {hll_est_micro_sql('s', 'v')} AS hll_est_micro
FROM agg JOIN ex USING (event_type, key_kind)
"""


def q_events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, k=64) distinct estimate — the simpler,
    mergeable sibling of the HLL query: keep the 64 smallest distinct
    hashes per group (salted two-phase grouped_topk, the
    dedup_survivors shape — no global window), estimate from the
    64th's fractional position. Same shared-text determinism."""
    from linz_bde_uploader_spark.operators.sketches import kmv_distinct
    keyed = _keyed_events(spark, sf_dir)
    est = kmv_distinct(keyed, ["event_type", "key_kind"], F.col("key"))
    exact = (keyed.groupBy("event_type", "key_kind")
             .agg(F.countDistinct("key").alias("exact_ndv")))
    return exact.join(est, ["event_type", "key_kind"]).select(
        "event_type", "key_kind", "exact_ndv", "kmv_est_micro")


def _sql_events_kmv() -> str:
    from linz_bde_uploader_spark.operators.sketches import (
        KMV_K, kmv_est_micro_sql)
    from linz_bde_uploader_spark.functions.hashing import sql_hash60
    return f"""
WITH {_SQL_KEYED_EVENTS},
dist AS (
  SELECT DISTINCT event_type, key_kind, {sql_hash60('key')} AS h
  FROM keyed),
ranked AS (
  SELECT event_type, key_kind, h,
         row_number() OVER (PARTITION BY event_type, key_kind
                            ORDER BY h) AS rn
  FROM dist),
per AS (
  SELECT event_type, key_kind, COUNT(*) AS cnt, MAX(h) AS kth
  FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type, key_kind)
SELECT event_type, key_kind, exact_ndv,
       {kmv_est_micro_sql('cnt', 'kth')} AS kmv_est_micro
FROM per JOIN ex USING (event_type, key_kind)
"""


ANALYTICS_QUERIES.update({
    "events_hll_distinct": (q_events_hll_distinct, _sql_events_hll()),
    "events_kmv_distinct": (q_events_kmv_distinct, _sql_events_kmv()),
})


def q_events_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: pairwise distinct-user overlap between
    event types by inclusion-exclusion over HLL register unions —
    |A ∩ B| ~= est(A) + est(B) - est(A ∪ B), where the union sketch
    is just the per-register MAX of the two register tables (the
    mergeability that makes HLL a rollup primitive: no re-scan of
    the events, the pair fan-out is |types|^2/2 x 256 register rows).
    exact_overlap rides along as the verification side-car. The
    estimate can undershoot/overshoot by sketch error (and even go
    negative for small overlaps) — it is published raw, signed
    micro-units, deterministic on both engines."""
    from linz_bde_uploader_spark.operators.sketches import (
        hll_estimate, hll_registers)
    ev = (load_table(spark, sf_dir, "events")
          .filter("user_id IS NOT NULL")
          .select("event_type", F.col("user_id").cast("string")
                  .alias("key")))
    regs = hll_registers(ev, ["event_type"], F.col("key"))
    types = regs.select("event_type").distinct()
    pairs = (types.select(F.col("event_type").alias("type_a"))
             .join(types.select(F.col("event_type").alias("type_b")),
                   F.col("type_a") < F.col("type_b")))
    # union registers per pair: every register of a member type joins
    # its (broadcast-tiny) pairs, then per-(pair, idx) max
    union_regs = (regs.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")))
        .groupBy("type_a", "type_b", "idx")
        .agg(F.max("m").alias("m")))
    est_u = hll_estimate(union_regs, ["type_a", "type_b"],
                         est_col="est_union")
    est_t = hll_estimate(regs, ["event_type"], est_col="est_t")
    ex_users = ev.distinct()
    exact = (ex_users.withColumnRenamed("event_type", "type_a")
             .join(ex_users.withColumnRenamed("event_type", "type_b"),
                   "key")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count("*").alias("exact_overlap")))
    ea = est_t.select(F.col("event_type").alias("type_a"),
                      F.col("est_t").alias("est_a"))
    eb = est_t.select(F.col("event_type").alias("type_b"),
                      F.col("est_t").alias("est_b"))
    return (est_u.join(ea, "type_a").join(eb, "type_b")
            .join(exact, ["type_a", "type_b"])
            .select("type_a", "type_b", "exact_overlap",
                    (F.col("est_a") + F.col("est_b")
                     - F.col("est_union")).alias("hll_overlap_micro")))


def _sql_events_hll_overlap() -> str:
    from linz_bde_uploader_spark.functions.hashing import sql_hash60
    from linz_bde_uploader_spark.operators.sketches import (
        _P52, _P53, hll_est_micro_sql)
    est_u = hll_est_micro_sql("s", "v")
    return f"""
WITH ev AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS key
  FROM events WHERE user_id IS NOT NULL),
hashed AS (
  SELECT event_type, {sql_hash60('key')} AS h FROM ev),
regs AS (
  SELECT event_type, h // {_P52} AS idx,
         MAX(CASE WHEN h % {_P52} = 0 THEN 53
                  ELSE 53 - length(bin(h % {_P52})) END) AS m
  FROM hashed GROUP BY event_type, h // {_P52}),
types AS (SELECT DISTINCT event_type FROM regs),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type),
union_regs AS (
  SELECT type_a, type_b, idx, MAX(m) AS m
  FROM regs JOIN pairs
    ON regs.event_type = pairs.type_a OR regs.event_type = pairs.type_b
  GROUP BY type_a, type_b, idx),
agg_u AS (
  SELECT type_a, type_b,
         CAST(SUM(1::BIGINT << (53 - m)) AS BIGINT)
           + (256 - COUNT(*)) * {int(_P53)} AS s,
         256 - COUNT(*) AS v
  FROM union_regs GROUP BY type_a, type_b),
est_union AS (
  SELECT type_a, type_b, {est_u} AS est_union FROM agg_u),
agg_t AS (
  SELECT event_type,
         CAST(SUM(1::BIGINT << (53 - m)) AS BIGINT)
           + (256 - COUNT(*)) * {int(_P53)} AS s,
         256 - COUNT(*) AS v
  FROM regs GROUP BY event_type),
est_t AS (SELECT event_type, {est_u.replace('est_union', 'est_t')} AS est_t
          FROM agg_t),
ex AS (
  SELECT a.type_a, b.type_b, COUNT(*) AS exact_overlap
  FROM (SELECT DISTINCT event_type AS type_a, key FROM ev) a
  JOIN (SELECT DISTINCT event_type AS type_b, key FROM ev) b USING (key)
  WHERE a.type_a < b.type_b
  GROUP BY a.type_a, b.type_b)
SELECT type_a, type_b, exact_overlap,
       ea.est_t + eb.est_t - est_union AS hll_overlap_micro
FROM est_union
JOIN est_t ea ON ea.event_type = est_union.type_a
JOIN est_t eb ON eb.event_type = est_union.type_b
JOIN ex USING (type_a, type_b)
"""


ANALYTICS_QUERIES.update({
    "events_hll_overlap": (q_events_hll_overlap,
                           _sql_events_hll_overlap()),
})


def q_events_window_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per tumbling hour — the windowed face of the
    sketch family (streaming dashboards maintain exactly this by
    max-merging each micro-batch's register delta; registers make
    the window state fixed-size instead of one-entry-per-user).
    Hour buckets via date_trunc on both engines (identical
    boundaries); the estimate hash-matches the oracle like every
    sketch query, with exact_ndv as the side-car."""
    from linz_bde_uploader_spark.operators.sketches import hll_distinct
    ev = (load_table(spark, sf_dir, "events")
          .filter("user_id IS NOT NULL AND ts IS NOT NULL")
          .select(F.date_format(
              F.date_trunc("hour", F.col("ts").cast("timestamp")),
              "yyyy-MM-dd HH:mm:ss").alias("hour"),
              F.col("user_id").cast("string").alias("key")))
    est = hll_distinct(ev, ["hour"], F.col("key"))
    exact = ev.groupBy("hour").agg(
        F.countDistinct("key").alias("exact_ndv"))
    return exact.join(est, "hour").select(
        "hour", "exact_ndv", "hll_est_micro")


def _sql_events_window_hll() -> str:
    from linz_bde_uploader_spark.functions.hashing import sql_hash60
    from linz_bde_uploader_spark.operators.sketches import (
        _P52, _P53, hll_est_micro_sql)
    return f"""
WITH ev AS (
  SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                  '%Y-%m-%d %H:%M:%S') AS hour,
         CAST(user_id AS VARCHAR) AS key
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
hashed AS (SELECT hour, {sql_hash60('key')} AS h FROM ev),
mx AS (
  SELECT hour, h // {_P52} AS idx,
         MAX(CASE WHEN h % {_P52} = 0 THEN 53
                  ELSE 53 - length(bin(h % {_P52})) END) AS m
  FROM hashed GROUP BY hour, h // {_P52}),
agg AS (
  SELECT hour,
         CAST(SUM(1::BIGINT << (53 - m)) AS BIGINT)
           + (256 - COUNT(*)) * {int(_P53)} AS s,
         256 - COUNT(*) AS v
  FROM mx GROUP BY hour),
ex AS (SELECT hour, COUNT(DISTINCT key) AS exact_ndv
       FROM ev GROUP BY hour)
SELECT hour, exact_ndv, {hll_est_micro_sql('s', 'v')} AS hll_est_micro
FROM agg JOIN ex USING (hour)
"""


ANALYTICS_QUERIES.update({
    "events_window_hll": (q_events_window_hll,
                          _sql_events_window_hll()),
})


def q_events_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-similarity: pairwise Jaccard of per-type user sets
    from the k-minimum-values sketches alone — J ~= |L ∩ A ∩ B| / |L|
    where L is the k smallest hashes of the UNION of the two
    sketches (combining two KMV sketches IS taking the k smallest of
    their union — the mergeability again). Everything here is
    INTEGER arithmetic end to end: hashes, ranks, counts, and the
    published micro-unit ratios (floor(x*1e6/y) via integer DIV) —
    the only sketch query with literally zero floating-point steps.
    exact_jaccard_micro rides along as the side-car."""
    from linz_bde_uploader_spark.operators.sketches import KMV_K
    from linz_bde_uploader_spark.functions.hashing import hash60
    from linz_bde_uploader_spark.operators.topk import grouped_topk
    ev = (load_table(spark, sf_dir, "events")
          .filter("user_id IS NOT NULL")
          .select("event_type", F.col("user_id").cast("string")
                  .alias("key")))
    dist = ev.select("event_type", hash60(F.col("key")).alias("h")) \
             .distinct()
    sk = grouped_topk(dist, ["event_type"], [F.col("h")], KMV_K,
                      salt_expr=F.col("h")).select("event_type", "h")
    types = sk.select("event_type").distinct()
    pairs = (types.select(F.col("event_type").alias("type_a"))
             .join(types.select(F.col("event_type").alias("type_b")),
                   F.col("type_a") < F.col("type_b")))
    tagged = (sk.join(F.broadcast(pairs),
                      (F.col("event_type") == F.col("type_a"))
                      | (F.col("event_type") == F.col("type_b")))
              .groupBy("type_a", "type_b", "h")
              .agg(F.max((F.col("event_type") == F.col("type_a"))
                         .cast("int")).alias("in_a"),
                   F.max((F.col("event_type") == F.col("type_b"))
                         .cast("int")).alias("in_b")))
    kmin = grouped_topk(tagged, ["type_a", "type_b"], [F.col("h")],
                        KMV_K, salt_expr=F.col("h"))
    est = (kmin.groupBy("type_a", "type_b")
           .agg(F.count("*").alias("l_size"),
                F.sum((F.col("in_a") * F.col("in_b"))).alias("inter")))
    ex_users = ev.distinct()
    ea = ex_users.withColumnRenamed("event_type", "type_a")
    eb = ex_users.withColumnRenamed("event_type", "type_b")
    exact = (ea.join(eb, "key")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count("*").alias("n_inter")))
    # sizes reuses the ex_users subtree (same canonical distinct ->
    # one exchange via ReuseExchange) instead of a third ev.distinct()
    sizes = ex_users.groupBy("event_type").agg(
        F.count("*").alias("n"))
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("n_b"))
    return (est.join(exact, ["type_a", "type_b"])
            .join(sa, "type_a").join(sb, "type_b")
            .select(
                "type_a", "type_b",
                F.expr("(n_inter * 1000000) DIV "
                       "(n_a + n_b - n_inter)")
                .alias("exact_jaccard_micro"),
                F.expr("(inter * 1000000) DIV l_size")
                .alias("kmv_jaccard_micro")))


def _sql_events_kmv_jaccard() -> str:
    from linz_bde_uploader_spark.functions.hashing import sql_hash60
    from linz_bde_uploader_spark.operators.sketches import KMV_K
    return f"""
WITH ev AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS key
  FROM events WHERE user_id IS NOT NULL),
dist AS (
  SELECT DISTINCT event_type, {sql_hash60('key')} AS h FROM ev),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM dist) WHERE rn <= {KMV_K}),
types AS (SELECT DISTINCT event_type FROM sk),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type),
tagged AS (
  SELECT type_a, type_b, h,
         MAX(CASE WHEN sk.event_type = pairs.type_a THEN 1 ELSE 0 END)
           AS in_a,
         MAX(CASE WHEN sk.event_type = pairs.type_b THEN 1 ELSE 0 END)
           AS in_b
  FROM sk JOIN pairs
    ON sk.event_type = pairs.type_a OR sk.event_type = pairs.type_b
  GROUP BY type_a, type_b, h),
kmin AS (
  SELECT type_a, type_b, in_a, in_b FROM (
    SELECT type_a, type_b, in_a, in_b,
           row_number() OVER (PARTITION BY type_a, type_b
                              ORDER BY h) AS rn
    FROM tagged) WHERE rn <= {KMV_K}),
est AS (
  SELECT type_a, type_b, COUNT(*) AS l_size,
         CAST(SUM(in_a * in_b) AS BIGINT) AS inter
  FROM kmin GROUP BY type_a, type_b),
du AS (SELECT DISTINCT event_type, key FROM ev),
exact AS (
  SELECT a.type_a, b.type_b, COUNT(*) AS n_inter
  FROM (SELECT event_type AS type_a, key FROM du) a
  JOIN (SELECT event_type AS type_b, key FROM du) b USING (key)
  WHERE a.type_a < b.type_b GROUP BY a.type_a, b.type_b),
sizes AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type)
SELECT type_a, type_b,
       (n_inter * 1000000) // (sa.n + sb.n - n_inter)
         AS exact_jaccard_micro,
       (inter * 1000000) // l_size AS kmv_jaccard_micro
FROM est
JOIN exact USING (type_a, type_b)
JOIN sizes sa ON sa.event_type = est.type_a
JOIN sizes sb ON sb.event_type = est.type_b
"""


ANALYTICS_QUERIES.update({
    "events_kmv_jaccard": (q_events_kmv_jaccard,
                           _sql_events_kmv_jaccard()),
})


def q_events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-CUBE pattern: build HLL registers ONCE at the fine
    (event_type, day) grain, then derive BOTH the fine estimates and
    the per-type rollup from that same register table — the coarse
    registers are just the per-register MAX across days (register
    max-rollup is algebraically exact: max over a union is the max
    of maxes; pinned by test_hll_rollup_equals_direct). At 100 TB
    this is how a sketch warehouse works: one pass over the events
    materializes the finest grain, and every coarser granularity
    aggregates 256-int register rows, never the corpus. Output is
    long-form: grain='day' rows and grain='type' rollup rows."""
    from linz_bde_uploader_spark.operators.sketches import (
        hll_estimate, hll_registers)
    ev = (load_table(spark, sf_dir, "events")
          .filter("user_id IS NOT NULL AND ts IS NOT NULL")
          .select("event_type",
                  F.date_format(F.col("ts").cast("timestamp"),
                                "yyyy-MM-dd").alias("day"),
                  F.col("user_id").cast("string").alias("key")))
    fine = hll_registers(ev, ["event_type", "day"], F.col("key"))
    fine_est = (hll_estimate(fine, ["event_type", "day"])
                .select("event_type", "day",
                        F.lit("day").alias("grain"), "hll_est_micro"))
    coarse = (fine.groupBy("event_type", "idx")
              .agg(F.max("m").alias("m")))
    coarse_est = (hll_estimate(coarse, ["event_type"])
                  .select("event_type",
                          F.lit("ALL").alias("day"),
                          F.lit("type").alias("grain"),
                          "hll_est_micro"))
    return fine_est.unionByName(coarse_est)


def _sql_events_hll_rollup() -> str:
    from linz_bde_uploader_spark.functions.hashing import sql_hash60
    from linz_bde_uploader_spark.operators.sketches import (
        _P52, _P53, hll_est_micro_sql)
    est = hll_est_micro_sql("s", "v")
    return f"""
WITH ev AS (
  SELECT event_type,
         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         CAST(user_id AS VARCHAR) AS key
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
hashed AS (
  SELECT event_type, day, {sql_hash60('key')} AS h FROM ev),
fine AS (
  SELECT event_type, day, h // {_P52} AS idx,
         MAX(CASE WHEN h % {_P52} = 0 THEN 53
                  ELSE 53 - length(bin(h % {_P52})) END) AS m
  FROM hashed GROUP BY event_type, day, h // {_P52}),
fine_agg AS (
  SELECT event_type, day,
         CAST(SUM(1::BIGINT << (53 - m)) AS BIGINT)
           + (256 - COUNT(*)) * {int(_P53)} AS s,
         256 - COUNT(*) AS v
  FROM fine GROUP BY event_type, day),
coarse AS (
  SELECT event_type, idx, MAX(m) AS m
  FROM fine GROUP BY event_type, idx),
coarse_agg AS (
  SELECT event_type,
         CAST(SUM(1::BIGINT << (53 - m)) AS BIGINT)
           + (256 - COUNT(*)) * {int(_P53)} AS s,
         256 - COUNT(*) AS v
  FROM coarse GROUP BY event_type)
SELECT event_type, day, 'day' AS grain, {est} AS hll_est_micro
FROM fine_agg
UNION ALL
SELECT event_type, 'ALL' AS day, 'type' AS grain,
       {est} AS hll_est_micro
FROM coarse_agg
"""


ANALYTICS_QUERIES.update({
    "events_hll_rollup": (q_events_hll_rollup,
                          _sql_events_hll_rollup()),
})
