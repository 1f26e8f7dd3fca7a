"""TPC-H completion gate: the 12 shapes rounds 5-6 left ungated —
Q2, Q6, Q8, Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q20, Q21 — closing the
full 22-query TPC-H operator surface (Q1/3/4/5/7/10/14/18/19/22 live
in queries/core.py).

The headline additions are the CORRELATED-SUBQUERY family the round-6
verdict called out as the main unexercised optimizer surface:

- Q17: correlated scalar AVG threshold  → decorrelated into a
  per-key aggregate joined back (no per-row subquery execution);
- Q20: nested semi chain with a correlated aggregate in HAVING;
- Q21: EXISTS + NOT EXISTS double correlation → one semi and one
  anti join on the same key;
- Q2:  correlated scalar MIN with the subquery repeating the outer
  dimension chain;
- Q11/Q15/Q16: uncorrelated scalar/IN subqueries (global-fraction
  HAVING, MAX-equality, NOT IN with a null-free guarantee).

These run through ``spark.sql`` ON PURPOSE — the correlated forms are
not expressible in the DataFrame API, and the point of the gate is
that Catalyst's decorrelation rewrites (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery) produce joins, not per-row re-execution;
tests/test_plans.py asserts the decorrelated plan shapes.

Schema adaptation (driver tables carry no partsupp / commitdate /
receiptdate / shipmode / comment columns): ``SELECT DISTINCT
l_partkey, l_suppkey FROM lineitem`` stands in for partsupp, supplier
account balance for supply cost (Q2) and for the complaints filter
(Q16), ship-lag beyond the order date for late delivery (Q12, Q21),
and the in-year vs all-time quantity share for excess stock (Q20) —
each preserving the query's defining OPERATOR shape per the TPC-H
spec, as the round-6 Q4/Q22 adaptations did.

Cross-engine hash parity: every money aggregate runs in scaled
DECIMAL (order-independent, exact on both engines — the
_exact_revenue contract from queries/core.py) and ships as double
only after the aggregate; threshold comparisons (Q11, Q15, Q17, Q20)
happen in decimal or on exact integer-valued sums so a borderline row
can never flip between engines; ranked cuts (Q21) quantize nothing
but break ties on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_for_oracle_parity
from ..sources.parquet import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# Decimal-exact money arithmetic (see queries/core.py:_exact_revenue):
# the 2-decimal factors cast exactly, products and sums stay in scaled
# decimal on both engines, the final cast to double is lossless at
# gate magnitudes.
_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)
_SUM_REV = f"CAST(sum({_REV}) AS DOUBLE)"


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    configure_for_oracle_parity(spark)
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"_tpch_{n}")


def _sql(spark: SparkSession, sql: str) -> DataFrame:
    return spark.sql(sql.replace("%T%", "_tpch_"))


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated scalar AVG
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#3"

_Q17_SQL = f"""
SELECT CAST(sum({_REV}) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM %T%lineitem l1 JOIN %T%part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM %T%lineitem l2
                    WHERE l2.l_partkey = l1.l_partkey)
"""


def q_tpch_q17_small_qty_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — the
    canonical correlated scalar-AVG threshold. Catalyst decorrelates
    the subquery into ONE per-partkey aggregate joined back to the
    fact (plan-asserted: two lineitem scans, no per-row subquery);
    at 100 TB that is one keyed exchange over the filtered fact
    instead of |rows| subquery executions. The threshold is
    deterministic cross-engine: l_quantity is integer-valued so the
    per-part sum is EXACT in double, and avg/0.2· are single
    operations — no order-dependent float accumulation near the
    comparison."""
    _views(spark, sf_dir, "lineitem", "part")
    return _sql(spark, _Q17_SQL)


ORACLES["tpch_q17_small_qty_revenue"] = _Q17_SQL.replace("%T%", "")
QUERIES["tpch_q17_small_qty_revenue"] = q_tpch_q17_small_qty_revenue


# ---------------------------------------------------------------------------
# Q20: excess-supply suppliers — nested semi chain, correlated agg
# in HAVING
# ---------------------------------------------------------------------------

Q20_COLOR = "red"
Q20_REGION = "ASIA"
Q20_YEAR_START = "1997-01-01"
Q20_YEAR_END = "1998-01-01"
Q20_SHARE = 0.3

_Q20_SQL = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM %T%supplier
JOIN %T%nation ON s_nationkey = n_nationkey
JOIN %T%region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM %T%lineitem l1
    WHERE l_partkey IN (SELECT p_partkey FROM %T%part
                        WHERE p_name LIKE '{Q20_COLOR}%')
      AND l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
      AND l_shipdate <  TIMESTAMP '{Q20_YEAR_END}'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > {Q20_SHARE} * (
      SELECT sum(l2.l_quantity) FROM %T%lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
        AND l2.l_suppkey = l1.l_suppkey)
  )
"""


def q_tpch_q20_excess_supply(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess supply of a
    part-name family — the nested semi-join chain (part-name IN →
    grouped fact → supplier IN) with a CORRELATED aggregate in the
    HAVING clause. Without partsupp, "excess" is adapted to "this
    (supplier, part) pair shipped >30% of its all-time quantity
    inside one year" — the correlated inner aggregate on the SAME
    pair the outer group is keyed on, exactly Q20's availqty
    comparison shape. Catalyst rewrites both IN's to semi joins and
    the correlated HAVING into a per-pair aggregate joined back;
    nothing executes per-row. Quantity sums are integer-exact, and
    the 30% threshold is one multiply — no float drift at the
    comparison."""
    _views(spark, sf_dir, "lineitem", "part", "supplier",
           "nation", "region")
    return _sql(spark, _Q20_SQL)


ORACLES["tpch_q20_excess_supply"] = _Q20_SQL.replace("%T%", "")
QUERIES["tpch_q20_excess_supply"] = q_tpch_q20_excess_supply


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 500
Q21_REGION = "EUROPE"
Q21_TOPK = 20

_Q21_SQL = f"""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM %T%lineitem JOIN %T%orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN %T%supplier ON s_suppkey = l1.l_suppkey
JOIN %T%nation ON s_nationkey = n_nationkey
JOIN %T%region ON n_regionkey = r_regionkey
WHERE r_name = '{Q21_REGION}'
  AND EXISTS (SELECT 1 FROM %T%lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOPK}
"""


def q_tpch_q21_waiting_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on
    a finished multi-supplier order — the double-correlated
    EXISTS / NOT EXISTS benchmark. Without receipt/commit dates,
    "late" is adapted to shipping >500 days after the order date,
    precomputed ONCE as the `late` set so both correlations stay
    self-contained on l_orderkey (the rewrite target: one LEFT SEMI
    and one LEFT ANTI join on the same key — no per-row subquery;
    plan-asserted). ~4 suppliers/order in the testdata makes both
    branches selective. The top-20 cut orders by (numwait DESC,
    s_name) — count ties broken on the unique name, so the LIMIT
    can never cut an engine-arbitrary row."""
    _views(spark, sf_dir, "lineitem", "orders", "supplier",
           "nation", "region")
    return _sql(spark, _Q21_SQL)


ORACLES["tpch_q21_waiting_supplier"] = _Q21_SQL.replace("%T%", "")
QUERIES["tpch_q21_waiting_supplier"] = q_tpch_q21_waiting_supplier


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier — correlated scalar MIN repeating the
# outer dimension chain
# ---------------------------------------------------------------------------

Q2_REGION = "ASIA"
Q2_SIZE = 15

_Q2_SQL = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM %T%lineitem)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name
FROM %T%part
JOIN ps ON p_partkey = ps.l_partkey
JOIN %T%supplier ON s_suppkey = ps.l_suppkey
JOIN %T%nation ON s_nationkey = n_nationkey
JOIN %T%region ON n_regionkey = r_regionkey
WHERE r_name = '{Q2_REGION}'
  AND p_size = {Q2_SIZE}
  AND s_acctbal = (SELECT min(s2.s_acctbal)
                   FROM %T%supplier s2
                   JOIN ps ps2 ON s2.s_suppkey = ps2.l_suppkey
                   JOIN %T%nation n2 ON s2.s_nationkey = n2.n_nationkey
                   JOIN %T%region r2 ON n2.n_regionkey = r2.r_regionkey
                   WHERE ps2.l_partkey = p_partkey
                     AND r2.r_name = '{Q2_REGION}')
"""


def q_tpch_q2_min_acctbal_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the in-region supplier
    at the extremum — the correlated scalar subquery that REPEATS
    the outer dimension chain inside itself. Adapted to the reduced
    schema: lineitem's distinct (partkey, suppkey) pairs stand in
    for partsupp and MIN account balance for MIN supply cost.
    Catalyst decorrelates to one per-part aggregate over the
    ps⋈supplier⋈nation⋈region chain joined back on (partkey,
    acctbal); ties at the minimum keep ALL matching suppliers (the
    spec's semantics) so equality on the untouched double is
    engine-safe — no arithmetic touches s_acctbal on either side."""
    _views(spark, sf_dir, "lineitem", "part", "supplier",
           "nation", "region")
    return _sql(spark, _Q2_SQL)


ORACLES["tpch_q2_min_acctbal_supplier"] = _Q2_SQL.replace("%T%", "")
QUERIES["tpch_q2_min_acctbal_supplier"] = q_tpch_q2_min_acctbal_supplier


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change — pure scan-side predicate stack
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       count(*) AS n_lines
FROM %T%lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q6_forecast_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q6: the pure predicate-pushdown benchmark — four
    range predicates, zero joins, one global aggregate. All four
    predicates reach the parquet scan as PushedFilters (row-group
    pruning does the work at 100 TB; the aggregate is a map-side
    fold to one row per partition). Revenue = Σ price·discount in
    exact decimal."""
    _views(spark, sf_dir, "lineitem")
    return _sql(spark, _Q6_SQL)


ORACLES["tpch_q6_forecast_revenue"] = _Q6_SQL.replace("%T%", "")
QUERIES["tpch_q6_forecast_revenue"] = q_tpch_q6_forecast_revenue


# ---------------------------------------------------------------------------
# Q8: national market share — two nation roles, conditional ratio
# ---------------------------------------------------------------------------

Q8_REGION = "AMERICA"
Q8_NATION = "NATION_7"
Q8_TYPE = "STANDARD"

_Q8_SQL = f"""
WITH base AS (
  SELECT year(o_orderdate) AS o_year,
         {_REV} AS volume,
         n2.n_name AS supp_nation
  FROM %T%lineitem
  JOIN %T%part ON p_partkey = l_partkey
  JOIN %T%orders ON o_orderkey = l_orderkey
  JOIN %T%customer ON c_custkey = o_custkey
  JOIN %T%nation n1 ON c_nationkey = n1.n_nationkey
  JOIN %T%region ON n1.n_regionkey = r_regionkey
  JOIN %T%supplier ON s_suppkey = l_suppkey
  JOIN %T%nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{Q8_REGION}'
    AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}'
                     THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END)
            AS DOUBLE)
       / CAST(sum(volume) AS DOUBLE) AS mkt_share,
       CAST(sum(volume) AS DOUBLE) AS total_volume
FROM base GROUP BY o_year
"""


def q_tpch_q8_market_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q8: one nation's market share by year — the 8-table
    join where NATION plays two roles (customer's region filter,
    supplier's identity) so the same broadcast dimension enters the
    plan twice under different aliases. Numerator and denominator
    come out of ONE pass as conditional decimal sums; the single
    double division per year happens after aggregation, so no
    order-dependent float work precedes the ratio."""
    _views(spark, sf_dir, "lineitem", "part", "orders", "customer",
           "supplier", "nation", "region")
    return _sql(spark, _Q8_SQL)


ORACLES["tpch_q8_market_share"] = _Q8_SQL.replace("%T%", "")
QUERIES["tpch_q8_market_share"] = q_tpch_q8_market_share


# ---------------------------------------------------------------------------
# Q9: product-type profit — expression pushdown through a 6-table join
# ---------------------------------------------------------------------------

Q9_NAME_FRAG = "gear"

_Q9_SQL = f"""
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       CAST(sum({_REV}
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_profit
FROM %T%lineitem
JOIN %T%part ON p_partkey = l_partkey
JOIN %T%supplier ON s_suppkey = l_suppkey
JOIN %T%orders ON o_orderkey = l_orderkey
JOIN %T%nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NAME_FRAG}%'
GROUP BY n_name, year(o_orderdate)
"""


def q_tpch_q9_product_profit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q9 shape: profit on a part-name family by (supplier
    nation, order year). Without ps_supplycost, cost is adapted to
    retail price × quantity — same expression shape: a two-sided
    arithmetic combining columns of THREE tables, evaluated on the
    joined row in exact decimal. The contains-LIKE on p_name prunes
    part before it broadcasts into the fact spine; the group-by keys
    arrive via broadcast joins so the only big exchange is the final
    (nation, year) aggregation."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "orders",
           "nation")
    return _sql(spark, _Q9_SQL)


ORACLES["tpch_q9_product_profit"] = _Q9_SQL.replace("%T%", "")
QUERIES["tpch_q9_product_profit"] = q_tpch_q9_product_profit


# ---------------------------------------------------------------------------
# Q11: important stock — group sums vs a global-fraction scalar
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_3"
Q11_MULT = 2  # keep parts worth > 2x the average per-part share

_Q11_SQL = f"""
WITH natval AS (
  SELECT l_partkey AS ps_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2))) AS part_value
  FROM %T%lineitem
  JOIN %T%supplier ON l_suppkey = s_suppkey
  JOIN %T%nation ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY l_partkey
),
stats AS (SELECT sum(part_value) AS total_value, count(*) AS n_parts
          FROM natval)
SELECT ps_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM natval CROSS JOIN stats
WHERE part_value * n_parts > {Q11_MULT} * total_value
"""


def q_tpch_q11_important_stock(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q11 shape: parts whose one-nation inventory value
    exceeds a threshold fraction of the nation's total — per-group
    sums compared against an uncorrelated scalar aggregate over the
    same derived table. The spec's fixed 0.0001 fraction is
    SF-DEPENDENT by design (it scales with part count); here the
    threshold is the scale-free "2× the average per-part share",
    rearranged Q22-style as ``part_value · n_parts > 2 · total`` so
    the comparison never leaves exact DECIMAL/BIGINT arithmetic — a
    part sitting on the threshold cannot flip between engines, at
    any SF. The 1-row stats aggregate broadcasts into the filter
    (J2 shape)."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return _sql(spark, _Q11_SQL)


ORACLES["tpch_q11_important_stock"] = _Q11_SQL.replace("%T%", "")
QUERIES["tpch_q11_important_stock"] = q_tpch_q11_important_stock


# ---------------------------------------------------------------------------
# Q12: shipping classes vs order priority — conditional counts
# ---------------------------------------------------------------------------

Q12_LATE_DAYS = 365

_Q12_SQL = f"""
SELECT l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM %T%lineitem JOIN %T%orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY l_returnflag
"""


def q_tpch_q12_priority_shipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape: late lines bucketed by shipping class with
    priority split into conditional counts (the CASE-inside-SUM
    pivot). Adapted: return flag stands in for ship mode and
    ship-lag > 1 year for the commit/receipt lateness chain — the
    cross-table lateness predicate must evaluate on the JOINED row
    (it references both sides), while the date window pushes into
    the orders scan. Integer conditional sums are exact by
    construction."""
    _views(spark, sf_dir, "lineitem", "orders")
    return _sql(spark, _Q12_SQL)


ORACLES["tpch_q12_priority_shipping"] = _Q12_SQL.replace("%T%", "")
QUERIES["tpch_q12_priority_shipping"] = q_tpch_q12_priority_shipping


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — outer join + histogram
# ---------------------------------------------------------------------------

Q13_EXCLUDED_PRIORITY = "5-LOW"

_Q13_SQL = f"""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM %T%customer
  LEFT JOIN %T%orders
    ON c_custkey = o_custkey
   AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
"""


def q_tpch_q13_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13: the distribution of per-customer order counts —
    LEFT OUTER join with the filter ON THE JOIN CONDITION (so
    customers with only excluded orders still appear with count 0;
    pushing it to WHERE would silently drop them — the classic
    outer-join filter-placement trap), then a second aggregation
    over the first's output (histogram of counts). Both exchanges
    are on small keys; counts are exact integers."""
    _views(spark, sf_dir, "customer", "orders")
    return _sql(spark, _Q13_SQL)


ORACLES["tpch_q13_order_distribution"] = _Q13_SQL.replace("%T%", "")
QUERIES["tpch_q13_order_distribution"] = q_tpch_q13_order_distribution


# ---------------------------------------------------------------------------
# Q15: top supplier — derived revenue view + MAX-equality scalar
# ---------------------------------------------------------------------------

Q15_START = "1997-01-01"
Q15_END = "1997-04-01"

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum({_REV}) AS total_rev
  FROM %T%lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
    AND l_shipdate <  TIMESTAMP '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(total_rev AS DOUBLE) AS total_revenue
FROM %T%supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


def q_tpch_q15_top_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q15: the supplier(s) at the quarter's revenue maximum —
    a derived revenue view consumed twice (once for the rows, once
    for the MAX scalar), the view-reuse benchmark. The equality
    against the max happens on the DECIMAL aggregate, not on a
    post-cast double — decimal sums are order-independent and the
    comparison is exact on both engines, so the spec's
    "all suppliers tied at the max" semantics hold bit-for-bit;
    only the reported revenue ships as double."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return _sql(spark, _Q15_SQL)


ORACLES["tpch_q15_top_supplier"] = _Q15_SQL.replace("%T%", "")
QUERIES["tpch_q15_top_supplier"] = q_tpch_q15_top_supplier


# ---------------------------------------------------------------------------
# Q16: supplier counts by part attributes — NOT IN + count distinct
# ---------------------------------------------------------------------------

Q16_EXCLUDED_BRAND = "Brand#5"
Q16_EXCLUDED_TYPE = "PROMO"
Q16_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)

_Q16_SQL = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM %T%lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN %T%part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
  AND p_type <> '{Q16_EXCLUDED_TYPE}'
  AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM %T%supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q16_supplier_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each (brand,
    type, size) bucket, excluding a blacklist via NOT IN — the
    null-aware anti-join surface (s_suppkey is non-null by
    construction, so the rewrite is a plain anti join; with nulls it
    would need the null-aware variant — the reason Q16 is the NOT IN
    benchmark). Negative account balance stands in for the
    complaints filter. Lineitem's distinct pairs stand in for
    partsupp; the exact COUNT(DISTINCT) dedups (pair, attrs) in one
    keyed exchange."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return _sql(spark, _Q16_SQL)


ORACLES["tpch_q16_supplier_counts"] = _Q16_SQL.replace("%T%", "")
QUERIES["tpch_q16_supplier_counts"] = q_tpch_q16_supplier_counts


# ---------------------------------------------------------------------------
# Q1 alias: the engine's flagship pricing summary IS TPC-H Q1 (it
# predates this module — queries/core.py:q_pricing_summary, gated
# since round 1). Registered under the tpch_ name too so the
# 22-shape completion is legible in the registry by name alone;
# same function, same oracle, no second implementation.
# ---------------------------------------------------------------------------

from .core import ORACLE_PRICING_SUMMARY as _Q1_ORACLE
from .core import q_pricing_summary as _q1

QUERIES["tpch_q1_pricing_summary"] = _q1
ORACLES["tpch_q1_pricing_summary"] = _Q1_ORACLE
