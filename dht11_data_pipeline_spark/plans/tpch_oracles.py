"""DuckDB oracle SQL for plans/tpch_queries.py — written in the
*subquery* form (EXISTS / NOT EXISTS / IN / correlated scalar) so the
differential test proves the decorrelated DataFrame plans compute the
textbook semantics, not just themselves.

Same exactness rules as plans/oracles.py: DECIMAL(18,2) money,
cross-multiplied threshold comparisons, double only at the end.
"""

from __future__ import annotations

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))"

TPCH_ORACLES: dict[str, str] = {
    "q4_priority_with_late_ship": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
    "q13_customer_order_distribution": """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    "q14_promo_revenue_share": f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
""",
    "q19_disjunctive_revenue": f"""
SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
""",
    "q17_small_quantity_revenue": """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#7' AND p.p_type = 'MEDIUM'
  AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
      (SELECT count(*) FROM lineitem l2
       WHERE l2.l_partkey = l.l_partkey
         AND EXISTS (SELECT 1 FROM part p2 WHERE p2.p_partkey = l2.l_partkey
                     AND p2.p_brand = 'Brand#7' AND p2.p_type = 'MEDIUM'))
    < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2))) FROM lineitem l3
       WHERE l3.l_partkey = l.l_partkey)
""",
    "q11_important_part_values": """
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey = 3
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM per_part
WHERE part_value * 1000 > (SELECT SUM(part_value) FROM per_part)
""",
    "q15_top_revenue_supplier": f"""
WITH revenue AS (
  SELECT l_suppkey, SUM({_REV}) AS total_revenue
  FROM lineitem l
  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    "q7_bination_volume": f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l.l_shipdate) AS l_year,
         {_REV} AS volume
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
""",
    "q21_sole_late_supplier": """
SELECT s.s_name, count(*) AS numwait
FROM (SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1
      JOIN orders o ON l1.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
     ) late
JOIN supplier s ON late.l_suppkey = s.s_suppkey
GROUP BY s.s_name
""",
    "q22_idle_wealthy_customers": """
SELECT substring(c_name, 17, 2) AS cntrycode,
       count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
      (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0)
    > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3 WHERE c3.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY cntrycode
""",
    "q2_min_cost_supplier": """
SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
       n.n_name AS supp_nation,
       CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE p.p_type = 'STANDARD' AND p.p_size <= 5 AND r.r_name = 'EUROPE'
  AND CAST(l.l_extendedprice AS DECIMAL(18,2)) =
      (SELECT MIN(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
       FROM lineitem l2
       JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
       JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
       JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
       WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
""",
    "q20_heavy_promo_suppliers": """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 400
)
""",
    "q9_profit_by_nation_year": """
SELECT nation, l_year,
       CAST(rev AS DOUBLE) - 0.1 * CAST(retail AS DOUBLE) AS profit
FROM (
  SELECT n.n_name AS nation, EXTRACT(year FROM l.l_shipdate) AS l_year,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev,
         SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS retail
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%widget%'
  GROUP BY nation, l_year
)
""",
    "q8_market_share": f"""
SELECT o_year,
       CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV}
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_vol,
         SUM({_REV}) AS total_vol
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  JOIN region r   ON n2.n_regionkey = r.r_regionkey
  WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA'
  GROUP BY o_year
)
""",
    "q6_forecast_revenue": """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    "q10_returned_item_customers": f"""
SELECT c.c_custkey, c.c_name,
       CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
       n.n_name AS nation,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    "q12_late_ship_priority_mix": """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
GROUP BY l_returnflag
""",
    "q16_supplier_part_counts": """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
}
