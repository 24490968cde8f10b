"""Tier-C pass-through queries, driven through ``Engine.execute``.

These prove the reference's flagship path (SURVEY §3.1): arbitrary SQL
text — including T-SQL spellings — goes through the dialect shim into
``spark.sql``. The oracle twin is plain ANSI SQL, so a hash match also
proves the shim rewrites (brackets, TOP, ISNULL, LEN, CHARINDEX)
preserve semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparketl.engine import Engine
from sparketl.io import load_tables


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return Engine(spark).execute(sql)


def q_tierc_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain Spark SQL through the engine (tool:273 equivalent)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_mktsegment,
               YEAR(o_orderdate) AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY c_mktsegment, YEAR(o_orderdate)
        ORDER BY c_mktsegment, order_year
        """,
    )


def q_tierc_tsql_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL spellings: TOP + bracket identifiers (tool:149, 246-248)."""
    return _run(
        spark,
        sf_dir,
        "SELECT TOP 25 [o_orderkey], [o_totalprice] FROM orders "
        "ORDER BY [o_totalprice] DESC, [o_orderkey]",
    )


def q_tierc_tsql_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL scalar functions via the shim: ISNULL/LEN/CHARINDEX."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT TOP 200 [o_orderkey],
               ISNULL(NULLIF([o_orderstatus], 'F'), 'CLOSED') AS status_or_closed,
               LEN([o_orderpriority]) AS pri_len,
               CHARINDEX('-', [o_orderpriority]) AS dash_pos
        FROM orders ORDER BY [o_orderkey]
        """,
    )


def q_tierc_tsql_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL ``+`` string concatenation and ``DISTINCT TOP (n)`` via the
    shim — the pass-through surface's most common T-SQL-isms after
    brackets (tool:273; SURVEY §4.3 item 1)."""
    return _run(
        spark,
        sf_dir,
        "SELECT DISTINCT TOP (50) "
        "[o_orderpriority] + ' / ' + [o_orderstatus] AS pri_status "
        "FROM orders ORDER BY pri_status",
    )


def q_tierc_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst rewrites both to
    semi/anti joins (RewritePredicateSubquery), so this is two hash
    joins, not a per-row probe."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              )
        ORDER BY c_custkey
        """,
    )


def q_tierc_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — decorrelated into an aggregate +
    left outer join (RewriteCorrelatedScalarSubquery)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_totalprice,
               (SELECT COUNT(*) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_items,
               (SELECT CAST(MAX(l_extendedprice) AS DOUBLE) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
        FROM orders o
        ORDER BY o_orderkey
        """,
    )


def q_tierc_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top unshipped-revenue orders for one segment.
    Broadcast customer filter → lineitem⋈orders shuffle on orderkey →
    TakeOrderedAndProject top-10."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
        GROUP BY l_orderkey, YEAR(o_orderdate), o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """,
    )


def q_tierc_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where supplier and customer
    share the nation — two broadcast dims + one fact shuffle."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE s_nationkey = c_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """,
    )


ENGINE_QUERIES = {
    "tierc_shipping_priority": q_tierc_shipping_priority,
    "tierc_local_supplier_volume": q_tierc_local_supplier_volume,
    "tierc_sql_passthrough": q_tierc_sql_passthrough,
    "tierc_tsql_top": q_tierc_tsql_top,
    "tierc_tsql_funcs": q_tierc_tsql_funcs,
    "tierc_tsql_concat": q_tierc_tsql_concat,
    "tierc_exists_subquery": q_tierc_exists_subquery,
    "tierc_scalar_subquery": q_tierc_scalar_subquery,
}


def q_tierc_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral shipping volume between two nations by
    year. The nation dim joins twice (supplier side + customer side) —
    both broadcast; the only shuffle is the lineitem⋈orders equi-join,
    and the IN filters reach the dim scans before broadcast."""
    return _run(spark, sf_dir, """
        SELECT ns.n_name AS supp_nation,
               nc.n_name AS cust_nation,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS volume
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ns ON s_nationkey = ns.n_nationkey
          JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE ns.n_name IN ('NATION_0', 'NATION_1')
          AND nc.n_name IN ('NATION_0', 'NATION_1')
          AND ns.n_name <> nc.n_name
        GROUP BY ns.n_name, nc.n_name, YEAR(o_orderdate)
        ORDER BY supp_nation, cust_nation, order_year
""")


def q_tierc_line_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: conditional counts per order priority (adapted
    to the fixture's columns). Single fact shuffle + map-side CASE
    aggregation; the date filter pushes to the parquet scan."""
    return _run(spark, sf_dir, """
        SELECT o_orderpriority,
               COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returned,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_finished
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= DATE '1995-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
""")


def q_tierc_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share by ship year. Broadcast the
    part dim onto the fact scan; exact decimal sums, one final
    IEEE-exact double division per group."""
    return _run(spark, sf_dir, """
        SELECT CAST(YEAR(l_shipdate) AS INT) AS ship_year,
               CAST(100.0 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(12,2))
                             * (1 - CAST(l_discount AS DECIMAL(3,2)))
                        ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY YEAR(l_shipdate)
        ORDER BY ship_year
""")



def q_tierc_tsql_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL date functions through the shim: DATEDIFF (boundary-count
    semantics), DATEADD, CONVERT(VARCHAR(n), ...) truncation."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT TOP 100 [o_orderkey],
               DATEDIFF(day, [o_orderdate], DATE '1998-08-01') AS days_old,
               DATEDIFF(month, [o_orderdate], DATE '1998-08-01') AS months_old,
               DATEADD(month, 3, [o_orderdate]) AS follow_up,
               CONVERT(VARCHAR(5), [o_orderpriority]) AS pri5
        FROM orders ORDER BY [o_orderkey]
        """,
    )


ENGINE_QUERIES.update({
    "tierc_nation_volume": q_tierc_nation_volume,
    "tierc_line_status": q_tierc_line_status,
    "tierc_promo_revenue": q_tierc_promo_revenue,
    "tierc_tsql_dates": q_tierc_tsql_dates,
})


ENGINE_ORACLES = {
    "tierc_tsql_dates": """
        SELECT o_orderkey,
               CAST(DATEDIFF('day', o_orderdate, DATE '1998-08-01') AS INT)
                 AS days_old,
               CAST(DATEDIFF('month', o_orderdate, DATE '1998-08-01') AS INT)
                 AS months_old,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS follow_up,
               substr(CAST(o_orderpriority AS VARCHAR), 1, 5) AS pri5
        FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    "tierc_nation_volume": """
        SELECT ns.n_name AS supp_nation,
               nc.n_name AS cust_nation,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS volume
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ns ON s_nationkey = ns.n_nationkey
          JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE ns.n_name IN ('NATION_0', 'NATION_1')
          AND nc.n_name IN ('NATION_0', 'NATION_1')
          AND ns.n_name <> nc.n_name
        GROUP BY ns.n_name, nc.n_name, YEAR(o_orderdate)
        ORDER BY supp_nation, cust_nation, order_year
""",
    "tierc_line_status": """
        SELECT o_orderpriority,
               COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returned,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_finished
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= DATE '1995-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
""",
    "tierc_promo_revenue": """
        SELECT CAST(YEAR(l_shipdate) AS INT) AS ship_year,
               CAST(100.0 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(12,2))
                             * (1 - CAST(l_discount AS DECIMAL(3,2)))
                        ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY YEAR(l_shipdate)
        ORDER BY ship_year
""",
    "tierc_shipping_priority": """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
        GROUP BY l_orderkey, YEAR(o_orderdate), o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "tierc_local_supplier_volume": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE s_nationkey = c_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    "tierc_exists_subquery": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              )
        ORDER BY c_custkey
    """,
    "tierc_scalar_subquery": """
        SELECT o_orderkey, o_totalprice,
               (SELECT COUNT(*) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS n_items,
               (SELECT CAST(MAX(l_extendedprice) AS DOUBLE) FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey) AS max_item_price
        FROM orders o
        ORDER BY o_orderkey
    """,
    "tierc_sql_passthrough": """
        SELECT c_mktsegment,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY c_mktsegment, YEAR(o_orderdate)
        ORDER BY c_mktsegment, order_year
    """,
    "tierc_tsql_top": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "tierc_tsql_concat": """
        SELECT DISTINCT o_orderpriority || ' / ' || o_orderstatus AS pri_status
        FROM orders ORDER BY pri_status LIMIT 50
    """,
    "tierc_tsql_funcs": """
        SELECT o_orderkey,
               COALESCE(NULLIF(o_orderstatus, 'F'), 'CLOSED') AS status_or_closed,
               CAST(LENGTH(o_orderpriority) AS INT) AS pri_len,
               CAST(POSITION('-' IN o_orderpriority) AS INT) AS dash_pos
        FROM orders ORDER BY o_orderkey LIMIT 200
    """,
}


# ---------------------------------------------------------------------------
# Third pass-through batch: the remaining classic TPC-H query shapes a
# reference user would ship verbatim (tool:273) — semi-join priority
# counts (Q4), supplier-count rollups with NOT IN (Q16), correlated
# aggregate thresholds (Q17), IN-subquery-with-HAVING volume customers
# (Q18), disjunctive multi-block predicates (Q19), and scalar-subquery
# + anti-join account screening (Q22). All adapted to the fixture's
# columns (no partsupp table — lineitem is the part↔supplier bridge;
# no country code — c_custkey % 10 buckets).
# ---------------------------------------------------------------------------


def q_tierc_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: order counts per priority where at least one
    line is a big-quantity item — a correlated EXISTS Catalyst turns
    into one left-semi shuffle join; the date filter pushes to the
    orders scan before the join."""
    return _run(spark, sf_dir, """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1996-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
""")


def q_tierc_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct-supplier counts per part attribute
    combo, excluding complaint suppliers via NOT IN (anti-join on a
    broadcast-sized exclusion list). lineitem stands in for partsupp;
    the IN-list size filter prunes the broadcast part dim scan."""
    return _run(spark, sf_dir, """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 200
""")


def q_tierc_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from below-one-fifth-of-average
    quantity lines per brand. The correlated aggregate subquery
    becomes one extra aggregate over lineitem plus an equi-join on
    partkey — no per-row re-aggregation. The average is an exact
    decimal sum divided once (IEEE-identical in DuckDB)."""
    return _run(spark, sf_dir, """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand IN ('Brand#2', 'Brand#3', 'Brand#4')
          AND l_quantity <
              (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2)))
                                  AS DOUBLE)
                             / CAST(COUNT(*) AS DOUBLE))
               FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        GROUP BY p_brand
        ORDER BY p_brand
""")


def q_tierc_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: large-volume orders via IN (GROUP BY ...
    HAVING SUM > threshold) — the subquery reuses the same shuffle key
    (orderkey) as the outer join, so AQE coalesces the exchange."""
    return _run(spark, sf_dir, """
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS total_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN
              (SELECT l_orderkey FROM lineitem
               GROUP BY l_orderkey
               HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        ORDER BY total_price DESC, o_orderkey
        LIMIT 100
""")


def q_tierc_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: three OR'd brand/size/quantity predicate
    blocks over the part⋈lineitem join. Catalyst extracts the common
    p_partkey = l_partkey conjunct so this stays an equi-join (not a
    BNLJ) with the disjunction applied post-join."""
    return _run(spark, sf_dir, """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#6' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 35)
           OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 50)
        GROUP BY p_brand
        ORDER BY p_brand
""")


def q_tierc_acct_screening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: above-average-balance customers with no urgent
    orders, bucketed. The scalar subquery computes once (broadcast as
    a literal by Catalyst); the NOT EXISTS is a left-anti shuffle
    join. Buckets replace Q22's phone country codes (fixture has
    none); every customer here has orders, so the anti-join screens
    urgent orders instead."""
    return _run(spark, sf_dir, """
        SELECT bucket, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS totacctbal
        FROM (SELECT CAST(c_custkey % 10 AS INT) AS bucket, c_acctbal
              FROM customer c
              WHERE c_acctbal >
                    (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
                                 AS DOUBLE)
                            / CAST(COUNT(*) AS DOUBLE)
                     FROM customer c2 WHERE c2.c_acctbal > 0.0)
                AND NOT EXISTS
                    (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT')) t
        GROUP BY bucket
        ORDER BY bucket
""")


ENGINE_QUERIES.update({
    "tierc_priority_semijoin": q_tierc_priority_semijoin,
    "tierc_supplier_cnt": q_tierc_supplier_cnt,
    "tierc_small_qty_revenue": q_tierc_small_qty_revenue,
    "tierc_volume_customers": q_tierc_volume_customers,
    "tierc_disjunctive_revenue": q_tierc_disjunctive_revenue,
    "tierc_acct_screening": q_tierc_acct_screening,
})


ENGINE_ORACLES.update({
    "tierc_priority_semijoin": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate < DATE '1996-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
""",
    "tierc_supplier_cnt": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 200
""",
    "tierc_small_qty_revenue": """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand IN ('Brand#2', 'Brand#3', 'Brand#4')
          AND l_quantity <
              (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2)))
                                  AS DOUBLE)
                             / CAST(COUNT(*) AS DOUBLE))
               FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        GROUP BY p_brand
        ORDER BY p_brand
""",
    "tierc_volume_customers": """
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS total_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN
              (SELECT l_orderkey FROM lineitem
               GROUP BY l_orderkey
               HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        ORDER BY total_price DESC, o_orderkey
        LIMIT 100
""",
    "tierc_disjunctive_revenue": """
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#6' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 35)
           OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 50)
        GROUP BY p_brand
        ORDER BY p_brand
""",
    "tierc_acct_screening": """
        SELECT bucket, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 AS totacctbal
        FROM (SELECT CAST(c_custkey % 10 AS INT) AS bucket, c_acctbal
              FROM customer c
              WHERE c_acctbal >
                    (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2)))
                                 AS DOUBLE)
                            / CAST(COUNT(*) AS DOUBLE)
                     FROM customer c2 WHERE c2.c_acctbal > 0.0)
                AND NOT EXISTS
                    (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT')) t
        GROUP BY bucket
        ORDER BY bucket
""",
})


def q_tierc_tsql_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL OFFSET…FETCH pagination through the shim — the reference's
    users page result grids constantly; Spark executes this as a
    GlobalLimit(offset+fetch) + per-partition LocalLimit, so the scan
    never materializes past the page end."""
    return _run(
        spark,
        sf_dir,
        "SELECT [o_orderkey], [o_totalprice] FROM orders "
        "ORDER BY [o_orderkey] OFFSET 100 ROWS FETCH NEXT 50 ROWS ONLY",
    )


ENGINE_QUERIES["tierc_tsql_pagination"] = q_tierc_tsql_pagination
ENGINE_ORACLES["tierc_tsql_pagination"] = """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 50 OFFSET 100
"""


def q_tierc_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each part (subset), the supplier(s) whose
    average sale price for that part is the minimum. The correlated
    MIN subquery decorrelates into one extra aggregate joined back on
    partkey — Catalyst plans both aggregates over the same
    (partkey, suppkey) shuffle. lineitem is the part↔supplier bridge
    (fixture has no partsupp)."""
    return _run(spark, sf_dir, """
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_price
          FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT p_partkey, p_brand, s_name, c.avg_price
        FROM cost c
          JOIN part ON p_partkey = c.l_partkey
          JOIN supplier ON s_suppkey = c.l_suppkey
        WHERE p_size >= 45
          AND c.avg_price = (SELECT MIN(c2.avg_price) FROM cost c2
                             WHERE c2.l_partkey = c.l_partkey)
        ORDER BY p_partkey, s_name
""")


def q_tierc_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: suppliers achieving the global maximum
    quarterly revenue. The revenue view aggregates once; the scalar
    MAX reuses it (self-reference — Spark computes the tiny aggregate
    twice, DuckDB materializes the CTE; identical results)."""
    return _run(spark, sf_dir, """
        WITH revenue AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS total_rev
          FROM lineitem
          WHERE l_shipdate >= DATE '1995-01-01'
            AND l_shipdate < DATE '1995-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, r.total_rev
        FROM supplier JOIN revenue r ON s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey
""")


def q_tierc_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers whose item was the ONLY late one in a
    multi-supplier order — EXISTS (another supplier in the order) and
    NOT EXISTS (another late supplier) against the same fact table;
    Catalyst turns the pair into one semi- and one anti-join over the
    same orderkey shuffle. 'Late' adapts to the fixture's columns as
    shipped ≥ 60 days after the order date."""
    return _run(spark, sf_dir, """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
          JOIN orders ON o_orderkey = l1.l_orderkey
          JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate >= o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate >= o_orderdate + INTERVAL 60 DAYS)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
""")


ENGINE_QUERIES.update({
    "tierc_min_cost_supplier": q_tierc_min_cost_supplier,
    "tierc_top_revenue_supplier": q_tierc_top_revenue_supplier,
    "tierc_waiting_orders": q_tierc_waiting_orders,
})


ENGINE_ORACLES.update({
    "tierc_min_cost_supplier": """
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_price
          FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT p_partkey, p_brand, s_name, c.avg_price
        FROM cost c
          JOIN part ON p_partkey = c.l_partkey
          JOIN supplier ON s_suppkey = c.l_suppkey
        WHERE p_size >= 45
          AND c.avg_price = (SELECT MIN(c2.avg_price) FROM cost c2
                             WHERE c2.l_partkey = c.l_partkey)
        ORDER BY p_partkey, s_name
""",
    "tierc_top_revenue_supplier": """
        WITH revenue AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS total_rev
          FROM lineitem
          WHERE l_shipdate >= DATE '1995-01-01'
            AND l_shipdate < DATE '1995-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, r.total_rev
        FROM supplier JOIN revenue r ON s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey
""",
    "tierc_waiting_orders": """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
          JOIN orders ON o_orderkey = l1.l_orderkey
          JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate >= o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate >= o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
""",
})


def q_tierc_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 priciest lineitems per order.
    Catalyst decorrelates the ORDER BY/LIMIT lateral into a ranked
    window over one orderkey shuffle — the per-group top-n a user
    would otherwise hand-write with ROW_NUMBER."""
    return _run(spark, sf_dir, """
        SELECT o.o_orderkey, l.l_linenumber, l.price
        FROM orders o, LATERAL (
          SELECT l_linenumber, CAST(l_extendedprice AS DOUBLE) AS price
          FROM lineitem WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) l
        WHERE o.o_orderkey <= 200
        ORDER BY o.o_orderkey, price DESC, l_linenumber
""")


ENGINE_QUERIES["tierc_lateral_topn"] = q_tierc_lateral_topn
ENGINE_ORACLES["tierc_lateral_topn"] = """
        SELECT o.o_orderkey, l.l_linenumber, l.price
        FROM orders o, LATERAL (
          SELECT l_linenumber, CAST(l_extendedprice AS DOUBLE) AS price
          FROM lineitem WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) l
        WHERE o.o_orderkey <= 200
        ORDER BY o.o_orderkey, price DESC, l_linenumber
"""


def q_tierc_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit by supplier nation × order year (cost
    approximated as retailprice·quantity — fixture has no ps_supplycost).
    Two broadcast dims onto one fact shuffle; YEAR() evaluates pre-agg."""
    return _run(spark, sf_dir, """
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))
                        - CAST(p_retailprice AS DECIMAL(12,2))
                          * CAST(l_quantity AS DECIMAL(12,2)) * 0.1)
                    AS DOUBLE) AS profit
        FROM lineitem
          JOIN orders ON o_orderkey = l_orderkey
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
        WHERE p_type <> 'PROMO'
        GROUP BY n_name, YEAR(o_orderdate)
        ORDER BY nation, order_year
""")


def q_tierc_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top customers by lost revenue on returned
    items in one quarter. Date + returnflag filters push to the scans;
    the top-20 is a TakeOrderedAndProject, not a full sort."""
    return _run(spark, sf_dir, """
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               c_mktsegment, n_name
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1996-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_mktsegment, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
""")


def q_tierc_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of customers by order count,
    including zero-order customers via LEFT JOIN — the double
    aggregation (per-customer count, then histogram of counts)."""
    return _run(spark, sf_dir, """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
""")


def q_tierc_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth through the pass-through path: string
    (SUBSTRING/TRIM/UPPER/LOWER/REPLACE/LPAD/CONCAT_WS), numeric
    (ABS/MOD/ROUND on decimal), and conditional (CASE, NULLIF) — all
    whole-stage-codegen expressions over one scan."""
    return _run(spark, sf_dir, """
        SELECT o_orderkey,
               SUBSTRING(o_orderpriority, 1, 1) AS pri_code,
               UPPER(o_orderstatus) AS status_u,
               LOWER(o_orderpriority) AS pri_l,
               REPLACE(o_orderpriority, '-', '_') AS pri_sub,
               LPAD(CAST(o_orderkey AS STRING), 10, '0') AS key_pad,
               CONCAT_WS('|', o_orderstatus, o_orderpriority) AS joined,
               TRIM('  pad  ') AS trimmed,
               ABS(-o_orderkey) AS key_abs,
               MOD(o_orderkey, 7) AS key_mod,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 1) AS DOUBLE)
                 AS price_r1,
               CASE WHEN o_orderstatus = 'F' THEN 'final'
                    WHEN o_orderstatus = 'O' THEN 'open'
                    ELSE 'other' END AS status_word,
               NULLIF(o_orderstatus, 'P') AS status_np
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
""")


ENGINE_QUERIES.update({
    "tierc_product_profit": q_tierc_product_profit,
    "tierc_returned_items": q_tierc_returned_items,
    "tierc_custdist": q_tierc_custdist,
    "tierc_scalar_funcs": q_tierc_scalar_funcs,
})


ENGINE_ORACLES.update({
    "tierc_product_profit": """
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))
                        - CAST(p_retailprice AS DECIMAL(12,2))
                          * CAST(l_quantity AS DECIMAL(12,2)) * 0.1)
                    AS DOUBLE) AS profit
        FROM lineitem
          JOIN orders ON o_orderkey = l_orderkey
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
        WHERE p_type <> 'PROMO'
        GROUP BY n_name, YEAR(o_orderdate)
        ORDER BY nation, order_year
""",
    "tierc_returned_items": """
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue,
               c_mktsegment, n_name
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1996-07-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_mktsegment, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
""",
    "tierc_custdist": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
""",
    "tierc_scalar_funcs": """
        SELECT o_orderkey,
               SUBSTRING(o_orderpriority, 1, 1) AS pri_code,
               UPPER(o_orderstatus) AS status_u,
               LOWER(o_orderpriority) AS pri_l,
               REPLACE(o_orderpriority, '-', '_') AS pri_sub,
               LPAD(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_pad,
               CONCAT_WS('|', o_orderstatus, o_orderpriority) AS joined,
               TRIM('  pad  ') AS trimmed,
               ABS(-o_orderkey) AS key_abs,
               MOD(o_orderkey, 7) AS key_mod,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)), 1) AS DOUBLE)
                 AS price_r1,
               CASE WHEN o_orderstatus = 'F' THEN 'final'
                    WHEN o_orderstatus = 'O' THEN 'open'
                    ELSE 'other' END AS status_word,
               NULLIF(o_orderstatus, 'P') AS status_np
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
""",
})


def q_tierc_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: revenue delta from a discount change — a pure
    scan-side aggregate (every predicate pushes into the parquet scan;
    no join, no shuffle beyond the final 1-row combine). The classic
    scan-throughput probe."""
    return _run(spark, sf_dir, """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
                 AS revenue_delta,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
""")


ENGINE_QUERIES["tierc_forecast_revenue"] = q_tierc_forecast_revenue
ENGINE_ORACLES["tierc_forecast_revenue"] = """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
                 AS revenue_delta,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
"""


def q_tierc_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one supplier nation's share of total revenue per
    order year — conditional-sum ratio over one fact shuffle, the
    nation dim broadcast twice removed (supplier→nation only here).
    Share = exact decimal sums cast to double, one division."""
    return _run(spark, sf_dir, """
        WITH sales AS (
          SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
                 n_name,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2))) AS vol
          FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
        )
        SELECT order_year,
               CAST(SUM(CASE WHEN n_name = 'NATION_0' THEN vol
                             ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_lines
        FROM sales
        GROUP BY order_year
        ORDER BY order_year
""")


ENGINE_QUERIES["tierc_market_share"] = q_tierc_market_share
ENGINE_ORACLES["tierc_market_share"] = """
        WITH sales AS (
          SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
                 n_name,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2))) AS vol
          FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
        )
        SELECT order_year,
               CAST(SUM(CASE WHEN n_name = 'NATION_0' THEN vol
                             ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_lines
        FROM sales
        GROUP BY order_year
        ORDER BY order_year
"""


def q_tierc_tsql_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 T-SQL scalar additions via the shim (SURVEY §4.3):
    DATEPART, STUFF (→ overlay), SQUARE, REPLICATE."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT TOP 100 [o_orderkey],
               DATEPART(year, [o_orderdate]) AS order_year,
               DATEPART(qq, [o_orderdate]) AS order_quarter,
               STUFF([o_orderpriority], 1, 1, '#') AS pri_tag,
               SQUARE([o_totalprice]) AS price_sq,
               REPLICATE('*', DATEPART(dd, [o_orderdate]) % 5) AS stars
        FROM orders ORDER BY [o_orderkey]
        """,
    )


ENGINE_QUERIES["tierc_tsql_funcs2"] = q_tierc_tsql_funcs2
ENGINE_ORACLES["tierc_tsql_funcs2"] = """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           '#' || substr(o_orderpriority, 2) AS pri_tag,
           o_totalprice * o_totalprice AS price_sq,
           repeat('*', CAST(day(o_orderdate) AS INT) % 5) AS stars
    FROM orders ORDER BY o_orderkey LIMIT 100
"""


def q_tierc_tsql_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 T-SQL scalar additions via the shim (SURVEY §4.3):
    IIF, CHOOSE (1-based, NULL out of range), LEFT/RIGHT, SPACE."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT TOP 100 [o_orderkey],
               IIF([o_totalprice] > 150000, 'big', 'small') AS size_tag,
               CHOOSE(DATEPART(qq, [o_orderdate]),
                      'Q1', 'Q2', 'Q3', 'Q4') AS quarter_name,
               LEFT([o_orderpriority], 1) AS pri_code,
               RIGHT([o_orderpriority], 3) AS pri_tail,
               CONCAT(LEFT([o_orderstatus], 1), SPACE(1),
                      [o_orderpriority]) AS status_line
        FROM orders ORDER BY [o_orderkey]
        """,
    )


ENGINE_QUERIES["tierc_tsql_funcs3"] = q_tierc_tsql_funcs3
ENGINE_ORACLES["tierc_tsql_funcs3"] = """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END
             AS size_tag,
           CASE quarter(o_orderdate) WHEN 1 THEN 'Q1' WHEN 2 THEN 'Q2'
                WHEN 3 THEN 'Q3' WHEN 4 THEN 'Q4' END AS quarter_name,
           LEFT(o_orderpriority, 1) AS pri_code,
           RIGHT(o_orderpriority, 3) AS pri_tail,
           LEFT(o_orderstatus, 1) || ' ' || o_orderpriority AS status_line
    FROM orders ORDER BY o_orderkey LIMIT 100
"""


def q_tierc_promo_qty_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers (in a nation subset) who moved an
    above-threshold quantity of promo parts — the NESTED-IN planner
    shape: an IN over a grouped subquery whose HAVING compares against
    an uncorrelated scalar subquery. Exercises semi-join unnesting of
    a grouped+filtered subquery and scalar-subquery hoisting into the
    HAVING predicate (tool:273 pass-through surface). l_quantity is
    integral, so AVG is exact in double arithmetic and the threshold
    compare is engine-deterministic."""
    return _run(spark, sf_dir, """
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_6', 'NATION_9', 'NATION_11')
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_type = 'PROMO'
              )
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > (
                SELECT 0.5 * AVG(l_quantity)
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate < DATE '1998-01-01'
              )
          )
        ORDER BY s_suppkey
""")


def q_tierc_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts whose stocked value (within a nation
    subset) exceeds a FRACTION OF THE GLOBAL TOTAL — the
    group-filtered-by-global-scalar shape: HAVING compares each
    group's aggregate against a scalar subquery over the same joined
    fact. Both sides are exact decimal sums cast to double ONCE before
    the compare, so the predicate is bit-deterministic across
    engines."""
    return _run(spark, sf_dir, """
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS part_value
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l_partkey
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > (
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   * 0.001
            FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          )
        ORDER BY part_value DESC, l_partkey
""")


def q_tierc_same_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-flavored with EXPRESSION JOIN KEYS: revenue by
    supplier nation x order year restricted to items that SHIPPED in
    the order's own calendar year — the orders join carries
    YEAR(l_shipdate) = YEAR(o_orderdate) alongside the key equality,
    so the hash join's build/probe keys include a computed expression
    (the planner path none of the plain equi-join tierc queries
    exercise)."""
    return _run(spark, sf_dir, """
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS same_year_revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
                     AND YEAR(l_shipdate) = YEAR(o_orderdate)
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
        GROUP BY n_name, YEAR(o_orderdate)
        ORDER BY nation, order_year
""")


ENGINE_QUERIES.update({
    "tierc_promo_qty_suppliers": q_tierc_promo_qty_suppliers,
    "tierc_value_concentration": q_tierc_value_concentration,
    "tierc_same_year_revenue": q_tierc_same_year_revenue,
})


ENGINE_ORACLES.update({
    "tierc_promo_qty_suppliers": """
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_6', 'NATION_9', 'NATION_11')
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_type = 'PROMO'
              )
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > (
                SELECT 0.5 * AVG(l_quantity)
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate < DATE '1998-01-01'
              )
          )
        ORDER BY s_suppkey
""",
    "tierc_value_concentration": """
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS part_value
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY l_partkey
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > (
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   * 0.001
            FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          )
        ORDER BY part_value DESC, l_partkey
""",
    "tierc_same_year_revenue": """
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS same_year_revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
                     AND YEAR(l_shipdate) = YEAR(o_orderdate)
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
        GROUP BY n_name, YEAR(o_orderdate)
        ORDER BY nation, order_year
""",
})


def q_tierc_tsql_funcs4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 T-SQL scalar additions via the shim (SURVEY §4.3):
    EOMONTH (1- and 2-arg), DATENAME month/weekday, QUOTENAME
    bracket-quoting with ]-doubling, PATINDEX contains-patterns,
    TRY_CONVERT (null on failure), DATEFROMPARTS."""
    return _run(spark, sf_dir, """
        SELECT TOP 150 [o_orderkey],
               EOMONTH([o_orderdate]) AS month_end,
               EOMONTH([o_orderdate], 1) AS next_month_end,
               DATENAME(month, [o_orderdate]) AS month_name,
               DATENAME(weekday, [o_orderdate]) AS day_name,
               QUOTENAME([o_orderstatus]) AS status_q,
               PATINDEX('%URGENT%', [o_orderpriority]) AS urgent_pos,
               ISNULL(TRY_CONVERT(INT, [o_orderstatus]), -1) AS status_int,
               TRY_CONVERT(VARCHAR(5), [o_totalprice]) AS price5,
               DATEFROMPARTS(2000, 6, 15) AS fixed_date
        FROM orders ORDER BY [o_orderkey]
""")


ENGINE_QUERIES["tierc_tsql_funcs4"] = q_tierc_tsql_funcs4
ENGINE_ORACLES["tierc_tsql_funcs4"] = """
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           last_day(CAST(CAST(o_orderdate AS DATE)
                         + INTERVAL 1 MONTH AS DATE)) AS next_month_end,
           monthname(CAST(o_orderdate AS DATE)) AS month_name,
           dayname(CAST(o_orderdate AS DATE)) AS day_name,
           '[' || replace(o_orderstatus, ']', ']]') || ']' AS status_q,
           CAST(strpos(o_orderpriority, 'URGENT') AS INT) AS urgent_pos,
           COALESCE(TRY_CAST(o_orderstatus AS INT), -1) AS status_int,
           substr(TRY_CAST(o_totalprice AS VARCHAR), 1, 5) AS price5,
           DATE '2000-06-15' AS fixed_date
    FROM orders ORDER BY o_orderkey LIMIT 150
"""


def q_tierc_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 ``CREATE FUNCTION … RETURN
    expr``) used inside an engine query — the way a reference user
    ports a small T-SQL scalar UDF without leaving SQL. The function
    body inlines into the plan at analysis time (no Python boundary, no
    serialization — WholeStageCodegen still covers the whole pipeline),
    so unlike an external UDF it costs nothing at 100 TB. The oracle
    inlines the identical expression (the gate compares semantics, not
    syntax)."""
    load_tables(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'low'
                    WHEN p < 150000 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return Engine(spark).execute(
        """
        SELECT price_band(o_totalprice) AS band,
               o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY price_band(o_totalprice), o_orderpriority
        ORDER BY band, o_orderpriority
        """
    )


ENGINE_QUERIES["tierc_sql_udf"] = q_tierc_sql_udf
ENGINE_ORACLES["tierc_sql_udf"] = """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS band,
           o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY band, o_orderpriority
"""


def q_tierc_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through the VARIANT type (Spark 4): parse
    the events ``props`` column once into VARIANT and extract typed
    fields with ``variant_get`` — the schemaless path for payloads
    whose shape isn't known at ingest (ext_05's ``from_json`` needs a
    declared schema; VARIANT defers typing to query time and keeps the
    binary-encoded value columnar). ``try_variant_get`` surfaces
    missing paths as NULL, counted here as absent. The oracle reads
    the same fields with DuckDB's JSON operators."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT variant_get(parse_json(props), '$.k', 'int') % 10 AS k_mod,
               COUNT(*) AS n,
               CAST(SUM(variant_get(parse_json(props), '$.k', 'int'))
                 AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN try_variant_get(parse_json(props),
                     '$.missing', 'int') IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_absent
        FROM events
        WHERE props IS NOT NULL
        GROUP BY 1 ORDER BY k_mod
        """
    )


ENGINE_QUERIES["tierc_variant_props"] = q_tierc_variant_props
ENGINE_ORACLES["tierc_variant_props"] = """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
             AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing')
                 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_absent
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1 ORDER BY k_mod
"""


def q_tierc_tsql_funcs5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth T-SQL scalar batch: STRING_AGG WITHIN GROUP (→ LISTAGG,
    identical syntax), UNICODE (→ ascii), and REVERSE/TRANSLATE which
    T-SQL and Spark spell identically (shim passthrough)."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT r_name,
               STRING_AGG(n_name, '|') WITHIN GROUP (ORDER BY n_name)
                 AS nations,
               UNICODE(LEFT(r_name, 1)) AS first_cp,
               REVERSE(r_name) AS rev_name,
               TRANSLATE(r_name, 'AEIOU', 'aeiou') AS lowered_vowels
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name
        ORDER BY r_name
        """
    )


ENGINE_QUERIES["tierc_tsql_funcs5"] = q_tierc_tsql_funcs5
ENGINE_ORACLES["tierc_tsql_funcs5"] = """
    SELECT r_name,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           ascii(substr(r_name, 1, 1)) AS first_cp,
           reverse(r_name) AS rev_name,
           translate(r_name, 'AEIOU', 'aeiou') AS lowered_vowels
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    ORDER BY r_name
"""


def q_tierc_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the engine (new in Spark 4): generate the
    complete month spine between the first and last order date
    recursively, then LEFT JOIN monthly revenue so zero-order months
    surface — the coverage-gap report a calendar table would otherwise
    require. Exercises the recursive planner shape (UnionLoop) the
    pass-through surface gained in Spark 4; DuckDB runs the identical
    recursion. Recursion depth = month count (bounded by the calendar,
    not the data — the anchor aggregate is one map-combinable min/max).
    The upper bound rides THROUGH the recursion as a carried column:
    a scalar subquery in the recursive step would re-scan orders on
    every one of the ~80 iterations (measured 9.6 s → 2-3 s at
    sf0.1)."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        WITH RECURSIVE spine(m, hi) AS (
          SELECT DATE_TRUNC('MONTH', MIN(o_orderdate)),
                 DATE_TRUNC('MONTH', MAX(o_orderdate))
          FROM orders
          UNION ALL
          SELECT m + INTERVAL '1' MONTH, hi FROM spine WHERE m < hi
        ),
        monthly AS (
          SELECT DATE_TRUNC('MONTH', o_orderdate) AS m,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS revenue
          FROM orders GROUP BY 1
        )
        SELECT CAST(YEAR(spine.m) * 100 + MONTH(spine.m) AS INT) AS ym,
               COALESCE(monthly.n_orders, 0) AS n_orders,
               COALESCE(monthly.revenue, 0.0) AS revenue
        FROM spine LEFT JOIN monthly ON spine.m = monthly.m
        ORDER BY ym
        """
    )


ENGINE_QUERIES["tierc_recursive_spine"] = q_tierc_recursive_spine
ENGINE_ORACLES["tierc_recursive_spine"] = """
    WITH RECURSIVE spine(m, hi) AS (
      SELECT DATE_TRUNC('MONTH', MIN(o_orderdate)),
             DATE_TRUNC('MONTH', MAX(o_orderdate))
      FROM orders
      UNION ALL
      SELECT m + INTERVAL 1 MONTH, hi FROM spine WHERE m < hi
    ),
    monthly AS (
      SELECT DATE_TRUNC('MONTH', o_orderdate) AS m,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    )
    SELECT CAST(YEAR(spine.m) * 100 + MONTH(spine.m) AS INT) AS ym,
           COALESCE(monthly.n_orders, 0) AS n_orders,
           COALESCE(monthly.revenue, 0.0) AS revenue
    FROM spine LEFT JOIN monthly ON spine.m = monthly.m
    ORDER BY ym
"""


def q_tierc_pivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT clause through the engine (the relational pivot
    operator agg_06 exercises the DataFrame API; this is the
    pass-through SQL planner shape a reference user types). Exact
    DECIMAL sums per pivoted status cell; the oracle is the equivalent
    conditional aggregation (the gate compares semantics, not
    syntax)."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(12,2)) AS p
          FROM orders
        )
        PIVOT (
          CAST(SUM(p) AS DOUBLE) AS total, COUNT(*) AS n
          FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS pp)
        )
        ORDER BY o_orderpriority
        """
    )


ENGINE_QUERIES["tierc_pivot_sql"] = q_tierc_pivot_sql
ENGINE_ORACLES["tierc_pivot_sql"] = """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
             AS f_total,
           COUNT(*) FILTER (o_orderstatus = 'F') AS f_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
             AS o_total,
           COUNT(*) FILTER (o_orderstatus = 'O') AS o_n,
           CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
             AS pp_total,
           COUNT(*) FILTER (o_orderstatus = 'P') AS pp_n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Round 8: QUALIFY and CROSS/OUTER APPLY planner shapes
# ---------------------------------------------------------------------------


def q_tierc_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY clause through the engine (Teradata/Snowflake/DuckDB
    extension — Spark's grammar lacks it, so the dialect shim rewrites
    it into a subquery filter with a helper column dropped by
    `* EXCEPT`). Top-3 orders per priority by price; DuckDB runs the
    QUALIFY spelling natively, making the rewrite's semantics the
    oracle-checked contract. One window shuffle on the partition key;
    the filter runs before any row leaves the exchange stage."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM orders
        QUALIFY RANK() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey) <= 3
        ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
        """
    )


ENGINE_QUERIES["tierc_qualify"] = q_tierc_qualify
ENGINE_ORACLES["tierc_qualify"] = """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    QUALIFY RANK() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey) <= 3
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
"""


def q_tierc_qualify_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY inside a WITH member body feeding a join — the shape
    real analyst SQL uses constantly and the r8 shim refused
    (judge task 6). The dialect rewrite now recurses into each
    depth-0 CTE body the way the APPLY transpiler recurses into its
    operand, so the top-3-per-nation window filter happens INSIDE the
    CTE before the nation join. DuckDB runs the QUALIFY-in-CTE
    spelling natively as the oracle. Plan: one window shuffle on
    c_nationkey, then a broadcast join to the 25-row nation dim."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        WITH top_cust AS (
          SELECT c_nationkey, c_custkey, c_name, c_acctbal
          FROM customer
          QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) <= 3
        )
        SELECT n_name, t.c_custkey, t.c_name,
               CAST(t.c_acctbal AS DOUBLE) AS acctbal
        FROM top_cust t JOIN nation ON t.c_nationkey = n_nationkey
        ORDER BY n_name, acctbal DESC, t.c_custkey
        """
    )


ENGINE_QUERIES["tierc_qualify_cte"] = q_tierc_qualify_cte
ENGINE_ORACLES["tierc_qualify_cte"] = """
    WITH top_cust AS (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal
      FROM customer
      QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey) <= 3
    )
    SELECT n_name, t.c_custkey, t.c_name,
           CAST(t.c_acctbal AS DOUBLE) AS acctbal
    FROM top_cust t JOIN nation ON t.c_nationkey = n_nationkey
    ORDER BY n_name, acctbal DESC, t.c_custkey
"""


def q_tierc_qualify_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY inside a non-CTE derived table — the last common home
    of analyst QUALIFY the shim refused through r9 (judge task 4).
    The rewrite now recurses into every parenthesized subquery body
    that starts with SELECT/WITH, one level at a time, so a
    ``FROM (SELECT … QUALIFY …) t`` join works; DuckDB runs the
    spelling natively as the oracle. The inner body windows top-2
    orders per customer; the outer query joins the 25-row nation dim
    through customer (broadcast) and aggregates per nation. Same
    single window shuffle as tierc_qualify_cte — the derived table is
    just the inline spelling of that CTE."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT n_name,
               COUNT(*) AS n_top_orders,
               CAST(SUM(CAST(t.o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS top_order_value
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice
          FROM orders
          QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC,
                                              o_orderkey) <= 2
        ) t
        JOIN customer ON t.o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """
    )


ENGINE_QUERIES["tierc_qualify_subquery"] = q_tierc_qualify_subquery
ENGINE_ORACLES["tierc_qualify_subquery"] = """
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_top_orders,
           CAST(SUM(CAST(t.o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) AS top_order_value
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice
      FROM orders
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC,
                                          o_orderkey) <= 2
    ) t
    JOIN customer ON t.o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
"""


def q_tierc_qualify_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY composed with DISTINCT — refused through r9 on the
    theory the helper column would change the DISTINCT row set; in
    the Snowflake/DuckDB clause order QUALIFY evaluates BEFORE
    DISTINCT, so the rewrite filters on the helper inside the
    subquery and re-applies DISTINCT in the outer select after
    `* EXCEPT` drops the helper (r10). The query keeps each
    customer's top-3 orders by price and then dedups the
    (priority, status) combinations among them — DISTINCT does real
    work because many top orders share both. DuckDB runs the
    QUALIFY-with-DISTINCT spelling natively as the oracle."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT DISTINCT o_orderpriority, o_orderstatus
        FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC,
                                            o_orderkey) <= 3
        ORDER BY o_orderpriority, o_orderstatus
        """
    )


ENGINE_QUERIES["tierc_qualify_distinct"] = q_tierc_qualify_distinct
ENGINE_ORACLES["tierc_qualify_distinct"] = """
    SELECT DISTINCT o_orderpriority, o_orderstatus
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC,
                                        o_orderkey) <= 3
    ORDER BY o_orderpriority, o_orderstatus
"""


def q_tierc_qualify_setop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY inside set-operator branches — the last refused QUALIFY
    placement (r11, judge task 5). Each depth-0 UNION/INTERSECT/EXCEPT
    branch is a self-contained SELECT, so the shim applies the
    per-SELECT rewrite to each branch independently; the set-level
    ORDER BY tail stays after the last branch, where Spark parses it
    at the set-operation level. The query unions each nation's two
    richest and two poorest customers (both branches windowed), a
    shape analysts write for outlier panels. DuckDB runs the
    QUALIFY-in-union-branches spelling natively as the oracle. Plan:
    two window shuffles on c_nationkey (one per branch — unavoidable,
    the sort orders differ), then a zero-shuffle union."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT 'top' AS side, c_nationkey, c_custkey,
               CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer
        QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC,
                                            c_custkey) <= 2
        UNION ALL
        SELECT 'bottom' AS side, c_nationkey, c_custkey,
               CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer
        QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal ASC,
                                            c_custkey) <= 2
        ORDER BY c_nationkey, side DESC, acctbal DESC, c_custkey
        """
    )


ENGINE_QUERIES["tierc_qualify_setop"] = q_tierc_qualify_setop
ENGINE_ORACLES["tierc_qualify_setop"] = """
    SELECT 'top' AS side, c_nationkey, c_custkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC,
                                        c_custkey) <= 2
    UNION ALL
    SELECT 'bottom' AS side, c_nationkey, c_custkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal ASC,
                                        c_custkey) <= 2
    ORDER BY c_nationkey, side DESC, acctbal DESC, c_custkey
"""


def q_tierc_cross_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL CROSS APPLY with a correlated TOP — the idiom APPLY
    exists for (top-N-per-entity without self-join gymnastics). The
    shim transpiles the subquery independently (so TOP works inside)
    and rewrites APPLY to Spark's JOIN LATERAL; Catalyst plans it as
    a partitioned window top-k, not a per-row re-scan. DuckDB's
    LATERAL runs the identical semantics as the oracle."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM customer c
        CROSS APPLY (
          SELECT TOP 2 o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
        ) t
        WHERE c.c_custkey <= 150
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )


ENGINE_QUERIES["tierc_cross_apply"] = q_tierc_cross_apply
ENGINE_ORACLES["tierc_cross_apply"] = """
    SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey <= 150
    ORDER BY c.c_custkey, t.o_orderkey
"""


def q_tierc_outer_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL OUTER APPLY (latest order per customer, NULLs for
    customers who never ordered) → LEFT JOIN LATERAL. The preserved
    null rows are the semantic difference from CROSS APPLY and what
    this entry pins down."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT c.c_custkey,
               t.o_orderkey AS last_orderkey,
               t.o_totalprice AS last_price
        FROM customer c
        OUTER APPLY (
          SELECT TOP 1 o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
        ) t
        WHERE c.c_custkey <= 300
        ORDER BY c.c_custkey
        """
    )


ENGINE_QUERIES["tierc_outer_apply"] = q_tierc_outer_apply
ENGINE_ORACLES["tierc_outer_apply"] = """
    SELECT c.c_custkey,
           t.o_orderkey AS last_orderkey,
           t.o_totalprice AS last_price
    FROM customer c
    LEFT JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) t ON TRUE
    WHERE c.c_custkey <= 300
    ORDER BY c.c_custkey
"""


def q_tierc_tsql_funcs6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL scalar-function batch 6 through the shim: PARSENAME
    (dot-path part from the right), ISNUMERIC (sane try_cast subset —
    the currency-symbol quirks are documented deviations), ATN2
    (argument-order-identical atan2, floored to micro after one
    identical double call), SIGN cast to INT (Spark returns DOUBLE,
    DuckDB INTEGER — the cast pins the contract), and T-SQL string
    concatenation via +."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT TOP 100
          o_orderkey,
          PARSENAME(o_orderpriority + '.' + o_orderstatus + '.'
                    + CONVERT(VARCHAR, o_orderkey), 1) AS part1,
          PARSENAME(o_orderpriority + '.' + o_orderstatus, 2) AS part2,
          PARSENAME(o_orderstatus, 5) AS part_missing,
          ISNUMERIC(o_orderstatus) AS isnum_status,
          ISNUMERIC(CONVERT(VARCHAR, o_orderkey)) AS isnum_key,
          CAST(SIGN(o_totalprice - 100000.0) AS INT) AS price_sign,
          CAST(FLOOR(ATN2(o_totalprice, 100000.0) * 1000000.0) AS BIGINT)
            AS angle_micro
        FROM orders
        ORDER BY o_orderkey
        """
    )


ENGINE_QUERIES["tierc_tsql_funcs6"] = q_tierc_tsql_funcs6
ENGINE_ORACLES["tierc_tsql_funcs6"] = """
    SELECT o_orderkey,
           string_split(o_orderpriority || '.' || o_orderstatus || '.'
                        || CAST(o_orderkey AS VARCHAR), '.')[-1] AS part1,
           string_split(o_orderpriority || '.' || o_orderstatus, '.')[-2]
             AS part2,
           string_split(o_orderstatus, '.')[-5] AS part_missing,
           CASE WHEN TRY_CAST(o_orderstatus AS DOUBLE) IS NOT NULL
                THEN 1 ELSE 0 END AS isnum_status,
           CASE WHEN TRY_CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE)
                     IS NOT NULL THEN 1 ELSE 0 END AS isnum_key,
           CAST(SIGN(o_totalprice - 100000.0) AS INT) AS price_sign,
           CAST(FLOOR(ATAN2(o_totalprice, 100000.0) * 1000000.0) AS BIGINT)
             AS angle_micro
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
"""


def q_tierc_tsql_funcs7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-SQL batch 7 (r9): DATETRUNC (2022 syntax — part keyword →
    Spark/DuckDB date_trunc string literal; week refuses, it is
    DATEFIRST-dependent) and the STRING_SPLIT table-valued function —
    the shim rewrites the TVF call into an inline explode subquery,
    so both plain FROM and CROSS APPLY positions work, with the
    separator regex-escaped (T-SQL separators are literal; Spark
    split() takes a pattern). FORMAT() refuses loudly (.NET format
    strings). Priorities like '1-URGENT' split into two rows each."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT TOP 200 o_orderkey,
               CAST(DATETRUNC(month, o_orderdate) AS DATE) AS order_month,
               CAST(DATETRUNC(quarter, o_orderdate) AS DATE)
                 AS order_quarter,
               s.value AS prio_part
        FROM orders CROSS APPLY STRING_SPLIT(o_orderpriority, '-') s
        ORDER BY o_orderkey, prio_part
        """
    )


ENGINE_QUERIES["tierc_tsql_funcs7"] = q_tierc_tsql_funcs7
ENGINE_ORACLES["tierc_tsql_funcs7"] = """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(date_trunc('quarter', o_orderdate) AS DATE)
             AS order_quarter,
           u.value AS prio_part
    FROM orders, unnest(string_split(o_orderpriority, '-')) AS u(value)
    ORDER BY o_orderkey, prio_part
    LIMIT 200
"""


def q_tierc_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL through the engine — the analyst shorthand (group
    on every non-aggregate select item) both Spark ≥3.4 and DuckDB
    resolve natively; the entry pins that the resolution matches."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT l_returnflag, l_linestatus, YEAR(l_shipdate) AS ship_year,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus, ship_year
        """
    )


ENGINE_QUERIES["tierc_groupby_all"] = q_tierc_groupby_all
ENGINE_ORACLES["tierc_groupby_all"] = """
    SELECT l_returnflag, l_linestatus,
           CAST(YEAR(l_shipdate) AS INT) AS ship_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY l_returnflag, l_linestatus, ship_year
"""


def q_tierc_unpivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause through the engine (ext_32 exercises the
    DataFrame melt; this is the pass-through planner shape): wide
    per-status revenue columns back to (metric, value) rows."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        SELECT o_orderpriority, metric, val FROM (
          SELECT o_orderpriority,
                 CAST(SUM(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                      AS DOUBLE) AS total_f,
                 CAST(SUM(CASE WHEN o_orderstatus = 'O'
                      THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                      AS DOUBLE) AS total_o,
                 CAST(SUM(CASE WHEN o_orderstatus = 'P'
                      THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                      AS DOUBLE) AS total_p
          FROM orders GROUP BY o_orderpriority
        )
        UNPIVOT (val FOR metric IN (total_f, total_o, total_p))
        ORDER BY o_orderpriority, metric
        """
    )


ENGINE_QUERIES["tierc_unpivot_sql"] = q_tierc_unpivot_sql
ENGINE_ORACLES["tierc_unpivot_sql"] = """
    SELECT o_orderpriority, metric, val FROM (
      SELECT o_orderpriority,
             CAST(SUM(CASE WHEN o_orderstatus = 'F'
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                  AS DOUBLE) AS total_f,
             CAST(SUM(CASE WHEN o_orderstatus = 'O'
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                  AS DOUBLE) AS total_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'P'
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                  AS DOUBLE) AS total_p
      FROM orders GROUP BY o_orderpriority
    )
    UNPIVOT (val FOR metric IN (total_f, total_o, total_p))
    ORDER BY o_orderpriority, metric
"""


def q_tierc_asof_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN through the engine (DuckDB/QuestDB time-series
    syntax — Spark's grammar lacks it; the shim rewrites it into a
    validity-interval join: a LEAD window on the right side marks each
    row's next timestamp, and the equi+range ON condition becomes a
    SortMergeJoin — the earlier correlated-LATERAL form decorrelated
    to a quadratic nested loop and was replaced in r8). Each
    event attaches the SAME USER's most recent order-day summary at
    or before the event; users with no prior orders keep NULLs (ASOF
    LEFT). The right side is aggregated to one row per (customer,
    day), so the nearest match is unique — the precondition real ASOF
    semantics assume. DuckDB runs the identical statement natively as
    the oracle. The programmatic as-of operator (EXT-07,
    operators/temporal.py) covers the DataFrame path; this is its SQL
    spelling."""
    load_tables(spark, sf_dir)
    return Engine(spark).execute(
        """
        WITH od AS (
          SELECT o_custkey, o_orderdate,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS day_total
          FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id,
               CAST(od.o_orderdate AS STRING) AS last_order_date,
               od.n_orders, od.day_total
        FROM events e
        ASOF LEFT JOIN od
          ON e.user_id = od.o_custkey AND CAST(e.ts AS DATE) >= od.o_orderdate
        WHERE e.user_id < 40
        ORDER BY e.event_id
        """
    )


ENGINE_QUERIES["tierc_asof_sql"] = q_tierc_asof_sql
ENGINE_ORACLES["tierc_asof_sql"] = """
    WITH od AS (
      SELECT o_custkey, o_orderdate,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS day_total
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CAST(od.o_orderdate AS VARCHAR) AS last_order_date,
           od.n_orders, od.day_total
    FROM events e
    ASOF LEFT JOIN od
      ON e.user_id = od.o_custkey AND CAST(e.ts AS DATE) >= od.o_orderdate
    WHERE e.user_id < 40
    ORDER BY e.event_id
"""
