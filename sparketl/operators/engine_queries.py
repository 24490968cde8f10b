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
