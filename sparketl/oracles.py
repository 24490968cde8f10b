"""DuckDB-runnable ANSI-SQL oracles, one per entry in ``queries()``.

Each statement is the semantic twin of the same-named Spark builder in
``sparketl.operators.*``. Column names/aliases match exactly (the
driver's compare sorts columns by name before hashing). Money
aggregates go through the same exact DECIMAL arithmetic as the Spark
side so double results are bit-identical (see operators/relational.py
module docstring).
"""

from __future__ import annotations

# Relational tier (SURVEY §2.2-§2.9) -------------------------------------

RELATIONAL_ORACLES: dict[str, str] = {
    "flagship_pricing_summary": """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))
                   * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "prj_01_projection": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey
    """,
    "prj_02_mapping_rename": """
        SELECT c_custkey AS id, c_name AS customer_name, c_acctbal AS balance
        FROM customer ORDER BY id
    """,
    "prj_03_null_normalize": """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END
                 AS o_orderstatus
        FROM orders ORDER BY o_orderkey
    """,
    "prj_04_stringify": """
        SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
               CAST(n_name AS VARCHAR) AS n_name,
               CAST(n_regionkey AS VARCHAR) AS n_regionkey
        FROM nation ORDER BY CAST(n_nationkey AS INT)
    """,
    "flt_01_eq_and": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        ORDER BY l_orderkey, l_linenumber
    """,
    "flt_03_not_in": """
        SELECT * FROM nation WHERE n_regionkey NOT IN (1, 2, 3)
        ORDER BY n_nationkey
    """,
    "flt_04_param_eq": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_custkey = 7 ORDER BY o_orderkey
    """,
    "flt_05_range": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity >= 25 AND l_quantity <= 30 AND l_discount > 0.05
        ORDER BY l_orderkey, l_linenumber
    """,
    "join_01_inner": """
        SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        FROM orders INNER JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey
    """,
    "join_02_left": """
        SELECT c_custkey, c_name,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(total_spend, 0.0) AS total_spend
        FROM customer
        LEFT JOIN (
          SELECT o_custkey, COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
          FROM orders GROUP BY o_custkey
        ) o ON c_custkey = o.o_custkey
        ORDER BY c_custkey
    """,
    "join_02_full": """
        SELECT COALESCE(l.l_partkey, r.l_partkey) AS l_partkey,
               COALESCE(n_returned, 0) AS n_returned,
               COALESCE(n_open, 0) AS n_open
        FROM (SELECT l_partkey, COUNT(*) AS n_returned FROM lineitem
              WHERE l_returnflag = 'R' GROUP BY l_partkey) l
        FULL OUTER JOIN
             (SELECT l_partkey, COUNT(*) AS n_open FROM lineitem
              WHERE l_linestatus = 'O' GROUP BY l_partkey) r
        ON l.l_partkey = r.l_partkey
        ORDER BY 1
    """,
    "join_03_star": """
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "join_semi_anti": """
        WITH w AS (
          SELECT c_mktsegment, COUNT(*) AS n_with_orders FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM orders)
          GROUP BY c_mktsegment
        ), wo AS (
          SELECT c_mktsegment, COUNT(*) AS n_without_orders FROM customer
          WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
          GROUP BY c_mktsegment
        )
        SELECT COALESCE(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
               COALESCE(n_with_orders, 0) AS n_with_orders,
               COALESCE(n_without_orders, 0) AS n_without_orders
        FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
        ORDER BY 1
    """,
    "agg_01_group_sum": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "agg_02_value_counts": """
        SELECT event_type, COUNT(*) AS cnt
        FROM events GROUP BY event_type ORDER BY cnt DESC, event_type
    """,
    "agg_03_count_avg": """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                 AS avg_balance,
               MIN(c_acctbal) AS min_balance,
               MAX(c_acctbal) AS max_balance
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "agg_04_having": """
        SELECT l_suppkey, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_suppkey
        HAVING COUNT(*) > 100
        ORDER BY l_suppkey
    """,
    "agg_04_distinct": """
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders ORDER BY o_orderstatus, o_orderpriority
    """,
    "agg_05_rollup": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY 1, 2
    """,
    "agg_05_cube": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY 1, 2
    """,
    "agg_05_grouping_sets": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY 1, 2
    """,
    "agg_06_pivot": """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "agg_07_quantiles": """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS median_price,
               quantile_cont(l_extendedprice, 0.95) AS p95_price,
               quantile_cont(l_quantity, 0.5) AS median_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "ext_08_stratified_sample": """
        SELECT doc_id, lang, source, n_chars FROM (
          SELECT doc_id, lang, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn % 10 = 1 ORDER BY doc_id
    """,
    "prof_01_table_profile": """
        WITH w AS (
          SELECT
            CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k1n,
            COUNT(DISTINCT o_orderkey) AS k1d,
            MIN(CAST(o_orderkey AS VARCHAR)) AS k1mi, MAX(CAST(o_orderkey AS VARCHAR)) AS k1ma,
            CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k2n,
            COUNT(DISTINCT o_custkey) AS k2d,
            MIN(CAST(o_custkey AS VARCHAR)) AS k2mi, MAX(CAST(o_custkey AS VARCHAR)) AS k2ma,
            CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k3n,
            COUNT(DISTINCT o_orderstatus) AS k3d,
            MIN(CAST(o_orderstatus AS VARCHAR)) AS k3mi, MAX(CAST(o_orderstatus AS VARCHAR)) AS k3ma,
            CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k4n,
            COUNT(DISTINCT o_totalprice) AS k4d,
            MIN(CAST(o_totalprice AS VARCHAR)) AS k4mi, MAX(CAST(o_totalprice AS VARCHAR)) AS k4ma,
            CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k5n,
            COUNT(DISTINCT o_orderdate) AS k5d,
            MIN(CAST(o_orderdate AS VARCHAR)) AS k5mi, MAX(CAST(o_orderdate AS VARCHAR)) AS k5ma,
            CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k6n,
            COUNT(DISTINCT o_orderpriority) AS k6d,
            MIN(CAST(o_orderpriority AS VARCHAR)) AS k6mi, MAX(CAST(o_orderpriority AS VARCHAR)) AS k6ma
          FROM orders
        )
        SELECT 'o_orderkey' AS col_name, k1n AS n_nulls, k1d AS ndv, k1mi AS min_s, k1ma AS max_s FROM w
        UNION ALL SELECT 'o_custkey', k2n, k2d, k2mi, k2ma FROM w
        UNION ALL SELECT 'o_orderstatus', k3n, k3d, k3mi, k3ma FROM w
        UNION ALL SELECT 'o_totalprice', k4n, k4d, k4mi, k4ma FROM w
        UNION ALL SELECT 'o_orderdate', k5n, k5d, k5mi, k5ma FROM w
        UNION ALL SELECT 'o_orderpriority', k6n, k6d, k6mi, k6ma FROM w
        ORDER BY col_name
    """,
    "agg_05_stats": """
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
               COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "srt_01_order_by": """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier ORDER BY s_acctbal DESC, s_suppkey
    """,
    "srt_02_limit_offset": """
        SELECT c_custkey, c_name FROM customer
        ORDER BY c_custkey LIMIT 20 OFFSET 10
    """,
    "lim_01_preview": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
    "lim_02_topk": """
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "set_union": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey FROM supplier
        ) ORDER BY nationkey
    """,
    "set_intersect_except": """
        SELECT nationkey, 'both' AS which FROM
          (SELECT c_nationkey AS nationkey FROM customer
           INTERSECT
           SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'customer_only' AS which FROM
          (SELECT c_nationkey AS nationkey FROM customer
           EXCEPT
           SELECT s_nationkey FROM supplier)
        ORDER BY which, nationkey
    """,
    "fn_01_year_month": """
        SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(MONTH(o_orderdate) AS INT) AS order_month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "window_rank": """
        SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 3
        ORDER BY o_orderpriority, rn
    """,
    "window_running_sum": """
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_revenue
        FROM lineitem WHERE l_suppkey <= 3
        ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    "subquery_above_avg": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
          FROM customer
        )
        ORDER BY c_custkey
    """,
    "ext_08_reservoir_per_group": """
        SELECT doc_id, lang, source, rank FROM (
          SELECT doc_id, lang, source,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS INT)
                   AS rank
          FROM documents
        ) WHERE rank <= 5 ORDER BY lang, rank
    """,
    "ext_20_winsorize": """
        WITH b AS (
          SELECT l_returnflag,
                 quantile_cont(l_extendedprice, 0.05) AS p05,
                 quantile_cont(l_extendedprice, 0.95) AS p95
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT li.l_returnflag,
               MIN(b.p05) AS p05, MIN(b.p95) AS p95,
               CAST(SUM(CASE WHEN li.l_extendedprice < b.p05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clip_lo,
               CAST(SUM(CASE WHEN li.l_extendedprice > b.p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clip_hi,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM lineitem li JOIN b USING (l_returnflag)
        GROUP BY li.l_returnflag ORDER BY li.l_returnflag
    """,
}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    try:
        from sparketl.operators.engine_queries import ENGINE_ORACLES

        out.update(ENGINE_ORACLES)
    except ImportError:
        pass
    # extension-operator oracles are registered by their own modules
    try:
        from sparketl.operators.ext_queries import EXT_ORACLES

        out.update(EXT_ORACLES)
    except ImportError:
        pass
    return out
