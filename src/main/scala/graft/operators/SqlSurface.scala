package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string entry point: the same engine driven through `spark.sql`
  * over registered views — TPC-H-shaped multi-join analytics proving the
  * parser/analyzer path end-to-end. The SQL text doubles as the DuckDB
  * oracle (dialect-shared ANSI subset), so the two engines execute the
  * *identical* query text.
  *
  * Scale posture: classic star-join plans — Catalyst broadcast-joins the
  * dimensions (region/nation/supplier/customer) under the fact tables'
  * shuffle joins; both queries aggregate with partial+final hash
  * aggregation and end in bounded top-k / small-group sorts.
  */
object SqlSurface {

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))

  /** TPC-H Q3-shaped: shipping-priority revenue of building-segment
    * orders straddling a date. */
  private val q3Sql =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-01'
      |  AND l_shipdate  > TIMESTAMP '1997-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q1-shaped: the canonical pricing-summary scan-aggregate.
    * Determinism per SURVEY §2.0: every sum is an exact decimal
    * aggregate cast to double at the END; the disc-price product is
    * re-cast to DECIMAL(18,4) before the (1+tax) multiply so every
    * intermediate stays inside exact 38-digit decimal arithmetic in
    * BOTH engines (unchecked (18,2)³ products would overflow precision
    * and round engine-specifically); averages are stated as
    * CAST(sum AS DOUBLE)/count — one double division, identical text
    * both sides. */
  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
      |            AS DOUBLE) AS sum_disc_price,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
      |                * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
      |       CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q5-shaped: local-supplier volume per nation in EUROPE, 1996. */
  private val q5Sql =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM customer
      |JOIN orders   ON c_custkey  = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Correlated scalar subquery — exercises Catalyst's
    * RewriteCorrelatedScalarSubquery decorrelation (the subquery becomes
    * an aggregate + left outer join; customers with no orders compare
    * against NULL and drop out in both engines). */
  private val corrSql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT 0.0001 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |                   FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** GROUPING SETS with grouping() indicator bits — the grouping-set
    * surface beyond rollup/cube (Expand-based plan in Spark); the two
    * one-dimension sets plus the grand total. NULL group cells sorted
    * explicitly so both engines agree on total order. */
  private val groupingSetsSql =
    """SELECT o_orderpriority, o_orderstatus,
      |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY g_prio, g_status,
      |         o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** TPC-H Q6-shaped: the forecasting-revenue-change filter-aggregate —
    * pure scan + predicate + one-group agg, the pushdown/codegen
    * benchmark (no join, no shuffle beyond the final single-group
    * combine). Discount bounds are double literals compared against the
    * raw double column — identical bits both engines. */
  private val q6Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24
      |ORDER BY revenue""".stripMargin

  /** TPC-H Q10-shaped: returned-item revenue ranking — the classic
    * "top complaining customers" report; fact-side shuffle join under
    * broadcast customer/nation dims, bounded top-20. */
  private val q10Sql =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       c_acctbal, n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q14-shaped: promo revenue share — conditional aggregation
    * over a fact⋈dim join; both sums stay in exact DECIMAL(18,4) (Q1's
    * overflow-safe pattern) and the share is ONE double division of the
    * two exact sums. */
  private val q14Sql =
    """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
      |                THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |                          * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
      |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |       / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |                       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
      |              AS DOUBLE) AS promo_frac,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate <  TIMESTAMP '1996-10-01'
      |ORDER BY promo_frac""".stripMargin

  /** TPC-H Q18-shaped: large-volume-order customers — the IN-subquery
    * over a grouped HAVING (Catalyst decorrelates to a semi-join against
    * the re-aggregated fact), quantity sums exact in decimal. */
  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey
      |                     HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q19-shaped: discounted revenue under an OR-of-ANDs predicate
    * — the disjunctive-pushdown benchmark (Catalyst factors the common
    * join key and pushes brand/size/quantity bounds below the join). */
  private val q19Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)
      |ORDER BY revenue""".stripMargin

  /** Correlated LATERAL subquery — per-customer top-2 orders via the
    * lateral join surface (Spark plans it as a decorrelated window/
    * limit under a join; DuckDB executes the same text natively). */
  private val lateralSql =
    """SELECT c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |ORDER BY c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin

  def sqlLateral(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders")
    s.sql(lateralSql)
  }

  def sqlQ19(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "lineitem", "part")
    s.sql(q19Sql)
  }

  def sqlQ6(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "lineitem")
    s.sql(q6Sql)
  }

  def sqlQ10(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders", "lineitem", "nation")
    s.sql(q10Sql)
  }

  def sqlQ14(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "lineitem", "part")
    s.sql(q14Sql)
  }

  def sqlQ18(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders", "lineitem")
    s.sql(q18Sql)
  }

  def sqlGroupingSets(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "orders")
    s.sql(groupingSetsSql)
  }

  def sqlCorr(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders")
    s.sql(corrSql)
  }

  def sqlQ3(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders", "lineitem")
    s.sql(q3Sql)
  }

  def sqlQ5(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    s.sql(q5Sql)
  }

  def sqlQ1(s: SparkSession, dir: String): DataFrame = {
    views(s, dir, "lineitem")
    s.sql(q1Sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_tpch_q1"        -> (sqlQ1 _),
    "sql_tpch_q3"        -> (sqlQ3 _),
    "sql_tpch_q5"        -> (sqlQ5 _),
    "sql_tpch_q6"        -> (sqlQ6 _),
    "sql_tpch_q10"       -> (sqlQ10 _),
    "sql_tpch_q14"       -> (sqlQ14 _),
    "sql_tpch_q18"       -> (sqlQ18 _),
    "sql_tpch_q19"       -> (sqlQ19 _),
    "sql_lateral_topk"   -> (sqlLateral _),
    "sql_corr_subquery"  -> (sqlCorr _),
    "sql_grouping_sets"  -> (sqlGroupingSets _),
  )

  val oracle: Map[String, String] = Map(
    "sql_tpch_q1"        -> q1Sql,
    "sql_tpch_q3"        -> q3Sql,
    "sql_tpch_q5"        -> q5Sql,
    "sql_tpch_q6"        -> q6Sql,
    "sql_tpch_q10"       -> q10Sql,
    "sql_tpch_q14"       -> q14Sql,
    "sql_tpch_q18"       -> q18Sql,
    "sql_tpch_q19"       -> q19Sql,
    "sql_lateral_topk"   -> lateralSql,
    "sql_corr_subquery"  -> corrSql,
    "sql_grouping_sets"  -> groupingSetsSql,
  )
}
