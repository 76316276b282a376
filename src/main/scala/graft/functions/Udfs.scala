package graft.functions

import graft.operators.Mining
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §F — UDF / UDAF / UDTF extension surface (SURVEY.md §2.1.F).
  *
  * Demonstrates all three user-extension points with oracle-checkable
  * semantics:
  *  - `udf_scalar`: a Scala UDF (codegen-opaque scalar; fine off the hot
  *    path — built-ins are preferred everywhere else).
  *  - `udaf_itemset_support`: a typed `Aggregator` doing single-pass
  *    per-item support counting — the MapReduce combiner pattern as a
  *    UDAF (partial maps merged across partitions, no row explosion).
  *  - `udtf_generator`: Dataset `flatMap` generating ordered item pairs
  *    per basket — the Apriori candidate generator as a lateral view.
  */
object Udfs {

  /** Gini impurity of a uniform distribution over n items: 1 - 1/n. */
  def udfScalar(s: SparkSession, dir: String): DataFrame = {
    val gini = udf((n: Long) => 1.0 - 1.0 / n)
    Mining.baskets(s, dir)
      .select(col("tid").as("l_orderkey"),
        size(col("items")).cast("long").as("basket_size"))
      .withColumn("gini", gini(col("basket_size")))
      .orderBy("l_orderkey")
  }

  /** Single-pass item-support counter (combiner-style partial maps). */
  object ItemSupport extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.updated(item, b.getOrElse(item, 0L) + 1L)
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    // ExpressionEncoder (columnar map), NOT Encoders.kryo: an opaque
    // binary buffer forces the slow serialization path and blocks any
    // future whole-stage optimization of the partial aggregate.
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Equals fpm_freq_items without the support filter (cross-checked in
    * UdfSpec and by the oracle). */
  def udafItemsetSupport(s: SparkSession, dir: String): DataFrame = {
    val counter = udaf(ItemSupport)
    Mining.txItems(s, dir)
      .agg(counter(col("item")).as("supports"))
      .select(explode(col("supports")).as(Seq("item", "freq")))
      .orderBy("item")
  }

  /** Basket → all ordered item pairs (typed flatMap generator). */
  def udtfGenerator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Mining.baskets(s, dir)
      .as[(Long, Seq[String])]
      .flatMap { case (tid, items) =>
        for {
          i <- items.indices
          j <- (i + 1) until items.size
        } yield (tid, items(i), items(j))
      }
      .toDF("l_orderkey", "item_a", "item_b")
      .orderBy("l_orderkey", "item_a", "item_b")
  }

  /** SQL-defined scalar function — Spark 4's `CREATE FUNCTION ... RETURN
    * <expr>` (the fourth extension tier, and the cheapest: the analyzer
    * INLINES the body into the calling plan, so unlike a Scala UDF the
    * call stays fully codegen'd and optimizable — predicate pushdown and
    * constant folding see through it). The tier a warehouse team reaches
    * for first: shared business logic without shipping jars.
    *
    * Scale posture: zero runtime cost vs writing the CASE inline —
    * ResolveSQLFunctions rewrites it away before optimization. */
  def udfSqlFunction(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_order_tier(p DOUBLE)
        |RETURNS STRING
        |RETURN CASE WHEN p > 300000 THEN 'high'
        |            WHEN p > 150000 THEN 'mid'
        |            ELSE 'low' END""".stripMargin)
    s.sql(
      """SELECT graft_order_tier(o_totalprice) AS tier,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** SQL TABLE function (`CREATE FUNCTION ... RETURNS TABLE`, Spark 4) —
    * the set-returning tier above [[udfSqlFunction]]'s scalar: a
    * parameterized order slice declared once in SQL and consumed as a
    * table, then re-invoked LATERALLY with a correlated bound (each
    * priority's rows above that priority's own mean — the per-group
    * subquery pattern a reusable TVF cleans up). The analyzer INLINES
    * the body both times, so the plan is the plain subquery's plan; the
    * oracle states the inlined form.
    *
    * Scale posture: inlining means zero function-call machinery at
    * runtime — filters land on the scan, the lateral correlation plans
    * as the same join the hand-written subquery would. */
  def udfSqlTableFunction(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_order_slice(lo DOUBLE)
        |RETURNS TABLE (o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE)
        |RETURN SELECT o_orderkey, o_orderpriority, o_totalprice
        |       FROM orders WHERE o_totalprice >= lo""".stripMargin)
    s.sql(
      """WITH prio_mean AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / count(*) AS mean_price
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT prio,
        |       CAST(count(*) AS BIGINT) AS n_above_own_mean
        |FROM prio_mean, LATERAL graft_order_slice(mean_price) sl
        |WHERE sl.o_orderpriority = prio
        |GROUP BY prio ORDER BY prio""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_scalar"           -> (udfScalar _),
    "udf_sql_function"     -> (udfSqlFunction _),
    "udf_sql_table_function" -> (udfSqlTableFunction _),
    "udaf_itemset_support" -> (udafItemsetSupport _),
    "udtf_generator"       -> (udtfGenerator _),
  )

  private val txCte =
    """WITH tx AS (
      |  SELECT DISTINCT l_orderkey AS tid, p_brand AS item
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "udf_sql_table_function" ->
      """WITH prio_mean AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / count(*) AS mean_price
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT prio, CAST(count(*) AS BIGINT) AS n_above_own_mean
        |FROM prio_mean JOIN orders
        |  ON o_orderpriority = prio AND o_totalprice >= mean_price
        |GROUP BY prio ORDER BY prio""".stripMargin,

    "udf_sql_function" ->
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
        |            WHEN o_totalprice > 150000 THEN 'mid'
        |            ELSE 'low' END AS tier,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "udf_scalar" ->
      """SELECT l_orderkey,
        |       CAST(count(DISTINCT p_brand) AS BIGINT) AS basket_size,
        |       CAST(1 AS DOUBLE) - CAST(1 AS DOUBLE) / count(DISTINCT p_brand) AS gini
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "udaf_itemset_support" -> (txCte +
      """
        |SELECT item, CAST(count(*) AS BIGINT) AS freq
        |FROM tx GROUP BY item ORDER BY item""".stripMargin),

    "udtf_generator" -> (txCte +
      """
        |SELECT a.tid AS l_orderkey, a.item AS item_a, b.item AS item_b
        |FROM tx a JOIN tx b ON a.tid = b.tid AND a.item < b.item
        |ORDER BY l_orderkey, item_a, item_b""".stripMargin),
  )
}
