package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Contract tests for [[graft.catalog.GraftCatalog]]: namespace/table
  * discovery over the testdata tree, SQL through the catalog equal to
  * path-based reads for both the parquet star schema and a `.fimi`
  * transaction-text table, read-only enforcement, and cache
  * invalidation picking up an external rewrite. */
class GraftCatalogSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", "/root/testdata")
  }

  test("namespaces and tables list from the directory tree") {
    // SHOW NAMESPACES backticks names containing dots
    val ns = spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0).stripPrefix("`").stripSuffix("`")).sorted.toSeq
    assert(ns.contains("sf0.001") && ns.contains("sf0.01"), ns.toString)
    val tables = spark.sql("SHOW TABLES IN graft.`sf0.001`")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(tables == Tables.names.sorted, tables.toString)
  }

  test("catalog parquet scan ≡ path-based read, with pushdown intact") {
    val viaCatalog = spark.sql(
      "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM graft.`sf0.001`.lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaPath = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaCatalog == viaPath)
    // the delegated parquet table still pushes filters to the scan
    val plan = spark.sql(
      "SELECT l_orderkey FROM graft.`sf0.001`.lineitem WHERE l_quantity > 40")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      plan.take(2000))
  }

  test("a .fimi directory resolves to the connector table through the same catalog") {
    val root = Files.createTempDirectory("graft-cat").toString
    Files.createDirectories(java.nio.file.Paths.get(root, "corpus", "tx.fimi"))
    Files.write(java.nio.file.Paths.get(root, "corpus", "tx.fimi", "a.dat"),
      "x y\ny z\nx y z\n".getBytes("UTF-8"))
    spark.conf.set("spark.sql.catalog.graft2", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft2.root", root)
    val freq = spark.sql(
      "SELECT item, CAST(count(*) AS BIGINT) AS freq FROM " +
        "(SELECT explode(items) AS item FROM graft2.corpus.tx) " +
        "GROUP BY item ORDER BY item")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(freq == Seq(("x", 2L), ("y", 3L), ("z", 2L)))
  }

  test("the catalog is read-only; invalidateTable picks up an external rewrite") {
    val e = intercept[Exception] {
      spark.sql("DROP TABLE graft.`sf0.001`.lineitem")
    }
    assert(e.getMessage.contains("read-only") ||
      e.getCause != null && e.getCause.getMessage.contains("read-only"),
      e.getMessage)
    // external rewrite of a .fimi table becomes visible after invalidate
    val root = Files.createTempDirectory("graft-cat-inv").toString
    val dir = java.nio.file.Paths.get(root, "ns", "t.fimi")
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.dat"), "p q\n".getBytes("UTF-8"))
    spark.conf.set("spark.sql.catalog.graft3", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft3.root", root)
    assert(spark.sql("SELECT * FROM graft3.ns.t").count() == 1)
    Files.write(dir.resolve("b.dat"), "r s\n".getBytes("UTF-8"))
    // the connector lists files at scan planning, so new files appear
    // without invalidation; REFRESH TABLE must also succeed (it routes
    // to invalidateTable) and the count stays correct after it
    spark.sql("REFRESH TABLE graft3.ns.t")
    assert(spark.sql("SELECT * FROM graft3.ns.t").count() == 2)
  }
}
