package graft

import graft.operators.Relational

/** Physical-plan assertions (SURVEY.md §4.2): the declarative queries must
  * actually produce the scale-correct plans — pushdown reaching parquet,
  * broadcast vs shuffle-merge join selection, top-k instead of full sort. */
class RelationalSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("filter predicate is pushed down to the parquet scan") {
    val plan = Relational.relFilterPred(spark, sf).queryExecution
      .sparkPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate"),
      s"no pushdown in:\n$plan")
  }

  test("scan-project prunes columns at the reader") {
    val plan = Relational.relScanProject(spark, sf).queryExecution
      .sparkPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"))
    assert(!plan.contains("l_shipdate"), "projection not pruned")
  }

  test("dimension join is a broadcast hash join") {
    assert(planOf(Relational.relJoinBroadcast(spark, sf))
      .contains("BroadcastHashJoin"))
  }

  test("fact-fact join is a sort-merge join") {
    assert(planOf(Relational.relJoinSortmerge(spark, sf))
      .contains("SortMergeJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject") {
    val plan = Relational.relSortLimit(spark, sf).queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"full sort in:\n$plan")
  }

  test("set ops: except and intersect branches are disjoint by construction") {
    val rows = Relational.relSetOps(spark, sf).collect()
    val byTag = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val ex = byTag.getOrElse("except", Set.empty)
    val in = byTag.getOrElse("intersect", Set.empty)
    assert(ex.intersect(in).isEmpty && (ex.nonEmpty || in.nonEmpty))
  }
}
