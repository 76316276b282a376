package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator extension — the (c) tier of SURVEY §4.3: a
  * logical node, a planner strategy, and a physical operator, exposed
  * through `TopK.perGroup` and registered via
  * `spark.experimental.extraStrategies` (public hook) or
  * `GraftExtensions.injectPlannerStrategy`.
  *
  * Semantics: the top `k` rows of each group under `order` (a strict
  * total order — callers include a tiebreak column for determinism).
  *
  * Why a custom operator: the built-in formulation
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`) SORTS every
  * group in full — O(n log n) per group and the whole group's rows pass
  * through the sort buffer. [[TopKPerGroupExec]] keeps a bounded k-row
  * heap per group in one pass — O(n log k), memory O(groups·k) per
  * partition — the aggregate-like shape that survives fat groups at
  * 100 TB. Like partial aggregation, the strategy plans a map-side
  * PARTIAL heap pass before the exchange (top-k is decomposable:
  * top-k(∪ partitions) = top-k(∪ per-partition top-k)), so the rows
  * shuffled drop from O(n) to O(partitions·groups·k).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Physical operator: hash of bounded per-group heaps. The FINAL pass
  * declares `ClusteredDistribution(groupExprs)` so EnsureRequirements
  * inserts the single hash exchange; the PARTIAL pass (planned below
  * it, same operator with `partial = true`) accepts any distribution
  * and bounds what that exchange carries.
  *
  * Memory bound: the group map is O(groups-in-partition · k) rows. The
  * PARTIAL pass caps it at `flushThreshold` groups — on overflow it
  * FLUSHES the map downstream and starts fresh (exactly how partial
  * hash aggregation degrades: duplicate group keys across flushes are
  * fine because the final pass re-merges; the pass stays a strict
  * row-count reducer, it just stops being a perfect one under extreme
  * map-side cardinality). The FINAL pass cannot flush (it must emit
  * exactly k per group), but after the hash exchange its map holds at
  * most its own input ÷ (maps · k) groups — the partial pass already
  * bounded each group's shuffled rows to maps · k, so final-map memory
  * is strictly smaller than the partition's shuffled input, the same
  * envelope HashAggregateExec's in-memory map assumes before spilling.
  * Tune `spark.graft.topk.flushThreshold` (default 1<<17 groups) so
  * flushThreshold · k rows fit comfortably per task. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    flushThreshold: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  // Row-FILTERING operator: every output row stays in the partition it
  // arrived in, so the child's partitioning (for the final pass, the
  // group-hash exchange EnsureRequirements inserted) flows through.
  // Without this the default UnknownPartitioning forces any downstream
  // operator clustered on the same group keys — e.g. llm_source_cap's
  // rank window over `source` — to re-shuffle rows the exchange below
  // already clustered.
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprsLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    val partialLocal = partial
    val flushLocal = flushThreshold
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ord = RowOrdering.create(orderLocal, childOutput)
      // LAZY INTERLEAVED drain: a flushed map's rows are handed to the
      // consumer BEFORE more input is read (not chained into an iterator
      // that only materializes after the whole partition is consumed —
      // that shape silently kept every flushed heap reachable and made
      // the documented O(flushThreshold·k) memory bound false). Live
      // memory is ≤ the map being built + the map being drained.
      new Iterator[InternalRow] {
        // PriorityQueue dequeues its Ordering's maximum = the WORST kept
        // row under `ord` (ord.compare < 0 = sorts first = better).
        private var heaps =
          mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        private var pending: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false

        private def drain(
            m: mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]])
            : Iterator[InternalRow] =
          m.iterator.flatMap { case (_, pq) => pq.dequeueAll.reverseIterator }

        private def fill(): Unit = {
          while (!pending.hasNext && !inputDone) {
            if (it.hasNext) {
              val row = it.next()
              val key = keyProj(row)
              heaps.get(key) match {
                case None =>
                  if (partialLocal && heaps.size >= flushLocal) {
                    // overflow: emit the full map downstream and start
                    // fresh — correct for the partial pass only (the
                    // final pass re-merges duplicate group keys)
                    val old = heaps
                    heaps = mutable.LinkedHashMap.empty
                    pending = drain(old)
                  }
                  val pq = mutable.PriorityQueue.empty[InternalRow](ord)
                  pq.enqueue(row.copy())
                  heaps.put(key.copy(), pq)
                case Some(pq) =>
                  if (pq.size < kLocal) pq.enqueue(row.copy())
                  else if (ord.compare(row, pq.head) < 0) {
                    pq.dequeue(); pq.enqueue(row.copy())
                  }
              }
            } else {
              inputDone = true
              pending = drain(heaps)
            }
          }
        }

        override def hasNext: Boolean = { fill(); pending.hasNext }
        override def next(): InternalRow = { fill(); pending.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner rule mapping the logical node to its physical operator. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val flush = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.flushThreshold", (1 << 17).toString).toInt
      TopKPerGroupExec(g, o, k, partial = false, flush,
        TopKPerGroupExec(g, o, k, partial = true, flush, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Idempotent registration through the PUBLIC experimental hook. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }

  /** Top `k` rows per group of `df`. `order` is (column, ascending?)
    * pairs and must form a strict total order (include a tiebreak) for
    * deterministic output. Attributes are resolved by name against the
    * analyzed child, so the node enters the planner fully resolved. */
  def perGroup(df: DataFrame, group: Seq[String],
               order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k >= 1, s"TopK.perGroup needs k >= 1, got $k")
    require(group.nonEmpty,
      "TopK.perGroup needs at least one group column (for a global " +
        "top-k use orderBy(...).limit(k) — TakeOrderedAndProject)")
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    // resolve like the rest of the session (case-insensitive unless
    // spark.sql.caseSensitive), and REFUSE ambiguity instead of silently
    // binding the first of two same-named post-join columns
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute = {
      val hits = analyzed.output.filter(a => resolver(a.name, name))
      require(hits.length == 1,
        if (hits.isEmpty)
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"
        else s"column $name is ambiguous: ${hits.mkString(", ")}")
      hits.head
    }
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      TopKPerGroup(group.map(attr), sortOrder, k, analyzed))
  }
}
