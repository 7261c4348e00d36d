package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Top-k rows per key as a first-class operator.
  *
  * The composable alternative (`row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k`) must fully SORT every key group; this operator
  * keeps a bounded k-element heap per key instead — O(n log k) with
  * memory bounded by (#keys-in-partition x k), no sort buffer, no spill
  * pressure from cold groups. At 100 TB that is the difference between a
  * full shuffle+sort of the fact table and a single clustered exchange.
  *
  * Demonstrates the full custom-operator stack: LogicalPlan node ->
  * SparkStrategy -> SparkPlan, registered either via
  * `GraftExtensions` (SparkSessionExtensions) or lazily through
  * `spark.experimental.extraStrategies` (see TopK.perKey).
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan)
    extends UnaryNode {
  // Carrying resolved Attributes (not ColumnNode placeholders — see
  // TopK.perKey) keeps `references` accurate, so ColumnPruning cannot
  // strip the key/order columns from the child.
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  // Two-phase like partial aggregation: a map-side partial top-k bounds
  // what crosses the exchange at (#keys-in-partition x k) rows instead of
  // the full input — the difference between shuffling every scored row
  // and shuffling candidates only. Top-k is a semilattice, so
  // partial-then-final is exact.
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order,
        TopKPerKeyExec(k, keys, order, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean = false)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Final phase asks the planner to cluster by key (Spark inserts the
    * single hash exchange); the partial phase runs on whatever
    * partitioning the child already has.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap of the kept set: peek = currently-worst kept row
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      val hIt = heaps.values().iterator()
      while (hIt.hasNext) {
        val heap = hIt.next()
        val arr = new Array[InternalRow](heap.size())
        var i = arr.length - 1
        while (!heap.isEmpty) { arr(i) = heap.poll(); i -= 1 } // drain worst-first
        out ++= arr
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

/** User-facing API. */
object TopK {

  /** Top `k` rows per `keyNames` group, ranked by `orderSpec` —
    * (columnName, descending?) pairs; append a unique tiebreaker for
    * deterministic output.
    */
  def perKey(df: DataFrame, keyNames: Seq[String], orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    // Resolve names against the analyzed child NOW: real Attributes (with
    // exprIds) survive optimizer rewrites; Spark 4 Column objects would
    // only carry unresolvable ColumnNode placeholders into a custom node.
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => a.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"TopKPerKey: column $n not in ${analyzed.output.map(_.name)}"))
    val order = orderSpec.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(spark, TopKPerKey(k, keyNames.map(attr), order, analyzed))
  }
}
