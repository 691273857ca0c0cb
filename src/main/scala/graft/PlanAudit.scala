package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every SparkEntry query's physical plan for scale
  * anti-patterns. Not part of the driver contract — run with
  * `sbt "runMain graft.PlanAudit <sfDir>"`.
  *
  * An UNconditioned BroadcastNestedLoopJoin is the sanctioned 1-row
  * scalar-broadcast crossJoin (global max ts / θ threshold / GCD scale) —
  * O(n·1), fine at any scale. A CONDITIONED one is a range-predicate join
  * Spark couldn't turn into an equi-join — O(n·m), flagged.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A BNLJ is sanctioned only as the scalar crossJoin(broadcast(1-row
    // agg)) pattern: Cross type AND a keyless aggregate somewhere in the
    // BUILD subtree (a pushed filter may still appear as its condition —
    // O(n·1), fine). Non-Cross types, or a Cross against anything that is
    // not a scalar aggregate, are O(n·m) — flagged. Checked on the actual
    // physical tree (descending through AQE wrappers and cached plans): a
    // string-window scan misjudges build sides that print far below a
    // deeply nested streamed subtree.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.catalyst.plans.Cross
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case other => other.children
    }
    def anyNode(p: SparkPlan)(f: SparkPlan => Boolean): Boolean =
      f(p) || kids(p).exists(anyNode(_)(f))
    def scalarAgg(p: SparkPlan): Boolean = anyNode(p) {
      case h: HashAggregateExec       => h.groupingExpressions.isEmpty
      case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
      case s: SortAggregateExec       => s.groupingExpressions.isEmpty
      case _ => false
    }
    def badBnlj(plan: SparkPlan): Boolean = anyNode(plan) {
      case b: BroadcastNestedLoopJoinExec =>
        val build = b.buildSide match {
          case BuildRight => b.right
          case BuildLeft  => b.left
        }
        b.joinType != Cross || !scalarAgg(build)
      case _ => false
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val physical = fn(spark, sfDir).queryExecution.executedPlan
        val plan = physical.toString
        val hits = Seq(
          if (badBnlj(physical)) Some("non-scalar-BNLJ") else None,
          if (plan.contains("CartesianProduct")) Some("CartesianProduct") else None,
          if (plan.contains("SortAggregate")) Some("SortAggregate") else None).flatten
        println(s"AUDIT $name: ${if (hits.isEmpty) "clean" else hits.mkString(",")}")
      } catch {
        case e: Throwable => println(s"AUDIT $name: ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
