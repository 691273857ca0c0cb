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
    // agg)) pattern: Cross type AND a keyless HashAggregate in the nearby
    // build subtree (a pushed filter may still appear as its condition —
    // O(n·1), fine). Non-Cross types, or a Cross against anything that is
    // not a scalar aggregate, are O(n·m) — flagged.
    val crossType = """BroadcastNestedLoopJoin\s+\w+,\s+Cross""".r
    def badBnlj(plan: String): Boolean = {
      val lines = plan.split("\n")
      lines.zipWithIndex.exists { case (l, i) =>
        l.contains("BroadcastNestedLoopJoin") && {
          val near = lines.slice(i, math.min(i + 15, lines.length))
          val scalarBuild = near.exists(_.contains("HashAggregate(keys=[]"))
          crossType.findFirstIn(l).isEmpty || !scalarBuild
        }
      }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = Seq(
          if (badBnlj(plan)) Some("non-scalar-BNLJ") else None,
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
