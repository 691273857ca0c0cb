package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query runner: runMain graft.CheckOne <sfDir> <name...> — shows result rows. */
object CheckOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Conf.engineDefaults(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Conf.resolveStatePartitions(spark, sfDir)
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $name: ${rows.length} rows in $dt%.2f s")
      rows.take(5).foreach(println)
    }
    spark.stop()
  }
}
