package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity
/** Ad-hoc: print per-query ANN recall stats for the IVF variants. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def stats(name: String, approx: Array[(Long, Long)]): Unit = {
      val a = approx.toSet
      val rec = brute.groupBy(_._1).map { case (qid, ps) =>
        ps.count(a.contains).toDouble / ps.length }
      println(f"== $name min=${rec.min}%.3f mean=${rec.sum / rec.size}%.3f")
    }
    val stub = Similarity.ivfTopK(q, e, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    stats("ivf_stub", stub)
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", 32, iters = 5)
    val km = Similarity.ivfTopK(q, e, "vec_id", "embedding", 5, nprobe = 16, centroids = cents)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    stats("ivf_km", km)
    spark.stop()
  }
}
