package graft

import graft.bars.TimeBars
import graft.ml.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the operators whose refactors carry the most
  * silent-corruption risk: result must be independent of physical knobs
  * (block count, partitioning) and equal to a sequential reference.
  * Seeds are fixed — failures reproduce deterministically.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("nearDupPairs: pair set invariant under block count (random vectors)") {
    for (seed <- Seq(1L, 42L, 777L)) {
      val rnd = new scala.util.Random(seed)
      val n = 10 + rnd.nextInt(50)
      val dim = 8
      val rows = (0 until n).map { i =>
        (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
      }
      val e = rows.toDF("vec_id", "embedding")
      def pairs(blockRows: Int) =
        Similarity.nearDupPairs(e, "vec_id", "embedding", 0.5, blockRows)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            math.round(r.getDouble(2) * 1e9))).toSet
      val whole = pairs(1000)
      assert(pairs(5) == whole, s"seed=$seed blockRows=5")
      assert(pairs(13) == whole, s"seed=$seed blockRows=13")
    }
  }

  test("weighted-median resample equals the sequential reference (random weights)") {
    for (seed <- 1L to 8L) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(20)
      val sizes = Seq.fill(n)(math.rint(rnd.nextDouble() * 100) / 10.0)
      val weights = Seq.fill(n)(1L + rnd.nextInt(9))
      val bars = sizes.zip(weights).zipWithIndex.map { case ((sz, w), i) =>
        ((i + 1).toLong * 600000000000L, 1.0, 1.0, 1.0, 1.0, 1.0, w, sz, 1.0)
      }.toDF("bar_ts", "open", "high", "low", "close", "volume", "trades",
        "median_trade_size", "vwap")
      // all bars land in one coarse bucket when toSec covers the span
      val got = TimeBars.resample(bars, 600, 600 * 32)
        .select("median_trade_size").head().getDouble(0)
      // numpy-style reference: stable sort by size, cum weights, cutoff at
      // half the total, searchsorted side='left'
      val sorted = sizes.zip(weights).sortBy(_._1)
      val cum = sorted.map(_._2.toDouble).scanLeft(0.0)(_ + _).tail
      val cutoff = cum.last * 0.5
      val exp = sorted(cum.indexWhere(_ >= cutoff))._1
      assert(got == exp, s"seed=$seed sizes=$sizes weights=$weights")
    }
  }

  test("two-pass OHLCV equals struct-keyed argmin/argmax (random equal-ts ties)") {
    for (seed <- Seq(3L, 99L, 2026L)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(200)
      val t = (0 until n).map { i =>
        // heavy ts collisions: many trades share each second
        (1000000000L * (1 + rnd.nextInt(20)), i.toLong,
          90.0 + rnd.nextInt(2000) / 100.0, 1.0)
      }.toDF("ts", "id", "price", "qty")
      val got = TimeBars.ohlcv(t, 10, fillEmpty = false)
        .select("bar_ts", "open", "close").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      val ref = t.withColumn("bar_ts", expr("((ts + 9999999999L) div 10000000000L) * 10000000000L"))
        .groupBy("bar_ts").agg(
          min_by(col("price"), struct(col("ts"), col("id"))).as("open"),
          max_by(col("price"), struct(col("ts"), col("id"))).as("close"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == ref, s"seed=$seed")
    }
  }
}
