package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregates (SURVEY.md §7.3 "Custom Aggregator" bucket).
  * All are associative + commutative with a proper identity, so they run as
  * ordinary partial/final aggregates — map-side combine and AQE included.
  */
object Aggs {

  /** Greatest common divisor of a column of longs (identity 0) — the reduce
    * step of the reference's tick-size estimator (finmlkit/bar/utils.py:49-81).
    */
  object GcdAgg extends Aggregator[Long, Long, Long] {
    @annotation.tailrec
    private def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = gcd(b, math.abs(a))
    def merge(b1: Long, b2: Long): Long = gcd(b1, b2)
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  lazy val gcdUdaf = udaf(GcdAgg)
  def gcd_agg(c: Column): Column = gcdUdaf(c)
}
