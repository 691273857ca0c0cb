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

  /** POC / HVA / LVA of a volume profile — the reference's greedy
    * two-levels-at-a-time value-area expansion (finmlkit/feature/core/
    * volume.py:277-364), ported faithfully (including the ±2 stride, the
    * -1 "exhausted side" sentinel and the equal-volume dual expansion).
    * The kernel strides over ARRAY POSITIONS of the profile it is given,
    * exactly like the reference: `dense = true` first expands the sparse
    * (level, volume) pairs onto the full [min..max] tick grid (matching
    * `aggregate_footprint`'s dense output, volume.py:185-195);
    * `dense = false` walks the sorted PRESENT levels positionally
    * (matching `bucket_price_levels` output, whose bin midpoints are
    * array-contiguous but not grid-contiguous). Profiles are small
    * (~30 bins bucketed; a few thousand ticks raw), so a collect-and-scan
    * Aggregator is the idiomatic shape (SURVEY.md §7.3).
    */
  class PocHvaLvaAggBase(dense: Boolean)
      extends Aggregator[(Int, Double), Map[Int, Double], (Int, Int, Int)] {
    def zero: Map[Int, Double] = Map.empty
    def reduce(b: Map[Int, Double], a: (Int, Double)): Map[Int, Double] =
      b.updated(a._1, b.getOrElse(a._1, 0.0) + a._2)
    def merge(b1: Map[Int, Double], b2: Map[Int, Double]): Map[Int, Double] =
      b2.foldLeft(b1) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0.0) + v) }
    def finish(m: Map[Int, Double]): (Int, Int, Int) = {
      if (m.isEmpty) return (0, 0, 0)
      val levels =
        if (dense) (m.keys.min to m.keys.max).toArray
        else m.keys.toArray.sorted
      val vols = levels.map(l => m.getOrElse(l, 0.0))
      val n = levels.length
      val total = vols.sum
      var pocIdx = 0
      var i = 1
      while (i < n) { if (vols(i) > vols(pocIdx)) pocIdx = i; i += 1 }
      val vaThr = total * (68.34 / 100.0)
      var cum = vols(pocIdx)
      var hva = levels(pocIdx)
      var lva = levels(pocIdx)
      var up = pocIdx + 1
      var dn = pocIdx - 1
      def upVol(u: Int): Double =
        if (u < n) vols(u) + (if (u + 1 < n) vols(u + 1) else 0.0) else -1.0
      def dnVol(d: Int): Double =
        if (d >= 0) vols(d) + (if (d - 1 >= 0) vols(d - 1) else 0.0) else -1.0
      var cu = if (up < n) upVol(up) else 0.0
      var cd = if (dn >= 0) dnVol(dn) else 0.0
      var guard = 0
      while (cum < vaThr && guard < 2 * n + 4) {
        guard += 1
        if (cu > cd) {
          cum += cu; hva = levels(math.min(up + 1, n - 1)); up += 2; cu = upVol(up)
        } else if (cu < cd) {
          cum += cd; lva = levels(math.max(dn - 1, 0)); dn -= 2; cd = dnVol(dn)
        } else if (cu == cd && cu != -1.0) {
          cum += cu + cd
          hva = levels(math.min(up + 1, n - 1)); lva = levels(math.max(dn - 1, 0))
          up += 2; dn -= 2; cu = upVol(up); cd = dnVol(dn)
        } else {
          guard = Int.MaxValue // both sides exhausted (reference prints BUG)
        }
      }
      (levels(pocIdx), hva, lva)
    }
    def bufferEncoder: Encoder[Map[Int, Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[(Int, Int, Int)] = Encoders.tuple(
      Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaInt)
  }

  object PocHvaLvaAgg extends PocHvaLvaAggBase(true)
  object PocHvaLvaPositionalAgg extends PocHvaLvaAggBase(false)

  lazy val pocUdaf = udaf(PocHvaLvaAgg,
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaDouble))
  lazy val pocPositionalUdaf = udaf(PocHvaLvaPositionalAgg,
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaDouble))
  /** returns struct(_1 = poc, _2 = hva, _3 = lva); dense [min..max] grid */
  def poc_hva_lva(level: Column, vol: Column): Column = pocUdaf(level, vol)
  /** positional variant for bucketed (array-contiguous) profiles */
  def poc_hva_lva_positional(level: Column, vol: Column): Column =
    pocPositionalUdaf(level, vol)
}
