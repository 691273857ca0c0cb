package graft.features

import graft.functions.Aggs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Volume-profile operators (finmlkit/feature/core/volume.py) over the
  * exploded footprint table: profile aggregation across a bar set, POC,
  * %-above-POC, greedy value area (HVA/LVA), rolling and anchored
  * (developing) variants.
  *
  * All variants reduce to: select the contributing (bar, level, volume)
  * rows, groupBy(key, level) to a profile, then per-key profile stats — the
  * reference's per-window Numba loops (volume.py:393-456) become one shuffle
  * each, which parallelizes the rolling case trivially.
  */
object VolumeProfile {

  /** Profile aggregation over an arbitrary key: (key, level) total volume —
    * `aggregate_footprint` (volume.py:133-203) generalized.
    */
  /** Decimal-exact volume aggregation (Q.dsum): profile volumes feed POC
    * argmax / value-area equality logic, where double summation's
    * addition-order ulp noise flips picks between engines (and between
    * re-evaluations of the same SQL) — measured at sf0.1. Exact to 6
    * decimals up to 10^12.
    */
  private def vsum(c: Column): Column = graft.queries.Q.dsum(c)

  def profile(footprint: DataFrame, key: Column, keyName: String): DataFrame =
    footprint
      .groupBy(key.as(keyName), col("level"))
      .agg(vsum(col("buy_volume") + col("sell_volume")).as("volume"))

  /** Re-bin levels into ~nBuckets odd-width integer buckets with midpoint
    * labels — `bucket_price_levels` (volume.py:206-274).
    */
  def bucket(profile: DataFrame, keyName: String, nBuckets: Int = 30): DataFrame = {
    val kw = Window.partitionBy(keyName)
    val p = profile
      .withColumn("__lo", min("level").over(kw))
      .withColumn("__n", max("level").over(kw) - col("__lo") + 1)
      .withColumn("__size", {
        val raw = greatest(round(col("__n") / nBuckets).cast("int"), lit(1))
        when(raw % 2 === 0, raw + 1).otherwise(raw)
      })
    p.groupBy(col(keyName),
        (col("__lo") + ((col("level") - col("__lo")) / col("__size")).cast("int") * col("__size")
          + (col("__size") / 2).cast("int")).as("level"))
      .agg(vsum(col("volume")).as("volume"))
  }

  /** POC (argmax volume, lowest level on ties) + % of volume strictly above
    * it (`calc_volume_percentage_above_poc`, volume.py:367-390).
    */
  def pocStats(profile: DataFrame, keyName: String): DataFrame = {
    // Single pass: a window computes the per-key POC (argmax volume, lowest
    // level on ties) alongside each row, and the groupBy reuses the window's
    // hash partitioning — one shuffle total. The join-back formulation
    // recomputed the whole upstream profile pipeline per join branch.
    val w = Window.partitionBy(keyName)
      .orderBy(col("volume").desc, col("level").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    profile
      .withColumn("poc_level", first("level").over(w))
      .groupBy(keyName, "poc_level")
      .agg(
        (vsum(when(col("level") > col("poc_level"), col("volume")).otherwise(0.0)) /
          vsum(col("volume"))).as("pct_above_poc"),
        vsum(col("volume")).as("total_volume"))
  }

  /** Full value area via the greedy Aggregator (volume.py:277-364).
    * `dense = true` for raw tick profiles (mirrors aggregate_footprint's
    * dense grid); `dense = false` for bucketed profiles, whose bin
    * midpoints are array-contiguous but not grid-contiguous.
    */
  def valueArea(profile: DataFrame, keyName: String,
                dense: Boolean = true): DataFrame =
    profile.groupBy(keyName)
      .agg((if (dense) Aggs.poc_hva_lva(col("level"), col("volume"))
            else Aggs.poc_hva_lva_positional(col("level"), col("volume"))).as("va"))
      .select(col(keyName), col("va._1").as("poc_level"),
        col("va._2").as("hva_level"), col("va._3").as("lva_level"))

  /** Rolling profile: for each target bar, the profile of bars in
    * (target − windowBars, target] — `volume_profile_rolling`
    * (volume.py:393-456) with a bar-count window on the time grid.
    */
  def rolling(footprint: DataFrame, intervalSec: Long, windowBars: Int): DataFrame = {
    val iv = intervalSec * 1000000000L
    // Each footprint row contributes to exactly `windowBars` targets on the
    // bar grid: explode that target list per row and equi-join against the
    // set of real bars. A pure range predicate here would be a
    // BroadcastNestedLoopJoin — O(targets × rows) at scale; the explode is
    // O(rows × windowBars) map-side work feeding an equi shuffle instead.
    // Assumes bar_ts sits on the intervalSec grid (true for TimeBars output).
    val targets = footprint.select(col("bar_ts").as("target_ts")).distinct()
    val exploded = footprint.select(
      explode(sequence(col("bar_ts"),
        col("bar_ts") + lit((windowBars - 1).toLong * iv), lit(iv))).as("target_ts"),
      col("level"), (col("buy_volume") + col("sell_volume")).as("v"))
    exploded.join(targets, "target_ts") // drop phantom targets past the last bar / in gaps
      .groupBy(col("target_ts"), col("level"))
      .agg(vsum(col("v")).as("volume"))
  }

  /** Anchored (developing) profile within each UTC day — cumulative
    * profile up to each bar (`volume_profile_developing`, volume.py:462-569).
    */
  def developing(footprint: DataFrame): DataFrame = {
    val day = expr("bar_ts div 86400000000000")
    val f = footprint.withColumn("day", day)
    val targets = f.select(col("day").as("tday"), col("bar_ts").as("target_ts")).distinct()
    val contrib = targets.join(f,
      col("day") === col("tday") && col("bar_ts") <= col("target_ts"))
    contrib.groupBy(col("target_ts"), col("level"))
      .agg(vsum(col("buy_volume") + col("sell_volume")).as("volume"))
  }
}
