package graft.bars

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-flow footprints (finmlkit/bar/base.py:615-850) in exploded
  * relational form: one row per (bar, integer tick-unit price level).
  *
  * The reference builds a dense [low..high] level grid per bar inside a
  * serial Numba kernel (its own TODO notes it cannot parallelize,
  * base.py:616). Exploded + groupBy(bar, level) shuffles and parallelizes
  * naturally — the zero-volume grid rows are not materialized; everywhere
  * their absence matters (diagonal neighbors, run breaks) the logic accounts
  * for level gaps explicitly, so results are identical to the dense kernel.
  */
object Footprints {

  /** Exploded footprint with diagonal bid-ask imbalance flags.
    *
    * Imbalance semantics (base.py:795-798): ascending-level table;
    * sell_imb[l] = sell[l] > buy[l+1]·k (all but the bar's top level),
    * buy_imb[l]  = buy[l]  > sell[l−1]·k (all but the bar's bottom level).
    * Missing neighbor levels are zero-volume, so a lag/lead guarded by
    * level-adjacency reproduces the dense grid exactly.
    *
    * `partCols` prepends grouping keys (e.g. symbol) to every grouping and
    * window — the multi-symbol store layout: each (symbol, bar) footprint
    * is independent, so the whole build shuffles once on (partCols, bar_ts)
    * and parallelizes across symbols at any scale.
    */
  def build(tradesWithSide: DataFrame, intervalSec: Long, tickSize: Double,
            imbalanceFactor: Double = 3.0,
            partCols: Seq[String] = Nil): DataFrame = {
    val iv = intervalSec * 1000000000L
    val barKeys = partCols :+ "bar_ts"
    val fp = tradesWithSide
      .withColumn("bar_ts", TimeBars.barTs(iv))
      .withColumn("level", round(col("price") / tickSize).cast("int"))
      .groupBy((barKeys :+ "level").map(col): _*)
      .agg(
        // decimal-exact volume sums (Q.dsum shape): double summation is
        // ADDITION-ORDER-VARIANT, and these volumes feed argmax/equality
        // logic downstream (POC, COT, value area) — at sf0.1 the ulp noise
        // flipped POC picks between engines and even between DuckDB CTE
        // re-evaluations. decimal(18,6) accumulation is exact for
        // 6-decimal quantities up to 10^12, then one cast back to double.
        graft.queries.Q.dsum(when(col("side") === 1, col("qty")).otherwise(0.0))
          .as("buy_volume"),
        graft.queries.Q.dsum(when(col("side") === -1, col("qty")).otherwise(0.0))
          .as("sell_volume"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("buy_ticks"),
        sum(when(col("side") === -1, 1L).otherwise(0L)).as("sell_ticks"))
    val wl = Window.partitionBy(barKeys.map(col): _*).orderBy("level")
    val bar = Window.partitionBy(barKeys.map(col): _*)
    val buyUp = when(lead("level", 1).over(wl) === col("level") + 1,
      lead("buy_volume", 1).over(wl)).otherwise(0.0)
    val sellDn = when(lag("level", 1).over(wl) === col("level") - 1,
      lag("sell_volume", 1).over(wl)).otherwise(0.0)
    fp
      .withColumn("sell_imbalance",
        col("level") < max("level").over(bar) &&
        col("sell_volume") > buyUp * imbalanceFactor)
      .withColumn("buy_imbalance",
        col("level") > min("level").over(bar) &&
        col("buy_volume") > sellDn * imbalanceFactor)
  }

  /** Per-bar footprint summary: imbalance counts, COT level (argmax total
    * volume, first-lowest on ties like np.argmax), longest signed imbalance
    * run (level gaps break runs — gap levels carry sign 0 on the dense
    * grid), vp_skew and vp_gini (base.py:800-848).
    */
  def summary(footprint: DataFrame, partCols: Seq[String] = Nil): DataFrame = {
    // Single pass: the per-bar scalars the join-branch formulation derived by
    // re-joining (POC volume, vwap, island run lengths) ride window columns
    // alongside each row, and ONE groupBy folds everything — the branchy
    // version recomputed the whole upstream footprint per branch (×4).
    val barKeys = partCols :+ "bar_ts"
    val wl = Window.partitionBy(barKeys.map(col): _*).orderBy("level")
    val bar = Window.partitionBy(barKeys.map(col): _*)
    val sgn = when(col("buy_imbalance"), 1).when(col("sell_imbalance"), -1).otherwise(0)
    val f = footprint
      .withColumn("total_volume", col("buy_volume") + col("sell_volume"))
      .withColumn("sgn", sgn)
      .withColumn("brk",
        when(col("sgn") === 0, 1)
          .when(lag("sgn", 1).over(wl).isNull, 1)
          .when(col("sgn") =!= lag("sgn", 1).over(wl), 1)
          .when(col("level") =!= lag("level", 1).over(wl) + 1, 1)
          .otherwise(0))
      .withColumn("grp", sum("brk").over(wl.rowsBetween(Window.unboundedPreceding, 0)))
    val runW = Window.partitionBy((barKeys :+ "grp").map(col): _*)
    val f2 = f
      .withColumn("__maxv", max("total_volume").over(bar))
      // try_divide: a keyed bar whose trades are ALL pre-first-tick (side 0,
      // so zero attributed volume) would otherwise throw under ANSI; the
      // NULL propagates to vp_skew/vp_gini, matching the oracle's NaN→NULL
      // decimal-exact window sums (Q.dsum shape, spelled out because the
      // window attaches to the sum BEFORE the cast back to double):
      // level·volume and volume sit on the qty grid, and the vwap feeds
      // skew whose r6 output landed on a half-boundary at sf0.1
      .withColumn("__vwap", try_divide(
        sum((col("level") * col("total_volume")).cast("decimal(18,6)"))
          .over(bar).cast("double"),
        sum(col("total_volume").cast("decimal(18,6)")).over(bar).cast("double")))
      .withColumn("__runlen", count(lit(1)).over(runW))
      .withColumn("__runstart", min("level").over(runW))
    // island priority packed into ONE long (len desc, start_level asc) so the
    // best-run argmax stays a fixed-width max_by (no struct key, no sort agg)
    val islandKey = when(col("sgn") =!= 0,
      col("__runlen") * lit(4294967296L) + (lit(2147483647L) - col("__runstart")))
    f2.groupBy(barKeys.map(col): _*).agg(
      sum(col("buy_imbalance").cast("long")).as("buy_imbalances_sum"),
      sum(col("sell_imbalance").cast("long")).as("sell_imbalances_sum"),
      min(when(col("total_volume") === col("__maxv"), col("level"))).as("cot_price_level"),
      coalesce(max_by(col("__runlen") * col("sgn"), islandKey), lit(0L))
        .as("imb_max_run_signed"),
      // vp_skew: Σ(level − vwap)·vol / Σvol — two-pass like the reference
      // (algebraically ~0; kept for parity, see base.py:836-843).
      // decimal-exact sums throughout: gini's double-sum ratio landed
      // exactly on an r6 half-boundary at sf0.1
      try_divide(
        graft.queries.Q.dsum((col("level") - col("__vwap")) * col("total_volume")),
        graft.queries.Q.dsum(col("total_volume"))).as("vp_skew"),
      (lit(1.0) - try_divide(
        graft.queries.Q.dsum(col("total_volume") * col("total_volume")),
        graft.queries.Q.dsum(col("total_volume")) *
          graft.queries.Q.dsum(col("total_volume")))).as("vp_gini"))
  }
}
