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
        // total attributed volume in EXACT integer micro-units: qty sits on
        // a ≤6-decimal grid, so round(qty·1e6) recovers the true integer
        // per trade and the decimal sum is exact at any scale. summary()
        // computes COT/vwap/skew/gini from this column with ZERO per-row
        // double→decimal rounding — the r7 knife-edge class (an arbitrary
        // double landing on a 5e-7 cast boundary where the two engines'
        // rounding modes can fork) is eliminated, not just narrowed.
        sum(when(col("side") =!= 0, round(col("qty") * 1e6)).otherwise(0.0)
          .cast("decimal(20,0)")).as("total_vol_u"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("buy_ticks"),
        sum(when(col("side") === -1, 1L).otherwise(0L)).as("sell_ticks"))
    withImbalanceFlags(fp, imbalanceFactor, partCols)
  }

  /** Diagonal imbalance flags over a FINISHED (bar, level) grid — the tail
    * of [[build]], shared with the streaming path: footprintStream finalizes
    * the per-level sums under the watermark, and this post-finalize batch
    * step adds the neighbor-dependent flags (they need lead/lag over the
    * completed grid, so they cannot ride the streaming agg itself).
    */
  def withImbalanceFlags(fp: DataFrame, imbalanceFactor: Double = 3.0,
                         partCols: Seq[String] = Nil): DataFrame = {
    val barKeys = partCols :+ "bar_ts"
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
    *
    * EXACT integer arithmetic end-to-end (r8, closing the driver's one red
    * gate): every sum runs over `total_vol_u` — the per-level volume in
    * integer micro-units from [[build]] — in decimal(38,0), so A = Σ lvl·v,
    * B = Σ v, C = Σ v² are exact integers on BOTH engines (HUGEINT on the
    * oracle). The ratios become a fixed, finite sequence of correctly-
    * rounded IEEE double ops on identical integers:
    *   vwap = A/B, vp_skew = (A − vwap·B)/B, vp_gini = 1 − C/B²
    * (vp_skew via the algebraic identity Σ(lvl−vwap)·v = A − vwap·B — the
    * r7 formulation summed per-row (lvl−vwap)·v doubles through a
    * decimal(18,6) cast, and that per-row rounding of an ARBITRARY double
    * is where Spark's HALF_UP and DuckDB's cast rounding forked on one
    * sf0.01 row). COT compares v against max(v) in exact integers.
    */
  def summary(footprint: DataFrame, partCols: Seq[String] = Nil): DataFrame = {
    // Single pass: the per-bar scalars the join-branch formulation derived by
    // re-joining (POC volume, island run lengths) ride window columns
    // alongside each row, and ONE groupBy folds everything — the branchy
    // version recomputed the whole upstream footprint per branch (×4).
    val barKeys = partCols :+ "bar_ts"
    val wl = Window.partitionBy(barKeys.map(col): _*).orderBy("level")
    val bar = Window.partitionBy(barKeys.map(col): _*)
    val sgn = when(col("buy_imbalance"), 1).when(col("sell_imbalance"), -1).otherwise(0)
    val f = footprint
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
      .withColumn("__maxu", max("total_vol_u").over(bar))
      .withColumn("__runlen", count(lit(1)).over(runW))
      .withColumn("__runstart", min("level").over(runW))
    // island priority packed into ONE long (len desc, start_level asc) so the
    // best-run argmax stays a fixed-width max_by (no struct key, no sort agg)
    val islandKey = when(col("sgn") =!= 0,
      col("__runlen") * lit(4294967296L) + (lit(2147483647L) - col("__runstart")))
    // exact integer aggregates: decimal(38,0) sums of micro-unit volumes.
    // lvl·v ≤ decimal(31,0), v² ≤ decimal(38,0) — exact below 10^38, i.e.
    // any physical corpus (v ≈ 10^13 micro-units per level at 100 TB).
    val vA = sum(col("level") * col("total_vol_u"))
    val vB = sum(col("total_vol_u"))
    val vC = sum(col("total_vol_u") * col("total_vol_u"))
    // try_divide: a keyed bar whose trades are ALL pre-first-tick (side 0,
    // so zero attributed volume) has B = 0 and would throw under ANSI; the
    // NULL propagates to vp_skew/vp_gini, matching the oracle's NaN→NULL
    val vwap = try_divide(vA.cast("double"), vB.cast("double"))
    f2.groupBy(barKeys.map(col): _*).agg(
      sum(col("buy_imbalance").cast("long")).as("buy_imbalances_sum"),
      sum(col("sell_imbalance").cast("long")).as("sell_imbalances_sum"),
      min(when(col("total_vol_u") === col("__maxu"), col("level"))).as("cot_price_level"),
      coalesce(max_by(col("__runlen") * col("sgn"), islandKey), lit(0L))
        .as("imb_max_run_signed"),
      // vp_skew: Σ(level − vwap)·vol / Σvol — two-pass like the reference
      // (algebraically ~0; kept for parity, see base.py:836-843), computed
      // as (A − vwap·B)/B on exact integers (micro-units cancel).
      try_divide(vA.cast("double") - vwap * vB.cast("double"), vB.cast("double"))
        .as("vp_skew"),
      (lit(1.0) - try_divide(vC.cast("double"),
        vB.cast("double") * vB.cast("double"))).as("vp_gini"))
  }
}
