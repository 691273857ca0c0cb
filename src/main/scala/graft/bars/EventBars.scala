package graft.bars

import graft.features.Scan
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-driven bar indexers (tick / volume / dollar / CUSUM) —
  * finmlkit/bar/logic.py. Semantics preserved exactly, including the
  * reference's boundary convention: close-index list starts at row 0, bars
  * are (close[k-1], close[k]] so the very first trade belongs to no bar, and
  * the trailing partial bar is dropped (n_bars = len(closes) − 1).
  *
  * Tick bars reduce to pure arithmetic on row_number (closed-form — stays
  * in whole-stage codegen). Volume/dollar/CUSUM are reset-on-trigger state
  * machines (not mergeable, SURVEY.md §4.3 bucket 2): they run as ordered
  * sequential kernels, parallel across symbols via [[Scan.keyOrdered]].
  */
object EventBars {

  /** Tick bars: a new bar every `threshold` trades (logic.py:54-84).
    * bar_id = rn0 div thr on the 0-based row number; row 0 excluded; the
    * trailing partial bar dropped via max(rn0) check. With `keyCols` the
    * count restarts per symbol and the window shuffles by key instead of
    * single-partitioning the stream.
    */
  def tickBarIds(trades: DataFrame, threshold: Int,
                 keyCols: Seq[String] = Nil): DataFrame =
    trades
      .withColumn("rn0", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy("ts", "id")) - 1)
      .where(col("rn0") >= 1)
      .withColumn("bar_id", expr(s"rn0 div $threshold"))

  /** OHLCV over explicit bar ids; close ts = last trade's ts. Fixed-width
    * two-pass aggregation (see TimeBars.ohlcvTwoPass) — no SortAggregate.
    * With `keyCols` (per-symbol bar_id sequences restart at 0) the group
    * key is (keys..., bar_id) — bar_id alone would mix symbols.
    */
  def ohlcvByBarId(withIds: DataFrame, keyCols: Seq[String] = Nil): DataFrame =
    TimeBars.ohlcvTwoPass(withIds, keyCols :+ "bar_id")
      .withColumn("bar_ts", col("__lts"))
      .select((keyCols ++ Seq("bar_id", "bar_ts", "open", "high", "low", "close",
        "volume", "trades", "median_trade_size", "vwap")).map(col): _*)

  def tickBarsOhlcv(trades: DataFrame, threshold: Int,
                    keyCols: Seq[String] = Nil): DataFrame = {
    val ids = tickBarIds(trades, threshold, keyCols)
    // complete bars only: bar 0 has thr-1 rows (row 0 excluded per key),
    // others thr — the filter holds per key run
    ohlcvByBarId(ids, keyCols)
      .where(col("trades") === lit(threshold.toLong) ||
             (col("bar_id") === 0 && col("trades") === lit(threshold.toLong - 1)))
  }

  // --- sequential (reset-state) indexers --------------------------------

  /** Volume bars (logic.py:87-115): running cum += qty, close when
    * cum >= threshold, reset to 0 (NO carry-over). Emits per-trade bar_id
    * (-1 for the unassigned row 0) + bar_closed on the closing row.
    */
  def volumeBarIds(trades: DataFrame, threshold: Double,
                   keyCols: Seq[String] = Nil): DataFrame =
    sequentialIds(trades, keyCols) { (rows, qtyIdx, _) =>
      var cum = 0.0
      var bar = 0L
      var first = true
      rows.map { r =>
        if (first) { first = false; cum = r.getDouble(qtyIdx); (r, -1L, false) }
        else {
          cum += r.getDouble(qtyIdx)
          val id = bar
          val closed = cum >= threshold
          if (closed) { bar += 1; cum = 0.0 }
          (r, id, closed)
        }
      }
    }

  /** Dollar bars (logic.py:118-149): cum += price·qty, close when
    * cum >= threshold, CARRY the remainder (cum −= threshold).
    */
  def dollarBarIds(trades: DataFrame, threshold: Double,
                   keyCols: Seq[String] = Nil): DataFrame =
    sequentialIds(trades, keyCols) { (rows, qtyIdx, priceIdx) =>
      var cum = 0.0
      var bar = 0L
      var first = true
      rows.map { r =>
        if (first) { first = false; cum = r.getDouble(priceIdx) * r.getDouble(qtyIdx); (r, -1L, false) }
        else {
          cum += r.getDouble(priceIdx) * r.getDouble(qtyIdx)
          val id = bar
          val closed = cum >= threshold
          if (closed) { bar += 1; cum -= threshold }
          (r, id, closed)
        }
      }
    }

  /** Shared layout+kernel runner: key-ordered partitions, per-key reset,
    * appends (bar_id, bar_closed). The kernel sees (rows, qtyIdx, priceIdx).
    */
  private def sequentialIds(trades: DataFrame, keyCols: Seq[String])(
      kernel: (Iterator[Row], Int, Int) => Iterator[(Row, Long, Boolean)]): DataFrame = {
    val laid = Scan.keyOrdered(trades, keyCols, Seq("ts", "id"))
    val schema = laid.schema
    val qtyIdx = schema.fieldIndex("qty")
    val priceIdx = schema.fieldIndex("price")
    val keyIdxs = keyCols.map(schema.fieldIndex)
    val out = StructType(schema.fields :+
      StructField("bar_id", LongType) :+ StructField("bar_closed", BooleanType))
    laid.mapPartitions { it =>
      Scan.keyRuns(it, keyIdxs).flatMap(g => kernel(g, qtyIdx, priceIdx).map {
        case (r, id, closed) => Row.fromSeq(r.toSeq :+ id :+ closed)
      })
    }(Encoders.row(out)).toDF()
  }

  /** Drop the unassigned first trade and the trailing partial bar (a bar is
    * complete iff its close fired), then aggregate — parity with the
    * reference's n_bars = len(closes) − 1.
    */
  def completeBars(withIds: DataFrame, keyCols: Seq[String] = Nil): DataFrame = {
    val keys = keyCols :+ "bar_id"
    val flagged = withIds.where(col("bar_id") >= 0)
      .groupBy(keys.map(col): _*).agg(max(col("bar_closed")).as("__complete"))
      .where(col("__complete"))
    ohlcvByBarId(withIds.where(col("bar_id") >= 0), keyCols)
      .join(flagged.select(keys.map(col): _*), keys)
  }

  /** Symmetric CUSUM filter on log returns (sampling/filters.py:6-70 and
    * the bar indexer logic.py:152-221 share this state machine): emits the
    * rows where either cumulative sum crosses ±max(mult·σ, floor).
    * σ here is a per-row threshold column (NaN forward-filled like the
    * reference); equal-timestamp print blocks cannot close (logic.py:207-209).
    */
  def cusumEventIds(trades: DataFrame, sigmaCol: String, sigmaMult: Double,
                    sigmaFloor: Double, keyCols: Seq[String] = Nil,
                    emitSlack: Boolean = false): DataFrame = {
    val laid = Scan.keyOrdered(trades, keyCols, Seq("ts", "id"))
    val schema = laid.schema
    val pIdx = schema.fieldIndex("price")
    val tsIdx = schema.fieldIndex("ts")
    val sIdx = schema.fieldIndex(sigmaCol)
    val keyIdxs = keyCols.map(schema.fieldIndex)
    val baseFields = schema.fields :+ StructField("is_event", BooleanType)
    val out = StructType(
      if (emitSlack) baseFields :+ StructField("slack", DoubleType) else baseFields)
    laid.mapPartitions { it =>
      // state (cusum sums, prev price/sigma) resets at every key run —
      // log-returns and thresholds must not leak across symbols
      Scan.keyRuns(it, keyIdxs).flatMap { run =>
        val rows = run.buffered
        var sPos = 0.0
        var sNeg = 0.0
        var prevPrice = Double.NaN
        var prevSigma = Double.NaN
        var seenFirst = false
        new Iterator[Row] {
          def hasNext: Boolean = rows.hasNext
          def next(): Row = {
            val r = rows.next()
            val price = r.getDouble(pIdx)
            val rawSigma = if (r.isNullAt(sIdx)) Double.NaN else r.getDouble(sIdx)
            val sigma = if (rawSigma.isNaN) prevSigma else rawSigma
            var event = false
            // distance of this row's fire decision from the ±λ boundaries
            // (NaN when no comparison ran): an oracle recomputing s and λ
            // with different numerics flips the decision only inside this
            // margin, so its minimum certifies the gate's tie-safety
            var slack = Double.NaN
            if (!seenFirst) {
              if (!sigma.isNaN) { seenFirst = true; event = true } // first valid row opens
            } else {
              val ret = math.log(price / prevPrice)
              sPos = math.max(0.0, sPos + ret)
              sNeg = math.min(0.0, sNeg + ret)
              // cannot close inside an equal-timestamp print block
              val inBlock = rows.hasNext && rows.head.getLong(tsIdx) == r.getLong(tsIdx)
              if (!inBlock) {
                val lam = math.max(sigmaMult * sigma, sigmaFloor)
                slack = math.min(math.abs(sPos - lam), math.abs(sNeg + lam))
                if (sPos >= lam) { event = true; sPos = 0.0 }
                else if (sNeg <= -lam) { event = true; sNeg = 0.0 }
              }
            }
            if (seenFirst) { prevPrice = price }
            prevSigma = sigma
            if (emitSlack) Row.fromSeq(r.toSeq :+ event :+ slack)
            else Row.fromSeq(r.toSeq :+ event)
          }
        }
      }
    }(Encoders.row(out)).toDF()
  }
}
