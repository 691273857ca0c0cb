package graft.streaming

import graft.bars.TimeBars
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming executors (SURVEY.md §7.0 design stance): the same
  * bar/feature semantics as the batch operators, expressed over an unbounded
  * trades stream.
  *
  *  - Windowed aggregations (time bars) are plain event-time groupBy aggs —
  *    the continuous equivalent of the reference's `AddTimeBarH5`
  *    materialized-view maintenance (bar/io.py:441-565); a watermark bounds
  *    state and finalizes bars in append mode.
  *  - Recursive/reset-state operators (EW family, CUSUM) run as
  *    `flatMapGroupsWithState` per symbol: the reference's sequential kernels
  *    become explicit state machines whose state survives across
  *    micro-batches. Rows are sorted by (ts, id) WITHIN each batch; exactness
  *    across batches assumes batch boundaries respect event order per key
  *    (i.e. no straggler older than anything already processed — enforce
  *    upstream with a watermark-delayed sorted buffer if the source can
  *    reorder).
  */
object StreamingBars {

  /** Streaming OHLCV time bars. `event_time` (µs timestamp of the bar close)
    * carries the watermark; bars finalize `watermarkDelay` after their close
    * in append mode, or stream continuously in update/complete mode when
    * `watermarkDelay` is None.
    */
  def ohlcvStream(trades: DataFrame, intervalSec: Long,
                  watermarkDelay: Option[String] = Some("1 minute")): DataFrame = {
    val iv = intervalSec * 1000000000L
    val based = trades
      .withColumn("bar_ts", expr(s"((ts + ${iv - 1}L) div ${iv}L) * ${iv}L"))
      .withColumn("event_time",
        timestamp_micros((col("bar_ts") / 1000L).cast("long")))
    val marked = watermarkDelay.fold(based)(d => based.withWatermark("event_time", d))
    marked
      .groupBy(col("event_time"), col("bar_ts"))
      .agg(
        min_by(col("price"), struct(col("ts"), col("id"))).as("open"),
        max("price").as("high"),
        min("price").as("low"),
        max_by(col("price"), struct(col("ts"), col("id"))).as("close"),
        sum("qty").as("volume"),
        count(lit(1)).as("trades"),
        (sum(col("price") * col("qty")) / sum(col("qty"))).as("vwap"))
      .drop("event_time")
  }

  case class TradeIn(ts: Long, id: Long, price: Double, qty: Double, symbol: Long)
  case class EwmaOut(symbol: Long, ts: Long, id: Long, ewma: Double)
  case class EwState(u: Double, v: Double)
  case class CusumOut(symbol: Long, ts: Long, id: Long, isEvent: Boolean)
  case class CusumState(sPos: Double, sNeg: Double, prevPrice: Double, seen: Boolean)

  /** pandas-ewm(span, adjust=True) recursion as a per-symbol streaming state
    * machine — u/v are the geometric numerator/denominator sums, exactly the
    * batch scan's state (Ewm.ewmaExact).
    */
  def ewmaStream(trades: Dataset[TradeIn], span: Int): Dataset[EwmaOut] = {
    import trades.sparkSession.implicits._
    val q = 1.0 - 2.0 / (span + 1.0)
    trades
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: Long, rows: Iterator[TradeIn], state: GroupState[EwState]) =>
          var s = state.getOption.getOrElse(EwState(0.0, 0.0))
          val out = rows.toArray.sortBy(r => (r.ts, r.id)).map { r =>
            s = EwState(q * s.u + r.price, q * s.v + 1.0)
            EwmaOut(symbol, r.ts, r.id, s.u / s.v)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Symmetric CUSUM event filter (constant threshold) as a per-symbol
    * streaming state machine — the streaming twin of
    * EventBars.cusumEventIds' batch scan.
    */
  def cusumStream(trades: Dataset[TradeIn], threshold: Double): Dataset[CusumOut] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: Long, rows: Iterator[TradeIn], state: GroupState[CusumState]) =>
          var s = state.getOption.getOrElse(CusumState(0.0, 0.0, Double.NaN, seen = false))
          val out = rows.toArray.sortBy(r => (r.ts, r.id)).map { r =>
            var event = false
            if (!s.seen) {
              s = CusumState(0.0, 0.0, r.price, seen = true)
              event = true // first row opens, like the batch kernel
            } else {
              val ret = math.log(r.price / s.prevPrice)
              var sPos = math.max(0.0, s.sPos + ret)
              var sNeg = math.min(0.0, s.sNeg + ret)
              if (sPos >= threshold) { event = true; sPos = 0.0 }
              else if (sNeg <= -threshold) { event = true; sNeg = 0.0 }
              s = CusumState(sPos, sNeg, r.price, seen = true)
            }
            CusumOut(symbol, r.ts, r.id, event)
          }
          state.update(s)
          out.iterator
      }
  }
}
