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

  /** Streaming OHLCV time bars as a declarative windowed aggregation.
    * `event_time` (µs timestamp of the bar close) carries the watermark;
    * bars finalize `watermarkDelay` after their close in append mode, or
    * stream continuously in update/complete mode when `watermarkDelay` is
    * None. The struct-keyed open/close tie-break sorts each micro-batch —
    * bounded by batch size, fine for update/complete dashboards; the
    * append-mode scale path is [[ohlcvStateStream]] (fixed-width state
    * machine, no sort).
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

  /** Streaming directional (order-flow) bars — the conditional-sum subset
    * of TimeBars.directional that is declaratively streamable (all
    * fixed-width buffers): per-bar buy/sell tick counts, volumes and
    * dollars. The spread stats and intra-bar cumulative extrema need the
    * cross-boundary lag / ordered path walk — state-machine territory, not
    * a windowed aggregation — and are deliberately absent here. `side` must
    * arrive on the input (exchange feeds carry it; the batch tick rule is a
    * window function, which streams don't support).
    */
  def directionalStream(tradesWithSide: DataFrame, intervalSec: Long,
                        watermarkDelay: Option[String] = Some("1 minute")): DataFrame = {
    val iv = intervalSec * 1000000000L
    val based = tradesWithSide
      .withColumn("bar_ts", expr(s"((ts + ${iv - 1}L) div ${iv}L) * ${iv}L"))
      .withColumn("event_time",
        timestamp_micros((col("bar_ts") / 1000L).cast("long")))
    val marked = watermarkDelay.fold(based)(d => based.withWatermark("event_time", d))
    val isBuy = col("side") === 1
    val isSell = col("side") === -1
    marked
      .groupBy(col("event_time"), col("bar_ts"))
      .agg(
        sum(when(isBuy, 1L).otherwise(0L)).as("ticks_buy"),
        sum(when(isSell, 1L).otherwise(0L)).as("ticks_sell"),
        sum(when(isBuy, col("qty")).otherwise(0.0)).as("volume_buy"),
        sum(when(isSell, col("qty")).otherwise(0.0)).as("volume_sell"),
        sum(when(isBuy, col("price") * col("qty")).otherwise(0.0)).as("dollars_buy"),
        sum(when(isSell, col("price") * col("qty")).otherwise(0.0)).as("dollars_sell"))
      .drop("event_time")
  }

  /** Streaming footprint aggregation — the windowed-agg core of
    * Footprints.build: per (bar, price level) buy/sell volumes and tick
    * counts, finalized by the watermark in append mode. The diagonal
    * imbalance flags need lead/lag over the FINISHED level grid (a per-bar
    * window), so they belong to a post-finalize batch step — the same
    * declarative/stateful split as directionalStream vs the path stats.
    */
  def footprintStream(tradesWithSide: DataFrame, intervalSec: Long,
                      tickSize: Double,
                      watermarkDelay: Option[String] = Some("1 minute")): DataFrame = {
    val iv = intervalSec * 1000000000L
    val based = tradesWithSide
      .withColumn("bar_ts", expr(s"((ts + ${iv - 1}L) div ${iv}L) * ${iv}L"))
      .withColumn("level", round(col("price") / tickSize).cast("int"))
      .withColumn("event_time",
        timestamp_micros((col("bar_ts") / 1000L).cast("long")))
    val marked = watermarkDelay.fold(based)(d => based.withWatermark("event_time", d))
    marked
      .groupBy(col("event_time"), col("bar_ts"), col("level"))
      .agg(
        sum(when(col("side") === 1, col("qty")).otherwise(0.0)).as("buy_volume"),
        sum(when(col("side") === -1, col("qty")).otherwise(0.0)).as("sell_volume"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("buy_ticks"),
        sum(when(col("side") === -1, 1L).otherwise(0L)).as("sell_ticks"))
      .drop("event_time")
  }

  case class TradeIn(ts: Long, id: Long, price: Double, qty: Double, symbol: Long)
  case class SidedIn(ts: Long, id: Long, price: Double, qty: Double, side: Int)
  case class TradeBar(ts: Long, id: Long, price: Double, qty: Double, bar_ts: Long)
  case class BarState(openTs: Long, openId: Long, openPx: Double,
                      closeTs: Long, closeId: Long, closePx: Double,
                      high: Double, low: Double, vol: Double, n: Long, pq: Double)
  case class BarOut(bar_ts: Long, open: Double, high: Double, low: Double,
                    close: Double, volume: Double, trades: Long, vwap: Double)

  /** Streaming OHLCV as an explicit per-bar state machine — the scale path.
    *
    * [[ohlcvStream]]'s declarative agg needs a struct-keyed min_by/max_by
    * for the (ts, id) open/close tie-break, which demotes each micro-batch
    * to a SortAggregate. Here the bar state is a fixed-width record updated
    * in one pass per batch (`flatMapGroupsWithState`), and bars emit exactly
    * once in APPEND mode when the event-time watermark passes the bar close
    * + delay — bounded state, no sort, late trades folded in until the
    * timeout fires.
    */
  def ohlcvStateStream(trades: Dataset[TradeIn], intervalSec: Long,
                       watermarkDelay: String = "1 minute"): Dataset[BarOut] = {
    import trades.sparkSession.implicits._
    val iv = intervalSec * 1000000000L
    val based = trades
      .withColumn("bar_ts", expr(s"((ts + ${iv - 1}L) div ${iv}L) * ${iv}L"))
      .withColumn("event_time",
        timestamp_micros((col("bar_ts") / 1000L).cast("long")))
      .withWatermark("event_time", watermarkDelay)
      .as[TradeBar]
    based
      .groupByKey(_.bar_ts)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (barTs: Long, rows: Iterator[TradeBar], state: GroupState[BarState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(BarOut(barTs, s.openPx, s.high, s.low, s.closePx,
              s.vol, s.n, s.pq / s.vol))
          } else {
            var s = state.getOption.orNull
            rows.foreach { r =>
              s =
                if (s == null)
                  BarState(r.ts, r.id, r.price, r.ts, r.id, r.price,
                    r.price, r.price, r.qty, 1L, r.price * r.qty)
                else {
                  // (ts, id) tie-break, exactly the batch two-pass semantics
                  val isOpen = r.ts < s.openTs || (r.ts == s.openTs && r.id < s.openId)
                  val isClose = r.ts > s.closeTs || (r.ts == s.closeTs && r.id > s.closeId)
                  BarState(
                    if (isOpen) r.ts else s.openTs,
                    if (isOpen) r.id else s.openId,
                    if (isOpen) r.price else s.openPx,
                    if (isClose) r.ts else s.closeTs,
                    if (isClose) r.id else s.closeId,
                    if (isClose) r.price else s.closePx,
                    math.max(s.high, r.price), math.min(s.low, r.price),
                    s.vol + r.qty, s.n + 1L, s.pq + r.price * r.qty)
                }
            }
            if (s != null) {
              state.update(s)
              // finalize when the watermark (already delayed) passes the bar
              // close; clamp above the current watermark so the timeout is valid
              val closeMs = barTs / 1000000L
              state.setTimeoutTimestamp(math.max(closeMs, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }
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

  case class BarIdOut(symbol: Long, ts: Long, id: Long, bar_id: Long,
                      bar_closed: Boolean)
  case class CumState(cum: Double, bar: Long, seen: Boolean)

  /** Shared reset-on-trigger threshold-bar state machine: per-symbol running
    * `cum += measure(trade)`, close when cum >= threshold; `carry = false`
    * resets to 0 (volume bars, bar/logic.py:87-115), `carry = true` keeps
    * the remainder (dollar bars, logic.py:118-149). Row 0 seeds cum and is
    * unassigned (bar_id = -1), exactly the batch kernels' convention —
    * batch/stream parity is tested in StreamingSpec.
    */
  private def thresholdBarStream(trades: Dataset[TradeIn], threshold: Double,
                                 carry: Boolean, dollars: Boolean): Dataset[BarIdOut] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: Long, rows: Iterator[TradeIn], state: GroupState[CumState]) =>
          var s = state.getOption.getOrElse(CumState(0.0, 0L, seen = false))
          val out = rows.toArray.sortBy(r => (r.ts, r.id)).map { r =>
            val m = if (dollars) r.price * r.qty else r.qty
            if (!s.seen) {
              s = CumState(m, 0L, seen = true)
              BarIdOut(symbol, r.ts, r.id, -1L, bar_closed = false)
            } else {
              val cum = s.cum + m
              val id = s.bar
              val closed = cum >= threshold
              s =
                if (closed)
                  CumState(if (carry) cum - threshold else 0.0, s.bar + 1, seen = true)
                else CumState(cum, s.bar, seen = true)
              BarIdOut(symbol, r.ts, r.id, id, closed)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** Streaming tick bars — twin of EventBars.tickBarIds' closed form: a
    * per-symbol trade counter; row 0 unassigned, bar_id = (count−1) div
    * threshold thereafter, closing on the last trade of each bar.
    */
  def tickBarStream(trades: Dataset[TradeIn], threshold: Int): Dataset[BarIdOut] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: Long, rows: Iterator[TradeIn], state: GroupState[CumState]) =>
          var s = state.getOption.getOrElse(CumState(0.0, 0L, seen = false))
          // CumState.bar counts rows AFTER the first (the batch kernel's
          // rn0); cum is unused for tick bars
          val out = rows.toArray.sortBy(r => (r.ts, r.id)).map { r =>
            if (!s.seen) {
              s = CumState(0.0, 0L, seen = true)
              BarIdOut(symbol, r.ts, r.id, -1L, bar_closed = false)
            } else {
              val rn0 = s.bar + 1
              s = CumState(0.0, rn0, seen = true)
              // batch closed form: bar_id = rn0 div thr (bar 0 spans rn0
              // 1..thr-1 — row 0 is excluded — all later bars thr rows)
              BarIdOut(symbol, r.ts, r.id, rn0 / threshold,
                bar_closed = (rn0 + 1) % threshold == 0)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** Streaming volume bars (reset, no carry) — twin of EventBars.volumeBarIds. */
  def volumeBarStream(trades: Dataset[TradeIn], threshold: Double): Dataset[BarIdOut] =
    thresholdBarStream(trades, threshold, carry = false, dollars = false)

  /** Streaming dollar bars (carry remainder) — twin of EventBars.dollarBarIds. */
  def dollarBarStream(trades: Dataset[TradeIn], threshold: Double): Dataset[BarIdOut] =
    thresholdBarStream(trades, threshold, carry = true, dollars = true)

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
