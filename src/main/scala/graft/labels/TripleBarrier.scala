package graft.labels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triple Barrier Method labeling (finmlkit/label/tbm.py:11-158) as a
  * range join + two aggregation passes — no per-event sequential walk.
  *
  * Pass 1 finds the first-touch timestamp per event with conditional `min`;
  * pass 2 re-joins the (pruned) path up to the touch to recover the return
  * at touch and the max return/barrier ratios the reference tracks for its
  * soft vertical-touch weight. Both joins are range joins bounded by the
  * vertical barrier, so the blow-up is |events| × avg path length — the same
  * work the reference's kernel does, but shuffle-parallel.
  *
  * Semantics preserved: barriers in log-return space multiplied by event
  * side; path is (t0, t0+vert] start-exclusive end-inclusive; rows closer
  * than minClose are skipped entirely; label = sign(ret) with 0 → +1, or
  * meta-label ret >= minRet; events whose vertical barrier passes the end of
  * data are dropped (label/kit.py:262-269).
  */
object TripleBarrier {

  /** @param events (event_ts, event_id, p0, tgt[, eside]) — eside ∈ {-1,1}
    *               required when isMeta
    */
  def label(trades: DataFrame, events: DataFrame,
            topMult: Double, botMult: Double,
            vertBarrierSec: Double, minCloseSec: Double = 0.0,
            minRet: Double = 0.0, isMeta: Boolean = false): DataFrame = {
    val vertNs = (vertBarrierSec * 1e9).toLong
    val minCloseNs = (minCloseSec * 1e9).toLong

    val maxTs = trades.agg(max("ts").as("__max_ts"))
    val ev = events
      .withColumn("eside", if (isMeta) col("eside") else lit(1))
      .withColumn("up", lit(topMult) * col("tgt"))
      .withColumn("lo", lit(-botMult) * col("tgt"))
      .crossJoin(broadcast(maxTs))
      .where(col("event_ts") + vertNs <= col("__max_ts"))
      .drop("__max_ts")

    val t = trades.select(col("ts"), col("price"))
    val path = ev.join(t,
        t("ts") > col("event_ts") &&
        t("ts") <= col("event_ts") + vertNs &&
        t("ts") - col("event_ts") >= minCloseNs)
      .withColumn("ret", (log(col("price")) - log(col("p0"))) * col("eside"))

    val breach = col("ret") >= col("up") || col("ret") <= col("lo")
    val p1 = path.groupBy("event_id", "event_ts", "p0", "tgt", "eside", "up", "lo")
      .agg(
        min(when(breach, col("ts"))).as("touch0"),
        max(col("ts")).as("vert_ts"))
      .withColumn("touch_ts", coalesce(col("touch0"), col("vert_ts")))

    val p2 = p1.join(path.select(col("event_id").as("eid2"), col("ts"), col("ret")),
        col("eid2") === col("event_id") && col("ts") <= col("touch_ts"))
      .groupBy("event_id", "event_ts", "tgt", "eside", "up", "lo", "touch0", "touch_ts")
      .agg(
        max_by(col("ret"), col("ts")).as("ret_touch"),
        coalesce(max(when(col("ret") > 0, col("ret") / col("up"))), lit(0.0)).as("max_urbr"),
        coalesce(max(when(col("ret") < 0, col("ret") / col("lo"))), lit(0.0)).as("max_lrbr"))

    val isVertical = col("touch0").isNull
    val rawLabel =
      if (isMeta) when(col("ret_touch") >= minRet, 1).otherwise(0)
      else when(signum(col("ret_touch")) === 0, 1)
        .otherwise(signum(col("ret_touch")).cast("int"))
    val maxRbr = when(col("ret_touch") > 0, col("max_urbr") / (lit(1.0) + col("max_lrbr")))
      .otherwise(col("max_lrbr") / (lit(1.0) + col("max_urbr")))
    p2.select(
      col("event_ts"), col("event_id"),
      rawLabel.as("label"),
      col("touch_ts"),
      col("ret_touch").as("ret"),
      when(isVertical, least(maxRbr, lit(1.0))).otherwise(lit(1.0))
        .as("vertical_touch_weight"))
  }

  /** The deterministic synthetic event set used by the driver queries:
    * every 29th trade, target = 0.05 + (id mod 7)/100 (log-return scale),
    * side from id parity.
    */
  def syntheticEvents(trades: DataFrame): DataFrame =
    trades.where(col("id") % 29 === 0).select(
      col("ts").as("event_ts"),
      col("id").as("event_id"),
      col("price").as("p0"),
      (lit(0.05) + (col("id") % 7).cast("double") * lit(0.01)).as("tgt"),
      when(col("id") % 2 === 0, 1).otherwise(-1).as("eside"))
}
